"""End-to-end pipelines (the north_star scan→encode→join→tile chain)."""
