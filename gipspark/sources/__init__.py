"""Sources & sinks: driver-table loaders, deterministic synthetic
fixtures (the Common-Crawl-style doc table of BASELINE.json's
input_hint), and the checkpoint/lineage manifest layer that makes
pipelines resumable mid-tiling (SURVEY.md §2.11)."""
