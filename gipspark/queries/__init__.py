"""Query registry package (split from the former single-file
gipspark/queries.py; VERDICT r4 next-round #3). Importing this
package imports every family module (filling REGISTRY) and
re-exports the union namespace so existing imports like
``from gipspark.queries import REGISTRY, _PII_EMAIL`` keep
working unchanged."""

from gipspark.queries import _base, _shared
from gipspark.queries import analytics
from gipspark.queries import contracts
from gipspark.queries import curation
from gipspark.queries import dedup
from gipspark.queries import geo_cells
from gipspark.queries import geo_join
from gipspark.queries import geo_stats
from gipspark.queries import graph
from gipspark.queries import matching
from gipspark.queries import olap
from gipspark.queries import similarity
from gipspark.queries import sketches
from gipspark.queries import streaming
from gipspark.queries import text
from gipspark.queries import timeseries
from gipspark.queries import tpch
from gipspark.queries import trajectory

import sys as _sys

_self = _sys.modules[__name__]
for _mod in (_base, _shared, analytics, contracts, curation, dedup, geo_cells, geo_join, geo_stats, graph, matching, olap, similarity, sketches, streaming, text, timeseries, tpch, trajectory):
    for _k, _v in vars(_mod).items():
        if not _k.startswith('__'):
            setattr(_self, _k, _v)
del _self, _mod, _k, _v, _sys
