"""Fixture-generator invariants (FIXTURES.md §1): purity, partition
independence, input_hint schema, the byte-identical-text contract."""

import numpy as np
import pandas as pd

from gipspark.functions.text import extract_text_series, geotag_frame
from gipspark.sources.fixtures import MEGACITY, docs_df, docs_pdf, polygons


def test_generator_pure_and_split_invariant():
    whole = docs_pdf(np.arange(100))
    parts = pd.concat([docs_pdf(np.arange(0, 37)), docs_pdf(np.arange(37, 100))])
    pd.testing.assert_frame_equal(whole.reset_index(drop=True), parts.reset_index(drop=True))


def test_text_is_frozen_extraction_of_html():
    d = docs_pdf(np.arange(200))
    re_extracted = extract_text_series(d.html)
    assert (re_extracted == d.text).all()


def test_geocoded_fraction_and_hotspot():
    d = docs_pdf(np.arange(5000))
    g = geotag_frame(d.html)
    frac = g.lat.notna().mean()
    assert 0.6 < frac < 0.8
    hot = (
        (g.lat.sub(MEGACITY[0]).abs() < 0.06) & (g.lon.sub(MEGACITY[1]).abs() < 0.06)
    ).mean()
    assert 0.15 < hot < 0.3  # ~0.7*0.3 of all docs


def test_spark_generator_matches_driver_side(spark):
    df = docs_df(spark, 50, partitions=7).orderBy("url").toPandas()
    ref = docs_pdf(np.arange(50)).sort_values("url").reset_index(drop=True)
    assert list(df.url) == list(ref.url)
    assert list(df.text) == list(ref.text)
    assert [bytes(b) for b in df.html] == list(ref.html)


def test_polygons_shapes():
    ps = polygons(50)
    assert len(ps) == 50
    assert sum(len(p["rings"]) > 1 for p in ps) == 2  # two with holes
    for p in ps:
        for ring in p["rings"]:
            assert ring[0] == ring[-1]  # closed
