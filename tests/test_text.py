"""Frozen extract_text spec goldens + geotag parse + JVM text analysis."""

import pandas as pd
from pyspark.sql import functions as F

from gipspark.functions.text import (
    extract_text_py,
    geotag_frame,
    lang_id,
    quality_score,
    token_count,
)


def test_extract_text_spec_goldens():
    cases = [
        ("<p>hello   world</p>", "hello world"),
        ("<script>var x = '<p>no</p>';</script>text", "text"),
        ("<style>p {color: red}</style>ok", "ok"),
        ("<!-- comment -->seen", "seen"),
        ("a&amp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y", "a&b <tag> \"q\" 's' x y"),
        ("&amp;lt;", "&lt;"),  # amp decoded last
        (b"<b>bytes</b> in", "bytes in"),
        ("tabs\tand\nnewlines", "tabs and newlines"),
        ("", ""),
    ]
    for html, want in cases:
        assert extract_text_py(html) == want, html


def test_extract_text_nfc():
    # e + combining acute must normalize to precomposed é
    assert extract_text_py("café") == "café"


def test_geotag_parse_variants():
    htmls = pd.Series(
        [
            '<meta name="geo.position" content="48.85;2.35">',
            "<META NAME='geo.position' CONTENT='-10.5 ; -170.25'>",
            '<meta name="geo.position" content="bad">',
            "<p>none</p>",
        ]
    )
    g = geotag_frame(htmls)
    assert g.lat.tolist()[:2] == [48.85, -10.5]
    assert g.lon.tolist()[:2] == [2.35, -170.25]
    assert g.lat.isna().tolist() == [False, False, True, True]


def test_jvm_text_analysis(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of a to a"),
            (1, "der hund und die katze ist das"),
            (2, "xyz qrs tuv"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("n"),
            lang_id(F.col("text")).alias("lang"),
            quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert rows[0].lang == "en"
    assert rows[1].lang == "de"
    assert rows[2].lang == "und"
    assert rows[0].n == 9
    assert 0.0 <= rows[2].q <= 1.0


def test_ws_collapse_equivalence_full_bmp():
    # the step-4 rewrite (" ".join(t.split())) must equal the spec's
    # re.sub(r"\s+", " ", t).strip() for EVERY BMP char in whitespace
    # position — both reduce to Py_UNICODE_ISSPACE, pinned here so a
    # future regex/runtime change cannot silently fork the frozen spec
    import re

    ws = re.compile(r"\s+")
    for c in range(0x3001):
        ch = chr(c)
        t = f"a{ch}b {ch} c{ch}"
        assert ws.sub(" ", t).strip() == " ".join(t.split()), hex(c)
