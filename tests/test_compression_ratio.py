"""compression_ratio_frame vs direct zlib + ordering properties."""

import zlib

from gipspark.queries import REGISTRY


def test_matches_direct_zlib_and_orders_repetition(spark):
    texts = {
        0: "the quick brown fox jumps over the lazy dog " * 3,
        1: "spam spam spam spam spam spam spam spam spam spam " * 10,
        2: "a9$k!QzP0w#rT5uV&xY2mN8bL4cJ7dH1fG6eS3i",  # high-entropy
        3: "",
    }
    df = spark.createDataFrame([(k, v) for k, v in texts.items()], "doc_id long, text string")

    import sys

    fn = REGISTRY["compression_ratio_docs"][0]
    Q = sys.modules[fn.__module__]  # the family module whose globals the fn reads

    orig_load = Q.load
    Q.load = lambda s, sf, name: df  # route the registry fn at this frame
    try:
        out = {r.doc_id: r for r in fn(spark, "ignored").collect()}
    finally:
        Q.load = orig_load

    for k, t in texts.items():
        b = t.encode("utf-8")
        assert out[k].raw_len == len(b)
        assert out[k].comp_len == len(zlib.compress(b, 6))

    # repetitive text compresses harder than prose; prose harder than noise
    assert out[1].ratio < out[0].ratio < out[2].ratio
    # empty doc: ratio guarded by the greatest(1, raw_len) denominator
    assert out[3].raw_len == 0 and out[3].ratio == float(out[3].comp_len)
