"""Multimodal plumbing: schemas, batch shapes, expansion, determinism.

The decode kernels are deterministic fakes (no codecs in the sandbox —
module docstring); these tests pin the *Spark-side* contract a real
codec would inherit unchanged."""

import numpy as np

from gipspark.functions import multimodal as M


def test_image_features_schema_and_determinism(spark):
    media = M.synthetic_media_df(spark, 30)
    f1 = sorted(tuple(r) for r in M.image_features(media).collect())
    f2 = sorted(tuple(r) for r in M.image_features(media.repartition(7)).collect())
    assert f1 == f2  # partitioning-independent
    assert len(f1) == 10  # only the image rows
    r = f1[0]
    assert len(r[4]) == 16 and sum(r[4]) == 32 * 24  # histogram covers all px


def test_image_resize_roundtrip(spark):
    media = M.synthetic_media_df(spark, 9)
    rows = M.image_resize(media, target=8).collect()
    assert {len(bytes(r.thumb)) for r in rows} == {64}
    assert all(r.t_width == r.t_height == 8 for r in rows)


def test_audio_features(spark):
    media = M.synthetic_media_df(spark, 9)
    rows = M.audio_features(media).collect()
    assert len(rows) == 3
    assert all(0.0 < r.rms < 1.01 for r in rows)


def test_video_frame_sample_expands_rows(spark):
    media = M.synthetic_media_df(spark, 9)
    rows = M.video_frame_sample(media, every=10).collect()
    # 3 videos × 5 sampled frames (0,10,20,30,40 of 50)
    assert len(rows) == 15
    assert sorted({r.frame_idx for r in rows}) == [0, 10, 20, 30, 40]
    assert all(len(bytes(r.frame)) == 256 for r in rows)


def test_stub_seam_raises_without_fake_codecs(monkeypatch):
    monkeypatch.setattr(M, "FAKE_CODECS", False)
    try:
        M._fake_decode_image(b"x", 4, 4)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass
