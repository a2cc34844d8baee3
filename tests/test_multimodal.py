"""Multimodal plumbing: schemas, batch shapes, expansion, determinism.

The decode kernels are deterministic fakes (no codecs in the sandbox —
module docstring); these tests pin the *Spark-side* contract a real
codec would inherit unchanged."""

import numpy as np
import pytest

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


def test_video_frames_match_per_frame_decode(spark):
    # the batched synthesis must be BIT-identical to decoding each
    # frame independently via _fake_decode_image(payload + f_le32) —
    # including short payloads, where the frame index bytes land inside
    # the 64-byte seed window and change the pixels per frame
    rows = [
        (0, "video", b"\x07" * 5, {"width": None, "height": None, "sample_rate": None, "n_frames": 25}),
        (1, "video", b"\xfe" * 128, {"width": None, "height": None, "sample_rate": None, "n_frames": 7}),
        (2, "image", b"\x01" * 16, {"width": 4, "height": 4, "sample_rate": None, "n_frames": None}),
    ]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = sorted(
        (r.media_id, r.frame_idx, bytes(r.frame))
        for r in M.video_frame_sample(media, every=10, size=16).collect()
    )
    expected = sorted(
        (mid, f, M._fake_decode_image(payload + f.to_bytes(4, "little"), 16, 16).tobytes())
        for mid, kind, payload, meta in rows
        if kind == "video"
        for f in range(0, meta["n_frames"], 10)
    )
    assert got == expected
    # short payload: per-frame bytes genuinely differ (seed window hit)
    frames0 = [fr for mid, _, fr in got if mid == 0]
    assert len(set(frames0)) == len(frames0)


def test_stub_seam_raises_without_fake_codecs(monkeypatch):
    monkeypatch.setattr(M, "FAKE_CODECS", False)
    try:
        M._fake_decode_image(b"x", 4, 4)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def test_decode_dispatch_without_pil_raises(monkeypatch):
    """With fakes off and Pillow absent, the DISPATCH raises at the
    seam too (the real branch must never be silently skipped)."""
    monkeypatch.setattr(M, "FAKE_CODECS", False)
    monkeypatch.setattr(M, "_PILImage", None)
    try:
        M._decode_image(b"x", 4, 4)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


@pytest.mark.skipif(M._PILImage is None, reason="Pillow not installed")
def test_real_pil_decode_roundtrip(monkeypatch):
    """Real-codec branch (activates automatically when Pillow exists,
    VERDICT r4 next-round #6): a PNG-encoded known grayscale array must
    decode back bit-exact, and a meta-dims mismatch must raise."""
    import io

    monkeypatch.setattr(M, "FAKE_CODECS", False)
    arr = (np.arange(24 * 32, dtype=np.uint64) * 37 % 251).astype(np.uint8).reshape(24, 32)
    buf = io.BytesIO()
    M._PILImage.fromarray(arr, mode="L").save(buf, format="PNG")
    payload = buf.getvalue()
    got = M._decode_image(payload, 32, 24)
    assert got.dtype == np.uint8 and got.shape == (24, 32)
    assert np.array_equal(got, arr)
    try:
        M._decode_image(payload, 16, 16)
        raise AssertionError("expected ValueError on meta mismatch")
    except ValueError:
        pass


@pytest.mark.skipif(M._PILImage is None, reason="Pillow not installed")
def test_real_pil_group_images_stacks_decoded_arrays(monkeypatch):
    """The decode+stack plumbing is codec-agnostic: with real PNG
    payloads and fakes off, _group_images (the exact code path every
    image op's mapInPandas kernel runs per Arrow batch) yields the
    PIL-decoded arrays stacked by shape group. Tested on the pandas
    batch directly — a driver-side monkeypatch cannot reach forked
    Python workers, so the Spark roundtrip is covered by the fake-codec
    tests and the kernel by this one."""
    import io

    import pandas as pd

    monkeypatch.setattr(M, "FAKE_CODECS", False)
    arrs, rows = [], []
    for i in range(6):
        w, h = (32, 24) if i % 2 == 0 else (16, 16)
        arr = ((np.arange(h * w, dtype=np.uint64) * (i + 3)) % 256).astype(np.uint8).reshape(h, w)
        buf = io.BytesIO()
        M._PILImage.fromarray(arr, mode="L").save(buf, format="PNG")
        arrs.append(arr)
        rows.append(
            {"media_id": i, "kind": "image", "payload": buf.getvalue(),
             "meta": {"width": w, "height": h, "sample_rate": None, "n_frames": None}}
        )
    batch = pd.DataFrame(rows)
    got = {}
    for w, h, ids, stack in M._group_images(batch):
        for mid, img in zip(ids, stack):
            got[int(mid)] = (w, h, img)
    assert set(got) == set(range(6))
    for i, arr in enumerate(arrs):
        w, h, img = got[i]
        assert (h, w) == arr.shape
        assert np.array_equal(img, arr)


def _scalar_image_reference(media_rows, bins=16):
    """Per-row NumPy reference for the batched feature kernels."""
    out = {}
    for r in media_rows:
        if r["kind"] != "image":
            continue
        w, h = int(r["meta"]["width"]), int(r["meta"]["height"])
        img = M._fake_decode_image(r["payload"], w, h).astype(np.float32)
        gx = np.abs(np.diff(img, axis=1)).mean() if w > 1 else 0.0
        gy = np.abs(np.diff(img, axis=0)).mean() if h > 1 else 0.0
        hist = np.histogram(img, bins=bins, range=(0, 255))[0]
        out[r["media_id"]] = (
            float(img.mean()),
            float(img.std()),
            float(gx + gy),
            hist.astype(np.int32).tolist(),
        )
    return out


def test_image_features_match_scalar_reference(spark):
    media = M.synthetic_media_df(spark, 30)
    ref = _scalar_image_reference([r.asDict() for r in media.collect()])
    got = {
        r.media_id: (r.mean_px, r.std_px, r.edge_density, list(r.histogram))
        for r in M.image_features(media).collect()
    }
    assert set(got) == set(ref)
    for mid, (m, s, e, hist) in ref.items():
        gm, gs, ge, gh = got[mid]
        assert abs(gm - m) < 1e-4 and abs(gs - s) < 1e-4 and abs(ge - e) < 1e-4
        assert gh == hist


def test_image_resize_matches_scalar_reference(spark):
    media = M.synthetic_media_df(spark, 9)
    target = 8
    got = {r.media_id: bytes(r.thumb) for r in M.image_resize(media, target=target).collect()}
    for r in media.collect():
        if r.kind != "image":
            continue
        w, h = int(r.meta["width"]), int(r.meta["height"])
        img = M._fake_decode_image(bytes(r.payload), w, h)
        ys = np.linspace(0, h, target + 1).astype(int)
        xs = np.linspace(0, w, target + 1).astype(int)
        thumb = np.zeros((target, target), dtype=np.uint8)
        for i in range(target):
            for j in range(target):
                thumb[i, j] = img[
                    ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)
                ].mean()
        assert got[r.media_id] == thumb.tobytes()


def test_image_ahash_matches_scalar_reference(spark):
    media = M.synthetic_media_df(spark, 12)
    grid = 8
    got = {
        r.media_id: (r.ahash, r.popcount)
        for r in M.image_ahash(media, grid=grid).collect()
    }
    # scalar reference: per-image box-downsample -> mean threshold ->
    # row-major MSB-first bit pack (two's-complement int64)
    for r in media.collect():
        if r.kind != "image":
            continue
        w, h = int(r.meta["width"]), int(r.meta["height"])
        img = M._fake_decode_image(bytes(r.payload), w, h).astype(np.float64)
        ys = np.linspace(0, h, grid + 1).astype(int)
        xs = np.linspace(0, w, grid + 1).astype(int)
        thumb = np.zeros((grid, grid))
        for i in range(grid):
            for j in range(grid):
                thumb[i, j] = img[
                    ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)
                ].mean()
        bits = (thumb > thumb.mean()).ravel()
        val = 0
        for b in bits:
            val = (val << 1) | int(b)
        expect = np.uint64(val).astype(np.int64)
        assert got[r.media_id] == (expect, int(bits.sum()))


def test_image_ahash_partitioning_invariant(spark):
    media = M.synthetic_media_df(spark, 30)
    a = {r.media_id: r.ahash for r in M.image_ahash(media).collect()}
    b = {
        r.media_id: r.ahash
        for r in M.image_ahash(media.repartition(7)).collect()
    }
    assert a == b
