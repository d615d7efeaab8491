"""Round-5 fixes: PNG decode (stdlib zlib + numpy unfilter), the
degenerate-P6-header guard, checkpoint_keep validation, and the
semdedup survivor-ordering quantization (ADVICE r4 + VERDICT r4 #3)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from data_harvesting_ray.fixtures.generator import encode_png
from data_harvesting_ray.stages.multimodal import FeatureExtractor


def _rng_img(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter_type(ft):
    """Every scanline filter type (None/Sub/Up/Average/Paeth)
    roundtrips exactly through encode → zlib → unfilter."""
    img = _rng_img(100 + ft, 11, 7)
    payload = encode_png(img, filters=np.full(11, ft, dtype=np.int64))
    out = FeatureExtractor._decode_png(payload)
    assert out.shape == (11, 7, 3)
    assert (out == img.astype(np.int64)).all()


def test_png_roundtrip_mixed_filters():
    img = _rng_img(7, 23, 13)
    payload = encode_png(img)  # default cycles filters 0..4
    out = FeatureExtractor._decode_png(payload)
    assert (out == img.astype(np.int64)).all()


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _manual_png(px: np.ndarray, ctype: int, interlace: int = 0) -> bytes:
    """Hand-built PNG (filter 0 on every row) for gray/RGBA cases the
    in-repo encoder doesn't emit."""
    h, w = px.shape[0], px.shape[1]
    bpp = {0: 1, 2: 3, 6: 4}[ctype]
    raw = b"".join(
        b"\x00" + px[y].reshape(-1).astype(np.uint8).tobytes() for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_png_gray_and_rgba_color_types():
    gray = np.random.default_rng(3).integers(0, 256, size=(5, 6, 1), dtype=np.uint8)
    out = FeatureExtractor._decode_png(_manual_png(gray, ctype=0))
    assert out.shape == (5, 6, 3)
    assert (out == np.repeat(gray.astype(np.int64), 3, axis=2)).all()

    rgba = np.random.default_rng(4).integers(0, 256, size=(4, 3, 4), dtype=np.uint8)
    out = FeatureExtractor._decode_png(_manual_png(rgba, ctype=6))
    assert (out == rgba[:, :, :3].astype(np.int64)).all()


def test_png_unsupported_shapes_raise():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        FeatureExtractor._decode_png(_manual_png(px, ctype=2, interlace=1))
    with pytest.raises(NotImplementedError):  # 16-bit depth
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
            + _chunk(b"IEND", b"")
        )
        FeatureExtractor._decode_png(bad)
    with pytest.raises(NotImplementedError):  # truncated: no IDAT
        FeatureExtractor._decode_png(
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        )


def test_decode_real_dispatches_png_and_features_match_golden():
    img = _rng_img(11, 9, 12)
    fx = FeatureExtractor(use_real_decoder=True)
    feats = fx._decode_real(encode_png(img))
    px = img.astype(np.int64)
    gray = px.mean(axis=2, dtype=np.float64)
    h, w = 9, 12
    expect = [
        px[:, :, 0].sum() // (h * w),
        px[:, :, 1].sum() // (h * w),
        px[:, :, 2].sum() // (h * w),
        int(gray[: h // 2].sum() // gray[: h // 2].size),
        int(gray[h - h // 2 :].sum() // gray[h - h // 2 :].size),
        w % 256,
        h % 256,
        255,
    ]
    assert list(feats.astype(int)) == [e & 0xFF for e in expect]


def test_degenerate_ppm_header_rejected():
    """ADVICE r4: a P6 header with w=0 or h=0 passes the byte-length
    check with an empty raster; it must raise, not floor-divide by
    zero."""
    fx = FeatureExtractor(use_real_decoder=True)
    for hdr in (b"P6\n0 4\n255\n", b"P6\n4 0\n255\n", b"P6\n2 2\n0\n"):
        with pytest.raises(NotImplementedError):
            fx._decode_real(hdr)


def test_png_payloads_fixture_golden_matches_engine(ray_session):
    """End-to-end: the planted-PNG side table's golden checksums equal
    the actor-pool real-decode output (the m_features_png gate)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import png_payloads_path
    from data_harvesting_ray.stages.multimodal import extract_features_real

    side = png_payloads_path("sf0.001")
    golden = (
        pq.read_table(side, columns=["doc_id", "feat_checksum"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        extract_features_real(
            rd.read_parquet(side, columns=["doc_id", "payload"])
        )
        .select_columns(["doc_id", "feat_checksum"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden)


def test_checkpoint_keep_validation():
    from data_harvesting_ray.config import EngineConfig

    with pytest.raises(ValueError):
        EngineConfig(checkpoint_keep=-1).validate()
    with pytest.raises(ValueError):
        EngineConfig(checkpoint=True, checkpoint_keep=1).validate()
    # keep=1 is allowed when checkpointing is off; 0 disables pruning
    EngineConfig(checkpoint=False, checkpoint_keep=1).validate()
    EngineConfig(checkpoint_keep=0).validate()
    EngineConfig(checkpoint_keep=2).validate()


def test_semdedup_survivor_ordering_is_micro_quantized(ray_session):
    """ADVICE r4: the low_centroid survivor pick orders on integer
    micro-units of centroid cosine — two members whose csim differs
    only past 1e-6 tie, and the tie breaks to the smaller vec_id."""
    import ray.data as rd

    from data_harvesting_ray.stages.similarity import semdedup

    rng = np.random.default_rng(5)
    base = rng.normal(size=8).astype(np.float64)
    base /= np.linalg.norm(base)
    # two near-identical dup-pair members (cos >> 0.9) whose centroid
    # cosines differ by ~1e-9 — far below micro resolution
    a = base.copy()
    b = base + 1e-9 * rng.normal(size=8)
    rows = pd.DataFrame(
        {
            "vec_id": np.array([2, 1], dtype=np.int64),
            "embedding": [a.astype(np.float32), b.astype(np.float32)],
        }
    )
    out = (
        semdedup(rd.from_pandas(rows), n_centroids=1, sample_frac=1.0,
                 keep="low_centroid")
        .to_pandas()
        .sort_values("vec_id")
    )
    assert list(out["vec_id"]) == [1]


# ---------------------------------------------------------------- r4 verdict 2
# fixed-execution-overhead cuts: join schema hints, raw-task prefilter
# keys, small-dup coalesce, fused scorecard


def test_equi_join_schema_hint_matches_unhinted(ray_session):
    """A correct left_fields hint produces identical rows to the
    materializing path while keeping the hinted side lazy."""
    import pyarrow as pa
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    left = rd.from_arrow(
        pa.table({"k": ["a", "b", "b", "c"], "v": [1, 2, 3, 4]})
    ).map_batches(lambda t: t, batch_format="pyarrow")  # schema now lazy
    right = rd.from_arrow(pa.table({"k": ["a", "b"], "w": [10, 20]}))
    base = equi_join(left, right, on="k", how="inner").to_pandas()
    hinted = equi_join(
        left,
        right,
        on="k",
        how="inner",
        left_fields=[("k", pa.string()), ("v", pa.int64())],
    ).to_pandas()
    key = ["k", "v", "w"]
    assert (
        base.sort_values(key).reset_index(drop=True).equals(
            hinted.sort_values(key).reset_index(drop=True)
        )
    )


def test_equi_join_wrong_schema_hint_raises(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    left = rd.from_arrow(pa.table({"k": ["a"], "v": [1]}))
    right = rd.from_arrow(pa.table({"k": ["a"], "w": [2]}))
    j = equi_join(
        left,
        right,
        on="k",
        left_fields=[("k", pa.string()), ("nope", pa.int64())],
    )
    with pytest.raises(Exception, match="schema hint mismatch"):
        j.to_pandas()


def test_prefilter_keys_from_materialized_side(ray_session):
    """prefilter='right' with a MATERIALIZED right side takes the
    raw-task distinct-keys path; output equals the unfiltered join."""
    import pyarrow as pa
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    left = rd.from_arrow(
        pa.table({"k": [f"k{i % 7}" for i in range(50)], "v": list(range(50))})
    )
    right = rd.from_arrow(
        pa.table({"k": ["k0", "k1", "k2"], "w": [1, 2, 3]})
    ).map_batches(lambda t: t, batch_format="pyarrow").materialize()
    got = equi_join(left, right, on="k", how="inner", prefilter="right").to_pandas()
    want = equi_join(left, right, on="k", how="inner").to_pandas()
    key = ["k", "v", "w"]
    assert (
        got.sort_values(key).reset_index(drop=True).equals(
            want.sort_values(key).reset_index(drop=True)
        )
    )


def test_dedup_exact_small_dup_coalesce_and_shuffle_agree(ray_session):
    """The count-gated coalesce path and the keyed-shuffle path produce
    the same deduped rows."""
    import pandas as pd
    import ray.data as rd

    from data_harvesting_ray.stages import dedup as D

    df = pd.DataFrame(
        {
            "conv_id": [f"c{i % 5}" for i in range(40)] * 2,  # every row duplicated
            "turn_idx": (list(range(8)) * 5) * 2,
            "text": ["x"] * 80,
        }
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    ds = rd.from_pandas(df)
    got = D.dedup_exact(ds).to_pandas()
    old_cap = D.SMALL_DUP_COALESCE_CAP
    try:
        D.SMALL_DUP_COALESCE_CAP = 0  # force the keyed-shuffle branch
        want = D.dedup_exact(rd.from_pandas(df)).to_pandas()
    finally:
        D.SMALL_DUP_COALESCE_CAP = old_cap
    key = ["conv_id", "turn_idx"]
    assert len(got) == 40
    assert (
        got.sort_values(key).reset_index(drop=True)[key].equals(
            want.sort_values(key).reset_index(drop=True)[key]
        )
    )


# ------------------------------------------------------------- WAV decode
# real PCM audio decode via stdlib wave (the audio analogue of the PNG
# path; reference decodes real media: services/harvest_service.py:149-158)


def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from data_harvesting_ray.fixtures.generator import encode_wav
    from data_harvesting_ray.stages.multimodal import FeatureExtractor

    rng = np.random.default_rng(7)
    fx = FeatureExtractor(use_real_decoder=True)
    for nch, fr, nf in ((1, 8000, 100), (2, 44100, 63), (1, 22050, 40)):
        x = rng.integers(-30000, 30000, size=nf * nch, dtype=np.int64)
        feats = fx._decode_real(encode_wav(x, fr, nch))
        assert feats.dtype == np.uint8 and len(feats) == 8
        assert feats[0] == nch % 256
        assert feats[1] == (fr // 1000) % 256
        assert feats[2] == nf % 256
        assert feats[7] == (nf * 1000 // fr) % 256


def test_wav_8bit_and_unsupported():
    import io
    import wave

    import numpy as np

    from data_harvesting_ray.stages.multimodal import FeatureExtractor

    fx = FeatureExtractor(use_real_decoder=True)
    # 8-bit unsigned PCM decodes (centered at 128)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(1)
        wv.setframerate(8000)
        wv.writeframes(bytes([128, 255, 0, 128] * 10))
    feats = fx._decode_real(buf.getvalue())
    assert feats[0] == 1 and feats[1] == 8
    # 32-bit sample width raises (not faked)
    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(4)
        wv.setframerate(8000)
        wv.writeframes(b"\x00" * 40)
    with pytest.raises(NotImplementedError, match="sample width"):
        fx._decode_real(buf2.getvalue())


def test_wav_payloads_fixture_golden_matches_engine(ray_session):
    """End-to-end through the actor pool: engine-decoded checksums ==
    fixture goldens computed from the raw samples."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import wav_payloads_path
    from data_harvesting_ray.stages.multimodal import extract_features_real

    side = wav_payloads_path("sf0.001")
    binary = rd.read_parquet(side, columns=["doc_id", "payload"])
    got = (
        extract_features_real(binary)
        .select_columns(["doc_id", "feat_checksum"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pq.read_table(side, columns=["doc_id", "feat_checksum"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want) and len(got) > 0


# ---------------------------------------------------------- volume hint
def test_volume_hint_clamps_and_resets(ray_session):
    """Shuffle width is clamped to the input volume when hinted (a
    KB-scale input stops paying cluster-width fixed exchange costs)
    and restored exactly on reset; at cluster volume the clamp is a
    no-op, so physical plans at scale are unchanged."""
    from ray.data import DataContext

    from data_harvesting_ray.stages.partition import (
        _BASE_HASH_PARALLELISM,
        default_num_buckets,
        reset_volume_hint,
        set_volume_hint,
    )

    reset_volume_hint()
    base_buckets = default_num_buckets()
    ctx = DataContext.get_current()
    assert ctx.default_hash_shuffle_parallelism == _BASE_HASH_PARALLELISM

    try:
        set_volume_hint(64 << 10)  # 64 KiB parquet -> floor width
        assert default_num_buckets() == 4
        assert ctx.default_hash_shuffle_parallelism == 4

        set_volume_hint(16 << 10)  # smaller hint: max accumulates
        assert default_num_buckets() == 4

        set_volume_hint(1 << 40)  # 1 TiB: clamp is a no-op
        assert default_num_buckets() == base_buckets
        assert ctx.default_hash_shuffle_parallelism == _BASE_HASH_PARALLELISM
    finally:
        reset_volume_hint()
    assert default_num_buckets() == base_buckets
    assert ctx.default_hash_shuffle_parallelism == _BASE_HASH_PARALLELISM


def test_volume_hint_query_results_unchanged(ray_session):
    """A hinted (narrow) and un-hinted (wide) run of the same keyed
    aggregate produce identical results — the clamp changes physical
    width only."""
    import pandas as pd
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import turn_stats
    from data_harvesting_ray.stages.partition import (
        reset_volume_hint,
        set_volume_hint,
    )

    from data_harvesting_ray.fixtures.generator import ensure_fixture, transcripts_path

    sf = ensure_fixture("sf0.001")
    path = transcripts_path("sf0.001")

    def run() -> pd.DataFrame:
        ds = rd.read_parquet(path)
        return (
            turn_stats(ds)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )

    reset_volume_hint()
    wide = run()
    try:
        set_volume_hint(1)  # floor width everywhere
        narrow = run()
    finally:
        reset_volume_hint()
    pd.testing.assert_frame_equal(wide, narrow)
