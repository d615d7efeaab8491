"""BMP decode (RLE8 + uncompressed 24/32-bit): roundtrips through the
in-repo RLE8 encoder, escape handling (end-of-line / end-of-bitmap /
delta), bottom-up vs top-down rows, honest raises, and the end-to-end
golden gate — the fifth no-codec decode format (round 5)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from data_harvesting_ray.fixtures.generator import encode_bmp_rle8
from data_harvesting_ray.stages.multimodal import FeatureExtractor


def _pal(seed: int, n: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(n, 3), dtype=np.uint8)


def _striped(seed: int, h: int, w: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = np.repeat(rng.integers(0, n, size=(h, 1)), w, axis=1).astype(np.uint8)
    mask = rng.random((h, w)) < 0.3
    idx[mask] = rng.integers(0, n, int(mask.sum()))
    return idx


@pytest.mark.parametrize("npal", [4, 16, 64, 256])
def test_bmp_rle8_roundtrip(npal):
    pal, idx = _pal(npal, npal), _striped(npal + 1, 12, 17, npal)
    out = FeatureExtractor._decode_bmp(encode_bmp_rle8(idx, pal))
    assert out.shape == (12, 17, 3)
    assert (out == pal[idx].astype(np.int64)).all()


def test_bmp_rle8_pure_noise_and_long_runs():
    pal = _pal(7, 256)
    noise = np.random.default_rng(8).integers(0, 256, (19, 23), dtype=np.uint8)
    assert (
        FeatureExtractor._decode_bmp(encode_bmp_rle8(noise, pal))
        == pal[noise].astype(np.int64)
    ).all()
    runs = np.full((5, 300), 7, dtype=np.uint8)  # row run > 255 splits
    assert (
        FeatureExtractor._decode_bmp(encode_bmp_rle8(runs, pal))
        == pal[runs].astype(np.int64)
    ).all()


def test_bmp_rle8_delta_escape_skips_pixels():
    """A delta escape advances (x, y); skipped pixels stay palette
    index 0 per the spec."""
    pal = _pal(9, 4)
    base = encode_bmp_rle8(np.zeros((3, 4), dtype=np.uint8), pal)
    data_off = struct.unpack("<I", base[10:14])[0]
    # hand-build: run of 2 at bottom row, delta (1, 1), run of 1, EOB
    body = bytes([2, 3]) + b"\x00\x02" + bytes([1, 1]) + bytes([1, 2]) + b"\x00\x01"
    payload = base[:data_off] + body
    out = FeatureExtractor._decode_bmp(payload)
    want = np.zeros((3, 4), dtype=np.int64)  # stream row 0 = bottom row
    want_idx = np.zeros((3, 4), dtype=np.uint8)
    want_idx[2, 0:2] = 3  # bottom row after flip
    want_idx[1, 3] = 2  # after delta dx=1 dy=1: x=3, stream y=1 → middle
    assert (out == pal[want_idx].astype(np.int64)).all()


def test_bmp_24bit_and_top_down():
    rng = np.random.default_rng(11)
    h, w = 4, 6
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows_bu = b"".join(
        rgb[y][:, [2, 1, 0]].tobytes() + b"\x00" * (stride - w * 3)
        for y in range(h - 1, -1, -1)
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows_bu), 0, 0, 0, 0)
    fh = struct.pack("<2sIHHI", b"BM", 54 + len(rows_bu), 0, 0, 54)
    assert (
        FeatureExtractor._decode_bmp(fh + info + rows_bu) == rgb.astype(np.int64)
    ).all()
    # top-down: negative height, rows in natural order
    rows_td = b"".join(
        rgb[y][:, [2, 1, 0]].tobytes() + b"\x00" * (stride - w * 3) for y in range(h)
    )
    info_td = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(rows_td), 0, 0, 0, 0
    )
    assert (
        FeatureExtractor._decode_bmp(fh + info_td + rows_td) == rgb.astype(np.int64)
    ).all()


def test_bmp_unsupported_and_truncated_raise():
    pal = _pal(13, 4)
    base = encode_bmp_rle8(np.zeros((3, 3), dtype=np.uint8), pal)
    with pytest.raises(NotImplementedError):  # truncated header
        FeatureExtractor._decode_bmp(base[:40])
    with pytest.raises(NotImplementedError):  # RLE4
        bad = bytearray(base)
        bad[28:30] = struct.pack("<H", 4)
        FeatureExtractor._decode_bmp(bytes(bad))
    with pytest.raises(NotImplementedError):  # missing end-of-bitmap
        FeatureExtractor._decode_bmp(base[:-2])
    with pytest.raises(NotImplementedError):  # truncated palette
        data_off = struct.unpack("<I", base[10:14])[0]
        FeatureExtractor._decode_bmp(base[: 14 + 40 + 3])


def test_decode_real_dispatches_bmp_and_fixture_golden(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import bmp_payloads_path
    from data_harvesting_ray.stages.multimodal import extract_features_real

    side = bmp_payloads_path("sf0.001")
    golden = (
        pq.read_table(side, columns=["doc_id", "feat_checksum"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        extract_features_real(rd.read_parquet(side, columns=["doc_id", "payload"]))
        .select_columns(["doc_id", "feat_checksum"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden)
