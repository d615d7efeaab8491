"""GIF decode (pure-Python LZW + palette mapping): roundtrips through
the in-repo GIF89a encoder, the 12-bit growth / table-full reset path,
animated poster-frame semantics, local color tables, honest raises for
interlace/truncation, and the end-to-end golden gate — the third
no-codec decode format after PNG and WAV (round 5)."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from data_harvesting_ray.fixtures.generator import _lzw_encode_gif, encode_gif
from data_harvesting_ray.stages.multimodal import FeatureExtractor


def _pal(seed: int, n: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(n, 3), dtype=np.uint8)


def _idx(seed: int, h: int, w: int, n: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, n, size=(h, w), dtype=np.uint8)


@pytest.mark.parametrize("npal", [2, 4, 16, 64, 256])
def test_gif_roundtrip_palette_sizes(npal):
    pal, idx = _pal(npal, npal), _idx(npal + 1, 13, 9, npal)
    out = FeatureExtractor._decode_gif(encode_gif(idx, pal))
    assert out.shape == (13, 9, 3)
    assert (out == pal[idx].astype(np.int64)).all()


def test_gif_lzw_12bit_growth_and_table_full_reset():
    """A 90x90 random 256-color frame grows the code width to 12 bits
    and fills the 4096-entry table, forcing the encoder's mid-stream
    CLEAR reset — the decoder must resynchronize exactly."""
    pal, idx = _pal(7, 256), _idx(8, 90, 90, 256)
    data = _lzw_encode_gif(idx, 8)
    decoded = np.frombuffer(
        FeatureExtractor._lzw_decode(data, 8), dtype=np.uint8
    )
    assert (decoded[: idx.size] == idx.reshape(-1)).all()
    out = FeatureExtractor._decode_gif(encode_gif(idx, pal))
    assert (out == pal[idx].astype(np.int64)).all()


def test_gif_repetitive_runs():
    pal = _pal(9, 8)
    idx = np.zeros((64, 64), dtype=np.uint8)
    idx[::7, ::3] = 3
    out = FeatureExtractor._decode_gif(encode_gif(idx, pal))
    assert (out == pal[idx].astype(np.int64)).all()


def test_gif_animated_poster_frame_and_extension_skip():
    """Multi-frame GIFs decode to frame 0 (poster-frame semantics);
    every frame carries a graphic-control extension block the parser
    must skip."""
    pal, idx = _pal(11, 64), _idx(12, 10, 17, 64)
    payload = encode_gif(idx, pal, extra_frames=3)
    assert payload.count(b"\x21\xf9") == 4  # one GCE per frame
    out = FeatureExtractor._decode_gif(payload)
    assert (out == pal[idx].astype(np.int64)).all()


def test_gif_local_color_table_wins():
    """A frame with a local color table must be mapped through it,
    not the (deliberately wrong) global table."""
    pal, idx = _pal(13, 4), _idx(14, 5, 6, 4)
    base = encode_gif(idx, pal)
    # rewrite: blank the GCT in place, attach the true palette as an LCT
    gct_len = 3 * 4
    head, rest = base[:13], base[13 + gct_len :]
    img_at = 8  # the fixed 8-byte GCE precedes the descriptor
    assert rest[img_at] == 0x2C
    desc = bytearray(rest[img_at : img_at + 10])
    desc[9] |= 0x80 | 0x01  # LCT present, 4 entries
    pal4 = np.zeros((4, 3), dtype=np.uint8)
    pal4[:] = pal
    payload = (
        head
        + b"\x00" * gct_len
        + rest[:img_at]
        + bytes(desc)
        + pal4.tobytes()
        + rest[img_at + 10 :]
    )
    out = FeatureExtractor._decode_gif(payload)
    assert (out == pal[idx].astype(np.int64)).all()


def test_gif_interlaced_roundtrip():
    """An interlaced frame (rows stored in the four-pass order) must
    de-interlace back to the original raster."""
    pal, idx = _pal(19, 16), _idx(20, 23, 7, 16)
    ih = idx.shape[0]
    order = np.concatenate(
        [
            np.arange(0, ih, 8),
            np.arange(4, ih, 8),
            np.arange(2, ih, 4),
            np.arange(1, ih, 2),
        ]
    )
    base = encode_gif(idx[order], pal)  # store rows in interlace order
    img_at = 13 + 3 * 16 + 8  # header + padded GCT + GCE, then 0x2C
    assert base[img_at] == 0x2C
    inter = bytearray(base)
    inter[img_at + 9] |= 0x40  # flag the frame interlaced
    out = FeatureExtractor._decode_gif(bytes(inter))
    assert (out == pal[idx].astype(np.int64)).all()


def test_gif_truncation_raises_honestly():
    """Truncated local color tables and payloads ending right after a
    color table must raise the NotImplementedError contract, not
    ValueError/IndexError (code-review findings r5)."""
    desc_lct = b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0x80 | 0x01)
    head = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
    with pytest.raises(NotImplementedError):  # LCT cut mid-table
        FeatureExtractor._decode_gif(head + desc_lct + b"\x01\x02")
    with pytest.raises(NotImplementedError):  # ends after complete LCT
        FeatureExtractor._decode_gif(head + desc_lct + b"\x00" * 6)


def test_gif_malformed_raise():
    with pytest.raises(NotImplementedError):  # truncated header
        FeatureExtractor._decode_gif(b"GIF89a\x04\x00")
    with pytest.raises(NotImplementedError):  # trailer only, no image
        FeatureExtractor._decode_gif(
            b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b"
        )
    with pytest.raises(NotImplementedError):  # no color table anywhere
        no_gct = (
            b"GIF89a"
            + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
            + b"\x2c"
            + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
            + b"\x02\x01\x44\x00\x3b"
        )
        FeatureExtractor._decode_gif(no_gct)


def test_decode_real_dispatches_gif():
    pal, idx = _pal(17, 16), _idx(18, 9, 12, 16)
    fx = FeatureExtractor(use_real_decoder=True)
    feats = fx._decode_real(encode_gif(idx, pal))
    px = pal[idx].astype(np.int64)
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


def test_gif_frames_decodes_every_value_shifted_frame():
    """gif_frames returns all frames; frame f's pixels are the
    value-shifted grid the encoder wrote, so each frame differs."""
    pal, idx = _pal(21, 16), _idx(22, 8, 9, 16)
    frames = FeatureExtractor.gif_frames(encode_gif(idx, pal, extra_frames=4))
    assert len(frames) == 5
    for f, img in enumerate(frames):
        want = pal[((idx.astype(np.int64) + f) % 16).astype(np.uint8)]
        assert (img == want.astype(np.int64)).all(), f
    # limit bounds decode work
    assert len(FeatureExtractor.gif_frames(encode_gif(idx, pal, extra_frames=4), limit=2)) == 2


def test_gif_partial_frame_raises():
    """A second frame with a nonzero offset needs disposal compositing
    and must raise rather than return garbage."""
    pal, idx = _pal(23, 4), _idx(24, 6, 6, 4)
    base = encode_gif(idx, pal, extra_frames=1)
    img1 = 13 + 3 * 4 + 8  # first descriptor offset
    assert base[img1] == 0x2C
    # find the SECOND descriptor: skip frame 1 (desc + lzw sub-blocks)
    second = base.index(b"\x21\xf9", img1)  # frame 2's GCE
    img2 = second + 8
    assert base[img2] == 0x2C
    mut = bytearray(base)
    mut[img2 + 1] = 1  # left offset = 1
    frames_ok = FeatureExtractor.gif_frames(bytes(mut), limit=1)  # poster fine
    assert len(frames_ok) == 1
    with pytest.raises(NotImplementedError):
        FeatureExtractor.gif_frames(bytes(mut))


def test_sample_gif_frames_matches_fixture_golden(ray_session):
    """End-to-end stride-2 sampling over planted animated GIFs equals
    the per-frame golden side table (the m_gif_frame_sample gate)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import gif_anim_paths
    from data_harvesting_ray.stages.multimodal import sample_gif_frames

    pay, gold = gif_anim_paths("sf0.001")
    golden = (
        pq.read_table(gold)
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    got = (
        sample_gif_frames(
            rd.read_parquet(pay, columns=["doc_id", "payload"]), stride=2
        )
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden)


def test_resize_gif_frames_matches_independent_golden(ray_session):
    """Fused decode+sample+resize equals the INDEPENDENTLY regenerated
    and resized golden pixels (the m_gif_resize gate) — verifies the
    nearest-neighbor kernel, not just the decode."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import (
        gif_anim_paths,
        gif_resize_golden_path,
    )
    from data_harvesting_ray.stages.multimodal import resize_gif_frames

    pay, _ = gif_anim_paths("sf0.001")
    golden = (
        pq.read_table(gif_resize_golden_path("sf0.001"))
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    got = (
        resize_gif_frames(
            rd.read_parquet(pay, columns=["doc_id", "payload"]),
            stride=2,
            out_h=4,
            out_w=5,
        )
        .to_pandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, golden)


def test_resize_nn_kernel_exact():
    """The NN grid is the exact integer mapping y*h//oh, x*w//ow."""
    from data_harvesting_ray.stages.multimodal import GifFrameResizer

    img = np.arange(7 * 9 * 3, dtype=np.int64).reshape(7, 9, 3)
    small = GifFrameResizer._resize_nn(img, 3, 4)
    ys = (np.arange(3) * 7) // 3
    xs = (np.arange(4) * 9) // 4
    assert (small == img[ys][:, xs]).all()
    # upscale works too (indices repeat)
    big = GifFrameResizer._resize_nn(img, 14, 18)
    assert big.shape == (14, 18, 3)
    assert (big[0, 0] == img[0, 0]).all() and (big[13, 17] == img[6, 8]).all()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        data=st.data(),
        min_code=st.integers(min_value=2, max_value=8),
        n=st.integers(min_value=1, max_value=4000),
    )
    def test_lzw_roundtrip_property(data, min_code, n):
        """Any index sequence within the alphabet roundtrips exactly
        through the GIF-variant LZW encoder/decoder pair, across every
        min-code-size and through width growth and table-full resets."""
        alpha = 1 << min_code
        seq = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=alpha - 1),
                min_size=n,
                max_size=n,
            )
        )
        arr = np.array(seq, dtype=np.uint8)
        out = FeatureExtractor._lzw_decode(_lzw_encode_gif(arr, min_code), min_code)
        assert np.array_equal(np.frombuffer(out, dtype=np.uint8), arr)

    _TRUNC_PAL = _pal(31, 16)
    _TRUNC_IDX = _idx(32, 9, 11, 16)
    _TRUNC_PAYLOAD = encode_gif(_TRUNC_IDX, _TRUNC_PAL, extra_frames=2)

    @settings(max_examples=120, deadline=None)
    @given(k=st.integers(min_value=0, max_value=len(_TRUNC_PAYLOAD) - 1))
    def test_gif_truncation_exception_contract(k):
        """EVERY proper prefix of a valid animated GIF either decodes
        (truncation fell after the data a frame needs) or raises the
        NotImplementedError contract — never ValueError / IndexError /
        struct.error from parsing internals."""
        try:
            frames = FeatureExtractor.gif_frames(_TRUNC_PAYLOAD[:k])
            assert all(f.shape == (9, 11, 3) for f in frames)
        except NotImplementedError:
            pass

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_gif_payloads_fixture_golden_matches_engine(ray_session):
    """End-to-end: the planted-GIF side table's golden checksums equal
    the actor-pool real-decode output (the m_features_gif gate)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import gif_payloads_path
    from data_harvesting_ray.stages.multimodal import extract_features_real

    side = gif_payloads_path("sf0.001")
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
