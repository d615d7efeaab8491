"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's media path is: fetch blob → decode frames → model
features (``services/harvest_service.py:104-158``, S2/S3/M3). The
engine treats image/audio/video as opaque ``binary`` columns with
typed metadata and runs decode / feature-extract as actor-pool
``map_batches`` stages. FOUR formats have REAL no-codec decode paths
in ``_decode_real`` (each golden-oracle gated end-to-end through the
actor pool): binary PPM (P6, numpy), 8-bit PNG (stdlib zlib + numpy
unfilter), GIF87a/89a (pure-Python LZW, palette, de-interlace,
animated multi-frame via ``gif_frames``; stride sampling + real
nearest-neighbor resize in ``GifFrameSampler``/``GifFrameResizer``),
and PCM WAV (stdlib ``wave``). Codec-needing formats (JPEG/MP3/video)
honestly raise; the default ``FeatureExtractor`` path remains the
deterministic md5 stub (``_decode_stub``) so the generic plumbing is
exercised without payload assumptions. The Ray-side plumbing (schema,
small batch size for wide rows, actor signature, output layout) is
real and tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

BINARY_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),
        pa.field("n_bytes", pa.int64()),
    ]
)


def to_binary_batch(t: pa.Table) -> pa.Table:
    """Pack documents into the binary-payload shape (stand-in for real
    media bytes; deterministic)."""
    texts = t["text"].to_pylist()
    payloads = [s.encode("utf-8") for s in texts]
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["text/plain"] * len(payloads), pa.string()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=BINARY_SCHEMA,
    )


def binary_meta(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Typed metadata over the binary column (doc_id, n_bytes)."""
    return docs.map_batches(to_binary_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_bytes"]
    )


class FeatureExtractor:
    """Actor-pool decode/feature stage. ``__init__`` is where a real
    deployment loads the codec/model ONCE per actor (ST1 pattern,
    projects/base_project.py:84-106); here it prepares the
    deterministic stub."""

    FEATURE_DIM = 8

    def __init__(self, use_real_decoder: bool = False):
        self.use_real_decoder = use_real_decoder
        # real decoder would be loaded here, e.g.:
        # import cv2  # not available in this container
        self.ready = True

    @staticmethod
    def _features_from_rgb(img: np.ndarray, maxval: int) -> np.ndarray:
        """(h, w, 3) int64 image → the 8 feature bytes: overall R/G/B
        means, top/bottom-half gray means, w%256, h%256, maxval%256 —
        the shape a tiny vision embedding has."""
        h, w = img.shape[0], img.shape[1]
        gray = img.mean(axis=2, dtype=np.float64)
        top, bottom = gray[: h // 2], gray[h - h // 2 :]
        feats = np.array(
            [
                img[:, :, 0].sum() // (h * w),
                img[:, :, 1].sum() // (h * w),
                img[:, :, 2].sum() // (h * w),
                int(top.sum() // max(top.size, 1)),
                int(bottom.sum() // max(bottom.size, 1)),
                w % 256,
                h % 256,
                maxval % 256,
            ],
            dtype=np.int64,
        )
        return feats.astype(np.uint8)

    def _decode_real(self, payload: bytes) -> np.ndarray:
        """REAL decode for the formats that need no external codec:
        binary PPM (P6 — 'P6\\n<w> <h>\\n<maxval>\\n' + raw RGB),
        parsed with numpy alone; PNG (8-bit gray/RGB/RGBA,
        non-interlaced), inflated with stdlib ``zlib`` and unfiltered
        in numpy (``_decode_png``); GIF87a/89a (palette + LZW decoded
        in pure Python, ``_decode_gif`` — poster frame of animated
        GIFs); and PCM WAV audio via stdlib ``wave`` (``_decode_wav``).
        Other compressed formats (JPEG/MP3/video) still raise: their
        codecs are not in this container, and faking them would be
        dishonest."""
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return self._decode_wav(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return self._features_from_rgb(self._decode_gif(payload), 255)
        if payload[:2] == b"BM":
            return self._features_from_rgb(self._decode_bmp(payload), 255)
        if payload[:2] == b"P6":
            # minimal whitespace-token header (no comment support —
            # the engine's own packer never emits comments). Parsed
            # with an anchored regex, NOT split(): per the spec exactly
            # ONE whitespace byte follows maxval, and a raster whose
            # first pixel byte happens to be ASCII whitespace must not
            # be consumed as header separator.
            import re

            m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload[:64])
            if m:
                w, h, maxval = (int(m.group(i)) for i in (1, 2, 3))
                raw = payload[m.end() : m.end() + w * h * 3]
                # w/h/maxval must all be positive: a degenerate 0×N
                # header passes the byte-length check with an empty
                # raster and would floor-divide by zero below
                if 0 < maxval < 256 and w > 0 and h > 0 and len(raw) == w * h * 3:
                    img = (
                        np.frombuffer(raw, dtype=np.uint8)
                        .reshape(h, w, 3)
                        .astype(np.int64)
                    )
                    return self._features_from_rgb(img, maxval)
        elif payload[:8] == b"\x89PNG\r\n\x1a\n":
            img = self._decode_png(payload)
            return self._features_from_rgb(img, 255)
        raise NotImplementedError(
            "only binary PPM (P6), 8-bit non-interlaced PNG, GIF87a/89a "
            "and PCM WAV decode without codecs; plug a real decoder here "
            "(cv2 / PIL / torchaudio) for other compressed media"
        )

    @staticmethod
    def _decode_wav(payload: bytes) -> np.ndarray:
        """REAL audio decode for PCM WAV via stdlib ``wave`` (8/16-bit,
        any channel count) → the 8 audio feature bytes: channels,
        kHz, frame count, mean |amplitude| and peak and RMS (high
        byte), zero-crossing count, duration ms — every term is
        integer-exact (``math.isqrt`` for RMS), so the checksum is
        recomputable from the raw samples by the golden-oracle fixture
        (the audio analogue of the PNG path; the reference decodes
        real media in its core loop,
        services/harvest_service.py:149-158)."""
        import io
        import math
        import wave

        with wave.open(io.BytesIO(payload)) as wv:
            nch = wv.getnchannels()
            sw = wv.getsampwidth()
            fr = wv.getframerate()
            nf = wv.getnframes()
            raw = wv.readframes(nf)
        if sw == 2:
            x = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        elif sw == 1:  # 8-bit WAV is unsigned, centered at 128
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.int64) - 128
        else:
            raise NotImplementedError(f"WAV sample width {sw} not supported")
        if len(x) == 0 or fr <= 0:
            raise NotImplementedError("empty or malformed WAV")
        ax = np.abs(x)
        feats = np.array(
            [
                nch % 256,
                (fr // 1000) % 256,
                nf % 256,
                (int(ax.sum()) // len(x)) >> 8 & 0xFF,
                int(ax.max()) >> 8 & 0xFF,
                math.isqrt(int((x * x).sum()) // len(x)) >> 8 & 0xFF,
                int(
                    np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))
                )
                % 256,
                (nf * 1000 // fr) % 256,
            ],
            dtype=np.int64,
        )
        return feats.astype(np.uint8)

    @staticmethod
    def _decode_png(payload: bytes) -> np.ndarray:
        """Public-knowledge PNG decode (RFC 2083 / W3C PNG spec) using
        only stdlib ``zlib`` + numpy: walk the chunk stream, inflate
        the concatenated IDAT data, undo the five per-scanline filters
        (None/Sub/Up/Average/Paeth), and return an (h, w, 3) int64 RGB
        image. Supports the common cases a training-data pipeline
        meets: bit depth 8, color types 0 (gray), 2 (RGB), 6 (RGBA;
        alpha dropped), no interlace. The reference decodes real
        compressed media in its core loop
        (services/harvest_service.py:149-158); this closes the same
        gap without bundling a codec."""
        import struct
        import zlib

        pos = 8
        w = h = bitdepth = ctype = None
        idat = bytearray()
        n = len(payload)
        while pos + 8 <= n:
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            if tag == b"IHDR":
                w, h, bitdepth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if interlace != 0:
                    raise NotImplementedError("interlaced PNG not supported")
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + length  # length + tag + data + CRC
        if w is None or w <= 0 or h <= 0 or not idat:
            raise NotImplementedError("malformed PNG (missing IHDR/IDAT)")
        if bitdepth != 8 or ctype not in (0, 2, 6):
            raise NotImplementedError(
                f"PNG bitdepth={bitdepth} colortype={ctype} not supported "
                "(8-bit gray/RGB/RGBA only)"
            )
        bpp = {0: 1, 2: 3, 6: 4}[ctype]
        stride = w * bpp
        raw = zlib.decompress(bytes(idat))
        if len(raw) != h * (stride + 1):
            raise NotImplementedError("PNG raster length mismatch")
        scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        filters = scan[:, 0]
        rows = scan[:, 1:].astype(np.int64)
        out = np.zeros((h, stride), dtype=np.int64)
        for y in range(h):
            ft = int(filters[y])
            row = rows[y]
            prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
            if ft == 0:  # None
                cur = row
            elif ft == 2:  # Up
                cur = (row + prev) & 0xFF
            elif ft == 1:  # Sub — per-lane cumulative sum mod 256
                lanes = row.reshape(-1, bpp)
                cur = (np.cumsum(lanes, axis=0) & 0xFF).reshape(-1)
            else:  # Average (3) / Paeth (4): left-dependent, per-pixel
                cur = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = cur[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    if ft == 3:
                        cur[x] = (row[x] + ((a + b) >> 1)) & 0xFF
                    elif ft == 4:
                        c = prev[x - bpp] if x >= bpp else 0
                        p = a + b - c
                        pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                        pred = (
                            a
                            if (pa_ <= pb_ and pa_ <= pc_)
                            else (b if pb_ <= pc_ else c)
                        )
                        cur[x] = (row[x] + pred) & 0xFF
                    else:
                        raise NotImplementedError(f"PNG filter type {ft}")
            out[y] = cur
        px = out.reshape(h, w, bpp)
        if ctype == 0:
            return np.repeat(px, 3, axis=2)
        if ctype == 6:
            return px[:, :, :3]
        return px

    @staticmethod
    def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
        """GIF-variant LZW decode (GIF89a spec appendix F): variable
        code width starting at ``min_code_size + 1`` bits, LSB-first
        bit packing, CLEAR resets the table, EOI terminates, code
        width grows when the next code to be assigned would not fit
        (capped at 12 bits). Pure Python over an int bit-buffer —
        fixture payloads are tiny; a production deployment plugs a
        codec into the same actor slot."""
        if not (2 <= min_code_size <= 8):
            raise NotImplementedError(f"GIF LZW min code size {min_code_size}")
        clear = 1 << min_code_size
        eoi = clear + 1
        big = int.from_bytes(data, "little")
        nbits = len(data) * 8
        pos = 0
        roots = [bytes([i]) for i in range(clear)] + [b"", b""]
        table: list[bytes] = list(roots)
        code_size = min_code_size + 1
        prev: bytes | None = None
        out = bytearray()
        while pos + code_size <= nbits:
            code = (big >> pos) & ((1 << code_size) - 1)
            pos += code_size
            if code == clear:
                table = list(roots)
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                break
            if code < len(table):
                # clear/eoi handled above; their table slots are the
                # unreachable b"" placeholders
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]
            else:
                raise NotImplementedError("corrupt GIF LZW stream")
            out += entry
            if prev is not None and len(table) < 4096:  # 12-bit cap
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
            prev = entry
        return bytes(out)

    @staticmethod
    def _decode_gif(payload: bytes) -> np.ndarray:
        """Public-knowledge GIF decode (GIF89a specification) in pure
        Python + numpy: logical-screen descriptor, global/local color
        table, extension blocks skipped, first image descriptor's LZW
        index stream decoded (``_lzw_decode``) and mapped through the
        palette to an (h, w, 3) int64 RGB image. Animated GIFs yield
        their POSTER FRAME (first image block); interlaced frames are
        de-interlaced (four-pass row scatter).
        The reference decodes real compressed media in its
        core loop (services/harvest_service.py:149-158); this is the
        third no-codec-needed format after PNG and WAV."""
        for _fidx, frame in FeatureExtractor._iter_gif_frames(payload):
            return frame
        raise NotImplementedError("GIF contains no image block")

    @staticmethod
    def gif_frames(payload: bytes, limit: int | None = None) -> list[np.ndarray]:
        """All frames of a (possibly animated) GIF as (h, w, 3) int64
        RGB arrays — the real-codec path behind frame sampling (M1,
        services/harvest_service.py:156-157). ``limit`` bounds decode
        work for stride gates that only need every k-th frame's
        predecessors."""
        out: list[np.ndarray] = []
        for _fidx, frame in FeatureExtractor._iter_gif_frames(payload):
            out.append(frame)
            if limit is not None and len(out) >= limit:
                break
        if not out:
            raise NotImplementedError("GIF contains no image block")
        return out

    @staticmethod
    def _iter_gif_frames(payload: bytes, stride: int = 1):
        """Yield ``(frame_idx, frame)`` for each image block of a
        GIF87a/89a stream — (h, w, 3) int64 RGB, LZW-decoded,
        palette-mapped, de-interlaced. With ``stride > 1`` only every
        stride-th frame is LZW-decoded and yielded; skipped frames'
        sub-blocks are scanned past without the (dominant) decode
        cost, but their geometry is still validated — a partial frame
        ANYWHERE invalidates the full-replacement model. Frames with
        a nonzero offset or a size differing from frame 0 would need
        disposal-method compositing and raise instead."""
        import struct

        n = len(payload)
        if n < 13:
            raise NotImplementedError("truncated GIF")
        _w, _h, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        gct: np.ndarray | None = None
        if packed & 0x80:
            sz = 2 << (packed & 0x07)
            gct = np.frombuffer(payload[pos : pos + 3 * sz], dtype=np.uint8)
            if gct.size != 3 * sz:
                raise NotImplementedError("truncated GIF color table")
            gct = gct.reshape(sz, 3)
            pos += 3 * sz
        size0: tuple[int, int] | None = None
        fidx = 0
        while pos < n:
            block = payload[pos]
            pos += 1
            if block == 0x3B:  # trailer
                break
            if block == 0x21:  # extension: label + sub-blocks
                pos += 1
                while pos < n and payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if block != 0x2C:
                raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
            if pos + 9 > n:
                raise NotImplementedError("truncated GIF image descriptor")
            left, top, iw, ih, ipacked = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            interlaced = bool(ipacked & 0x40)
            pal = gct
            if ipacked & 0x80:  # local color table wins
                sz = 2 << (ipacked & 0x07)
                lct = np.frombuffer(payload[pos : pos + 3 * sz], dtype=np.uint8)
                if lct.size != 3 * sz:
                    raise NotImplementedError("truncated GIF local color table")
                pal = lct.reshape(sz, 3)
                pos += 3 * sz
            if pal is None:
                raise NotImplementedError("GIF image without a color table")
            if iw <= 0 or ih <= 0:
                raise NotImplementedError("degenerate GIF frame size")
            if pos >= n:
                raise NotImplementedError("truncated GIF (no LZW data)")
            if size0 is None:
                size0 = (iw, ih)
            if left or top or (iw, ih) != size0:
                raise NotImplementedError(
                    "partial GIF frame (offset/size change) needs disposal "
                    "compositing — not supported"
                )
            min_code_size = payload[pos]
            pos += 1
            sampled = fidx % stride == 0
            chunks = []
            while pos < n and payload[pos] != 0:
                ln = payload[pos]
                if sampled:
                    chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # block terminator
            if not sampled:  # skipped frame: geometry checked, no decode
                fidx += 1
                continue
            idx = np.frombuffer(
                FeatureExtractor._lzw_decode(b"".join(chunks), int(min_code_size)),
                dtype=np.uint8,
            )
            if idx.size < iw * ih:
                raise NotImplementedError("GIF index stream shorter than frame")
            idx = idx[: iw * ih]
            if int(idx.max(initial=0)) >= pal.shape[0]:
                raise NotImplementedError("GIF index outside color table")
            rows = pal[idx].reshape(ih, iw, 3).astype(np.int64)
            if interlaced:
                # Adam-style GIF interlace: rows arrive in four passes
                # (every 8th from 0, every 8th from 4, every 4th from
                # 2, every 2nd from 1) — undo by scatter
                order = np.concatenate(
                    [
                        np.arange(0, ih, 8),
                        np.arange(4, ih, 8),
                        np.arange(2, ih, 4),
                        np.arange(1, ih, 2),
                    ]
                )
                out = np.empty_like(rows)
                out[order] = rows
                rows = out
            yield fidx, rows
            fidx += 1

    @staticmethod
    def _decode_bmp(payload: bytes) -> np.ndarray:
        """Public-knowledge BMP decode (Windows BITMAPINFOHEADER) in
        pure Python + numpy for the two no-codec cases a pipeline
        meets: 8-bit palettized uncompressed (BI_RGB) and 8-bit RLE8
        (BI_RLE8 — runs, absolute mode with word padding, end-of-line
        / end-of-bitmap / delta escapes). Rows are bottom-up unless
        height is negative; palette entries are BGRX. Returns
        (h, w, 3) int64 RGB. Anything else (16/24/32-bit, RLE4, BITFIELDS,
        OS/2 headers) raises the NotImplementedError contract — the
        fifth real format after PPM/PNG/GIF/WAV."""
        import struct

        n = len(payload)
        if n < 54:
            raise NotImplementedError("truncated BMP")
        data_off = struct.unpack("<I", payload[10:14])[0]
        hdr_size = struct.unpack("<I", payload[14:18])[0]
        if hdr_size < 40:
            raise NotImplementedError(f"BMP header size {hdr_size} not supported")
        w, h_raw = struct.unpack("<ii", payload[18:26])
        planes, bpp = struct.unpack("<HH", payload[26:30])
        compression, _imgsize = struct.unpack("<II", payload[30:38])
        colors_used = struct.unpack("<I", payload[46:50])[0]
        ok = (bpp == 8 and compression in (0, 1)) or (
            bpp in (24, 32) and compression in (0, 3)
        )
        if planes != 1 or not ok:
            raise NotImplementedError(
                f"BMP planes={planes} bpp={bpp} compression={compression} "
                "not supported (8-bit BI_RGB/BI_RLE8, 24/32-bit BI_RGB/"
                "canonical BITFIELDS only)"
            )
        top_down = h_raw < 0
        h = -h_raw if top_down else h_raw
        if w <= 0 or h <= 0:
            raise NotImplementedError("degenerate BMP size")
        if bpp in (24, 32):  # raw BGR(A/X) rows, 4-byte aligned
            if compression == 3:
                # BITFIELDS: accept only the canonical BGRA dword masks
                masks = struct.unpack("<III", payload[54:66]) if n >= 66 else ()
                if masks != (0x00FF0000, 0x0000FF00, 0x000000FF):
                    raise NotImplementedError(
                        f"BMP BITFIELDS masks {masks} not canonical BGRA"
                    )
            nch = bpp // 8
            stride = (w * nch + 3) & ~3
            body = payload[data_off:]
            if data_off > n or len(body) < stride * h:
                raise NotImplementedError("BMP raster shorter than frame")
            rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(
                h, stride
            )
            px = rows[:, : w * nch].reshape(h, w, nch)
            rgb = px[:, :, [2, 1, 0]].astype(np.int64)  # BGR(AX) -> RGB
            return rgb if top_down else rgb[::-1].copy()
        n_pal = colors_used or 256
        pal_off = 14 + hdr_size
        pal_raw = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_pal], dtype=np.uint8
        )
        if pal_raw.size != 4 * n_pal:
            raise NotImplementedError("truncated BMP palette")
        pal = pal_raw.reshape(n_pal, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        if data_off < pal_off + 4 * n_pal or data_off > n:
            raise NotImplementedError("BMP pixel-data offset out of range")
        body = payload[data_off:]
        idx = np.zeros((h, w), dtype=np.uint8)
        if compression == 0:  # BI_RGB: rows padded to 4 bytes
            stride = (w + 3) & ~3
            if len(body) < stride * h:
                raise NotImplementedError("BMP raster shorter than frame")
            rows = np.frombuffer(body[: stride * h], dtype=np.uint8).reshape(
                h, stride
            )
            idx = rows[:, :w].copy()
        else:  # BI_RLE8
            x = y = pos = 0
            m = len(body)
            done = False
            while pos + 1 < m and not done:
                cnt, val = body[pos], body[pos + 1]
                pos += 2
                if cnt > 0:  # encoded run
                    end = min(x + cnt, w)
                    if y < h and end > x:
                        idx[y, x:end] = val
                    x += cnt
                elif val == 0:  # end of line
                    x, y = 0, y + 1
                elif val == 1:  # end of bitmap
                    done = True
                elif val == 2:  # delta: skip (dx, dy), pixels stay 0
                    if pos + 1 >= m:
                        raise NotImplementedError("truncated BMP delta")
                    x += body[pos]
                    y += body[pos + 1]
                    pos += 2
                else:  # absolute mode: val literal bytes, word-padded
                    lit = body[pos : pos + val]
                    if len(lit) != val:
                        raise NotImplementedError("truncated BMP absolute run")
                    end = min(x + val, w)
                    if y < h and end > x:
                        idx[y, x:end] = np.frombuffer(lit, dtype=np.uint8)[
                            : end - x
                        ]
                    x += val
                    pos += val + (val & 1)  # pad to word boundary
            if not done:
                raise NotImplementedError("BMP RLE8 missing end-of-bitmap")
        if int(idx.max(initial=0)) >= n_pal:
            raise NotImplementedError("BMP index outside palette")
        rgb = pal[idx].astype(np.int64)
        return rgb if top_down else rgb[::-1].copy()

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        # Deterministic fake feature bytes: md5 digest prefix (md5 so
        # the driver's DuckDB oracle can recompute the checksum in SQL)
        d = hashlib.md5(payload).digest()[: self.FEATURE_DIM]
        return np.frombuffer(d, dtype=np.uint8)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if self.use_real_decoder:
            raw = [self._decode_real(p) for p in df["payload"]]
        else:
            raw = [self._decode_stub(p) for p in df["payload"]]
        feats = [(r.astype(np.float32) / 255.0) for r in raw]
        # integer checksum of the raw feature bytes: an exact,
        # SQL-recomputable witness of the float feature vector
        checks = np.array([int(r.sum()) for r in raw], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "features": pd.Series(feats, dtype=object),
                "feat_checksum": checks,
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage — the media-level analogue of
    the reference's CLASSIFICATION_FPS stride gate (M1,
    services/harvest_service.py:156-157) applied inside a decoded
    blob: the payload is treated as fixed-size frames and every
    ``stride``-th frame is emitted with an exact witness (byte length
    + md5), so the driver's DuckDB oracle can recompute every output
    from ``substr(text, ...)`` (payloads are ASCII text stand-ins).
    A real deployment replaces the chunker with a codec's keyframe
    iterator loaded once per actor in ``__init__``."""

    def __init__(self, frame_bytes: int = 64, stride: int = 2):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fb, st = self.frame_bytes, self.stride
        doc_ids, idxs, nbytes, fps = [], [], [], []
        for doc_id, payload in zip(df["doc_id"], df["payload"]):
            n = len(payload)
            for i in range(0, (n + fb - 1) // fb, st):
                frame = payload[i * fb : (i + 1) * fb]
                doc_ids.append(doc_id)
                idxs.append(i)
                nbytes.append(len(frame))
                fps.append(hashlib.md5(frame).hexdigest())
        return pd.DataFrame(
            {
                "doc_id": np.array(doc_ids, dtype=np.int64),
                "frame_idx": np.array(idxs, dtype=np.int64),
                "frame_bytes": np.array(nbytes, dtype=np.int64),
                "frame_fp": pd.Series(fps, dtype=object),
            }
        )


def sample_frames(
    docs: ray.data.Dataset,
    frame_bytes: int = 64,
    stride: int = 2,
    batch_size: int = 256,
    concurrency: int | tuple = (1, 2),
) -> ray.data.Dataset:
    """Binary payloads → sampled frame records (doc_id, frame_idx,
    frame_bytes, frame_fp). Small batch_size: wide binary rows."""
    binary = docs.map_batches(to_binary_batch, batch_format="pyarrow")
    return binary.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"frame_bytes": frame_bytes, "stride": stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class GifFrameSampler:
    """Actor-pool frame sampling over REAL decoded media: every
    ``stride``-th frame of an animated GIF payload is decoded
    (pure-Python LZW, no codec) and witnessed by the integer checksum
    of its 8 feature bytes — the reference's CLASSIFICATION_FPS stride
    gate (M1, services/harvest_service.py:156-157) applied to actual
    frames rather than byte-chunk stand-ins. Emits one row per
    sampled frame: (doc_id, frame_idx, frame_checksum)."""

    out_col = "frame_checksum"

    def __init__(self, stride: int = 2):
        self.stride = stride

    def _transform(self, img: np.ndarray) -> np.ndarray:
        return img

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, idxs, checks = [], [], []
        for doc_id, payload in zip(df["doc_id"], df["payload"]):
            got_any = False
            # stride handled INSIDE the iterator: skipped frames are
            # scanned past without paying the (dominant) LZW decode
            for fidx, img in FeatureExtractor._iter_gif_frames(
                bytes(payload), stride=self.stride
            ):
                got_any = True
                feats = FeatureExtractor._features_from_rgb(
                    self._transform(img), 255
                )
                doc_ids.append(doc_id)
                idxs.append(fidx)
                checks.append(int(feats.astype(np.int64).sum()))
            if not got_any:
                raise NotImplementedError("GIF contains no image block")
        return pd.DataFrame(
            {
                "doc_id": np.array(doc_ids, dtype=np.int64),
                "frame_idx": np.array(idxs, dtype=np.int64),
                self.out_col: np.array(checks, dtype=np.int64),
            }
        )


class GifFrameResizer(GifFrameSampler):
    """Decode → stride-sample → RESIZE fused inside one actor, every
    stage real: sampled GIF frames are nearest-neighbor resized to
    (out_h, out_w) in numpy (the integer source grid ``y*h // out_h``,
    ``x*w // out_w`` — exact, no float resampling) before feature
    witnessing. This is the reference's frame-resize step
    (projects/base_project.py crop/resize path) with an actual kernel
    rather than the byte-crop stand-in of ``FrameResizer``."""

    out_col = "resized_checksum"

    def __init__(self, stride: int = 2, out_h: int = 4, out_w: int = 5):
        super().__init__(stride=stride)
        self.out_h, self.out_w = out_h, out_w

    @staticmethod
    def _resize_nn(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
        h, w = img.shape[0], img.shape[1]
        ys = (np.arange(oh, dtype=np.int64) * h) // oh
        xs = (np.arange(ow, dtype=np.int64) * w) // ow
        return img[ys][:, xs]

    def _transform(self, img: np.ndarray) -> np.ndarray:
        return self._resize_nn(img, self.out_h, self.out_w)


def resize_gif_frames(
    docs: ray.data.Dataset,
    stride: int = 2,
    out_h: int = 4,
    out_w: int = 5,
    batch_size: int = 128,
    concurrency: int | tuple = (1, 2),
) -> ray.data.Dataset:
    """GIF payloads → real decode + stride sample + nearest-neighbor
    resize, one actor stage; rows (doc_id, frame_idx,
    resized_checksum)."""
    return docs.map_batches(
        GifFrameResizer,
        fn_constructor_kwargs={"stride": stride, "out_h": out_h, "out_w": out_w},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_gif_frames(
    docs: ray.data.Dataset,
    stride: int = 2,
    batch_size: int = 128,
    concurrency: int | tuple = (1, 2),
) -> ray.data.Dataset:
    """GIF payloads → real-decode sampled frame records (doc_id,
    frame_idx, frame_checksum). Small batch_size: each row fans out
    to multiple decoded frames inside the actor."""
    return docs.map_batches(
        GifFrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameResizer(FrameSampler):
    """Actor-pool resize stage, fused with frame sampling (raw frames
    never cross stages — decode → sample → resize happens inside one
    actor, as a real media pipeline would). The stub "resize" is a
    deterministic byte crop to ``out_bytes`` (codecs are unavailable;
    a real deployment swaps in e.g. ``cv2.resize`` behind the same
    actor signature); the md5 witness stays SQL-recomputable."""

    def __init__(self, frame_bytes: int = 64, stride: int = 2, out_bytes: int = 32):
        super().__init__(frame_bytes=frame_bytes, stride=stride)
        self.out_bytes = out_bytes

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fb, st, ob = self.frame_bytes, self.stride, self.out_bytes
        doc_ids, idxs, outs, fps = [], [], [], []
        for doc_id, payload in zip(df["doc_id"], df["payload"]):
            n = len(payload)
            for i in range(0, (n + fb - 1) // fb, st):
                resized = payload[i * fb : (i + 1) * fb][:ob]
                doc_ids.append(doc_id)
                idxs.append(i)
                outs.append(len(resized))
                fps.append(hashlib.md5(resized).hexdigest())
        return pd.DataFrame(
            {
                "doc_id": np.array(doc_ids, dtype=np.int64),
                "frame_idx": np.array(idxs, dtype=np.int64),
                "out_bytes": np.array(outs, dtype=np.int64),
                "resized_fp": pd.Series(fps, dtype=object),
            }
        )


def resize_frames(
    docs: ray.data.Dataset,
    frame_bytes: int = 64,
    stride: int = 2,
    out_bytes: int = 32,
    batch_size: int = 256,
    concurrency: int | tuple = (1, 2),
) -> ray.data.Dataset:
    binary = docs.map_batches(to_binary_batch, batch_format="pyarrow")
    return binary.map_batches(
        FrameResizer,
        fn_constructor_kwargs={
            "frame_bytes": frame_bytes,
            "stride": stride,
            "out_bytes": out_bytes,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_features_real(
    binary: ray.data.Dataset,
    batch_size: int = 256,
    concurrency: int | tuple = (1, 2),
) -> ray.data.Dataset:
    """REAL-decoder feature extraction over an already-binary dataset
    (doc_id, payload) — PPM/PNG payloads decoded in the actor pool,
    features + integer checksum out. Same sizing discipline as
    ``extract_features`` (small batches: wide binary rows)."""
    return binary.map_batches(
        FeatureExtractor,
        fn_constructor_kwargs={"use_real_decoder": True},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_features(
    docs: ray.data.Dataset, batch_size: int = 256, concurrency: int | tuple = (1, 2)
) -> ray.data.Dataset:
    """Binary payloads → feature vectors. Small batch_size: wide binary
    rows must not blow a worker's heap (batch × concurrency sizing)."""
    binary = docs.map_batches(to_binary_batch, batch_format="pyarrow")
    return binary.map_batches(
        FeatureExtractor,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
