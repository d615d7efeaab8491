"""Sequence packing: assign every document a position in a stream of
fixed-token-budget training sequences (concatenate-and-chunk, the
standard LM pretraining layout).

Each doc gets (seq_id, seq_off): the sequence index and the token
offset inside it, from the GLOBAL running token total over docs in
``id_col`` order. Docs may straddle a budget boundary (chunking splits
them), exactly like concatenate-then-chunk tokenization.

Scale plan — a distributed prefix sum, no global sort:
1. docs are range-bucketed by ``id_col // range_size`` (monotone in
   id, so concatenating buckets in range order IS the global order);
2. pass 1 pre-aggregates per-batch token sums per range inside
   ``map_batches`` and reduces them with a tiny groupby — the exchange
   moves at most |ranges| rows per block, never documents;
3. the driver cumsums the |ranges| totals into per-range START OFFSETS
   (|corpus| / range_size values — KBs at 100 TB) and broadcasts them
   once via ``ray.put``;
4. pass 2 hash-shuffles (id, tokens) metadata by range and each bucket
   computes its local cumsum + its range's start offset.

Reference analogue: the export stage that lays processed records into
a dataset directory layout (``exports/yolov8/yolov8_export.py:33-90``)
— here the "layout" is the token stream position, computed exactly
and deterministically instead of by wall-clock filename.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .partition import apply_per_bucket

_RANGE = "__pack_range"


def pack_sequences(
    ds: ray.data.Dataset,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    range_size: int = 65536,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Pack (id, token-count) rows into ``budget``-token sequences in
    ``id_col`` order. Output: (id_col, tokens_col, seq_id, seq_off).
    ``id_col`` must be a non-negative integer id; ids need not be
    dense (range buckets are monotone regardless), but heavily
    clustered ids can skew range sizes — pick ``range_size`` near the
    expected docs-per-bucket."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError(f"{id_col} must be non-negative for range packing")
        return pa.table(
            {
                id_col: t[id_col],
                tokens_col: t[tokens_col],
                _RANGE: pa.array(ids // range_size),
            }
        )

    # consumed twice (pass-1 range totals, pass-2 bucketed offsets) —
    # materialize so the upstream lineage (token counting, reads) runs
    # once, not once per pass
    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    # Pass 1: per-batch partials, then a tiny groupby — the exchange
    # carries at most |ranges| rows per block.
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                _RANGE: t[_RANGE].to_numpy(zero_copy_only=False),
                "s": t[tokens_col].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby(_RANGE, sort=False)["s"].sum().reset_index()
        return pa.table(
            {_RANGE: pa.array(g[_RANGE].to_numpy()), "s": pa.array(g["s"].to_numpy())}
        )

    from ray.data.aggregate import Sum

    totals = (
        tagged.map_batches(partial, batch_format="pyarrow")
        .groupby(_RANGE)
        .aggregate(Sum("s", alias_name="range_tokens"))
        .to_pandas()
        .sort_values(_RANGE)
    )
    # start offset of each range = cumsum of all earlier ranges
    starts = {
        int(r): int(off)
        for r, off in zip(
            totals[_RANGE].to_numpy(),
            np.concatenate(
                ([0], np.cumsum(totals["range_tokens"].to_numpy())[:-1])
            ),
        )
    }
    starts_ref = ray.put(starts)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(starts_ref)
        g = g.sort_values(id_col, kind="stable")
        toks = g[tokens_col].to_numpy().astype(np.int64)
        rng = g[_RANGE].to_numpy().astype(np.int64)
        # local running offset WITHIN each range (a bucket may hold
        # several whole ranges): global cumsum minus each range's
        # first-row cumsum, vectorized via first-occurrence gather
        cs = np.cumsum(toks) - toks  # tokens BEFORE each row, bucket-wide
        new_rng = np.empty(len(g), dtype=bool)
        if len(g):
            new_rng[0] = True
            new_rng[1:] = rng[1:] != rng[:-1]
        base = np.maximum.accumulate(np.where(new_rng, cs, 0))
        local = cs - base
        start = pd.Series(rng).map(offs).to_numpy(dtype=np.int64)
        off = start + local
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                tokens_col: toks,
                "seq_id": off // budget,
                "seq_off": off % budget,
            }
        )

    return apply_per_bucket(tagged, kernel, key=_RANGE, num_buckets=num_buckets)


def chunk_windows(
    ds: ray.data.Dataset,
    size: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Context-window chunking: split each document into fixed-size
    character windows (``size`` chars, starting every ``stride``
    chars — ``stride < size`` gives the standard overlapping windows
    used to fit long documents into a model's context). Output one row
    per chunk: (id_col, chunk_idx, chunk, n_chunk_chars), chunks in
    document order; null/empty text emits no chunks.

    Embarrassingly parallel — no shuffle: each batch explodes
    independently. The kernel loops over CHUNK ORDINALS (bounded by
    the longest doc in the batch, typically a handful) and runs one
    vectorized ``utf8_slice_codeunits`` over all docs still long
    enough per ordinal — never a per-row Python loop. Character (code
    point) semantics match DuckDB ``substr``/``length``, so the gate
    is exact on any unicode payload.

    Reference analogue: M6 crop-to-bbox projection
    (``condition.py:158-171``) crops each frame to a region; this is
    the text-modal form — every window a training-ready slice."""
    if size <= 0:
        raise ValueError("size must be positive")
    stride = size if stride is None else stride
    if stride <= 0:
        raise ValueError("stride must be positive")

    def explode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tt = t.filter(pc.is_valid(t[text_col]))
        if tt.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                    "n_chunk_chars": pa.array([], pa.int64()),
                }
            )
        txt = tt[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        ids = tt[id_col].to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.int64)
        out_ids, out_idx, out_chunks = [], [], []
        k = 0
        alive = lens > 0  # offset 0 exists only for non-empty docs
        while alive.any():
            sel = pa.array(alive)
            sliced = pc.utf8_slice_codeunits(
                txt.filter(sel), start=k * stride, stop=k * stride + size
            )
            out_ids.append(ids[alive])
            out_idx.append(np.full(int(alive.sum()), k, dtype=np.int64))
            out_chunks.append(sliced)
            k += 1
            alive = lens > k * stride
        chunks = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in out_chunks]
        )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_ids), pa.int64()),
                "chunk_idx": pa.array(np.concatenate(out_idx), pa.int64()),
                "chunk": chunks,
                "n_chunk_chars": pc.utf8_length(chunks).cast(pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
