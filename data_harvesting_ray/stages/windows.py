"""Event-time windowing operators (W2 analogues).

The reference scopes all state to one video and resets between videos
(``services/harvest_service.py:160-196``); generalized here to session
windows with a gap on event time, plus tumbling and sliding windows.

Physical plans:
- session: needs whole conversations → one hash(conv_id) shuffle, then
  a fully vectorized gaps-and-islands kernel per bucket (reduceat over
  island boundaries — no per-conversation Python).
- tumbling/sliding: dedup + the full (conv, window) aggregate fused
  into one hash(conv_id) partition pass over PRUNED metadata columns
  (conv_id, turn_idx, ts, role, tool) — the payload (`text`) is never
  read, never shuffled. (The partial-agg + small-groupby plan lives on
  in the streaming engine's per-epoch window partials.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..schema import DEFAULT_SESSION_GAP_S
from .dedup import dedup_kernel, prepare_bucket
from .partition import apply_per_bucket

US = 1_000_000


def session_kernel(
    g: pd.DataFrame, gap_s: int = DEFAULT_SESSION_GAP_S, prepared: bool = False
) -> pd.DataFrame:
    if not prepared:
        g = prepare_bucket(g)
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    conv = g["conv_id"].to_numpy()
    tidx = g["turn_idx"].to_numpy()
    n = len(g)
    if n == 0:
        return pd.DataFrame(
            {
                "conv_id": np.array([], dtype=object),
                "session_id": np.array([], np.int64),
                "window_start": np.array([], "datetime64[us]"),
                "window_end": np.array([], "datetime64[us]"),
                "turn_count": np.array([], np.int64),
                "first_turn_idx": np.array([], np.int32),
                "last_turn_idx": np.array([], np.int32),
            }
        )
    is_new = np.empty(n, dtype=bool)
    is_new[0] = True
    is_new[1:] = (conv[1:] != conv[:-1]) | (ts[1:] - ts[:-1] > gap_s * US)
    starts = np.flatnonzero(is_new)
    ends = np.append(starts[1:], n) - 1
    conv_new = np.empty(n, dtype=bool)
    conv_new[0] = True
    conv_new[1:] = conv[1:] != conv[:-1]
    # session_id = islands since the start of this conversation
    island_idx = np.cumsum(is_new) - 1
    first_island_of_conv = island_idx[np.flatnonzero(conv_new)]
    session_id = np.arange(len(starts)) - np.repeat(
        first_island_of_conv, np.diff(np.append(first_island_of_conv, len(starts)))
    )
    return pd.DataFrame(
        {
            "conv_id": conv[starts],
            "session_id": session_id.astype(np.int64),
            "window_start": ts[starts].astype("datetime64[us]"),
            "window_end": ts[ends].astype("datetime64[us]"),
            "turn_count": (ends - starts + 1).astype(np.int64),
            "first_turn_idx": tidx[starts],
            "last_turn_idx": tidx[ends],
        }
    )


def session_kernel_arrow(t: pa.Table, gap_s: int = DEFAULT_SESSION_GAP_S) -> pa.Table:
    """Arrow-native session kernel (r5 A/B vs the pandas path —
    BASELINE.md "Arrow-native kernel A/B"): the bucket block stays an
    Arrow table; conv codes come from ``dictionary_encode`` instead of
    object-array ``pd.factorize``; dedup+sort fuses on the same
    composite int key as ``prepare_bucket``; per-island output columns
    are built from numpy gathers plus ONE Arrow ``take`` for the
    conv_id strings (never materialized as Python objects)."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "session_id": pa.array([], pa.int64()),
                "window_start": pa.array([], pa.timestamp("us")),
                "window_end": pa.array([], pa.timestamp("us")),
                "turn_count": pa.array([], pa.int64()),
                "first_turn_idx": pa.array([], pa.int32()),
                "last_turn_idx": pa.array([], pa.int32()),
            }
        )
    conv_col = t["conv_id"].combine_chunks()
    codes = pc.dictionary_encode(conv_col).indices.to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    tidx = t["turn_idx"].to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    # dedup on (conv, turn_idx) + sort, one composite-int pass
    key = (codes << np.int64(32)) | tidx.astype(np.int64)
    order = np.argsort(key, kind="stable")
    sk = key[order]
    keep = np.empty(len(sk), dtype=bool)
    keep[0] = True
    keep[1:] = sk[1:] != sk[:-1]
    sel = order[keep]
    codes, tidx, ts = codes[sel], tidx[sel], ts[sel]
    n = len(sel)
    is_new = np.empty(n, dtype=bool)
    is_new[0] = True
    is_new[1:] = (codes[1:] != codes[:-1]) | (ts[1:] - ts[:-1] > gap_s * US)
    starts = np.flatnonzero(is_new)
    ends = np.append(starts[1:], n) - 1
    conv_new = np.empty(n, dtype=bool)
    conv_new[0] = True
    conv_new[1:] = codes[1:] != codes[:-1]
    island_idx = np.cumsum(is_new) - 1
    first_island_of_conv = island_idx[np.flatnonzero(conv_new)]
    session_id = np.arange(len(starts)) - np.repeat(
        first_island_of_conv,
        np.diff(np.append(first_island_of_conv, len(starts))),
    )
    return pa.table(
        {
            "conv_id": conv_col.take(pa.array(sel[starts])),
            "session_id": pa.array(session_id.astype(np.int64)),
            "window_start": pa.array(ts[starts].astype("datetime64[us]")),
            "window_end": pa.array(ts[ends].astype("datetime64[us]")),
            "turn_count": pa.array((ends - starts + 1).astype(np.int64)),
            "first_turn_idx": pa.array(tidx[starts].astype(np.int32)),
            "last_turn_idx": pa.array(tidx[ends].astype(np.int32)),
        }
    )


def session_windows(
    ds: ray.data.Dataset,
    gap_s: int = DEFAULT_SESSION_GAP_S,
    num_buckets: int | None = None,
    impl: str = "arrow",
) -> ray.data.Dataset:
    if impl == "arrow":
        return apply_per_bucket(
            ds,
            lambda t: session_kernel_arrow(t, gap_s),
            num_buckets=num_buckets,
            batch_format="pyarrow",
        )
    return apply_per_bucket(
        ds, lambda g: session_kernel(g, gap_s), num_buckets=num_buckets
    )


def session_windows_salted(
    ds: ray.data.Dataset,
    gap_s: int = DEFAULT_SESSION_GAP_S,
    salt_chunk: int = 65536,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Session windows with HOT-KEY SALTING (SURVEY §7 hard part (c)).

    ``session_windows`` co-locates whole conversations, so one
    mega-conversation pins one partition (the straggler holds the
    barrier). Here the partition key is (conv_id, turn_idx //
    salt_chunk): a 10M-turn conversation spreads over ~150 buckets.
    Stage 1 computes PARTIAL gap-islands per chunk (the decomposable
    part); stage 2 shuffles only the island rows — one row per partial
    session, ≥ salt_chunk× smaller than the input — by conv_id and
    merges chunk-boundary islands with the same gap rule, which is
    exact: two islands merge iff their boundary turns are consecutive
    with a gap ≤ the session gap, and within-chunk splits already
    satisfy the complement.

    Output is identical to ``session_windows`` (metamorphic test in
    tests/test_salting.py); use it when conversation-length skew is
    unbounded."""
    gap_us = gap_s * US

    def add_chunk(t: pa.Table) -> pa.Table:
        chunk = (
            t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64) // salt_chunk
        )
        return t.append_column("chunk", pa.array(chunk))

    def partial_islands(g: pd.DataFrame) -> pd.DataFrame:
        g = dedup_kernel(g)
        # chunk = turn_idx // C is monotone in turn_idx, so sorting by
        # (conv, turn_idx) also orders by chunk
        codes, _ = pd.factorize(g["conv_id"].to_numpy(), sort=False)
        key = (codes.astype(np.int64) << np.int64(32)) | g["turn_idx"].to_numpy().astype(
            np.int64
        )
        order = np.argsort(key, kind="stable")
        g = g.iloc[order]
        conv = g["conv_id"].to_numpy()
        chunk = g["chunk"].to_numpy().astype(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        tidx = g["turn_idx"].to_numpy().astype(np.int64)
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    "conv_id": np.array([], dtype=object),
                    "start_us": np.array([], np.int64),
                    "end_us": np.array([], np.int64),
                    "turn_count": np.array([], np.int64),
                    "first_idx": np.array([], np.int64),
                    "last_idx": np.array([], np.int64),
                }
            )
        is_new = np.empty(n, dtype=bool)
        is_new[0] = True
        is_new[1:] = (
            (conv[1:] != conv[:-1])
            | (chunk[1:] != chunk[:-1])
            | (ts[1:] - ts[:-1] > gap_us)
        )
        starts = np.flatnonzero(is_new)
        ends = np.append(starts[1:], n) - 1
        return pd.DataFrame(
            {
                "conv_id": conv[starts],
                "start_us": ts[starts],
                "end_us": ts[ends],
                "turn_count": (ends - starts + 1).astype(np.int64),
                "first_idx": tidx[starts],
                "last_idx": tidx[ends],
            }
        )

    def merge_islands(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "conv_id": np.array([], dtype=object),
                    "session_id": np.array([], np.int64),
                    "window_start": np.array([], "datetime64[us]"),
                    "window_end": np.array([], "datetime64[us]"),
                    "turn_count": np.array([], np.int64),
                    "first_turn_idx": np.array([], np.int32),
                    "last_turn_idx": np.array([], np.int32),
                }
            )
        codes, _ = pd.factorize(g["conv_id"].to_numpy(), sort=False)
        key = (codes.astype(np.int64) << np.int64(32)) | g["first_idx"].to_numpy().astype(
            np.int64
        )
        order = np.argsort(key, kind="stable")
        g = g.iloc[order]
        conv = g["conv_id"].to_numpy()
        start = g["start_us"].to_numpy().astype(np.int64)
        end = g["end_us"].to_numpy().astype(np.int64)
        cnt = g["turn_count"].to_numpy().astype(np.int64)
        fidx = g["first_idx"].to_numpy().astype(np.int64)
        lidx = g["last_idx"].to_numpy().astype(np.int64)
        n = len(g)
        is_new = np.empty(n, dtype=bool)
        is_new[0] = True
        is_new[1:] = (conv[1:] != conv[:-1]) | (start[1:] - end[:-1] > gap_us)
        s = np.flatnonzero(is_new)
        e = np.append(s[1:], n) - 1
        conv_new = np.empty(n, dtype=bool)
        conv_new[0] = True
        conv_new[1:] = conv[1:] != conv[:-1]
        island_idx = np.cumsum(is_new) - 1
        first_island = island_idx[np.flatnonzero(conv_new)]
        session_id = np.arange(len(s)) - np.repeat(
            first_island, np.diff(np.append(first_island, len(s)))
        )
        cnt_sums = np.add.reduceat(cnt, s)
        return pd.DataFrame(
            {
                "conv_id": conv[s],
                "session_id": session_id.astype(np.int64),
                "window_start": start[s].astype("datetime64[us]"),
                "window_end": end[e].astype("datetime64[us]"),
                "turn_count": cnt_sums.astype(np.int64),
                "first_turn_idx": fidx[s].astype(np.int32),
                "last_turn_idx": lidx[e].astype(np.int32),
            }
        )

    chunked = ds.map_batches(add_chunk, batch_format="pyarrow", zero_copy_batch=True)
    partials = apply_per_bucket(
        chunked, partial_islands, key=["conv_id", "chunk"], num_buckets=num_buckets
    )
    return apply_per_bucket(partials, merge_islands, num_buckets=num_buckets)


def _is_tool_call(g: pd.DataFrame) -> np.ndarray:
    """is_tool_call from whichever columns are present: a normalized
    frame carries it; a pruned raw read derives it from (role, tool)."""
    if "is_tool_call" in g.columns:
        return g["is_tool_call"].to_numpy().astype(np.int64)
    return (
        (g["tool"].to_numpy() != "") & (g["role"].to_numpy() == "assistant")
    ).astype(np.int64)


def tumbling_kernel(g: pd.DataFrame, size_us: int) -> pd.DataFrame:
    """Dedup + per-(conv, window) counts in one pass over a bucket.
    Input needs only (conv_id, turn_idx, ts) + (role, tool |
    is_tool_call) — callers prune the read to those columns so the one
    hash shuffle ships ~30 bytes/row of metadata, never the payload."""
    g = dedup_kernel(g)
    ws = (g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // size_us) * size_us
    out = (
        pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy(),
                "window_start": ws,
                "turn_count": np.int64(1),
                "tool_call_count": _is_tool_call(g),
            }
        )
        .groupby(["conv_id", "window_start"], sort=False, as_index=False)
        .sum()
    )
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out


def tumbling_windows(
    ds: ray.data.Dataset, size_s: int = 600, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Per-(conv, tumbling-window) turn/tool-call counts. Accepts raw
    (possibly duplicated) rows: dedup and the full aggregate fuse into
    the same hash(conv_id) partition pass, so exactly one shuffle of
    pruned metadata columns runs end-to-end."""
    size_us = size_s * US
    return apply_per_bucket(
        ds, lambda g: tumbling_kernel(g, size_us), num_buckets=num_buckets
    )


def sliding_kernel(g: pd.DataFrame, size_us: int, slide_us: int) -> pd.DataFrame:
    g = dedup_kernel(g)
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    k_hi = ts // slide_us
    k_lo = (ts - size_us) // slide_us + 1
    reps = (k_hi - k_lo + 1).astype(np.int64)
    conv = np.repeat(g["conv_id"].to_numpy(), reps)
    # window index for each (row, window) pair without a Python loop
    offsets = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
    ws = (np.repeat(k_lo, reps) + offsets) * slide_us
    out = (
        pd.DataFrame({"conv_id": conv, "window_start": ws, "turn_count": np.int64(1)})
        .groupby(["conv_id", "window_start"], sort=False, as_index=False)
        .sum()
    )
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out


def sliding_windows(
    ds: ray.data.Dataset,
    size_s: int = 600,
    slide_s: int = 300,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Sliding-window counts; same fused one-shuffle plan as tumbling
    (the window expansion happens after the shuffle, inside the
    kernel, so pre-expansion rows — not size/slide× more — move)."""
    return apply_per_bucket(
        ds,
        lambda g: sliding_kernel(g, size_s * US, slide_s * US),
        num_buckets=num_buckets,
    )
