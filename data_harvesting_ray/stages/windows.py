"""Event-time windowing operators (W2 analogues).

The reference scopes all state to one video and resets between videos
(``services/harvest_service.py:160-196``); generalized here to session
windows with a gap on event time, plus tumbling and sliding windows.

Physical plans:
- session: needs whole conversations → one hash(conv_id) shuffle, then
  a fully vectorized gaps-and-islands kernel per bucket (reduceat over
  island boundaries — no per-conversation Python).
- tumbling/sliding: decomposable aggregates → partial aggregation
  inside ``map_batches`` (one row per (conv, window) per batch), then a
  small ``groupby().aggregate(Sum)`` over the partials — the shuffle
  moves pre-aggregated rows, not turns (SURVEY.md "pre-aggregate
  inside map_batches").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..schema import DEFAULT_SESSION_GAP_S
from .dedup import dedup_kernel
from .partition import apply_per_bucket

US = 1_000_000


def session_kernel(g: pd.DataFrame, gap_s: int = DEFAULT_SESSION_GAP_S) -> pd.DataFrame:
    g = dedup_kernel(g).sort_values(["conv_id", "turn_idx"], kind="stable")
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


def session_windows(
    ds: ray.data.Dataset,
    gap_s: int = DEFAULT_SESSION_GAP_S,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    return apply_per_bucket(
        ds, lambda g: session_kernel(g, gap_s), num_buckets=num_buckets
    )


def _tumbling_partial(t: pa.Table, size_us: int) -> pa.Table:
    """Partial per-batch aggregate: one row per (conv_id, window) key.

    Exact duplicates inflate counts if not removed first — callers pass
    a deduped dataset (see pipelines). Kept separate so the partial
    aggregation is a pure decomposable combiner.
    """
    df = t.select(["conv_id", "ts", "is_tool_call"]).to_pandas()
    ws = (df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // size_us) * size_us
    part = (
        pd.DataFrame(
            {
                "conv_id": df["conv_id"],
                "window_start": ws,
                "turn_count": np.int64(1),
                "tool_call_count": df["is_tool_call"].to_numpy().astype(np.int64),
            }
        )
        .groupby(["conv_id", "window_start"], sort=False, as_index=False)
        .sum()
    )
    part["window_start"] = part["window_start"].astype("datetime64[us]")
    return pa.Table.from_pandas(part, preserve_index=False)


def tumbling_windows(
    normalized_deduped: ray.data.Dataset, size_s: int = 600
) -> ray.data.Dataset:
    size_us = size_s * US
    partials = normalized_deduped.map_batches(
        lambda t: _tumbling_partial(t, size_us), batch_format="pyarrow"
    )
    return partials.groupby(["conv_id", "window_start"]).aggregate(
        Sum("turn_count", alias_name="turn_count"),
        Sum("tool_call_count", alias_name="tool_call_count"),
    )


def _sliding_partial(t: pa.Table, size_us: int, slide_us: int) -> pa.Table:
    df = t.select(["conv_id", "ts"]).to_pandas()
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    k_hi = ts // slide_us
    k_lo = (ts - size_us) // slide_us + 1
    reps = (k_hi - k_lo + 1).astype(np.int64)
    conv = np.repeat(df["conv_id"].to_numpy(), reps)
    # window index for each (row, window) pair without a Python loop
    offsets = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
    ws = (np.repeat(k_lo, reps) + offsets) * slide_us
    part = (
        pd.DataFrame({"conv_id": conv, "window_start": ws, "turn_count": np.int64(1)})
        .groupby(["conv_id", "window_start"], sort=False, as_index=False)
        .sum()
    )
    part["window_start"] = part["window_start"].astype("datetime64[us]")
    return pa.Table.from_pandas(part, preserve_index=False)


def sliding_windows(
    deduped: ray.data.Dataset, size_s: int = 600, slide_s: int = 300
) -> ray.data.Dataset:
    partials = deduped.map_batches(
        lambda t: _sliding_partial(t, size_s * US, slide_s * US),
        batch_format="pyarrow",
    )
    return partials.groupby(["conv_id", "window_start"]).aggregate(
        Sum("turn_count", alias_name="turn_count")
    )
