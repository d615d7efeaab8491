"""Exact turn dedup — keep one row per (conv_id, turn_idx).

The reference suppresses near-duplicate detections pairwise in
arrival order (D2, ``condition.py:66-77``); per input_hint duplicates
here are byte-identical rows, so dedup is exact and any copy can be
kept (SURVEY.md §7.3).

Physical plan (round 2 — the payload never shuffles):

1. KEY PASS: per batch, hash (conv_id, turn_idx) to one int64
   fingerprint and emit partial counts per fp; a tiny
   ``groupby(fp).sum`` finds fingerprints with multiplicity > 1.
   The shuffle moves ONE int64 per distinct key per block, not rows.
2. FILTER PASS: re-stream the input; rows whose fp is NOT in the dup
   set are globally unique and pass through with zero movement; only
   rows in the dup set (the duplicates themselves, a small fraction)
   go through a hash shuffle + vectorized drop_duplicates.

Fingerprint collisions are conservative-safe: a colliding unique row
is merely routed to the (exact, true-key) dedup path. The dup-fp set
is broadcast via ``ray.put``; at a dup rate where it outgrows worker
memory, the documented fallback is to carry (input_file, row_group)
provenance through the key pass and re-partition the keep-list by
provenance instead of broadcasting (two key-only shuffles, payload
still never moves). The input dataset's lineage executes twice (both
passes stream from the source) — the 100 TB trade is two streaming
reads vs shuffling every payload byte once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from .partition import _stable_hash, apply_per_bucket


def dedup_kernel(g: pd.DataFrame) -> pd.DataFrame:
    return g.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")


def _key_fp(t: pa.Table) -> np.ndarray:
    h = _stable_hash(t["conv_id"].to_numpy(zero_copy_only=False))
    return (
        h * np.uint64(1_000_003)
        + t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ).astype(np.int64)


def dedup_exact(ds: ray.data.Dataset, num_buckets: int | None = None) -> ray.data.Dataset:
    def partial_counts(t: pa.Table) -> pa.Table:
        fp, counts = np.unique(_key_fp(t), return_counts=True)
        return pa.table({"fp": fp, "n": counts.astype(np.int64)})

    totals = ds.map_batches(partial_counts, batch_format="pyarrow").groupby(
        "fp"
    ).aggregate(Sum("n", alias_name="n"))
    dup_fps = totals.filter(expr="n > 1").select_columns(["fp"]).to_pandas()
    dup_set = ray.put(np.sort(dup_fps["fp"].to_numpy().astype(np.int64)))

    def split(t: pa.Table, want_dups: bool) -> pa.Table:
        fps = _key_fp(t)
        mask = np.isin(fps, ray.get(dup_set))
        return t.filter(pa.array(mask if want_dups else ~mask))

    unique_rows = ds.map_batches(
        lambda t: split(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    dup_rows = ds.map_batches(
        lambda t: split(t, True), batch_format="pyarrow", zero_copy_batch=True
    )
    deduped_dups = apply_per_bucket(dup_rows, dedup_kernel, num_buckets=num_buckets)
    return unique_rows.union(deduped_dups)
