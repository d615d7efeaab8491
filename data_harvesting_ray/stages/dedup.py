"""Exact turn dedup — keep one row per (conv_id, turn_idx).

The reference suppresses near-duplicate detections pairwise in
arrival order (D2, ``condition.py:66-77``); per input_hint duplicates
here are byte-identical rows, so dedup is exact: hash-partition on
conv_id (duplicates co-locate) and drop duplicate keys vectorized
inside each bucket (SURVEY.md §7.3). Deterministic regardless of
partition count because duplicate rows are identical; where payloads
could differ the streaming engine's keep-first-arrival (epoch order)
applies instead.
"""

from __future__ import annotations

import pandas as pd

import ray.data

from .partition import apply_per_bucket


def dedup_kernel(g: pd.DataFrame) -> pd.DataFrame:
    return g.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")


def dedup_exact(ds: ray.data.Dataset, num_buckets: int | None = None) -> ray.data.Dataset:
    return apply_per_bucket(ds, dedup_kernel, num_buckets=num_buckets)
