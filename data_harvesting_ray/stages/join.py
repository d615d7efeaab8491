"""Tool-call ↔ response correlation (J3 generalization).

The reference correlates detections across model sources within the
same frame (``projects/helmet/helmet_project.py:25-55``); the
transcript analogue pairs an assistant tool-call turn with the first
later ``tool`` response turn sharing (conv_id, call_id). Co-partitioned
by hash(conv_id) — the join never moves more than the one shuffle every
stateful stage already pays; within a bucket it is a vectorized pandas
hash join. Orphan calls (no response) are the anti-join complement
(FIXTURES.md F3.6).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .dedup import dedup_kernel
from .partition import apply_per_bucket


def _participants(normalized: ray.data.Dataset) -> ray.data.Dataset:
    """Pre-shuffle pruning: only call/response rows participate in the
    join, and the join needs no payload — filter to them and project
    `text` away BEFORE the shuffle (most rows and nearly all bytes
    never move). Filtering before dedup is sound because duplicate
    rows are byte-identical (the predicate is row-deterministic)."""

    def prune(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.not_equal(t["call_id"], pa.scalar("")),
            pc.or_(t["is_tool_call"], pc.equal(t["role"], pa.scalar("tool"))),
        )
        t = t.filter(keep)
        return t.drop_columns([c for c in ("text",) if c in t.column_names])

    return normalized.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)


def _split_calls_resps(
    g: pd.DataFrame, prepared: bool = False
) -> tuple[pd.DataFrame, pd.DataFrame]:
    if not prepared:
        g = dedup_kernel(g)
    has_id = g["call_id"] != ""
    calls = g[g["is_tool_call"] & has_id]
    resps = g[(g["role"] == "tool") & has_id]
    return calls, resps


def join_kernel(g: pd.DataFrame, prepared: bool = False) -> pd.DataFrame:
    calls, resps = _split_calls_resps(g, prepared)
    m = calls.merge(
        resps[["conv_id", "call_id", "turn_idx", "ts"]].rename(
            columns={"turn_idx": "resp_turn_idx", "ts": "resp_ts"}
        ),
        on=["conv_id", "call_id"],
        how="inner",
    )
    m = m[m["resp_turn_idx"] > m["turn_idx"]]
    m = m.sort_values(["conv_id", "call_id", "resp_turn_idx"], kind="stable")
    m = m.groupby(["conv_id", "call_id"], sort=False, as_index=False).first()
    out = m.rename(columns={"turn_idx": "call_turn_idx", "ts": "call_ts"})
    return out[
        [
            "conv_id",
            "call_id",
            "tool",
            "call_turn_idx",
            "resp_turn_idx",
            "call_ts",
            "resp_ts",
        ]
    ]


def orphan_kernel(g: pd.DataFrame, prepared: bool = False) -> pd.DataFrame:
    calls, resps = _split_calls_resps(g, prepared)
    resp_turn = resps.rename(columns={"turn_idx": "resp_turn_idx"})
    m = calls.merge(
        resp_turn[["conv_id", "call_id", "resp_turn_idx"]],
        on=["conv_id", "call_id"],
        how="left",
    )
    answered = m[m["resp_turn_idx"] > m["turn_idx"]][["conv_id", "call_id"]]
    orphans = calls.merge(
        answered.drop_duplicates(), on=["conv_id", "call_id"], how="left", indicator=True
    )
    orphans = orphans[orphans["_merge"] == "left_only"]
    return orphans.rename(columns={"turn_idx": "call_turn_idx"})[
        ["conv_id", "call_id", "call_turn_idx"]
    ]


def tool_join(normalized: ray.data.Dataset, num_buckets: int | None = None) -> ray.data.Dataset:
    """Bucketing on the TRUE join key (conv_id, call_id): a hot
    conversation's calls spread over many buckets instead of pinning
    one partition (the kernel only needs per-(conv, call) co-location)."""
    return apply_per_bucket(
        _participants(normalized),
        join_kernel,
        key=["conv_id", "call_id"],
        num_buckets=num_buckets,
    )


def orphan_calls(normalized: ray.data.Dataset, num_buckets: int | None = None) -> ray.data.Dataset:
    return apply_per_bucket(
        _participants(normalized),
        orphan_kernel,
        key=["conv_id", "call_id"],
        num_buckets=num_buckets,
    )
