"""Grouped aggregates from the reference's inventory (SURVEY §2.5).

A1/A2 count-per-key gates, A7 majority vote (mode), A8 top-k frequent,
M1 stride sampling, and a generic lineitem rollup showing the partial-
aggregation pattern (combine inside map_batches, then a small groupby
over partials — the shuffle moves pre-aggregated rows only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from .partition import apply_per_bucket


def stride_sample(ds: ray.data.Dataset, k: int = 4) -> ray.data.Dataset:
    """Emit every k-th turn — the reference's frame stride sampler M1
    (CLASSIFICATION_FPS gate, services/harvest_service.py:156-157)."""
    def gate(t: pa.Table) -> pa.Table:
        mask = (t["turn_idx"].to_numpy() % k) == 0
        return t.filter(pa.array(mask))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def turn_stats(normalized_deduped: ray.data.Dataset) -> ray.data.Dataset:
    """Per-conversation stats: count, tool-call count, first/last ts
    (the ClassificationObject incremental-aggregate analogue, ST3)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["conv_id", "ts", "is_tool_call"]).to_pandas()
        part = (
            pd.DataFrame(
                {
                    "conv_id": df["conv_id"],
                    "n_turns": np.int64(1),
                    "n_tool_calls": df["is_tool_call"].to_numpy().astype(np.int64),
                    "first_ts": df["ts"],
                    "last_ts": df["ts"],
                }
            )
            .groupby("conv_id", sort=False, as_index=False)
            .agg(
                n_turns=("n_turns", "sum"),
                n_tool_calls=("n_tool_calls", "sum"),
                first_ts=("first_ts", "min"),
                last_ts=("last_ts", "max"),
            )
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    return normalized_deduped.map_batches(partial, batch_format="pyarrow").groupby(
        "conv_id"
    ).aggregate(
        Sum("n_turns", alias_name="n_turns"),
        Sum("n_tool_calls", alias_name="n_tool_calls"),
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
    )


def role_mode(deduped: ray.data.Dataset) -> ray.data.Dataset:
    """Majority role per conversation (A7, exact mode with
    deterministic tie-break by role name asc —
    utils/ClassificationObject.py:105-113)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["conv_id", "role"]).to_pandas()
        part = (
            df.assign(n=np.int64(1))
            .groupby(["conv_id", "role"], sort=False, as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    counts = deduped.map_batches(partial, batch_format="pyarrow").groupby(
        ["conv_id", "role"]
    ).aggregate(Sum("n", alias_name="role_count"))

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "role_count", "role"], ascending=[True, False, True], kind="stable")
        out = g.drop_duplicates(subset=["conv_id"], keep="first")
        return out.rename(columns={"role": "top_role"})[["conv_id", "top_role", "role_count"]]

    return apply_per_bucket(counts, top1)


def topk_tools(normalized_deduped: ray.data.Dataset, k: int = 3) -> pd.DataFrame:
    """Global top-k tools by call count (A8; exact, small result →
    driver-side final sort is fine)."""
    calls = normalized_deduped.map_batches(
        lambda t: t.filter(t["is_tool_call"]).select(["tool"]),
        batch_format="pyarrow",
    )
    counts = calls.groupby("tool").aggregate(Count(alias_name="n_calls")).to_pandas()
    counts = counts.sort_values(["n_calls", "tool"], ascending=[False, True], kind="stable")
    counts["n_calls"] = counts["n_calls"].astype(np.int64)
    return counts.head(k).reset_index(drop=True)


def lineitem_rollup(ds: ray.data.Dataset) -> ray.data.Dataset:
    """TPC-H-Q1-style rollup over lineitem: integral quantity sums and
    row counts per (returnflag, linestatus) via per-batch partials."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["l_returnflag", "l_linestatus", "l_quantity"]).to_pandas()
        part = (
            pd.DataFrame(
                {
                    "l_returnflag": df["l_returnflag"],
                    "l_linestatus": df["l_linestatus"],
                    "sum_qty": df["l_quantity"].to_numpy().astype(np.int64),
                    "count_order": np.int64(1),
                }
            )
            .groupby(["l_returnflag", "l_linestatus"], sort=False, as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("count_order", alias_name="count_order"),
    )
