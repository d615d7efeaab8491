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
from ray.data.aggregate import Sum

from .partition import apply_per_bucket, to_clean_arrow


def stride_sample(ds: ray.data.Dataset, k: int = 4) -> ray.data.Dataset:
    """Emit every k-th turn — the reference's frame stride sampler M1
    (CLASSIFICATION_FPS gate, services/harvest_service.py:156-157)."""
    def gate(t: pa.Table) -> pa.Table:
        mask = (t["turn_idx"].to_numpy() % k) == 0
        return t.filter(pa.array(mask))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)


def turn_stats(ds: ray.data.Dataset, num_buckets: int | None = None) -> ray.data.Dataset:
    """Per-conversation stats: count, tool-call count, first/last ts
    (the ClassificationObject incremental-aggregate analogue, ST3).

    Accepts raw (possibly duplicated) rows pruned to (conv_id,
    turn_idx, ts, role, tool): dedup and the final per-conv aggregate
    fuse into the one hash(conv_id) pass — no second groupby, no
    payload in the shuffle."""
    from .dedup import dedup_kernel
    from .windows import _is_tool_call

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = dedup_kernel(g)
        return (
            pd.DataFrame(
                {
                    "conv_id": g["conv_id"].to_numpy(),
                    "n_turns": np.int64(1),
                    "n_tool_calls": _is_tool_call(g),
                    "first_ts": g["ts"].to_numpy(),
                    "last_ts": g["ts"].to_numpy(),
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

    return apply_per_bucket(ds, kernel, num_buckets=num_buckets)


def role_mode(ds: ray.data.Dataset, num_buckets: int | None = None) -> ray.data.Dataset:
    """Majority role per conversation (A7, exact mode with
    deterministic tie-break by role name asc —
    utils/ClassificationObject.py:105-113). Fused dedup + count +
    argmax per bucket; input pruned to (conv_id, turn_idx, role)."""
    from .dedup import dedup_kernel

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = dedup_kernel(g)
        counts = (
            g.assign(n=np.int64(1))
            .groupby(["conv_id", "role"], sort=False, as_index=False)["n"]
            .sum()
        )
        counts = counts.sort_values(
            ["conv_id", "n", "role"], ascending=[True, False, True], kind="stable"
        )
        out = counts.drop_duplicates(subset=["conv_id"], keep="first")
        return out.rename(columns={"role": "top_role", "n": "role_count"})[
            ["conv_id", "top_role", "role_count"]
        ]

    return apply_per_bucket(ds, kernel, num_buckets=num_buckets)


def topk_tools(ds: ray.data.Dataset, k: int = 3, num_buckets: int | None = None) -> pd.DataFrame:
    """Global top-k tools by call count (A8; exact, small result →
    driver-side final sort is fine). The bucket kernel dedups and
    emits per-tool partial counts (≤ |tools| rows per bucket); the
    final groupby shuffles those partials only."""
    from .dedup import dedup_kernel
    from .windows import _is_tool_call

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = dedup_kernel(g)
        g = g[_is_tool_call(g).astype(bool)]
        return (
            g.assign(n=np.int64(1))
            .groupby("tool", sort=False, as_index=False)["n"]
            .sum()
        )

    partials = apply_per_bucket(ds, kernel, num_buckets=num_buckets)
    counts = partials.groupby("tool").aggregate(Sum("n", alias_name="n_calls")).to_pandas()
    counts = counts.sort_values(["n_calls", "tool"], ascending=[False, True], kind="stable")
    counts["n_calls"] = counts["n_calls"].astype(np.int64)
    return counts.head(k).reset_index(drop=True)


def topk_per_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    k: int,
    ascending: bool = False,
    tie: str | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact top-k rows per key by value, deterministic tie-break on
    ``tie`` asc — the training-data curation op "keep the best k
    documents per group" (e.g. highest-token docs per language /
    best-quality per domain). Per-key variant of A8's global top-k
    (reference sorts then caps per class — ``condition.py:57-64``).

    Scale plan: a per-batch PARTIAL top-k prunes every input block to
    <= k rows per key BEFORE the shuffle (the partial-before-wide
    discipline), so the hash shuffle moves at most k rows per (key,
    block) — never the corpus. The bucket kernel computes the exact
    top-k vectorized across all keys in the bucket (one stable sort +
    groupby head, no per-key Python) and adds a 1-based int64 ``rank``
    within each key."""
    sort_cols = [key, value] + ([tie] if tie else [])
    asc = [True, ascending] + ([True] if tie else [])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return (
            df.sort_values(sort_cols, ascending=asc, kind="stable")
            .groupby(key, sort=False)
            .head(k)
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=asc, kind="stable")
        out = g.groupby(key, sort=False).head(k).copy()
        out["rank"] = out.groupby(key, sort=False).cumcount().to_numpy() + np.int64(1)
        return out

    pruned = ds.map_batches(prune, batch_format="pandas")
    return apply_per_bucket(pruned, kernel, key=key, num_buckets=num_buckets)


def distinct_per_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    out_col: str = "n_distinct",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact per-key COUNT(DISTINCT value) — the distinct-aggregate
    family member (e.g. distinct tools used per conversation). The
    per-batch partial projects to DISTINCT (key, value) pairs before
    the shuffle, so the exchange moves |distinct pairs| rows, never the
    input; the bucket kernel counts uniques vectorized (one
    drop_duplicates + groupby size across all keys in the bucket)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[key, value]].drop_duplicates()

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates()
        out = u.groupby(key, sort=False, as_index=False).size()
        return out.rename(columns={"size": out_col}).astype({out_col: np.int64})

    pruned = ds.map_batches(partial, batch_format="pandas")
    return apply_per_bucket(pruned, kernel, key=key, num_buckets=num_buckets)


def sample_per_key(
    ds: ray.data.Dataset,
    key: str,
    n: int,
    id_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Deterministic per-key downsampling cap: keep at most ``n`` rows
    per key, selected by golden-ratio integer-hash order of ``id_col``
    (a reproducible uniform sample, independent of arrival order) —
    the "at most n documents per domain/language" curation op, the
    per-key blend of SO3 systematic sampling and A9's per-key output
    cap. Same scale plan as ``topk_per_key`` (partial per-batch prune
    before the shuffle): the hash is just another value column."""

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = (df[id_col].to_numpy().astype(np.int64) * 2654435761) % 1000000007
        return df

    out = topk_per_key(
        ds.map_batches(add_h, batch_format="pandas"),
        key=key,
        value="__h",
        k=n,
        ascending=True,
        tie=id_col,
        num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda df: df.drop(columns=["__h"]), batch_format="pandas"
    )


def quota_sample(
    ds: ray.data.Dataset,
    key: str,
    quotas: dict[str, int],
    id_col: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Source-mix resampling: keep at most ``quotas[key]`` rows per
    key (keys absent from ``quotas`` are dropped entirely), selected
    by golden-ratio integer-hash order of ``id_col`` — the "rebalance
    the corpus to a target domain mix" curation op (the per-key
    generalization of ``sample_per_key``'s single cap).

    Scale plan: quotas are model-sized (one entry per domain/source),
    shipped in the task closure; the partial per-batch prune caps every
    key at max(quota) rows per block BEFORE the shuffle, and the final
    per-key rank filter runs vectorized in the bucket kernel's output.
    Rows of dropped keys are filtered in the partial pass, so they
    never enter the exchange."""
    if not quotas:
        raise ValueError("quota_sample needs at least one key quota")
    kmax = int(max(quotas.values()))

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[key].isin(quotas)].copy()
        df["__h"] = (
            df[id_col].to_numpy().astype(np.int64) * 2654435761
        ) % 1000000007
        return df

    ranked = topk_per_key(
        ds.map_batches(add_h, batch_format="pandas"),
        key=key,
        value="__h",
        k=kmax,
        ascending=True,
        tie=id_col,
        num_buckets=num_buckets,
    )

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        q = df[key].map(quotas).fillna(0).astype(np.int64)
        return df[df["rank"] <= q].drop(columns=["__h"])

    return ranked.map_batches(cut, batch_format="pandas")


def gap_quantiles(
    ds: ray.data.Dataset,
    q_milli: tuple[int, ...] = (500, 900),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-conversation discrete quantiles of the inter-turn gap (µs
    between consecutive turn_idx) — the grouped-quantile aggregate a
    latency/quality pipeline needs. Exact, not sketched: gaps of one
    conversation co-locate under the standard hash(conv_id) shuffle,
    and the kernel computes order statistics vectorized across every
    conversation in the bucket (one lexsort, no per-conv Python).

    Quantile semantics match DuckDB ``quantile_disc``: the element at
    index ``ceil(q*n) - 1`` of the sorted gaps. The index is computed
    in integer milli-arithmetic — ``ceil(0.9*10)`` in floats is 10,
    not 9. Input pruned to (conv_id, turn_idx, ts); conversations with
    a single turn have no gap and emit no row."""
    from .dedup import prepare_bucket

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # dedup + contiguous conv groups with ascending turn_idx
        g = prepare_bucket(g)
        conv = g["conv_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(g) >= 2:
            same = conv[1:] == conv[:-1]
            gc, gv = conv[1:][same], (ts[1:] - ts[:-1])[same]
        else:
            gc = gv = np.array([], dtype=np.int64)
        if not len(gc):
            # a bucket can hold >= 2 rows yet zero gaps (every conv
            # single-turn): guard on the GAP count, not the row count
            return pd.DataFrame(
                {
                    "conv_id": np.array([], dtype=object),
                    "n_gaps": np.array([], dtype=np.int64),
                    **{
                        f"p{qm // 10}_gap_us": np.array([], dtype=np.int64)
                        for qm in q_milli
                    },
                }
            )
        order = np.lexsort((gv, gc))
        gc, gv = gc[order], gv[order]
        starts = np.flatnonzero(np.concatenate([[True], gc[1:] != gc[:-1]]))
        cnts = np.diff(np.concatenate([starts, [len(gc)]])).astype(np.int64)
        out = {"conv_id": gc[starts], "n_gaps": cnts}
        for qm in q_milli:
            # ceil(q*n) - 1, clamped so q=0 == quantile_disc(0) (min)
            idx = np.maximum(-((-qm * cnts) // 1000) - 1, 0)
            out[f"p{qm // 10}_gap_us"] = gv[starts + idx]
        return pd.DataFrame(out)

    return apply_per_bucket(ds, kernel, num_buckets=num_buckets)


def global_value_quantiles(
    ds: ray.data.Dataset,
    q_milli: tuple[int, ...] = (500, 900, 990),
) -> pd.DataFrame:
    """Exact GLOBAL discrete quantiles of an integer-domain column
    (``cents``) — the shuffle-free order statistic: one streaming pass
    emits per-batch (value, count) partials, a small groupby merges
    them (the shuffle moves at most |distinct values| rows, never
    data), and the quantiles fall out of the cumulative counts with
    the same integer ``ceil(q*n) - 1`` indexing as DuckDB
    ``quantile_disc``. For unbounded/continuous domains the same plan
    runs on binned values with a second pass inside the winning bin;
    the integer-cents domain here needs no second pass."""

    def partial(t: pa.Table) -> pa.Table:
        v = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnt = np.unique(v, return_counts=True)
        return pa.table({"cents": vals, "n": cnt.astype(np.int64)})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cents")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # |distinct values| rows — small by construction
        .sort_values("cents", kind="stable")
        .reset_index(drop=True)
    )
    cum = hist["n"].to_numpy().cumsum()
    total = int(cum[-1]) if len(cum) else 0
    out = {}
    for qm in q_milli:
        k = -((-qm * total) // 1000)  # ceil(q*n), exact integer
        idx = int(np.searchsorted(cum, k, side="left"))
        out[f"p{qm // 10}_cents"] = np.int64(hist["cents"].iloc[idx]) if total else np.int64(0)
    return pd.DataFrame([out])


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
        # metadata-less schema: keeps the shuffle aggregators on their
        # schema-dedup fast path (metadata'd schemas are unhashable)
        return to_clean_arrow(part)

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]
    ).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("count_order", alias_name="count_order"),
    )


def grouping_sets_counts(
    ds: ray.data.Dataset, keys: list[str], sets: list[tuple[str, ...]]
) -> ray.data.Dataset:
    """``GROUP BY GROUPING SETS (...)`` row counts — the shared engine
    under ROLLUP and CUBE: exact counts at every requested subset of
    ``keys``, dropped key columns emitted as NULL (the SQL convention).

    Scale plan: ONE pass over the input — per-batch partial counts,
    one hash groupby at the FINEST level (all ``keys``) — then every
    requested set re-aggregates the finest RESULT (|distinct key
    combos| rows, never the input again); the finest result is
    materialized once and shared. Key columns must be strings (the
    NULL fill is a typed string null).

    NULL input keys are real groups (SQL keeps them): they are
    sentinel-encoded before the shuffle (pandas groupby and Ray's hash
    partitioner both mishandle null keys) and decoded back to typed
    nulls in ``widen``; the grand total (the empty set) therefore
    equals the input row count including null-keyed rows."""
    if not keys:
        raise ValueError("grouping_sets_counts needs at least one key")
    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s!r} not a subset of keys {keys!r}")

    # Record-separator control chars: no real key contains them, and
    # pandas' object-key groupby hashtable truncates trailing NULs, so
    # \x00 is unusable as a sentinel byte.
    _NULL = "\x1e<null>\x1e"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df[keys].copy()
        for k in keys:
            base[k] = base[k].fillna(_NULL)
        base["n"] = np.int64(1)
        return base.groupby(keys, sort=False, as_index=False)["n"].sum()

    finest = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(keys)
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    def widen(kept: tuple[str, ...]):
        # fill dropped key columns with typed nulls; decode the null
        # sentinel in the kept key columns back to real nulls
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                if k in kept:
                    col = t[k]
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    col = pc.cast(col, pa.string())
                    cols[k] = pc.if_else(
                        pc.equal(col, _NULL), pa.nulls(len(t), pa.string()), col
                    )
                else:
                    cols[k] = pa.nulls(len(t), pa.string())
            cols["n"] = t["n"]
            return pa.table(cols)

        return fn

    out = None
    for s in sets:
        if set(s) == set(keys):
            lvl = finest.map_batches(widen(tuple(keys)), batch_format="pyarrow")
        elif s:
            lvl = (
                finest.groupby(list(s))
                .aggregate(Sum("n", alias_name="n"))
                .map_batches(widen(tuple(s)), batch_format="pyarrow")
            )
        else:  # the grand total: empty grouping set
            total = int(finest.sum("n") or 0)
            lvl = ray.data.from_arrow(
                pa.table(
                    {
                        **{k: pa.nulls(1, pa.string()) for k in keys},
                        "n": pa.array([total], pa.int64()),
                    }
                )
            )
        out = lvl if out is None else out.union(lvl)
    return out


def rollup_counts(
    ds: ray.data.Dataset, keys: list[str]
) -> ray.data.Dataset:
    """``GROUP BY ROLLUP (k1, ..., kn)`` row counts: exact counts at
    every prefix level of ``keys`` plus the grand total — the prefix
    grouping sets, on the shared one-input-pass GROUPING SETS plan."""
    if not keys:
        raise ValueError("rollup_counts needs at least one key")
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets_counts(ds, keys, sets)


def cube_counts(ds: ray.data.Dataset, keys: list[str]) -> ray.data.Dataset:
    """``GROUP BY CUBE (k1, ..., kn)`` row counts: exact counts at
    EVERY subset of ``keys`` (2^n grouping sets) on the shared
    one-input-pass plan — the input streams once, every subset
    re-aggregates the materialized finest result. Capped at 4 keys
    (16 sets): a wider cube is 2^n small shuffles of the finest table
    and almost never what an analyst wants — ask for explicit
    GROUPING SETS instead."""
    if not keys:
        raise ValueError("cube_counts needs at least one key")
    if len(keys) > 4:
        raise ValueError(
            f"cube over {len(keys)} keys = {2 ** len(keys)} grouping sets; "
            "capped at 4 — pass explicit sets to grouping_sets_counts"
        )
    sets = [
        tuple(k for k in keys if (mask >> keys.index(k)) & 1)
        for mask in range((1 << len(keys)) - 1, -1, -1)
    ]
    return grouping_sets_counts(ds, keys, sets)


def value_histogram(
    ds: ray.data.Dataset, col: str, bin_width: float
) -> ray.data.Dataset:
    """Fixed-width value histogram (distribution profiling — the
    aggregate behind quality-gate threshold tuning). Output: one row
    per non-empty bin, ``bin = floor(value / bin_width)`` (int64) and
    ``n``. Exact and SQL-checkable: double division + floor is
    bit-identical in numpy and DuckDB. Per-batch partials collapse each
    block to its occupied bins before the shuffle — the exchange moves
    |bins| rows per block, never values."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bins = np.floor(v / bin_width).astype(np.int64)
        b, c = np.unique(bins, return_counts=True)
        return pa.table({"bin": b, "n": c.astype(np.int64)})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )


def pivot_counts(
    ds: ray.data.Dataset, key: str, col: str, values: list[str]
) -> ray.data.Dataset:
    """Wide per-key occurrence counts of each ``values`` member in
    ``col`` (SQL conditional-aggregation pivot: ``sum(CASE WHEN col =
    v THEN 1 END) AS n_v``) — the long->wide reshape for per-conv role
    mixes / per-user event-type profiles. Values outside ``values``
    are ignored. Per-batch partial crosstab before the shuffle: the
    exchange moves |keys-in-block| rows of small-int columns."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame({key: df[key].to_numpy()})
        cv = df[col].to_numpy()
        for v in values:
            base[f"n_{v}"] = (cv == v).astype(np.int64)
        return base.groupby(key, sort=False, as_index=False).sum()

    aggs = [Sum(f"n_{v}", alias_name=f"n_{v}") for v in values]
    return ds.map_batches(partial, batch_format="pandas").groupby(key).aggregate(*aggs)


def segment_revenue_topk(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    segment: str,
    k: int = 10,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Classic three-table analytics (the TPC-H Q3 shape): top-``k``
    orders of one market segment by line-item revenue. Demonstrates
    the engine's cross-table composition — per-row revenue quantized
    to integer micro-units (floor(price·(1-disc)·1e6), identical
    doubles in numpy and SQL) so the per-order sum is
    order-independent integer addition, then:

    1. line items reduce to per-order revenue with per-batch partials
       before ONE order-key groupby (revenue rows, never line items,
       cross the exchange);
    2. the segment's orders survive a distributed SEMI join against
       the filtered customer keys (`equi_join(how="semi")` — the
       customer side is corpus-scale, never broadcast);
    3. revenue joins the surviving orders by key;
    4. a per-block partial top-k prunes to ≤ k rows per block and the
       final ≤ k·blocks rows sort on the driver (bounded by k, not
       the data).
    """
    import pyarrow.compute as _pc

    def rev_partial(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        micro = np.floor(price * (1.0 - disc) * 1e6).astype(np.int64)
        df = pd.DataFrame(
            {"o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False), "r": micro}
        )
        out = df.groupby("o_orderkey", sort=False, as_index=False)["r"].sum()
        from .partition import to_clean_arrow

        return to_clean_arrow(out)

    rev = (
        lineitem.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("r", alias_name="revenue_micro"))
    )

    from .join import equi_join

    seg_keys = customer.filter(
        expr=f"c_mktsegment == '{segment}'"
    ).select_columns(["c_custkey"]).map_batches(
        lambda t: t.rename_columns(["o_custkey"]), batch_format="pyarrow"
    )
    seg_orders = equi_join(
        orders, seg_keys, on="o_custkey", how="semi", num_buckets=num_buckets
    ).select_columns(["o_orderkey", "o_orderdate"])

    joined = equi_join(
        rev, seg_orders, on="o_orderkey", how="inner", num_buckets=num_buckets
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_micro", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(k)

    top = joined.map_batches(prune, batch_format="pandas").to_pandas()
    top = top.sort_values(
        ["revenue_micro", "o_orderkey"], ascending=[False, True], kind="stable"
    ).head(k)
    top["revenue_micro"] = top["revenue_micro"].astype(np.int64)
    return top[["o_orderkey", "o_orderdate", "revenue_micro"]].reset_index(drop=True)


def role_transitions(
    ds: ray.data.Dataset, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Conversation-structure statistics: the corpus's role transition
    counts — how often a ``prev_role`` turn is followed by a ``role``
    turn within a conversation (the Markov view of dialogue shape that
    curriculum balancing and format-drift monitoring read). One
    hash(conv_id) shuffle of (conv, turn, role); per bucket the shared
    dedup+sort pass orders turns, adjacent pairs come from one roll +
    boundary mask, and per-bucket (prev_role, role) partials reduce
    with a |roles|²-row groupby — the second exchange is
    transition-matrix-sized, never the turns.

    Reference analogue: the tracker's state-transition accounting
    (``utils/ClassificationObject.py:105-113`` counts per-class state
    changes before the majority vote)."""
    from .dedup import prepare_bucket

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = prepare_bucket(g)
        if not len(g):
            return pd.DataFrame(
                {
                    "prev_role": np.array([], dtype=object),
                    "role": np.array([], dtype=object),
                    "n": np.array([], dtype=np.int64),
                }
            )
        codes, _ = pd.factorize(g["conv_id"].to_numpy(), sort=False)
        same_conv = np.empty(len(g), dtype=bool)
        same_conv[0] = False
        same_conv[1:] = codes[1:] == codes[:-1]
        role = g["role"].to_numpy()
        prev = np.roll(role, 1)
        out = pd.DataFrame(
            {"prev_role": prev[same_conv], "role": role[same_conv], "n": np.int64(1)}
        )
        return out.groupby(["prev_role", "role"], sort=False, as_index=False)["n"].sum()

    partials = apply_per_bucket(ds, kernel, num_buckets=num_buckets)
    return partials.groupby(["prev_role", "role"]).aggregate(
        Sum("n", alias_name="n")
    )


def local_supplier_volume(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    customer: ray.data.Dataset,
    supplier: ray.data.Dataset,
    nation: pd.DataFrame,
    region: pd.DataFrame,
    region_name: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    num_buckets: int | None = None,
    supplier_broadcast_cap: int = 5_000_000,
) -> pd.DataFrame:
    """Six-table analytics (the TPC-H Q5 shape): per-nation revenue
    from line items where the customer and the supplier share a nation
    inside one region, over one order-date year. The relational
    stress test for the join stack — two corpus-scale fact joins plus
    two dimension lookups in one plan:

    1. nation x region are constant-size (25 x 5 rows) and reduce on
       the driver to the region's nation-key set + name map;
    2. customers prefilter to those nations via a broadcast set lookup
       (``c_nationkey = s_nationkey`` with suppliers in-region implies
       customers in-region, so the prefilter is a pure optimization)
       and project to (c_custkey, c_nationkey);
    3. date-ranged orders inner-``equi_join`` the customer keys on
       o_custkey — one hash exchange of (orderkey, custkey, nationkey)
       int rows;
    4. line items project to (l_orderkey, l_suppkey, revenue_micro)
       where revenue is quantized to integer micro-units
       (floor(price*(1-disc)*1e6), bitwise-identical in numpy and SQL)
       and join the region's suppliers on l_suppkey — broadcast lookup
       while the filtered supplier side is under
       ``supplier_broadcast_cap`` rows, distributed ``equi_join``
       past it (count-gated, the corpus-scale path);
    5. the annotated line rows join the order side on o_orderkey,
       keep c_nationkey == s_nationkey, and collapse through per-batch
       (nationkey, revenue) partials into a 25-row groupby.

    Only integer-projected fact rows ever cross an exchange; the
    result is nations-sized. Reference analogue: the multi-source
    correlation the helmet project does across model outputs
    (``projects/helmet/helmet_project.py:25-55``), here as the generic
    N-table form."""
    from .join import broadcast_join, equi_join

    rkey = region.loc[region["r_name"] == region_name, "r_regionkey"]
    nat = nation[nation["n_regionkey"].isin(rkey.to_numpy())]
    nation_keys = nat["n_nationkey"].to_numpy(np.int64)
    name_of = dict(zip(nat["n_nationkey"].to_numpy(), nat["n_name"]))
    keys_ref = ray.put(frozenset(int(k) for k in nation_keys))

    def cust_prune(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, np.fromiter(keys, dtype=np.int64))
        return pa.table(
            {
                "o_custkey": pa.array(
                    t["c_custkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "c_nationkey": pa.array(nk[keep], pa.int64()),
            }
        )

    cust = customer.map_batches(cust_prune, batch_format="pyarrow")
    lo = np.datetime64(date_lo, "us").astype(np.int64)
    hi = np.datetime64(date_hi, "us").astype(np.int64)

    def date_prune(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        us = d.astype(np.int64)
        return t.select(["o_orderkey", "o_custkey"]).filter(
            pa.array((us >= lo) & (us < hi))
        )

    orders_pruned = orders.select_columns(
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(date_prune, batch_format="pyarrow")
    # same count-gated hybrid as the supplier side: the region's
    # customers are dimension-shaped until the corpus says otherwise;
    # broadcast keeps the orders side LAZY (no schema-resolution
    # materialization, no shuffle), the distributed join is the
    # corpus-scale fallback. Metadata-only count on the raw read.
    if customer.count() <= supplier_broadcast_cap:
        ord_side = broadcast_join(orders_pruned, cust, on="o_custkey", how="inner")
    else:
        ord_side = equi_join(
            orders_pruned, cust, on="o_custkey", how="inner",
            num_buckets=num_buckets,
        )
    ord_side = ord_side.select_columns(["o_orderkey", "c_nationkey"])

    def supp_prune(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        nk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(nk, np.fromiter(keys, dtype=np.int64))
        return pa.table(
            {
                "l_suppkey": pa.array(
                    t["s_suppkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "s_nationkey": pa.array(nk[keep], pa.int64()),
            }
        )

    # count-gate on the RAW table: for a pure parquet read this is a
    # metadata-only count (no execution), and it upper-bounds the
    # pruned side — the broadcast decision never runs the prune twice
    supplier_rows = supplier.count()
    supp = supplier.map_batches(supp_prune, batch_format="pyarrow")

    def line_project(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        micro = np.floor(price * (1.0 - disc) * 1e6).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    t["l_orderkey"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "l_suppkey": pa.array(
                    t["l_suppkey"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "rev_micro": pa.array(micro, pa.int64()),
            }
        )

    lines = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(line_project, batch_format="pyarrow")

    if supplier_rows <= supplier_broadcast_cap:
        lines_s = broadcast_join(lines, supp, on="l_suppkey", how="inner")
    else:  # corpus-scale supplier table: distributed hash join
        lines_s = equi_join(
            lines, supp, on="l_suppkey", how="inner", num_buckets=num_buckets
        )

    joined = equi_join(
        lines_s.select_columns(["o_orderkey", "s_nationkey", "rev_micro"]),
        ord_side,
        on="o_orderkey",
        how="inner",
        num_buckets=num_buckets,
    )

    def nat_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["s_nationkey"] == df["c_nationkey"]]
        out = (
            pd.DataFrame(
                {
                    "nationkey": m["s_nationkey"].to_numpy(np.int64),
                    "r": m["rev_micro"].to_numpy(np.int64),
                }
            )
            .groupby("nationkey", sort=False, as_index=False)["r"]
            .sum()
        )
        return out

    per_nation = (
        joined.map_batches(nat_partial, batch_format="pandas")
        .groupby("nationkey")
        .aggregate(Sum("r", alias_name="revenue_micro"))
        .to_pandas()
    )
    per_nation["n_name"] = per_nation["nationkey"].map(name_of)
    per_nation["revenue_micro"] = per_nation["revenue_micro"].astype(np.int64)
    return (
        per_nation[["n_name", "revenue_micro"]]
        .sort_values(["revenue_micro", "n_name"], ascending=[False, True])
        .reset_index(drop=True)
    )


def promo_revenue_share(
    lineitem: ray.data.Dataset,
    part: ray.data.Dataset,
    promo_type: str = "PROMO",
    num_buckets: int | None = None,
    part_broadcast_cap: int = 5_000_000,
) -> ray.data.Dataset:
    """Two-table revenue-mix analytics (the TPC-H Q14 shape): per
    ship-calendar-month, revenue from promo-typed parts alongside
    total revenue. Revenue is quantized to integer micro-units
    (floor(price*(1-disc)*1e6)) so both sums are order-independent
    integer addition and the gate is exact.

    Plan: the part table reduces to (l_partkey, is_promo) int pairs —
    broadcast lookup under ``part_broadcast_cap`` rows, distributed
    ``equi_join`` past it (count-gated, same hybrid as
    ``local_supplier_volume``); annotated line rows collapse through
    per-batch (month, promo, total) partials into a months-sized
    groupby. Reference analogue: the per-class vs total detection-rate
    mix the harvest loop tracks per interval
    (``services/harvest_service.py:198-232``)."""
    from ray.data.aggregate import Sum

    from .join import broadcast_join, equi_join

    def part_prune(t: pa.Table) -> pa.Table:
        types = np.asarray(t["p_type"].to_pylist(), dtype=object)
        return pa.table(
            {
                "l_partkey": pa.array(
                    t["p_partkey"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "is_promo": pa.array(
                    (types == promo_type).astype(np.int64), pa.int64()
                ),
            }
        )

    # metadata-only count on the raw read; upper-bounds the pruned side
    part_rows = part.count()
    pkeys = part.map_batches(part_prune, batch_format="pyarrow")

    def line_project(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        micro = np.floor(price * (1.0 - disc) * 1e6).astype(np.int64)
        month = (
            t["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[M]")
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "l_partkey": pa.array(
                    t["l_partkey"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "month_us": pa.array(month, pa.int64()),
                "rev_micro": pa.array(micro, pa.int64()),
            }
        )

    lines = lineitem.select_columns(
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(line_project, batch_format="pyarrow")

    if part_rows <= part_broadcast_cap:
        annotated = broadcast_join(lines, pkeys, on="l_partkey", how="inner")
    else:  # corpus-scale part table: distributed hash join
        annotated = equi_join(
            lines, pkeys, on="l_partkey", how="inner", num_buckets=num_buckets
        )

    def month_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["rev_micro"].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "month_us": df["month_us"].to_numpy(np.int64),
                "promo_micro": rev * df["is_promo"].to_numpy(np.int64),
                "total_micro": rev,
            }
        )
        return out.groupby("month_us", sort=False, as_index=False).sum()

    red = (
        annotated.map_batches(month_partial, batch_format="pandas")
        .groupby("month_us")
        .aggregate(
            Sum("promo_micro", alias_name="promo_micro"),
            Sum("total_micro", alias_name="total_micro"),
        )
    )

    def widen(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "month": df["month_us"].to_numpy(np.int64).astype("datetime64[us]"),
                "promo_micro": df["promo_micro"].to_numpy(np.int64),
                "total_micro": df["total_micro"].to_numpy(np.int64),
            }
        )

    return red.map_batches(widen, batch_format="pandas")


def late_order_counts(
    lineitem: ray.data.Dataset,
    orders: ray.data.Dataset,
    late_days: int = 90,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Existential-quantifier analytics (the TPC-H Q4 shape): orders
    per priority class having AT LEAST ONE line item shipped more than
    ``late_days`` after the order date. The predicate couples both
    tables (l_shipdate vs o_orderdate), so unlike A4's key-only semi
    join the existence test runs after one key join:

    1. line items project to (l_orderkey, ship_us) ints; orders to
       (o_orderkey, order_us, o_orderpriority);
    2. ONE distributed inner ``equi_join`` on the order key;
    3. late rows filter per batch, then collapse to DISTINCT
       (o_orderkey, o_orderpriority) pairs — per-batch dedup partials
       first, one keyed groupby for the global distinct (the exchange
       moves at most one row per late order per block);
    4. a priorities-sized count reduction.

    Reference analogue: A4's "any detection matched" gate
    (``condition.py:38-48``) with a cross-record time predicate."""
    from ray.data.aggregate import Sum

    def line_project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pa.array(
                    t["l_orderkey"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "ship_us": pa.array(
                    t["l_shipdate"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def order_project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pa.array(
                    t["o_orderkey"].to_numpy(zero_copy_only=False), pa.int64()
                ),
                "order_us": pa.array(
                    t["o_orderdate"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[us]")
                    .astype(np.int64),
                    pa.int64(),
                ),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    from .join import equi_join

    joined = equi_join(
        lineitem.select_columns(["l_orderkey", "l_shipdate"]).map_batches(
            line_project, batch_format="pyarrow"
        ),
        orders.select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(order_project, batch_format="pyarrow"),
        on="o_orderkey",
        how="inner",
        num_buckets=num_buckets,
    )
    late_us = np.int64(late_days) * 86400_000_000

    def late_distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[
            df["ship_us"].to_numpy(np.int64)
            > df["order_us"].to_numpy(np.int64) + late_us
        ]
        return m[["o_orderkey", "o_orderpriority"]].drop_duplicates()

    late_pairs = joined.map_batches(late_distinct_partial, batch_format="pandas")

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates()
        return (
            u.assign(n_orders=np.int64(1))
            .groupby("o_orderpriority", sort=False, as_index=False)["n_orders"]
            .sum()
        )

    partials = apply_per_bucket(
        late_pairs, bucket_distinct, key="o_orderkey", num_buckets=num_buckets
    )
    return partials.groupby("o_orderpriority").aggregate(
        Sum("n_orders", alias_name="n_orders")
    )


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str],
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Column profiler — per column: row count, null count, exact
    distinct count, lexicographic min/max of the VARCHAR rendering
    (one uniform output schema across mixed column types; the string
    rendering of int64 matches SQL's CAST(... AS VARCHAR)). The
    "what's in this table" health check run before any corpus job.

    Scale plan: two streamed passes. Pass 1 collapses every block to
    one |columns|-row partial (n / n_null / min / max) reduced by a
    |columns|-row groupby. Pass 2 reuses ``distinct_per_key`` over
    within-batch-deduped (col, value) pairs — the exchange moves
    distinct pairs only. Profile FREE-TEXT columns via their
    fingerprint (stages/text.fingerprint_docs), not raw values: the
    distinct exchange ships each distinct value string once."""
    from ray.data.aggregate import Max, Min, Sum

    cols = list(columns)

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            vs = s.dropna().astype(str)
            rows.append(
                {
                    "col": c,
                    "n": np.int64(len(s)),
                    "n_null": np.int64(s.isna().sum()),
                    "min_str": vs.min() if len(vs) else None,
                    "max_str": vs.max() if len(vs) else None,
                }
            )
        return pd.DataFrame(rows)

    stats = (
        ds.map_batches(stats_partial, batch_format="pandas")
        .groupby("col")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_str", alias_name="min_str"),
            Max("max_str", alias_name="max_str"),
        )
        .to_pandas()  # |columns| rows: bounded by the schema, not data
    )

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        outs = [
            pd.DataFrame(
                {"col": c, "value": df[c].dropna().astype(str).unique()}
            )
            for c in cols
        ]
        return pd.concat(outs, ignore_index=True)

    dist = distinct_per_key(
        ds.map_batches(melt, batch_format="pandas"),
        key="col",
        value="value",
        num_buckets=num_buckets,
    ).to_pandas()  # |columns| rows

    out = stats.merge(dist, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype(np.int64)
    return out.sort_values("col", kind="stable").reset_index(drop=True)


def key_skew_stats(
    ds: ray.data.Dataset,
    key: str,
    num_buckets: int = 16,
    hash_buckets: int | None = None,
) -> pd.DataFrame:
    """Shuffle-skew diagnostics for a partition key: per hash bucket,
    total rows, distinct keys, and the hottest key with its row count
    — the pre-flight check that decides whether a key needs salting
    (stages/windows.session_windows_salted and friends) before a
    100 TB shuffle pins one straggler partition.

    The reported bucket is the SQL-replayable md5-60bit hash mod
    ``num_buckets`` (the engine's internal shuffle hash differs, but
    any uniform hash yields the same skew statistics for diagnosis;
    the hot KEYS themselves are hash-independent). Scale plan: exact
    per-key counts via per-batch partials + one key-scale exchange;
    a second (key-count-scale) exchange co-locates md5-buckets and one
    fused kernel emits totals, key counts and the per-bucket argmax —
    the raw input never shuffles."""
    from .partition import md5_mod

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key, sort=False, as_index=False)["n"].sum()
        out["skew_bucket"] = md5_mod(out[key].astype(str), num_buckets)
        out["n"] = out["n"].astype(np.int64)
        return out

    per_key = apply_per_bucket(
        ds.map_batches(partial, batch_format="pandas"),
        kernel,
        key=key,
        num_buckets=hash_buckets,
    )

    def bucket_kernel(g: pd.DataFrame) -> pd.DataFrame:
        # whole md5-buckets are co-located here, so one pass yields
        # totals, key counts and the per-bucket argmax exactly
        g = g.sort_values(
            ["skew_bucket", "n", key], ascending=[True, False, True],
            kind="stable",
        )
        hot = g.drop_duplicates(subset=["skew_bucket"], keep="first")
        agg = g.groupby("skew_bucket", sort=False, as_index=False).agg(
            n_rows=("n", "sum"), n_keys=("n", "size")
        )
        out = agg.merge(
            hot.rename(columns={key: "hot_key", "n": "hot_rows"})[
                ["skew_bucket", "hot_key", "hot_rows"]
            ],
            on="skew_bucket",
        ).rename(columns={"skew_bucket": "bucket"})
        for c in ("bucket", "n_rows", "n_keys", "hot_rows"):
            out[c] = out[c].astype(np.int64)
        return out[["bucket", "n_rows", "n_keys", "hot_key", "hot_rows"]]

    stats = apply_per_bucket(
        per_key, bucket_kernel, key="skew_bucket", num_buckets=hash_buckets
    ).to_pandas()  # <= num_buckets rows: bounded by config, not data
    return stats.sort_values("bucket", kind="stable").reset_index(drop=True)


def winsorize_per_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    p_lo_milli: int = 50,
    p_hi_milli: int = 950,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-key winsorization: clip ``value`` at the key's discrete
    [p_lo, p_hi] quantiles — the outlier-taming pre-pass for
    length/score features before thresholds are tuned on them
    (a handful of megadocs otherwise drag every percentile gate).

    Quantile semantics match DuckDB ``quantile_disc`` exactly: the
    element at index ``ceil(q·n) - 1`` of the key's sorted values,
    with the index computed in integer milli-arithmetic (the
    gap_quantiles discipline). One hash(key) exchange co-locates each
    key; the kernel computes thresholds and clips vectorized across
    all keys in the bucket (one lexsort, no per-key Python)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value].to_numpy(np.int64)
        codes, _ = pd.factorize(g[key].to_numpy(), sort=False)
        order = np.lexsort((v, codes))
        cs, vs = codes[order], v[order]
        n = len(g)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = cs[1:] != cs[:-1]
        starts = np.nonzero(new_grp)[0]
        counts = np.diff(np.append(starts, n))
        # ceil(q*n) - 1 in integer milli units, clamped at the group
        # start so q=0 returns the group MIN (DuckDB quantile_disc(0))
        # instead of indexing into the previous group
        lo_idx = starts + np.maximum((p_lo_milli * counts + 999) // 1000 - 1, 0)
        hi_idx = starts + np.maximum((p_hi_milli * counts + 999) // 1000 - 1, 0)
        grp_of = np.cumsum(new_grp) - 1  # per sorted row
        lo = vs[lo_idx][grp_of]
        hi = vs[hi_idx][grp_of]
        clipped = np.minimum(np.maximum(vs, lo), hi)
        out = g.iloc[order].copy()
        out[f"{value}_wins"] = clipped.astype(np.int64)
        return out

    return apply_per_bucket(ds, kernel, key=key, num_buckets=num_buckets)


def value_quantiles_per_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    q_milli: tuple[int, ...] = (500, 900),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact per-key discrete quantiles of an integer column — the
    generic form of ``gap_quantiles`` (any key, any pre-computed
    value; e.g. per-TOOL response-latency p50/p90 from the pair
    channel). quantile_disc semantics: element at ceil(q·n)−1, index
    in integer milli arithmetic. One hash(key) exchange; the kernel
    is one lexsort across every key in the bucket."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy()
        v = g[value].to_numpy(np.int64)
        if not len(k):
            return pd.DataFrame(
                {
                    key: np.array([], dtype=object),
                    "n": np.array([], dtype=np.int64),
                    **{
                        f"p{qm // 10}_{value}": np.array([], dtype=np.int64)
                        for qm in q_milli
                    },
                }
            )
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        cnts = np.diff(np.concatenate([starts, [len(k)]])).astype(np.int64)
        out = {key: k[starts], "n": cnts}
        for qm in q_milli:
            # ceil(q*n) - 1, clamped so q=0 == quantile_disc(0) (min)
            idx = np.maximum(-((-qm * cnts) // 1000) - 1, 0)
            out[f"p{qm // 10}_{value}"] = v[starts + idx]
        return pd.DataFrame(out)

    return apply_per_bucket(ds, kernel, key=key, num_buckets=num_buckets)
