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

import numpy as np
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


_JSIDE = "__join_side"


# Above this many distinct keys the prefilter key set would strain the
# driver/broadcast — skip the prefilter (correctness is unaffected).
PREFILTER_KEY_CAP = 2_000_000


def _iter_done(refs: list):
    """Yield task results in completion order — drives the early-abort
    loop below without waiting for stragglers the cap may make
    irrelevant."""
    while refs:
        done, refs = ray.wait(refs, num_returns=1)
        yield ray.get(done[0])


@ray.remote
def _distinct_partial_task(blk: pa.Table, on_keys: list[str]) -> pd.DataFrame:
    """Per-block distinct-key partial for the raw-task prefilter path
    (runs colocated with the block; only the deduped key tuples travel
    to the driver)."""
    if blk.num_columns == 0:  # to_arrow_refs can yield zero-column blocks
        return pd.DataFrame({k: pd.Series(dtype=object) for k in on_keys})
    d = blk.select(on_keys).to_pandas().drop_duplicates()
    return d[~d[on_keys].isna().any(axis=1)]


def _distinct_keys(
    ds: ray.data.Dataset, on_keys: list[str], cap: int
) -> pd.DataFrame | None:
    """Distinct join-key tuples of a side (per-batch dedup partials,
    streamed to the driver with incremental dedup and an EARLY ABORT —
    the cap protects the driver during collection, not after it).
    Returns None when the set exceeds ``cap``. Null-keyed rows are
    excluded from the set (``_semi_filter`` passes them through
    unconditionally, so they never affect the output).

    A MATERIALIZED side (which every schema-resolved derived input is —
    see asof._fields_resolved) skips the Dataset execution entirely:
    raw tasks over its cached block refs compute the partials, avoiding
    the 0.6-3.2 s fixed executor cost a map_batches pass pays per run
    (the same measured trade as the streaming route path)."""
    import warnings

    from ray.data.dataset import MaterializedDataset

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[on_keys].drop_duplicates()
        return d[~d[on_keys].isna().any(axis=1)]

    def too_many() -> None:
        warnings.warn(
            f"equi_join prefilter skipped: distinct keys exceed cap {cap}"
        )

    # Amortized collection: buffer pre-deduped batches and only run the
    # global drop_duplicates when the buffered row count doubles past
    # the last deduped size (O(n log n) total instead of O(batches * n)
    # re-dedup per batch as the set approaches the cap).
    deduped: pd.DataFrame | None = None
    pending: list[pd.DataFrame] = []
    pending_rows = 0

    def merge() -> pd.DataFrame:
        nonlocal deduped, pending, pending_rows
        parts = ([deduped] if deduped is not None else []) + pending
        deduped = pd.concat(parts, ignore_index=True).drop_duplicates()
        pending, pending_rows = [], 0
        return deduped

    if isinstance(ds, MaterializedDataset):
        # stream partials back in completion order (early abort intact)
        batches = _iter_done(
            [_distinct_partial_task.remote(r, on_keys) for r in ds.to_arrow_refs()]
        )
    else:
        batches = ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_format="pandas", batch_size=None
        )
    for b in batches:
        # start from the first TYPED batch (concat with an empty
        # object-dtype frame trips pandas' all-NA deprecation)
        if len(b):
            pending.append(b)
            pending_rows += len(b)
        base = len(deduped) if deduped is not None else 0
        if pending_rows >= max(base, 1024) and len(merge()) > cap:
            too_many()
            return None
    if pending:
        merge()
    if deduped is not None and len(deduped) > cap:
        too_many()
        return None
    if deduped is None:
        deduped = pd.DataFrame({k: pd.Series(dtype=object) for k in on_keys})
    return deduped.reset_index(drop=True)


def _semi_filter(
    ds: ray.data.Dataset, keys: pd.DataFrame, on_keys: list[str]
) -> ray.data.Dataset:
    """Broadcast semi-join pushdown: drop rows whose join key cannot
    match (the bloom-filter pattern, exact — the key set is broadcast
    once via ``ray.put``). Null-keyed rows pass through UNCONDITIONALLY
    (a superset filter is always output-safe: extra rows just reach the
    bucket kernel, whose pandas merge is the single source of truth for
    null-key semantics — and ``np.isin`` over object arrays containing
    None would raise)."""
    import ray as _ray

    ref = _ray.put(keys)

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        ks = _ray.get(ref)
        null_mask = df[on_keys].isna().any(axis=1).to_numpy()
        sub = df[~null_mask]
        if len(on_keys) == 1:
            k = on_keys[0]
            hit = np.isin(sub[k].to_numpy(), ks[k].to_numpy())
        else:
            m = sub[on_keys].merge(ks.assign(__hit=1), on=on_keys, how="left")
            hit = m["__hit"].notna().to_numpy()
        keep = null_mask.copy()
        keep[~null_mask] = hit
        return df[keep]

    return ds.map_batches(filt, batch_format="pandas")


def equi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | list[str],
    how: str = "inner",
    num_buckets: int | None = None,
    prefilter: str | None = None,
    prefilter_cap: int = PREFILTER_KEY_CAP,
    left_fields: "pa.Schema | list[tuple[str, pa.DataType]] | None" = None,
    right_fields: "pa.Schema | list[tuple[str, pa.DataType]] | None" = None,
) -> ray.data.Dataset:
    """Generic distributed equi-join — the user-facing form of the J3
    correlation machinery (``tool_join`` is this plan specialized to
    call/response pairing).

    Physical plan: both sides are tagged and widened to the union
    schema, co-located with ONE hash shuffle on the join key(s) via the
    shared bucket primitive, and each bucket runs a vectorized pandas
    merge. Nothing crosses buckets: correctness only needs all rows of
    a key in one bucket. Broadcast-join the small side manually
    (``ray.put`` + lookup in ``map_batches``) when one side fits in
    memory — this operator is for two BIG sides.

    ``how``: "inner" | "left" | "outer" | "semi" | "anti" (semi/anti
    return left columns only — the A3/A4 existential/universal
    quantifier as a generic operator; "outer" is the FULL outer join —
    unmatched rows of BOTH sides survive with typed nulls, so
    ``prefilter`` is rejected there). Non-key columns of the two sides must be
    disjoint (pre-rename the right side). Precision guard (same as
    ``stages.asof``): synthetic widening fills for integer columns are
    zeros, never typed nulls (which would land in pandas as float64 and
    corrupt int64 ids above 2^53) — the fills are never observed, each
    kernel selects only the columns belonging to a row's own side; for
    ``how="left"`` the unmatched right integer columns come back as
    pandas nullable Int* for the same reason.

    ``prefilter``: semi-join pushdown — collect the distinct key set of
    the named side ("left" or "right") and drop the OTHER side's rows
    whose keys cannot match BEFORE the shuffle (the runtime-filter /
    bloom-filter pattern, exact). On selective joins this is the
    difference between shuffling a table and shuffling its matching
    subset. Sided correctness: "left" (filters right) is valid for
    every ``how`` — right rows with no left partner influence no
    output; "right" (filters left) only for "inner"/"semi", because
    left rows WITHOUT a right partner are exactly what "left"/"anti"
    must keep. Skipped with a warning past ``prefilter_cap`` distinct
    keys (output unaffected either way).

    ``left_fields`` / ``right_fields``: optional schema hints (a
    ``pa.Schema`` or ``[(name, pa.DataType), ...]``). A derived side
    with no statically-known schema is otherwise MATERIALIZED just to
    resolve its fields (asof._fields_resolved) — one extra Dataset
    execution whose ~1-3 s fixed cost dominates small inputs. A hinted
    side stays lazy and fuses into the final join execution. The hint
    is a contract: batches of that side must contain exactly the
    hinted columns (checked at runtime in the widen stage — a wrong
    hint raises instead of silently filling). The prefilter side still
    materializes when hinted lazy — its keys are consumed twice."""
    from .asof import _arrow_type, _fields_resolved, _nullable_int_name

    def _as_fields(f) -> list[tuple[str, pa.DataType]]:
        if isinstance(f, pa.Schema):
            return [(n, _arrow_type(t)) for n, t in zip(f.names, f.types)]
        return [(n, _arrow_type(t)) for n, t in f]

    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if prefilter not in (None, "left", "right"):
        raise ValueError(f"unsupported prefilter={prefilter!r}")
    if prefilter is not None and how == "outer":
        raise ValueError(
            'prefilter would drop unmatched rows a FULL outer join must keep'
        )
    if prefilter == "right" and how in ("left", "anti"):
        raise ValueError(
            f'prefilter="right" would drop the unmatched left rows '
            f"how={how!r} must keep"
        )
    on_keys = [on] if isinstance(on, str) else list(on)
    if left_fields is not None and prefilter != "left":
        lf = _as_fields(left_fields)
    else:
        left, lf = _fields_resolved(left)
    if right_fields is not None and prefilter != "right":
        rf = _as_fields(right_fields)
    else:
        right, rf = _fields_resolved(right)
    l_names = [n for n, _ in lf]
    r_names = [n for n, _ in rf]
    missing = [k for k in on_keys if k not in l_names or k not in r_names]
    if missing:
        raise ValueError(f"join key(s) missing from a side: {missing}")
    if prefilter is not None:
        keys = _distinct_keys(
            left if prefilter == "left" else right, on_keys, prefilter_cap
        )
        if keys is not None:
            if prefilter == "left":
                right = _semi_filter(right, keys, on_keys)
            else:
                left = _semi_filter(left, keys, on_keys)
    r_value = [(n, t) for n, t in rf if n not in on_keys]
    overlap = {n for n, _ in r_value} & set(l_names)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")
    all_fields = lf + r_value
    r_value_names = [n for n, _ in r_value]
    r_int_value = {
        n: _nullable_int_name(t.to_pandas_dtype())
        for n, t in r_value
        if pa.types.is_integer(t)
    }
    l_int_value = {
        n: _nullable_int_name(t.to_pandas_dtype())
        for n, t in lf
        if n not in on_keys and pa.types.is_integer(t)
    }

    # own-column check applies only to HINTED sides: a wrong hint must
    # raise, not synth-fill. Unhinted sides keep the permissive fill —
    # a unified schema legitimately leaves some blocks short a column.
    side_names = (l_names, on_keys + r_value_names)
    side_checked = (left_fields is not None, right_fields is not None)

    def widen(side: int):
        own = side_names[side] if side_checked[side] else ()

        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            absent = [c for c in own if c not in t.column_names]
            if absent:
                raise ValueError(
                    f"equi_join schema hint mismatch: side {side} batch "
                    f"lacks hinted column(s) {absent}"
                )
            cols = {}
            for name, typ in all_fields:
                if name in t.column_names:
                    cols[name] = t[name]
                elif pa.types.is_integer(typ):
                    cols[name] = pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()))
                else:
                    cols[name] = pa.nulls(n, typ)
            cols[_JSIDE] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    u = left.map_batches(widen(0), batch_format="pyarrow").union(
        right.map_batches(widen(1), batch_format="pyarrow")
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g[_JSIDE].to_numpy() == 0
        l = g[lmask][l_names]
        r = g[~lmask][on_keys + r_value_names]
        if how == "inner":
            return l.merge(r, on=on_keys, how="inner")
        if how in ("semi", "anti"):
            keys = r[on_keys].drop_duplicates()
            m = l.merge(keys, on=on_keys, how="left", indicator=True)
            keep = m["_merge"] == ("both" if how == "semi" else "left_only")
            return m[keep].drop(columns=["_merge"])
        # nullable Int* BEFORE the merge: converting after would let the
        # unmatched-row NaNs widen the column to float64 first, rounding
        # int64 values above 2^53 (the asof precision bug, same fix)
        if r_int_value:
            r = r.assign(**{n: r[n].astype(ext) for n, ext in r_int_value.items()})
        if how == "outer":
            # FULL outer: unmatched RIGHT rows null out left value
            # columns too — same nullable-Int guard on the left side
            if l_int_value:
                l = l.assign(
                    **{n: l[n].astype(ext) for n, ext in l_int_value.items()}
                )
            return l.merge(r, on=on_keys, how="outer")
        return l.merge(r, on=on_keys, how="left")

    return apply_per_bucket(u, kernel, key=on_keys, num_buckets=num_buckets)


def broadcast_join(
    big: ray.data.Dataset,
    small: "pd.DataFrame | ray.data.Dataset",
    on: str | list[str],
    how: str = "inner",
) -> ray.data.Dataset:
    """Equi-join where one side fits in memory: the small side is put
    in the object store ONCE (``ray.put``) and every batch of the big
    side merges against it inside ``map_batches`` — NO shuffle of the
    big side at all (J1 class-map broadcast generalized; the plan to
    prefer over ``equi_join`` whenever the small side fits a worker).
    Same semantics and int64-safety as ``equi_join``; ``how`` in
    {"inner", "left", "semi", "anti"}."""
    from .asof import _nullable_int_name

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if hasattr(small, "to_pandas"):
        small = small.to_pandas()
    on_keys = [on] if isinstance(on, str) else list(on)
    small = small.reset_index(drop=True)
    if how == "left":
        ints = {
            c: _nullable_int_name(small[c].dtype)
            for c in small.columns
            if c not in on_keys and small[c].dtype.kind in "iu"
        }
        if ints:
            small = small.assign(**{c: small[c].astype(e) for c, e in ints.items()})
    elif how in ("semi", "anti"):
        small = small[on_keys].drop_duplicates()
    ref = ray.put(small)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        if how in ("semi", "anti"):
            m = df.merge(s, on=on_keys, how="left", indicator=True)
            keep = m["_merge"] == ("both" if how == "semi" else "left_only")
            return m[keep].drop(columns=["_merge"])
        return df.merge(s, on=on_keys, how=how)

    return big.map_batches(fn, batch_format="pandas")


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
