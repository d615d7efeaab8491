"""Generic as-of join — a custom operator Ray Data lacks natively.

The reference correlates each detection with the *latest preceding*
state of its tracked object (SURVEY §2 J4: track-id correlation over
time, ``projects/base_project.py`` frame loop); the engine's general
form is the as-of join: every left row matches the single right row
with the greatest ``on`` value ≤ the left row's (per ``by`` key) —
the attribution / point-in-time-lookup join of event pipelines.

Physical plan (the partitioning assumption, per the build brief): both
sides are tagged and unioned, then co-located with ONE hash shuffle on
``by`` via the shared bucket primitive; within a bucket the match is
``pandas.merge_asof`` (a vectorized C merge over both sides sorted by
``on``). Nothing crosses buckets: correctness only needs all rows of a
``by`` key in one bucket. Skew: ``asof_join_salted`` range-chunks
``on`` with boundary carry (same recipe as
``windows.session_windows_salted``) so a hot key spreads over many
buckets; output is identical (metamorphic-tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .partition import apply_per_bucket

_SIDE = "__asof_side"
_MATCH = "__asof_match"


def _na_like(like: pd.Series, index) -> pd.Series:
    """All-NA column that keeps ``like``'s dtype (datetime64 → NaT,
    float → NaN, object → None) so a later ``pd.concat`` never sees an
    untyped all-None object column."""
    return like.iloc[:0].reindex(index)


def _nullable_int_name(dt) -> str:
    """numpy int dtype → pandas nullable extension name (int64 →
    'Int64', uint32 → 'UInt32')."""
    return np.dtype(dt).name.replace("uint", "UInt").replace("int", "Int")


def _arrow_type(t) -> pa.DataType:
    """Normalize a Ray schema entry to a pyarrow DataType. Pandas-block
    datasets (e.g. ``from_pandas`` with an object column) report numpy
    dtypes / Python types instead of Arrow types."""
    if isinstance(t, pa.DataType):
        return t
    if t is object or np.dtype(t) == np.dtype("O"):
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(t))


def _fields_resolved(
    ds: ray.data.Dataset,
) -> tuple[ray.data.Dataset, list[tuple[str, pa.DataType]]]:
    """Schema of a possibly-lazy dataset WITHOUT paying for its plan
    twice. A plain ``ds.schema()`` on a plan whose schema isn't
    statically known (anything downstream of a ``map_batches``)
    executes the whole upstream lineage just to peek at the first
    block — and the later real run executes it all AGAIN, doubling the
    cost of every join whose input is a derived dataset. When the
    schema is unknown we ``materialize()`` instead: the one execution
    is cached in the object store (spillable) and the returned handle
    feeds downstream stages, so nothing runs twice. Inputs with
    statically-known schemas (parquet reads + expression ops) stay
    fully lazy/streaming."""
    sch = ds.schema(fetch_if_missing=False)
    if sch is None:
        ds = ds.materialize()
        sch = ds.schema()
    return ds, [(n, _arrow_type(t)) for n, t in zip(sch.names, sch.types)]


def _widened_union(
    left: ray.data.Dataset, right: ray.data.Dataset, by: str, on: str
) -> tuple[ray.data.Dataset, list[str], list[str], dict]:
    """Tag each side, widen both to the union schema, and union.
    Returns (dataset, left column names, right value column names,
    {int col: original numpy dtype} for post-join restore).

    Two precision/correctness guards live here:

    - Synthetic nulls for the OTHER side's integer columns are filled
      with 0 instead of typed nulls: an Arrow int column with nulls
      lands in pandas as float64, silently corrupting int64 values
      above 2^53 (snowflake-style ids). The fills are never observed —
      each kernel selects only the columns belonging to a row's own
      side. Non-integer columns keep typed nulls.
    - Every right row carries ``_MATCH = 1`` (left rows 0): inner-match
      detection after ``merge_asof`` filters on this guaranteed
      non-null marker instead of ``dropna`` on the first right value
      column, which crashed when the right side had only (by, on)
      columns and silently dropped matches whose first value column
      held legitimate nulls."""
    left, lf = _fields_resolved(left)
    right, rf = _fields_resolved(right)
    l_names = [n for n, _ in lf]
    r_value = [(n, t) for n, t in rf if n not in (by, on)]
    overlap = {n for n, _ in r_value} & set(l_names)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")
    all_fields = lf + r_value
    int_cols = {
        n: t.to_pandas_dtype() for n, t in all_fields if pa.types.is_integer(t)
    }

    def widen(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for name, typ in all_fields:
                if name in t.column_names:
                    cols[name] = t[name]
                elif pa.types.is_integer(typ):
                    cols[name] = pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()))
                else:
                    cols[name] = pa.nulls(n, typ)
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            cols[_MATCH] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    u = left.map_batches(widen(0), batch_format="pyarrow").union(
        right.map_batches(widen(1), batch_format="pyarrow")
    )
    return u, l_names, [n for n, _ in r_value], int_cols


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    num_buckets: int | None = None,
    how: str = "inner",
) -> ray.data.Dataset:
    """As-of join (direction=backward, exact matches allowed —
    DuckDB's ``ASOF [LEFT] JOIN ... ON l.by = r.by AND l.on >= r.on``).
    ``how="inner"`` drops lefts with no at-or-before right row;
    ``how="left"`` keeps them with null right values (right INTEGER
    value columns then come back as pandas nullable Int* — never a
    float64 round-trip, so int64 ids above 2^53 survive on matched
    rows while unmatched rows carry NA).

    Non-key columns of the two sides must be disjoint (pre-rename the
    right side); every left column plus every right non-key column
    appears in the output. Ties on (by, on) pick the right row with
    the greatest position after a stable (on,)-sort — deterministic
    only if right keys are unique per (by, on), which callers should
    guarantee (dedup first)."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    u, l_names, r_value_names, int_cols = _widened_union(left, right, by, on)
    l_int = {c: dt for c, dt in int_cols.items() if c in l_names}
    r_int = {c: dt for c, dt in int_cols.items() if c in r_value_names}

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g[_SIDE].to_numpy() == 0
        l = g[lmask][l_names].sort_values(on, kind="stable")
        r = g[~lmask][[by, on] + r_value_names + [_MATCH]].sort_values(
            on, kind="stable"
        )
        if not len(l) or not len(r):
            out = (l.iloc[0:0] if how == "inner" else l).copy()
            for c in r_value_names:
                if c in r_int:
                    out[c] = pd.array(
                        [pd.NA] * len(out), dtype=_nullable_int_name(r_int[c])
                    )
                else:
                    out[c] = _na_like(g[c], out.index)
        else:
            # right int value columns ride as nullable Int* through the
            # merge: unmatched lefts produce NA, and a plain int64
            # column with any NaN widens the WHOLE column to float64,
            # corrupting matched values above 2^53
            for c in r_value_names:
                if c in r_int:
                    r[c] = r[c].astype(_nullable_int_name(r_int[c]))
            out = pd.merge_asof(
                l, r, on=on, by=by, direction="backward", allow_exact_matches=True
            )
            if how == "inner":
                # the guaranteed non-null right marker column identifies
                # matches (robust to null right values and to right
                # sides with zero value columns)
                out = out[out[_MATCH].notna()]
            out = out.drop(columns=[_MATCH])
        # left integer columns never hold NA — restore exact numpy
        # dtype; right ints restore only under inner (no NA possible),
        # and stay nullable Int* under left
        restore = int_cols if how == "inner" else l_int
        for c, dt in restore.items():
            out[c] = out[c].astype(dt)
        if how == "left":
            for c, ext in (
                (c, _nullable_int_name(dt)) for c, dt in r_int.items()
            ):
                out[c] = out[c].astype(ext)
        return out.reset_index(drop=True)

    return apply_per_bucket(u, kernel, key=by, num_buckets=num_buckets)


def asof_join_salted(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    chunk_s: int = 86400,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """As-of join with HOT-KEY SALTING: the pass-A partition key is
    (by, on // chunk), so a mega-key's rows spread over one bucket per
    time chunk instead of pinning a straggler partition.

    Pass A joins within each (key, chunk) bucket and emits three row
    kinds: locally matched rows (a same-chunk right at-or-before the
    left always beats any earlier-chunk right), unmatched left rows,
    and one CARRY per key — the latest right row of the chunk. Pass B
    is a plain ``asof_join`` of the unmatched lefts against the
    carries (≤ one row per (key, chunk): boundary-carry-sized, never
    input-sized), which is exact because an unmatched left's true
    match, if any, is the latest right row of some earlier chunk —
    i.e. a carry. Output identical to ``asof_join`` (metamorphic test
    in tests/test_salting.py)."""
    u, l_names, r_value_names, int_cols = _widened_union(left, right, by, on)
    chunk_us = chunk_s * 1_000_000
    out_cols = l_names + r_value_names

    def add_chunk(t: pa.Table) -> pa.Table:
        us = (
            t[on]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return t.append_column("__chunk", pa.array(us // chunk_us))

    def kernel_a(g: pd.DataFrame) -> pd.DataFrame:
        # A bucket holds MANY (key, chunk) groups (hash % B): local
        # matching and carries must both be per (key, chunk) — a
        # bucket-wide by=key match could pair a left with a stale
        # right from an older chunk that happened to share the bucket,
        # shadowing the true match (a later chunk's carry elsewhere).
        lmask = g[_SIDE].to_numpy() == 0
        l = g[lmask][l_names + ["__chunk"]].sort_values(on, kind="stable")
        r = g[~lmask][[by, "__chunk", on] + r_value_names + [_MATCH]].sort_values(
            on, kind="stable"
        )
        for c in r_value_names:
            if c in int_cols:
                r[c] = r[c].astype(_nullable_int_name(int_cols[c]))
        frames = []
        if len(l) and len(r):
            m = pd.merge_asof(
                l,
                r,
                on=on,
                by=[by, "__chunk"],
                direction="backward",
                allow_exact_matches=True,
            )
            hit = m[_MATCH].notna()
            matched = m[hit].drop(columns=[_MATCH]).copy()
            matched["__kind"] = np.int8(0)
            if len(matched):
                frames.append(matched)
            miss = l[(~hit).to_numpy()].copy()
        else:
            miss = l.copy()
        if len(miss):
            for c in r_value_names:
                # int fills are 0, never observed (pick(1) selects
                # l_names only); a null would float64-widen the column
                # and corrupt int64 values above 2^53. Non-int fills
                # are TYPED all-NA series (not None, whose object
                # column would trip pandas' deprecated all-NA dtype
                # exclusion in the concat below)
                miss[c] = np.int64(0) if c in int_cols else _na_like(g[c], miss.index)
            miss["__kind"] = np.int8(1)
            frames.append(miss)
        if len(r):
            # last ROW per (key, chunk) (max `on`; r is on-sorted) —
            # not groupby().last(), which takes last non-null per col
            carry = (
                r.drop_duplicates(subset=[by, "__chunk"], keep="last")
                .drop(columns=[_MATCH])
                .copy()
            )
            for c in l_names:
                if c not in (by, on):
                    carry[c] = (
                        np.int64(0) if c in int_cols else _na_like(g[c], carry.index)
                    )
            carry["__kind"] = np.int8(2)
            frames.append(carry)
        if not frames:
            return pd.DataFrame({c: pd.Series(dtype=g[c].dtype) for c in out_cols}).assign(
                __kind=pd.Series(dtype=np.int8)
            )
        out = pd.concat(frames, ignore_index=True)[out_cols + ["__kind"]]
        # int-origin cols hold only real values or 0-fills (never NA):
        # pin the exact integer dtype so every bucket's block agrees
        # and no float64 round-trip ever happens
        for c, dt in int_cols.items():
            out[c] = out[c].astype(dt)
        return out

    pass_a = apply_per_bucket(
        u.map_batches(add_chunk, batch_format="pyarrow"),
        kernel_a,
        key=[by, "__chunk"],
        num_buckets=num_buckets,
    ).materialize()

    def restore_ints(df: pd.DataFrame) -> pd.DataFrame:
        for c, dt in int_cols.items():
            if c in df.columns:
                df[c] = df[c].astype(dt)
        return df

    def pick(kind: int, cols: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return restore_ints(df[df["__kind"].to_numpy() == kind][cols].copy())

        return fn

    matched = pass_a.map_batches(pick(0, out_cols), batch_format="pandas")
    red_left = pass_a.map_batches(pick(1, l_names), batch_format="pandas")
    carries = pass_a.map_batches(
        pick(2, [by, on] + r_value_names), batch_format="pandas"
    )
    # inner semantics: with no unmatched lefts or no carries, pass B
    # is empty by construction (and schema inference on an empty
    # dataset is undefined) — skip it
    if red_left.count() == 0 or carries.count() == 0:
        return matched
    late = asof_join(red_left, carries, by=by, on=on, num_buckets=num_buckets)
    return matched.union(late)


def overlap_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    l_span: tuple[str, str],
    r_span: tuple[str, str],
    chunk_s: int = 3600,
    num_buckets: int | None = None,
    max_chunks_per_row: int = 1000,
) -> ray.data.Dataset:
    """Range × range join: per ``by`` key, every pair of intervals that
    OVERLAP — ``l_start <= r_end AND r_start <= l_end`` (closed
    intervals; inner). The general interval-intersection join
    (``interval_join`` is the point-in-interval special case).

    Physical plan — chunk replication, one shuffle: each interval is
    replicated to every ``chunk_s``-second time chunk it spans, both
    sides are co-located by hash(key, chunk), and each bucket joins
    its chunk locally. An overlapping pair co-occurs in every chunk
    their intersection spans; emitting ONLY in the chunk containing
    the intersection's START (max of the two starts) yields each pair
    exactly once — no dedup shuffle. Pick ``chunk_s`` near the typical
    interval length: replication factor = interval_len / chunk_s + 1.
    Rows spanning more than ``max_chunks_per_row`` chunks raise (an
    interval 1000× the chunk size means the chunk was mis-sized; at
    scale that is a silent data explosion, not a plan).

    Non-key columns (including the span columns) must be disjoint
    across sides. Span columns must be timestamps or int64.

    Partitioning assumption: work concentrates per (key, chunk) — a
    single key whose intervals pile into the same chunk makes that
    bucket's local join quadratic in its row count. That is inherent
    to the semantics (those pairs all overlap and must all be
    emitted); what chunking guarantees is that a hot KEY spread over
    TIME still parallelizes, the analogue of the salted plans'
    (key, time-chunk) decomposition."""
    ls, le = l_span
    rs, re_ = r_span
    left, lf = _fields_resolved(left)
    right, rf = _fields_resolved(right)
    l_names = [n for n, _ in lf]
    r_names = [n for n, _ in rf]
    for c, side_names, side in ((ls, l_names, "left"), (le, l_names, "left"), (rs, r_names, "right"), (re_, r_names, "right")):
        if c not in side_names:
            raise ValueError(f"span column {c!r} missing from {side} side")
    overlap_cols = (set(l_names) - {by}) & (set(r_names) - {by})
    if overlap_cols:
        raise ValueError(f"non-key columns collide across sides: {sorted(overlap_cols)}")
    r_value = [(n, t) for n, t in rf if n != by]
    all_fields = lf + r_value
    int_cols = {
        n: t.to_pandas_dtype() for n, t in all_fields if pa.types.is_integer(t)
    }
    r_value_names = [n for n, _ in r_value]
    chunk_us = chunk_s * 1_000_000

    def _us(col: pd.Series) -> np.ndarray:
        v = col.to_numpy()
        if np.issubdtype(v.dtype, np.datetime64):
            return v.astype("datetime64[us]").astype(np.int64)
        return v.astype(np.int64)

    def _fill(typ: pa.DataType, n: int):
        # typed synthetic fills so every bucket/block agrees on dtype:
        # ints get 0 (never observed — kernels select own-side columns),
        # timestamps NaT, floats NaN, everything else object-None
        if pa.types.is_integer(typ):
            return np.zeros(n, dtype=typ.to_pandas_dtype())
        if pa.types.is_timestamp(typ):
            return pd.Series([pd.NaT] * n, dtype=f"datetime64[{typ.unit}]")
        if pa.types.is_floating(typ):
            return np.full(n, np.nan, dtype=typ.to_pandas_dtype())
        return pd.Series([None] * n, dtype=object)

    def widen_explode(side: int, s_col: str, e_col: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            n = len(df)
            cols = {}
            for name, typ in all_fields:
                if name in df.columns:
                    cols[name] = df[name].reset_index(drop=True)
                else:
                    cols[name] = _fill(typ, n)
            out = pd.DataFrame(cols)
            out[_SIDE] = np.int8(side)
            lo = _us(df[s_col]) // chunk_us
            hi = _us(df[e_col]) // chunk_us
            if n and (hi - lo + 1).max() > max_chunks_per_row:
                raise ValueError(
                    f"an interval spans more than max_chunks_per_row="
                    f"{max_chunks_per_row} chunks; raise chunk_s"
                )
            reps = (hi - lo + 1).astype(np.int64)
            out = out.loc[out.index.repeat(reps)].reset_index(drop=True)
            offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
            out["__chunk"] = np.repeat(lo, reps) + (
                np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(offs, reps)
            )
            return out

        return fn

    u = left.map_batches(
        widen_explode(0, ls, le), batch_format="pandas"
    ).union(right.map_batches(widen_explode(1, rs, re_), batch_format="pandas"))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g[_SIDE].to_numpy() == 0
        l = g[lmask][l_names + ["__chunk"]]
        r = g[~lmask][[by, "__chunk"] + r_value_names]
        out_cols = l_names + r_value_names
        if not len(l) or not len(r):
            out = pd.DataFrame(
                {name: _fill(typ, 0) for name, typ in all_fields}
            )[out_cols]
        else:
            m = l.merge(r, on=[by, "__chunk"])
            if len(m):
                a0, a1 = _us(m[ls]), _us(m[le])
                b0, b1 = _us(m[rs]), _us(m[re_])
                keep = (
                    (a0 <= b1)
                    & (b0 <= a1)
                    # exactly-once: only the chunk holding the
                    # intersection start emits the pair
                    & (np.maximum(a0, b0) // chunk_us == m["__chunk"].to_numpy())
                )
                m = m[keep]
            out = m[out_cols] if len(m) else m.reindex(columns=out_cols).iloc[0:0]
        for c, dt in int_cols.items():
            out[c] = out[c].astype(dt)
        return out.reset_index(drop=True)

    return apply_per_bucket(u, kernel, key=[by, "__chunk"], num_buckets=num_buckets)


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    by: str,
    on: str,
    start: str,
    end: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Range join: each point row matches the interval containing its
    ``on`` value (``start <= on <= end``) per ``by`` key — sessionize /
    point-in-window assignment.

    Composition, not a new shuffle pattern: an as-of join on ``start``
    (latest interval starting at-or-before the point) followed by an
    ``end >= on`` containment filter. Exact for NON-OVERLAPPING
    intervals per key (session/tumbling windows); with overlapping
    intervals only the latest-starting container matches — callers
    needing all-overlaps semantics must explode intervals first.
    Inner: points in no interval are dropped."""
    intervals, iv_fields = _fields_resolved(intervals)
    if on in (n for n, _ in iv_fields):
        raise ValueError(
            f"intervals side already has a column named {on!r}; rename it"
        )

    def add_on(t: pa.Table) -> pa.Table:
        return t.append_column(on, t[start])

    iv = intervals.map_batches(add_on, batch_format="pyarrow")
    j = asof_join(points, iv, by=by, on=on, num_buckets=num_buckets)

    def contained(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t[end], t[on]))

    return j.map_batches(contained, batch_format="pyarrow")
