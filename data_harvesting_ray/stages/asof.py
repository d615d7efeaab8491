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
``by`` key in one bucket. Skew note: a hot key stays in one bucket —
as-of semantics are inherently per-key-ordered, so the salting escape
is range-chunking ``on`` with boundary carry (same recipe as
``windows.session_windows_salted``), not implemented here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .partition import apply_per_bucket

_SIDE = "__asof_side"


def _arrow_fields(ds: ray.data.Dataset) -> list[tuple[str, pa.DataType]]:
    sch = ds.schema()
    return list(zip(sch.names, sch.types))


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Inner as-of join (direction=backward, exact matches allowed —
    DuckDB's ``ASOF JOIN ... ON l.by = r.by AND l.on >= r.on``).

    Non-key columns of the two sides must be disjoint (pre-rename the
    right side); every left column plus every right non-key column
    appears in the output. Ties on (by, on) pick the right row with
    the greatest position after a stable (on,)-sort — deterministic
    only if right keys are unique per (by, on), which callers should
    guarantee (dedup first)."""
    lf = _arrow_fields(left)
    rf = _arrow_fields(right)
    l_names = [n for n, _ in lf]
    r_value = [(n, t) for n, t in rf if n not in (by, on)]
    overlap = {n for n, _ in r_value} & set(l_names)
    if overlap:
        raise ValueError(f"right columns collide with left: {sorted(overlap)}")
    all_fields = lf + r_value
    # remember integer columns: nulls from the union widen them to
    # float in pandas; the kernel casts back after the inner match
    int_cols = {
        n: t.to_pandas_dtype() for n, t in all_fields if pa.types.is_integer(t)
    }
    r_value_names = [n for n, _ in r_value]

    def widen(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for name, typ in all_fields:
                if name in t.column_names:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(n, typ)
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    u = left.map_batches(widen(0), batch_format="pyarrow").union(
        right.map_batches(widen(1), batch_format="pyarrow")
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        lmask = g[_SIDE].to_numpy() == 0
        l = g[lmask][l_names].sort_values(on, kind="stable")
        r = g[~lmask][[by, on] + r_value_names].sort_values(on, kind="stable")
        if not len(l) or not len(r):
            out = l.iloc[0:0].copy()
            for c in r_value_names:
                out[c] = pd.Series(dtype=g[c].dtype)
        else:
            out = pd.merge_asof(
                l, r, on=on, by=by, direction="backward", allow_exact_matches=True
            )
            # inner join: the first right value column marks a match
            # (callers must pick a non-nullable right column first)
            out = out.dropna(subset=[r_value_names[0]])
        for c, dt in int_cols.items():
            # nulls from the union widened ints to float; restore
            out[c] = out[c].astype(dt)
        return out.reset_index(drop=True)

    return apply_per_bucket(u, kernel, key=by, num_buckets=num_buckets)


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
    if on in intervals.schema().names:
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
