"""Per-key ordered window functions (bounded mode): lag/lead shifts
and rolling aggregates — the SQL window-function family over
transcript streams (response latency, moving tool-call rate).

Reference analogue: the tracker derives each record's delta from the
PREVIOUS record of the same track (``utils/ClassificationObject.py:
169-178`` — distance travelled from previous centroid); generalized
here to arbitrary lag/lead and bounded trailing windows per key.

Scale plan: ONE hash(key) shuffle of pruned metadata (the shared
``apply_per_bucket`` plan), kernels vectorized across ALL keys in the
bucket — group boundaries handled with factorized int64 codes and
global-cumsum differences, never a per-key Python loop. Ordering
inside a key is explicit (SO1/SO2 discipline: pinned sort keys, no
arrival-order assumption).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .partition import apply_per_bucket


def _sorted_codes(g: pd.DataFrame, key: str, order: str) -> tuple[pd.DataFrame, np.ndarray]:
    """Sort the bucket by (key, order) via factorized int64 codes (one
    stable argsort, no string comparisons) and return the sorted frame
    plus each row's group code."""
    codes, _ = pd.factorize(g[key].to_numpy(), sort=False)
    order_v = g[order].to_numpy()
    idx = np.lexsort((order_v, codes))
    return g.iloc[idx], codes[idx]


def with_lag(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    col: str,
    n: int = 1,
    out_col: str | None = None,
    drop_null: bool = True,
    prepare=None,
    num_buckets: int | None = None,
    impl: str = "arrow",
) -> ray.data.Dataset:
    """SQL ``LAG(col, n) OVER (PARTITION BY key ORDER BY order)``
    (``n < 0`` gives LEAD). With ``drop_null=True`` (default) rows
    without an n-th predecessor/successor are dropped — the output
    stays null-free and integer-typed; with False they carry NaN.
    ``prepare`` runs once per bucket before the window (the dedup
    slot: raw transcript reads carry duplicate rows and the window
    offset must count DISTINCT rows — per-batch dedup can't see
    cross-block duplicates, in-bucket dedup can).
    Output: the input columns plus ``out_col``.

    ``impl="arrow"`` (default — the r5 A/B winner, BASELINE.md) runs
    the kernel on the shuffled Arrow block zero-copy: group codes via
    ``dictionary_encode`` instead of object-array ``pd.factorize``,
    row selection via Arrow ``take``/``filter`` — string columns never
    materialize as Python objects. It supports ``prepare=None`` or
    ``prepare=dedup_kernel`` with an INTEGER ``order`` column (the
    dedup fuses into the same composite-int sort); anything else falls
    back to the pandas kernel."""
    out_col = out_col or f"{col}_lag{n}"

    from .dedup import dedup_kernel as _dk

    if impl == "arrow" and prepare in (None, _dk):
        return _with_lag_arrow(
            ds, key, order, col, n, out_col, drop_null,
            dedup=prepare is _dk, num_buckets=num_buckets,
        )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if prepare is not None:
            g = prepare(g)
        if not len(g):
            return g.assign(**{out_col: np.array([], dtype=np.float64)})
        g, codes = _sorted_codes(g, key, order)
        v = g[col].to_numpy()
        i = np.arange(len(g))
        src = i - n
        inb = (src >= 0) & (src < len(g))
        srcc = np.clip(src, 0, len(g) - 1)
        valid = inb & (codes[srcc] == codes)
        if drop_null:
            # gather in the NATIVE dtype — no float64 round-trip, so
            # int64 values beyond 2^53 survive intact (the asof-join
            # null-widening trap, designed out here)
            return g[valid].assign(**{out_col: np.take(v, srcc[valid])})
        lag_f = np.where(valid, np.take(v, srcc).astype(np.float64), np.nan)
        return g.assign(**{out_col: lag_f})

    return apply_per_bucket(ds, kernel, key=key, num_buckets=num_buckets)


def _with_lag_arrow(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    col: str,
    n: int,
    out_col: str,
    drop_null: bool,
    dedup: bool,
    num_buckets: int | None,
) -> ray.data.Dataset:
    """Arrow-native LAG kernel (see ``with_lag``). The bucket block
    stays an Arrow table end-to-end; only the small numeric arrays
    (codes, order, value) touch numpy."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            lag_type = t.schema.field(col).type if drop_null else pa.float64()
            return t.append_column(out_col, pa.array([], type=lag_type))
        kc = t[key].combine_chunks()
        codes = pc.dictionary_encode(kc).indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order_v = t[order].to_numpy(zero_copy_only=False)
        idx = np.lexsort((order_v, codes))
        if dedup:
            # dedup on (key, order) fused into the sort (duplicate rows
            # are byte-identical, so any representative works); general
            # over any order dtype — no composite-int range assumption
            sc, so = codes[idx], order_v[idx]
            keep = np.empty(len(idx), dtype=bool)
            keep[0] = True
            keep[1:] = (sc[1:] != sc[:-1]) | (so[1:] != so[:-1])
            sel = idx[keep]
        else:
            sel = idx
        t = t.take(pa.array(sel))
        codes = codes[sel]
        v = t[col].to_numpy(zero_copy_only=False)
        m = len(t)
        src = np.arange(m) - n
        inb = (src >= 0) & (src < m)
        srcc = np.clip(src, 0, m - 1)
        valid = inb & (codes[srcc] == codes)
        if drop_null:
            lag = np.take(v, srcc[valid])  # native dtype, no float trip
            return t.filter(pa.array(valid)).append_column(
                out_col, pa.array(lag)
            )
        lag_f = np.where(valid, np.take(v, srcc).astype(np.float64), np.nan)
        return t.append_column(out_col, pa.array(lag_f))

    return apply_per_bucket(
        ds, kernel, key=key, num_buckets=num_buckets, batch_format="pyarrow"
    )


def with_rank(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    method: str = "rank",
    descending: bool = False,
    out_col: str = "rank",
    prepare=None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """SQL ``RANK() / DENSE_RANK() / ROW_NUMBER() OVER (PARTITION BY
    key ORDER BY order [DESC])``. ``rank`` and ``dense_rank`` are
    deterministic under ties (tied rows share a value); ``row_number``
    breaks ties by the bucket's stable (key, order) sort and is only
    deterministic when (key, order) pairs are unique — callers needing
    a reproducible row_number must pass a tie-free order column.
    Output: the input columns plus ``out_col`` (int64).

    Same one-shuffle plan and cross-key vectorization as ``with_lag``:
    order values are factorized to int codes (works for strings and
    timestamps, and negation gives DESC), boundaries come from code
    diffs — no per-key loop."""
    if method not in ("rank", "dense_rank", "row_number"):
        raise ValueError(f"unsupported method={method!r}")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if prepare is not None:
            g = prepare(g)
        if not len(g):
            return g.assign(**{out_col: np.array([], dtype=np.int64)})
        codes, _ = pd.factorize(g[key].to_numpy(), sort=False)
        oc, _ = pd.factorize(g[order].to_numpy(), sort=True)
        if descending:
            oc = -oc
        # NULLS LAST in BOTH directions (DuckDB's default null order):
        # factorize marks nulls as -1, which would otherwise sort FIRST
        null_mask = pd.isna(g[order]).to_numpy()
        if null_mask.any():
            oc = oc.copy()
            oc[null_mask] = oc.max() + 1 if len(oc) else 0
        idx = np.lexsort((oc, codes))
        g, codes, oc = g.iloc[idx], codes[idx], oc[idx]
        n = len(g)
        i = np.arange(n)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = codes[1:] != codes[:-1]
        starts = np.maximum.accumulate(np.where(new_grp, i, 0))
        if method == "row_number":
            r = i - starts + 1
        else:
            new_val = new_grp.copy()
            new_val[1:] |= oc[1:] != oc[:-1]
            if method == "rank":
                r = np.maximum.accumulate(np.where(new_val, i, 0)) - starts + 1
            else:
                cnv = np.cumsum(new_val)
                r = cnv - cnv[starts] + 1
        return g.assign(**{out_col: r.astype(np.int64)})

    return apply_per_bucket(ds, kernel, key=key, num_buckets=num_buckets)


def with_ntile(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    n_tiles: int,
    descending: bool = False,
    out_col: str = "tile",
    prepare=None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """SQL ``NTILE(n) OVER (PARTITION BY key ORDER BY order [DESC])``:
    split each key's rows into ``n_tiles`` contiguous buckets of
    near-equal size — the first ``count % n`` tiles get one extra row
    (the SQL-standard fill rule). The position/recency/quality binning
    step of curriculum sampling and quota-per-quantile corpus gates.

    NTILE is tie-SENSITIVE: tied order values land in different tiles
    depending on their arbitrary relative order, so deterministic
    callers (and the SQL-gated query) must pass a tie-free ``order``
    within each key. Same one-shuffle factorized-codes plan as
    ``with_rank``; tile assignment is pure arithmetic on the row's
    0-based offset within its key group — no per-key loop."""
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if prepare is not None:
            g = prepare(g)
        if not len(g):
            return g.assign(**{out_col: np.array([], dtype=np.int64)})
        codes, _ = pd.factorize(g[key].to_numpy(), sort=False)
        oc, _ = pd.factorize(g[order].to_numpy(), sort=True)
        if descending:
            oc = -oc
        null_mask = pd.isna(g[order]).to_numpy()
        if null_mask.any():  # NULLS LAST, both directions
            oc = oc.copy()
            oc[null_mask] = oc.max() + 1 if len(oc) else 0
        idx = np.lexsort((oc, codes))
        g, codes = g.iloc[idx], codes[idx]
        n = len(g)
        i = np.arange(n)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = codes[1:] != codes[:-1]
        starts = np.maximum.accumulate(np.where(new_grp, i, 0))
        rn = i - starts  # 0-based row number within the key group
        size = np.bincount(codes, minlength=codes.max() + 1)[codes]
        base = size // n_tiles  # rows per small tile (0 when size<n)
        rem = size % n_tiles  # first `rem` tiles get base+1 rows
        cutoff = rem * (base + 1)
        big = rn < cutoff
        # guard div-by-zero past the cutoff when size < n_tiles (base
        # 0): every row is inside the cutoff there, value unused
        tile = np.where(
            big, rn // (base + 1), rem + (rn - cutoff) // np.maximum(base, 1)
        )
        return g.assign(**{out_col: (tile + 1).astype(np.int64)})

    return apply_per_bucket(ds, kernel, key=key, num_buckets=num_buckets)


def rolling_sum(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    col: str,
    window: int | None,
    out_col: str | None = None,
    prepare=None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """SQL ``SUM(col) OVER (PARTITION BY key ORDER BY order ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)`` — the bounded
    trailing window (moving tool-call rate, burst detection) — or,
    with ``window=None``, the UNBOUNDED-PRECEDING running total
    (cumulative sum from the group start). Always defined (the window
    clips at the group start), so the output is null-free int64 for
    integer inputs.

    Vectorized across groups: with rows sorted by (key, order), the
    trailing sum is ``cs[i] - cs[lo-1]`` on the GLOBAL cumsum, where
    ``lo = max(group_start, i-window+1)`` (``lo = group_start`` when
    unbounded) — indices lo..i never cross a group boundary, so one
    cumsum serves every key in the bucket."""
    out_col = out_col or f"{col}_rolling{window}"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if prepare is not None:
            g = prepare(g)
        if not len(g):
            return g.assign(**{out_col: np.array([], dtype=np.int64)})
        g, codes = _sorted_codes(g, key, order)
        v = g[col].to_numpy().astype(np.int64)
        n_rows = len(g)
        cs = np.cumsum(v)
        # group start index for every row (codes are contiguous after
        # the sort: a new group starts where the code changes)
        new_grp = np.empty(n_rows, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = codes[1:] != codes[:-1]
        starts = np.maximum.accumulate(np.where(new_grp, np.arange(n_rows), 0))
        if window is None:
            lo = starts
        else:
            lo = np.maximum(starts, np.arange(n_rows) - window + 1)
        roll = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        return g.assign(**{out_col: roll.astype(np.int64)})

    return apply_per_bucket(ds, kernel, key=key, num_buckets=num_buckets)


def _salted_parts(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    salt_chunk: int,
    carry_n: int,
) -> ray.data.Dataset:
    """Chunk rows by ``order // salt_chunk`` and DUPLICATE each chunk's
    last ``carry_n`` order positions into the next chunk's bucket as
    marked carries — the one-shuffle skew plan: a 10M-turn conversation
    spreads over ~10M/salt_chunk buckets and only carry_n rows per
    chunk ride twice."""

    def add(df: pd.DataFrame) -> pd.DataFrame:
        o = df[order].to_numpy().astype(np.int64)
        chunk = o // salt_chunk
        own = df.assign(_chunk=chunk, _carry=np.zeros(len(df), dtype=np.int8))
        m = (o % salt_chunk) >= salt_chunk - carry_n
        if not m.any():
            return own
        carry = df[m].assign(_chunk=chunk[m] + 1, _carry=np.int8(1))
        return pd.concat([own, carry], ignore_index=True)

    return ds.map_batches(add, batch_format="pandas")


def _dedup_prefer_own(g: pd.DataFrame, key: str, order: str) -> pd.DataFrame:
    """Keep one copy per (key, order), preferring the OWN row over a
    carry (when a key's adjacent chunks hash to the same bucket the
    carry duplicates a row already present — emitting both would
    corrupt the window)."""
    return g.sort_values([key, order, "_carry"], kind="stable").drop_duplicates(
        [key, order], keep="first"
    )


def with_lag_salted(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    col: str,
    n: int = 1,
    salt_chunk: int = 65536,
    out_col: str | None = None,
    prepare=None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Hot-key-safe ``with_lag`` (LAG only, ``n >= 1``): partitions on
    (key, order // salt_chunk) so an unbounded-length key spreads over
    many buckets; each bucket sees its chunk plus the previous chunk's
    last ``n`` rows as carries and emits only its own rows — output
    identical to ``with_lag`` (metamorphic test), one shuffle, carries
    are boundary-sized.

    EXACTNESS CONTRACT: the order domain must be DENSE per key (order
    values 0..m-1, each present once after ``prepare`` — the transcript
    turn_idx contract). Density is what makes "the previous n rows of a
    chunk head" identical to "the rows with order in [cC-n, cC)", which
    is the carry set. ``drop_null`` semantics are fixed to True (the
    null-free integer output)."""
    if n < 1:
        raise ValueError("with_lag_salted supports LAG only (n >= 1)")
    if salt_chunk < n:
        raise ValueError("salt_chunk must be >= n")
    out_col = out_col or f"{col}_lag{n}"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # prefer-own dedup BEFORE prepare: a (key, order)-subset dedup
        # in prepare could otherwise keep a carry copy and drop the own
        # row (losing it from the output); prefer-own also keeps the
        # first ARRIVAL among true duplicates (stable sort), so a
        # dedup-style prepare then finds nothing left to drop
        if len(g):
            g = _dedup_prefer_own(g, key, order)
        if prepare is not None:
            g = prepare(g)
        if not len(g):
            return g.drop(columns=["_chunk", "_carry"]).assign(
                **{out_col: np.array([], dtype=np.float64)}
            )
        g, codes = _sorted_codes(g, key, order)
        v = g[col].to_numpy()
        i = np.arange(len(g))
        src = i - n
        inb = src >= 0
        srcc = np.clip(src, 0, len(g) - 1)
        valid = inb & (codes[srcc] == codes)
        emit = valid & (g["_carry"].to_numpy() == 0)
        return (
            g[emit]
            .drop(columns=["_chunk", "_carry"])
            .assign(**{out_col: np.take(v, srcc[emit])})
        )

    parts = _salted_parts(ds, key, order, salt_chunk, n)
    return apply_per_bucket(parts, kernel, key=[key, "_chunk"], num_buckets=num_buckets)


def rolling_sum_salted(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    col: str,
    window: int,
    salt_chunk: int = 65536,
    out_col: str | None = None,
    prepare=None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Hot-key-safe bounded ``rolling_sum`` (``window >= 1``, bounded
    only — an unbounded running total needs a prefix reduction, not a
    constant-size carry). Same salting contract as ``with_lag_salted``
    (dense order per key; carries are the previous chunk's last
    ``window - 1`` rows); output identical to ``rolling_sum``."""
    if window is None or window < 1:
        raise ValueError("rolling_sum_salted needs a bounded window >= 1")
    if salt_chunk < window - 1:
        raise ValueError("salt_chunk must be >= window - 1")
    out_col = out_col or f"{col}_rolling{window}"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # prefer-own dedup BEFORE prepare: a (key, order)-subset dedup
        # in prepare could otherwise keep a carry copy and drop the own
        # row (losing it from the output); prefer-own also keeps the
        # first ARRIVAL among true duplicates (stable sort), so a
        # dedup-style prepare then finds nothing left to drop
        if len(g):
            g = _dedup_prefer_own(g, key, order)
        if prepare is not None:
            g = prepare(g)
        if not len(g):
            return g.drop(columns=["_chunk", "_carry"]).assign(
                **{out_col: np.array([], dtype=np.int64)}
            )
        g, codes = _sorted_codes(g, key, order)
        v = g[col].to_numpy().astype(np.int64)
        n_rows = len(g)
        cs = np.cumsum(v)
        new_grp = np.empty(n_rows, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = codes[1:] != codes[:-1]
        starts = np.maximum.accumulate(np.where(new_grp, np.arange(n_rows), 0))
        lo = np.maximum(starts, np.arange(n_rows) - window + 1)
        roll = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        emit = g["_carry"].to_numpy() == 0
        return (
            g[emit]
            .drop(columns=["_chunk", "_carry"])
            .assign(**{out_col: roll[emit].astype(np.int64)})
        )

    parts = _salted_parts(ds, key, order, salt_chunk, window - 1)
    return apply_per_bucket(parts, kernel, key=[key, "_chunk"], num_buckets=num_buckets)
