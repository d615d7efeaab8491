"""Generic event-stream variants of the windowing/CEP operators.

The transcript operators (windows.py, cep.py) are specialized to the
transcript schema; these run the same semantics over any keyed event
stream (here the testdata ``events`` table: ``user_id``/``ts``/
``event_type``), demonstrating that the engine's windowing layer is
schema-generic. Ordering within a key is (ts, event_id) — unlike
transcripts there is no turn index, so CEP contiguity means
"consecutive events of that key".
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from .partition import apply_per_bucket, to_clean_arrow

US = 1_000_000


def tumbling_events(ds: ray.data.Dataset, size_s: int = 3600) -> ray.data.Dataset:
    """Per-user fixed windows with decomposable aggregates, computed as
    per-batch partials + a small groupby (no full-row shuffle). Money
    sums use integer cents so results are order-independent."""
    size_us = size_s * US

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["user_id", "ts", "value"]).to_pandas()
        ws = (df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // size_us) * size_us
        part = (
            pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "window_start": ws,
                    "n_events": np.int64(1),
                    "sum_cents": np.rint(df["value"].to_numpy() * 100).astype(np.int64),
                }
            )
            .groupby(["user_id", "window_start"], sort=False, as_index=False)
            .sum()
        )
        part["window_start"] = part["window_start"].astype("datetime64[us]")
        return to_clean_arrow(part)

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["user_id", "window_start"]
    ).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_cents", alias_name="sum_cents"),
    )


def window_distinct_users(
    ds: ray.data.Dataset, size_s: int = 86400, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Distinct active users + event counts per fixed window — the
    distributed COUNT(DISTINCT) plan. Per-batch DISTINCT (window,
    user) partials with partial event counts shrink the exchange from
    EVENT rows to ACTIVITY rows (at most one per user-window per
    batch); one hash(window) shuffle co-locates each window's pairs;
    the per-bucket kernel is one C-level nunique + sum. At web scale
    the exchange is bounded by windows × active users regardless of
    event volume, and the same plan swaps nunique for an HLL sketch
    when approximate counts suffice (not needed at gate fidelity).

    Reference analogue: the per-interval frame/detection counters the
    harvest loop tracks while iterating a capture
    (``services/harvest_service.py:198-232``) — here keyed by window
    with a distinct-entity dimension."""
    size_us = size_s * US

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["user_id", "ts"]).to_pandas()
        ws = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // size_us
        ) * size_us
        part = (
            pd.DataFrame(
                {
                    "window_us": ws,
                    "user_id": df["user_id"].to_numpy(np.int64),
                    "n": np.int64(1),
                }
            )
            .groupby(["window_us", "user_id"], sort=False, as_index=False)
            .sum()
        )
        return to_clean_arrow(part)

    pairs = ds.map_batches(partial, batch_format="pyarrow")

    def per_window(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "window_start": np.array([], "datetime64[us]"),
                    "n_users": np.array([], np.int64),
                    "n_events": np.array([], np.int64),
                }
            )
        out = (
            g.groupby("window_us", sort=False)
            .agg(n_users=("user_id", "nunique"), n_events=("n", "sum"))
            .reset_index()
        )
        out["window_start"] = out.pop("window_us").astype("datetime64[us]")
        return out[["window_start", "n_users", "n_events"]]

    return apply_per_bucket(
        pairs, per_window, key="window_us", num_buckets=num_buckets
    )


def daily_spikes(
    ds: ray.data.Dataset,
    sigma: int = 2,
    size_s: int = 86400,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Volume-anomaly detection: days whose event count for a type
    exceeds that type's mean by more than ``sigma`` population
    standard deviations. The z-score test is evaluated in INTEGER
    arithmetic — with n days, s1 = Σcnt, s2 = Σcnt², flag when
    (n·cnt − s1) > 0 and (n·cnt − s1)² > sigma²·(n·s2 − s1²) — an
    exact rearrangement of cnt > mean + sigma·std, so the SQL gate is
    a hash comparison with no float tolerance.

    Scale plan: per-batch (type, day) partial counts + one small
    groupby reduce events to a types×days table; the spike test runs
    per type after a key-only hash(type) shuffle of that tiny table.
    Reference analogue: the harvest loop's per-interval detection-rate
    bookkeeping that decides when a capture is 'interesting'
    (``services/harvest_service.py:198-232``)."""
    size_us = size_s * US

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["event_type", "ts"]).to_pandas()
        day = (
            df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // size_us
        ) * size_us
        part = (
            pd.DataFrame(
                {"event_type": df["event_type"], "day_us": day, "cnt": np.int64(1)}
            )
            .groupby(["event_type", "day_us"], sort=False, as_index=False)
            .sum()
        )
        return to_clean_arrow(part)

    daily = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day_us"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "event_type": np.array([], dtype=object),
                    "day": np.array([], "datetime64[us]"),
                    "cnt": np.array([], np.int64),
                }
            )
        cnt = g["cnt"].to_numpy(np.int64)
        # exact arbitrary-precision arithmetic (object = Python ints):
        # the squared terms overflow int64 at realistic web-scale daily
        # counts; this table is types×days-sized, so the cost is nil.
        go = g.assign(cnt=cnt.astype(object))
        grp = go.groupby("event_type", sort=False)
        n = grp["cnt"].transform("size").to_numpy().astype(object)
        s1 = grp["cnt"].transform("sum").to_numpy()
        s2 = grp["cnt"].transform(
            lambda c: sum(int(x) * int(x) for x in c)
        ).to_numpy()
        dev = n * go["cnt"].to_numpy() - s1
        keep = (
            (dev > 0) & (dev * dev > sigma * sigma * (n * s2 - s1 * s1))
        ).astype(bool)
        out = pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy()[keep],
                "day": g["day_us"].to_numpy(np.int64)[keep].astype("datetime64[us]"),
                "cnt": cnt[keep],
            }
        )
        return out

    return apply_per_bucket(daily, flag, key="event_type", num_buckets=num_buckets)


def sliding_events(
    ds: ray.data.Dataset, size_s: int = 3600, slide_s: int = 1800
) -> ray.data.Dataset:
    """Per-user sliding windows over events — same decomposable
    partial-agg plan as ``tumbling_events``; the size/slide× window
    expansion happens inside the per-batch partial, so the shuffle
    still moves pre-aggregated (user, window) partial rows only."""
    size_us, slide_us = size_s * US, slide_s * US

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["user_id", "ts", "value"]).to_pandas()
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        k_lo = (us - size_us) // slide_us + 1
        reps = (us // slide_us + 1 - k_lo).astype(np.int64)
        total = int(reps.sum())
        offs = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        ws = (np.repeat(k_lo, reps) + offs) * slide_us
        part = (
            pd.DataFrame(
                {
                    "user_id": np.repeat(df["user_id"].to_numpy(), reps),
                    "window_start": ws,
                    "n_events": np.int64(1),
                    "sum_cents": np.repeat(
                        np.rint(df["value"].to_numpy() * 100).astype(np.int64), reps
                    ),
                }
            )
            .groupby(["user_id", "window_start"], sort=False, as_index=False)
            .sum()
        )
        part["window_start"] = part["window_start"].astype("datetime64[us]")
        return to_clean_arrow(part)

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["user_id", "window_start"]
    ).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_cents", alias_name="sum_cents"),
    )


def session_events_kernel(g: pd.DataFrame, gap_s: int = 1800) -> pd.DataFrame:
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    uid = g["user_id"].to_numpy()
    n = len(g)
    if n == 0:
        return pd.DataFrame(
            {
                "user_id": np.array([], np.int64),
                "session_id": np.array([], np.int64),
                "window_start": np.array([], "datetime64[us]"),
                "window_end": np.array([], "datetime64[us]"),
                "n_events": np.array([], np.int64),
            }
        )
    is_new = np.empty(n, dtype=bool)
    is_new[0] = True
    is_new[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_s * US)
    starts = np.flatnonzero(is_new)
    ends = np.append(starts[1:], n) - 1
    key_new = np.empty(n, dtype=bool)
    key_new[0] = True
    key_new[1:] = uid[1:] != uid[:-1]
    island_idx = np.cumsum(is_new) - 1
    first_island = island_idx[np.flatnonzero(key_new)]
    session_id = np.arange(len(starts)) - np.repeat(
        first_island, np.diff(np.append(first_island, len(starts)))
    )
    return pd.DataFrame(
        {
            "user_id": uid[starts],
            "session_id": session_id.astype(np.int64),
            "window_start": ts[starts].astype("datetime64[us]"),
            "window_end": ts[ends].astype("datetime64[us]"),
            "n_events": (ends - starts + 1).astype(np.int64),
        }
    )


def session_events(
    ds: ray.data.Dataset, gap_s: int = 1800, num_buckets: int | None = None
) -> ray.data.Dataset:
    return apply_per_bucket(
        ds, lambda g: session_events_kernel(g, gap_s), key="user_id", num_buckets=num_buckets
    )


def cep_events_kernel(
    g: pd.DataFrame, pattern: tuple[str, ...]
) -> pd.DataFrame:
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    uid = g["user_id"].to_numpy()
    etype = g["event_type"].to_numpy()
    eid = g["event_id"].to_numpy()
    n, plen = len(g), len(pattern)
    if n < plen:
        return pd.DataFrame(
            {
                "user_id": np.array([], np.int64),
                "start_event_id": np.array([], np.int64),
                "end_event_id": np.array([], np.int64),
            }
        )
    m = n - plen + 1
    ok = uid[:m] == uid[plen - 1 :]
    for j, r in enumerate(pattern):
        ok &= etype[j : m + j] == r
    cand = np.flatnonzero(ok)
    return pd.DataFrame(
        {
            "user_id": uid[cand],
            "start_event_id": eid[cand],
            "end_event_id": eid[cand + plen - 1],
        }
    )


def cep_events(
    ds: ray.data.Dataset,
    pattern: tuple[str, ...] = ("view", "click", "purchase"),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    return apply_per_bucket(
        ds, lambda g: cep_events_kernel(g, pattern), key="user_id", num_buckets=num_buckets
    )


def funnel_events(
    ds: ray.data.Dataset,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Ordered funnel analysis: how many keys (users) complete each
    prefix of the ``steps`` event-type sequence IN ORDER — step i
    counts a user iff an event of type ``steps[i]`` occurs at or after
    that user's earliest completion time of step i-1 (the classic
    sequential min-ts chain; ties at the same timestamp count, so
    simultaneous events satisfy order).

    Scale plan: ONE hash(key) shuffle of (key, type, ts); the bucket
    kernel runs |steps| vectorized groupby-min passes across ALL users
    in the bucket (no per-user Python), emitting |steps| partial
    count rows per bucket — the final reduce is bucket-count x steps
    rows on the driver."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        sub = pd.DataFrame(
            {
                "u": g[key].to_numpy(),
                "t": g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64),
                "e": g[type_col].to_numpy(),
            }
        )
        cur = (
            sub[sub["e"] == steps[0]]
            .groupby("u", sort=False, as_index=False)["t"]
            .min()
        )
        counts = [len(cur)]
        for s in steps[1:]:
            nxt = sub[sub["e"] == s].merge(
                cur, on="u", how="inner", suffixes=("", "_prev")
            )
            nxt = nxt[nxt["t"].to_numpy() >= nxt["t_prev"].to_numpy()]
            cur = nxt.groupby("u", sort=False, as_index=False)["t"].min()
            counts.append(len(cur))
        return pd.DataFrame(
            {
                "step_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
                "step": np.array(steps, dtype=object),
                "n_users": np.array(counts, dtype=np.int64),
            }
        )

    partials = apply_per_bucket(ds, kernel, key=key, num_buckets=num_buckets)
    out = (
        partials.to_pandas()
        .groupby(["step_idx", "step"], sort=True, as_index=False)["n_users"]
        .sum()
    )
    return out.sort_values("step_idx").reset_index(drop=True).astype(
        {"step_idx": np.int64, "n_users": np.int64}
    )


def props_extract_agg(
    ds: ray.data.Dataset,
    pattern: str = r'"k":\s*(-?\d+)',
    props_col: str = "props",
    key_col: str = "event_type",
) -> ray.data.Dataset:
    """Semi-structured column extraction + aggregate: pull an integer
    field out of a JSON-ish string column with ONE vectorized RE2 pass
    (``pc.extract_regex`` — compiled once inside Arrow, no per-row
    Python or JSON parser) and reduce per key with the
    partial-before-shuffle discipline. The everyday ETL shape "parse
    the props blob, aggregate by type" — the exchange moves one
    (key, n, sum) row per key per block, never the events.

    Rows whose props do not match the pattern are counted with a NULL
    contribution (n counts all rows; sum skips non-matches), matching
    SQL's ``sum(CAST(regexp_extract(...) AS BIGINT))`` null semantics.

    Reference analogue: M8/M9's per-record payload field extraction
    before aggregation (``utils/TranslateObject.py:1-23``)."""
    import pyarrow.compute as pc

    rx = pattern if "(?P<" in pattern else pattern.replace("(", "(?P<v>", 1)

    def partial(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t[props_col], rx)
        v = pc.struct_field(m, "v")  # null where no match
        k = pc.cast(v, pa.int64())
        df = pd.DataFrame(
            {
                key_col: t[key_col].to_pandas(),
                "n": np.int64(1),
                "sum_k": pd.array(
                    k.to_pandas(), dtype="Int64"
                ),  # nullable: non-matches drop out of the sum
            }
        )
        out = df.groupby(key_col, sort=False, as_index=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum")
        )
        out["n"] = out["n"].astype(np.int64)
        # a key whose props NEVER match sums to 0 here (pandas
        # min_count=0), where the SQL twin yields NULL — callers
        # needing SQL null semantics should gate on a match count
        out["sum_k"] = out["sum_k"].astype(np.int64)
        from .partition import to_clean_arrow

        return to_clean_arrow(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"))
    )


def user_retention(
    ds: ray.data.Dataset,
    week_us: int = 7 * 86400 * 1_000_000,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Cohort retention: per activity week, how many distinct users
    were active and how many of those were ALSO active the following
    week — the week-over-week retention curve of product analytics.
    Output: (week, n_active, n_retained).

    Scale plan: per-batch DISTINCT (user, week) partials shrink the
    exchange to activity rows before ONE hash(user) shuffle; per
    bucket a lexsort + adjacent-week mask flags retained rows
    vectorized across all users, reduced to per-week partials; the
    final groupby is |weeks|-sized. Events never move — only (user,
    week) keys do.

    Reference analogue: ST2's cross-record tracker asks the same
    "seen again later?" question per track (``condition.py:79-101``),
    here cohorted by time bucket."""
    from .partition import apply_per_bucket, to_clean_arrow

    def distinct_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        week = ts.astype(np.int64) // week_us
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "week": week,
            }
        ).drop_duplicates()
        return to_clean_arrow(df)

    keyed = ds.map_batches(distinct_partial, batch_format="pyarrow")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "week": np.array([], dtype=np.int64),
                    "n_active": np.array([], dtype=np.int64),
                    "n_retained": np.array([], dtype=np.int64),
                }
            )
        g = g.drop_duplicates()
        u = g["user_id"].to_numpy()
        w = g["week"].to_numpy().astype(np.int64)
        codes, _ = pd.factorize(u, sort=False)
        idx = np.lexsort((w, codes))
        codes, w = codes[idx], w[idx]
        retained = np.zeros(len(w), dtype=np.int64)
        retained[:-1] = (codes[:-1] == codes[1:]) & (w[:-1] + 1 == w[1:])
        out = pd.DataFrame(
            {"week": w, "n_active": np.int64(1), "n_retained": retained}
        )
        return out.groupby("week", sort=False, as_index=False).sum()

    partials = apply_per_bucket(keyed, per_user, key="user_id", num_buckets=num_buckets)
    return partials.groupby("week").aggregate(
        Sum("n_active", alias_name="n_active"),
        Sum("n_retained", alias_name="n_retained"),
    )


def sliding_mau(
    ds: ray.data.Dataset,
    size_s: int = 7 * 86400,
    slide_s: int = 86400,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Distinct active users + event counts per SLIDING window (the
    rolling-MAU curve): each event replicates into its size/slide
    covering windows — but only as (window, user_id) KEY pairs, never
    payload — then the exact COUNT(DISTINCT) plan of
    ``window_distinct_users`` takes over: per-batch DISTINCT pair
    partials shrink the exchange to activity rows, one hash(window)
    shuffle co-locates each window, and the kernel is a C-level
    nunique + sum. The exchange is bounded by windows x active users x
    (size/slide), independent of event volume.

    Reference analogue: the overlapping-interval bookkeeping of the
    suppression window (``services/harvest_service.py:226-232``) with
    a distinct-entity dimension."""
    if size_s % slide_s:
        raise ValueError("size_s must be a multiple of slide_s")
    size_us, slide_us = size_s * US, slide_s * US
    width = size_s // slide_s

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["user_id", "ts"]).to_pandas()
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        lo = (us - size_us) // slide_us + 1
        k = (lo[:, None] + np.arange(width, dtype=np.int64)).ravel()
        part = (
            pd.DataFrame(
                {
                    "window_us": k * slide_us,
                    "user_id": np.repeat(df["user_id"].to_numpy(np.int64), width),
                    "n": np.int64(1),
                }
            )
            .groupby(["window_us", "user_id"], sort=False, as_index=False)
            .sum()
        )
        return to_clean_arrow(part)

    pairs = ds.map_batches(partial, batch_format="pyarrow")

    def per_window(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "window_start": np.array([], "datetime64[us]"),
                    "n_users": np.array([], np.int64),
                    "n_events": np.array([], np.int64),
                }
            )
        out = (
            g.groupby("window_us", sort=False)
            .agg(n_users=("user_id", "nunique"), n_events=("n", "sum"))
            .reset_index()
        )
        out["window_start"] = out.pop("window_us").astype("datetime64[us]")
        return out[["window_start", "n_users", "n_events"]]

    return apply_per_bucket(
        pairs, per_window, key="window_us", num_buckets=num_buckets
    )


def type_cooccurrence(
    ds: ray.data.Dataset, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Market-basket co-occurrence: for every unordered pair of event
    types, how many users performed BOTH — the support counts behind
    "users who did A also did B" association mining.

    Scale plan: per-batch DISTINCT (user, type) partials collapse
    events to activity rows; one hash(user) shuffle co-locates each
    user's type set; the kernel dedups exactly, forms each user's
    pairs vectorized (types per user is bounded by the small type
    alphabet, so the blowup is |types|², not events), and emits
    pair-count partials; the final groupby is pairs-sized.

    Reference analogue: the cross-class co-detection statistics the
    multi-model projects imply (``projects/helmet/helmet_project.py``
    pairs person+helmet detections within one frame)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = (
            t.select(["user_id", "event_type"])
            .to_pandas()
            .drop_duplicates()
        )
        return to_clean_arrow(df)

    pairs = ds.map_batches(partial, batch_format="pyarrow")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        g = g.sort_values(["user_id", "event_type"], kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], uid[1:] != uid[:-1]))
        )
        counts = np.diff(np.append(starts, len(uid)))
        a_parts, b_parts = [], []
        for w in np.unique(counts):
            if w < 2:
                continue
            # all users with exactly w types, their C(w,2) pairs at once
            sel = np.flatnonzero(counts == w)
            rows = starts[sel][:, None] + np.arange(w)
            types = et[rows]  # (n_users_w, w), sorted within row
            iu, ju = np.triu_indices(w, k=1)
            a_parts.append(types[:, iu].ravel())
            b_parts.append(types[:, ju].ravel())
        if not a_parts:
            return pd.DataFrame(
                {
                    "type_a": np.array([], dtype=object),
                    "type_b": np.array([], dtype=object),
                    "n_users": np.array([], np.int64),
                }
            )
        out = pd.DataFrame(
            {
                "type_a": np.concatenate(a_parts),
                "type_b": np.concatenate(b_parts),
                "n_users": np.int64(1),
            }
        )
        return out.groupby(["type_a", "type_b"], sort=False, as_index=False)[
            "n_users"
        ].sum()

    partials = apply_per_bucket(pairs, per_user, key="user_id", num_buckets=num_buckets)
    return partials.groupby(["type_a", "type_b"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


def dow_profile(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Day-of-week volume/user profile per event type — the seasonality
    fingerprint a stream monitor baselines against. dow is pure
    integer arithmetic (0=Thu epoch anchor shifted so 0=Mon:
    ``(days_since_epoch + 3) % 7``), identical in the SQL oracle — no
    locale-dependent date functions. Per-batch partials collapse each
    block to <= |types|·7 rows (counts) plus distinct (type, dow,
    user) rows for the exact user count; both exchanges are key-scale."""
    from ray.data.aggregate import Sum

    from .aggregates import distinct_per_key

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dow = ((us // 86_400_000_000) + 3) % 7
        out = pd.DataFrame(
            {
                "event_type": df["event_type"].to_numpy(),
                "dow": dow.astype(np.int64),
                "n": np.int64(1),
            }
        )
        return out.groupby(["event_type", "dow"], sort=False, as_index=False).sum()

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "dow"])
        .aggregate(Sum("n", alias_name="n_events"))
    )

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dow = ((us // 86_400_000_000) + 3) % 7
        out = pd.DataFrame(
            {
                "key": df["event_type"].astype(str) + "\x1f" + pd.Series(dow).astype(str),
                "user_id": df["user_id"].to_numpy(np.int64),
            }
        )
        return out.drop_duplicates()

    dist = distinct_per_key(
        ds.map_batches(melt, batch_format="pandas"),
        key="key",
        value="user_id",
        out_col="n_users",
    )

    def split_key(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["key"].str.split("\x1f", expand=True)
        return pd.DataFrame(
            {
                "event_type": parts[0],
                "dow": parts[1].astype(np.int64),
                "n_users": df["n_users"].to_numpy(np.int64),
            }
        )

    dist = dist.map_batches(split_key, batch_format="pandas")
    from .join import equi_join

    return equi_join(counts, dist, on=["event_type", "dow"], num_buckets=8)
