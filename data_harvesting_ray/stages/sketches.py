"""Sketch-accelerated aggregates: EXACT heavy hitters via a
Misra-Gries candidate pass plus an exact recount, with a runtime
exactness certificate.

Reference analogue: the harvester's per-class frequency accounting
(A7/A8 — ``utils/ClassificationObject.py`` majority vote and the
per-class counters the sink reports) at a cardinality where the plain
``groupby(value).count()`` becomes the bottleneck: the distinct-value
universe (e.g. the token vocabulary of a 100 TB corpus) can be large
enough that even the (value, partial_count) exchange is a heavyweight
shuffle. Misra-Gries (public literature: Misra & Gries 1982, and the
merge analysis of Agarwal et al. PODS'12) bounds the per-batch summary
to ``capacity`` entries, so the wide exchange moves at most
``capacity`` rows per input block regardless of vocabulary size.

Exactness, not approximation: the sketch only nominates CANDIDATES; a
second pass recounts the candidates exactly (broadcast membership
filter, per-batch partial counts, one tiny groupby). A value absent
from every per-batch summary has true global count <= sum_b d_b (each
batch's Misra-Gries decrement, d_b <= n_b/(capacity+1)), so when the
k-th recounted candidate exceeds that bound no non-candidate can reach
the top k — the result equals the full groupby's top-k bit-for-bit,
which is exactly what the DuckDB oracle checks. When the certificate
fails (capacity too small for the skew profile) the operator RAISES
rather than silently degrading to approximate output.

Scale shape: two streaming passes over the input (the same trade as
the two-pass exact dedup — re-read lineage twice, never shuffle the
payload); both exchanges are candidate-scale. The candidate set lands
on the driver once and is broadcast via ``ray.put`` (its size is
bounded by capacity x blocks BEFORE the combine and by the distinct
candidate union after it — Zipf-head-scale, not vocabulary-scale).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from .text import BPE_ISH_PATTERN

def _empty_partial() -> pd.DataFrame:
    # explicit string dtype so a 0-row block still carries an Arrow
    # schema (an object column with no rows maps to Arrow null and
    # the executor warns about schema drift)
    return pd.DataFrame(
        {
            "kind": np.array([], dtype=np.int64),
            "token": pd.Series([], dtype="string"),
            "n": np.array([], dtype=np.int64),
        }
    )

# kind discriminator inside the partial frames (groupby keys are
# (kind, token), so sentinel rows can never collide with real tokens)
_CAND = 0  # (token, within-batch count)
_DECR = 1  # ("", this batch's Misra-Gries decrement d_b)
_TOTAL = 2  # ("", this batch's total value count n_b)


def heavy_hitters(
    ds: ray.data.Dataset,
    extract,
    k: int = 10,
    capacity: int | None = None,
) -> pd.DataFrame:
    """Exact global top-``k`` most frequent values produced by
    ``extract`` (a per-batch fn: pandas DataFrame -> 1-D array of
    string values, one entry per OCCURRENCE), computed without ever
    shuffling more than ``capacity`` rows per input block.

    Returns a ``(token, n)`` DataFrame sorted by (n desc, token asc),
    identical to ``GROUP BY token ORDER BY count DESC, token LIMIT k``.
    Raises ``ValueError`` when the exactness certificate fails —
    retry with a larger ``capacity`` (default ``max(64, 8 * k)``).
    """
    m = int(capacity if capacity is not None else max(64, 8 * k))
    if m < k:
        raise ValueError(f"capacity {m} must be >= k {k}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = np.asarray(extract(df), dtype=object)
        n_total = len(vals)
        if not n_total:
            return _empty_partial()
        tok, cnt = np.unique(vals, return_counts=True)
        if len(tok) > m:
            # d = (m+1)-th largest count: at most m counts exceed it,
            # and (m+1) counts are >= d so d <= n_total/(m+1)
            d = int(np.partition(cnt, len(cnt) - m - 1)[len(cnt) - m - 1])
            keep = cnt > d
            tok, cnt = tok[keep], cnt[keep]
        else:
            d = 0
        return pd.DataFrame(
            {
                "kind": np.concatenate(
                    [np.full(len(tok), _CAND, np.int64), [_DECR, _TOTAL]]
                ),
                "token": np.concatenate([tok, ["", ""]]),
                "n": np.concatenate(
                    [cnt.astype(np.int64), [d, n_total]]
                ).astype(np.int64),
            }
        )

    agg1 = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["kind", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if not len(agg1):
        return pd.DataFrame({"token": np.array([], object), "n": np.array([], np.int64)})
    sum_d = int(agg1.loc[agg1["kind"].to_numpy() == _DECR, "n"].sum())
    cands = agg1.loc[agg1["kind"].to_numpy() == _CAND, "token"].to_numpy(dtype=object)
    cand_index_ref = ray.put(cands)

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        vals = np.asarray(extract(df), dtype=object)
        if not len(vals):
            return _empty_partial()
        cand_idx = pd.Index(ray.get(cand_index_ref))  # hash lookup, O(1)/value
        hit = cand_idx.get_indexer(vals) >= 0
        tok, cnt = np.unique(vals[hit], return_counts=True)
        return pd.DataFrame(
            {
                "kind": np.full(len(tok), _CAND, np.int64),
                "token": tok,
                "n": cnt.astype(np.int64),
            }
        )

    exact = (
        ds.map_batches(recount, batch_format="pandas")
        .groupby(["kind", "token"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True], kind="stable")
        .reset_index(drop=True)
    )
    # Certificate: every non-candidate's true count <= sum_d. The k-th
    # candidate must strictly exceed that (ties at sum_d could admit a
    # hidden non-candidate under the (n desc, token asc) order).
    if len(exact) >= k:
        kth = int(exact["n"].iloc[k - 1])
        if kth <= sum_d:
            raise ValueError(
                f"heavy_hitters certificate failed: k-th count {kth} <= "
                f"missed-count bound {sum_d}; retry with capacity > {m}"
            )
    elif sum_d > 0:
        raise ValueError(
            f"heavy_hitters certificate failed: only {len(exact)} candidates "
            f"for k={k} with missed-count bound {sum_d} > 0; "
            f"retry with capacity > {m}"
        )
    out = exact.head(k)
    return pd.DataFrame(
        {"token": out["token"].to_numpy(dtype=object), "n": out["n"].to_numpy(np.int64)}
    )


_BPE_RE = re.compile(BPE_ISH_PATTERN)


def _bpe_extract(df: pd.DataFrame) -> np.ndarray:
    toks: list[str] = []
    for text in df["text"]:
        toks.extend(_BPE_RE.findall(text))
    return np.asarray(toks, dtype=object)


def heavy_tokens(
    docs: ray.data.Dataset, k: int = 10, capacity: int | None = None
) -> pd.DataFrame:
    """Top-k most frequent BPE-ish tokens across the corpus — the
    vocabulary-building / contamination-screening pass. Exact (see
    ``heavy_hitters``); SQL-checkable against
    ``unnest(regexp_extract_all(...))`` since the RE2 pattern means
    the same thing in Arrow, Python ``re``, and DuckDB."""
    return heavy_hitters(docs, _bpe_extract, k=k, capacity=capacity)


def kmv_distinct_tokens(
    ds: ray.data.Dataset,
    k: int = 256,
    text_col: str = "text",
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT tokens) via a K-Minimum-Values
    sketch (public literature: Bar-Yossef et al. RANDOM'02) — the
    one-pass cardinality estimator for vocabularies too large even for
    the (value, count) exchange. DETERMINISTIC and SQL-exact despite
    being an approximation: the hash is the first 60 bits of md5
    (DuckDB: ``CAST('0x' || substr(md5(t),1,15) AS BIGINT)``), the
    estimate is pure integer arithmetic ((k-1)·2^60 // kth_min), and
    when the corpus has fewer than k distinct tokens the sketch
    degrades to the EXACT count — so the DuckDB oracle reproduces the
    sketch bit-for-bit, not just approximately.

    Scale plan: each batch emits its k smallest distinct token hashes
    (np.unique + partition — at most k rows per block regardless of
    vocabulary); one repartition(1) merge keeps the final k-smallest
    reduce off the driver; the driver sees k rows. Standard error is
    ~1/sqrt(k-2).

    Output: one row (k_used, kth_hv, est_distinct)."""
    import hashlib

    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t[text_col]), pattern=r"\s+"
        )
        toks = pc.unique(pc.list_flatten(lists)).to_pylist()
        hv = np.unique(
            np.fromiter(
                (
                    int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
                    for s in toks
                ),
                dtype=np.int64,
                count=len(toks),
            )
        )
        return pa.table({"hv": pa.array(hv[:k], pa.int64())})

    def merge(t: pa.Table) -> pa.Table:
        hv = np.unique(t["hv"].to_numpy(zero_copy_only=False))
        return pa.table({"hv": pa.array(hv[:k], pa.int64())})

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
        .to_pandas()
    )
    hv = np.unique(merged["hv"].to_numpy(np.int64))[:k]
    k_used = int(len(hv))
    kth = int(hv[-1]) if k_used else 0
    if k_used < k:
        est = k_used  # sketch holds the whole distinct set: exact
    else:
        est = ((k_used - 1) * (1 << 60)) // kth  # exact Python ints
    return pd.DataFrame(
        {
            "k_used": np.array([k_used], np.int64),
            "kth_hv": np.array([kth], np.int64),
            "est_distinct": np.array([est], np.int64),
        }
    )
