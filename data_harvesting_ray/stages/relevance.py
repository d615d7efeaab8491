"""Term-relevance scoring over the document corpus: TF-IDF against a
fixed query-term set — the lexical retrieval / topical-filter
primitive of a training-data pipeline (score every document for a
topic vocabulary, keep or weight by relevance).

Reference analogue: the per-record scorer of M3/M9
(``services/harvest_service.py:169-183`` — every record gets a scalar
quality/relevance score from its content before gating); generalized
here to corpus-statistics-aware scoring (IDF needs a corpus pass, not
just the record).

Scale plan: two streaming passes, no all-to-all shuffle of payload.
Pass 1 computes per-batch PARTIAL document frequencies for the query
terms (a |terms|+1-row table per batch) and reduces them with one tiny
``groupby(term).sum`` — the exchange moves O(batches × |terms|) rows,
never tokens. The reduced DF table (≤ |terms|+1 rows, bounded by the
QUERY size, not the corpus) is the only driver hop. Pass 2 is
embarrassingly parallel: tokenize each batch once (Arrow split), count
term hits with ``np.bincount`` over segment ids, and combine with the
broadcast IDF constants. Smoothed IDF ``ln((1+N)/(1+df))`` keeps the
formula total (df=0 safe) and bitwise-reproducible against the SQL
oracle: scores are accumulated per document in query-term order,
matching SQL's left-to-right ``+``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_DOCS_SENTINEL = "\x1e__n_docs__"


def _tokenize(t: pa.Table, text_col: str):
    """One vectorized whitespace tokenization per batch: flat token
    array + each token's document segment id. Matches DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')`` exactly (an empty
    document yields one empty token, which matches no query term)."""
    lists = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t[text_col]), pattern=r"\s+"
    )
    lengths = (
        pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), lengths)
    return pc.list_flatten(lists), doc_idx


def term_doc_frequencies(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    text_col: str = "text",
) -> tuple[np.ndarray, int]:
    """Document frequency of each query term plus the corpus document
    count, in ONE pass: per-batch partials (|terms|+1 rows each) →
    one tiny groupby-sum → a ≤|terms|+1-row driver table. Bounded by
    the query-term list, never the corpus."""
    terms = list(terms)

    def partial(t: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(t, text_col)
        n = len(t)
        dfs = []
        for term in terms:
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            if hit.any():
                dfs.append(int((np.bincount(doc_idx[hit], minlength=n) > 0).sum()))
            else:
                dfs.append(0)
        return pa.table(
            {
                "term": pa.array(terms + [_DOCS_SENTINEL]),
                "df": pa.array(np.array(dfs + [n], dtype=np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .sum("df")
        .to_pandas()
    )
    by_term = dict(zip(agg["term"], agg["sum(df)"]))
    n_docs = int(by_term.pop(_DOCS_SENTINEL))
    return np.array([by_term.get(t, 0) for t in terms], dtype=np.int64), n_docs


def tfidf_scores(
    ds: ray.data.Dataset,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Score every document against ``terms``: ``Σ_t tf(doc, t) ·
    ln((1+N)/(1+df(t)))`` (raw term count × smoothed IDF), accumulated
    in term order. Output: (id_col, score) for every document —
    callers gate/TopK downstream. The dataset lineage executes twice
    (DF pass, then scoring); at scale, point both passes at the same
    pruned parquet read."""
    terms = list(terms)
    df, n_docs = term_doc_frequencies(ds, terms, text_col=text_col)
    idf = np.log((1.0 + float(n_docs)) / (1.0 + df.astype(np.float64)))

    def score(t: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(t, text_col)
        n = len(t)
        total = np.zeros(n, dtype=np.float64)
        # accumulate per term IN ORDER: matches the SQL oracle's
        # left-to-right `tf1*idf1 + tf2*idf2 + ...` bit-for-bit
        for j, term in enumerate(terms):
            hit = pc.equal(flat, term).to_numpy(zero_copy_only=False)
            tf = (
                np.bincount(doc_idx[hit], minlength=n).astype(np.float64)
                if hit.any()
                else np.zeros(n, dtype=np.float64)
            )
            total = total + tf * idf[j]
        return pa.table({id_col: t[id_col], "score": pa.array(total)})

    return ds.map_batches(score, batch_format="pyarrow")


def tfidf_oracle_sql(
    table_expr: str, terms: Sequence[str], id_col: str = "doc_id"
) -> str:
    """The ANSI-SQL twin of ``tfidf_scores`` over the same table,
    generated from the same term list so the per-document sum runs in
    the same left-to-right term order as the engine kernel."""
    terms = list(terms)
    for t in terms:
        if "'" in t or "\\" in t:
            raise ValueError(f"query term not SQL-literal-safe: {t!r}")
    tf_cols = ",\n                 ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf{j}"
        for j, t in enumerate(terms)
    )
    df_cols = ",\n                 ".join(
        f"count(*) FILTER (WHERE tf{j} > 0) AS df{j}" for j in range(len(terms))
    )
    score = " + ".join(
        f"tf{j} * ln((1.0 + n) / (1.0 + df{j}))" for j in range(len(terms))
    )
    return f"""
        WITH t AS (
          SELECT {id_col}, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM {table_expr}
        ),
        tf AS (
          SELECT {id_col},
                 {tf_cols}
          FROM t
        ),
        df AS (
          SELECT {df_cols},
                 count(*) AS n
          FROM tf
        )
        SELECT {id_col}, {score} AS score
        FROM tf, df
    """


__all__ = ["term_doc_frequencies", "tfidf_scores", "tfidf_oracle_sql"]
