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


__all__ = [
    "term_doc_frequencies",
    "tfidf_scores",
    "tfidf_oracle_sql",
    "unigram_surprisal",
    "doc_keywords",
]


def unigram_surprisal(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Unigram LM surprisal per document — the CCNet-style
    perplexity quality filter (documents whose tokens are improbable
    under the corpus's own unigram model are noise; suspiciously
    probable ones are boilerplate). Score: mean over the document's
    tokens of ``floor(ln(N_tokens / count(token)) * 1e6)`` — each
    token's surprisal is quantized to integer MICRO-units BEFORE the
    per-document sum, so the aggregate is integer addition:
    order-independent across shuffle/batch boundaries and exactly
    reproducible by the SQL oracle (float SUM order is unspecified in
    both engines; per-term floor removes it from the contract).

    Scale plan: the model is the corpus itself, never a driver-side
    table — (1) tf per (doc, token) completes INSIDE the document
    batch (a document is one atomic row), so the exchange carries
    tf-COMPRESSED rows, not raw token occurrences (all occurrences of
    a token in a doc share one surprisal: ``tf · floor(ln(N/c)·1e6)``
    equals the sum of per-occurrence floors exactly); (2) the (token,
    count) table reduces tf rows with a vocabulary-scale groupby and
    the corpus total is a distributed scalar sum; (3) tf rows JOIN
    their counts with the engine's generic hash equi-join (key-only
    co-location — the count table is never broadcast); (4)
    per-document partial sums reduce to one row per document. Four
    exchanges, all tf-, key- or vocab-scale; payload text never
    moves."""
    from .join import equi_join

    def tf_kernel(t: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(t, text_col)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({id_col: ids[doc_idx], "token": flat.to_pandas()})
        out = df.groupby([id_col, "token"], sort=False, as_index=False).size()
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy()),
                "token": pa.array(out["token"], pa.string()),
                "tf": pa.array(out["size"].to_numpy().astype(np.int64)),
            }
        )

    tok = ds.map_batches(tf_kernel, batch_format="pyarrow")

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("token", sort=False, as_index=False)["tf"].sum()
        return out.rename(columns={"tf": "c"})

    cnt = (
        tok.map_batches(count_partial, batch_format="pandas")
        .groupby("token")
        .sum("c")
        .map_batches(
            lambda t: t.rename_columns(["token", "c"]), batch_format="pyarrow"
        )
    )
    cnt = cnt.materialize()  # consumed twice: the total and the join
    n_total = int(cnt.sum("c") or 0)

    joined = equi_join(tok, cnt, on="token", num_buckets=num_buckets)

    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        tf_v = df["tf"].to_numpy(np.int64)
        surp = np.floor(
            np.log(float(n_total) / df["c"].to_numpy(np.float64)) * 1e6
        ).astype(np.int64)
        out = pd.DataFrame({id_col: df[id_col], "s": surp * tf_v, "k": tf_v})
        return out.groupby(id_col, sort=False, as_index=False).sum()

    from ray.data.aggregate import Sum

    per_doc = (
        joined.map_batches(doc_partial, batch_format="pandas")
        .groupby(id_col)
        .aggregate(Sum("s", alias_name="s"), Sum("k", alias_name="k"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "mean_surprisal_micro": pa.array(s // np.maximum(k, 1)),
            }
        )

    return per_doc.map_batches(finalize, batch_format="pyarrow")


def doc_keywords(
    ds: ray.data.Dataset,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Top-``k`` TF-IDF keywords per document — the salient-term
    extraction step of retrieval indexing and topic tagging. Output:
    (id, token, score_micro, rank) with rank 1..k ordered by score
    desc, token asc.

    Scale plan: (1) tf per (doc, token) is computed INSIDE the
    document batch (a document is one atomic row, so its token counts
    complete within one kernel call — no tf shuffle); (2) document
    frequency reduces tf rows with a vocabulary-scale groupby; (3) tf
    rows JOIN their df by key (never broadcast — same discipline as
    ``unigram_surprisal``); (4) ``topk_per_key`` prunes every block to
    ≤ k rows per doc BEFORE its shuffle. Scores are
    floor(tf · ln(N/df) · 1e6) integer micro-units, so ranking and
    values are exactly reproducible by the SQL oracle."""
    from .aggregates import topk_per_key
    from .join import equi_join

    if n_docs is None:
        n_docs = ds.count()
    n_docs_f = float(n_docs)

    def tf_kernel(t: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(t, text_col)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {id_col: ids[doc_idx], "token": flat.to_pandas()}
        )
        out = df.groupby([id_col, "token"], sort=False, as_index=False).size()
        return pa.table(
            {
                id_col: pa.array(out[id_col].to_numpy()),
                "token": pa.array(out["token"], pa.string()),
                "tf": pa.array(out["size"].to_numpy().astype(np.int64)),
            }
        )

    tf = ds.map_batches(tf_kernel, batch_format="pyarrow")

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        # tf rows are globally unique per (doc, token): counting rows
        # per token IS the document frequency partial
        out = df.groupby("token", sort=False, as_index=False).size()
        return out.rename(columns={"size": "dfc"})

    dfreq = (
        tf.map_batches(df_partial, batch_format="pandas")
        .groupby("token")
        .sum("dfc")
        .map_batches(
            lambda t: t.rename_columns(["token", "dfc"]), batch_format="pyarrow"
        )
    )

    joined = equi_join(tf, dfreq, on="token", num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        tf_v = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfc = t["dfc"].to_numpy(zero_copy_only=False).astype(np.float64)
        micro = np.floor(tf_v * np.log(n_docs_f / dfc) * 1e6).astype(np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                "token": t["token"],
                "score_micro": pa.array(micro),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return topk_per_key(
        scored,
        key=id_col,
        value="score_micro",
        k=k,
        tie="token",
        num_buckets=num_buckets,
    )


def top_collocations(
    ds: ray.data.Dataset,
    k: int = 10,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Collocation mining: the corpus's top-``k`` word bigrams by
    pointwise mutual information — the phrase-detection pass of
    word2vec-style preprocessing ("new york" scores high because its
    parts rarely occur apart). ``PMI = ln(p(w1 w2) / (p(w1)·p(w2)))``
    with counts from the corpus itself, floored to integer micro-units
    so ranking and values are exactly SQL-reproducible; bigrams below
    ``min_count`` are noise-gated (PMI's low-count pathology).

    Scale plan: unigram and bigram counts reduce per-batch partials
    with vocabulary-scale groupbys (documents are atomic rows — the
    partials complete in-batch); bigram rows fetch BOTH word counts
    via two key equi-joins (never broadcast); the final top-k prunes
    per block before a k-bounded driver finish. Five exchanges, all
    vocab-scale."""
    from .aggregates import Sum
    from .join import equi_join

    def uni_partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokenize(t, text_col)
        out = (
            pd.DataFrame({"token": flat.to_pandas()})
            .groupby("token", sort=False, as_index=False)
            .size()
        )
        return pa.table(
            {
                "token": pa.array(out["token"], pa.string()),
                "c1": pa.array(out["size"].to_numpy().astype(np.int64)),
            }
        )

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c1", alias_name="c1"))
        .materialize()
    )
    n1 = int(uni.sum("c1") or 0)

    def bi_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        lists = _pc.split_pattern_regex(
            _pc.utf8_trim_whitespace(t[text_col]), pattern=r"\s+"
        )
        lengths = (
            _pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = lists.combine_chunks().flatten() if isinstance(
            lists, pa.ChunkedArray
        ) else lists.flatten()
        toks = flat.to_pandas().to_numpy(dtype=object)
        total = int(lengths.sum())
        offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        pos = np.arange(total, dtype=np.int64) - np.repeat(offsets, lengths)
        doc_len = np.repeat(lengths, lengths)
        valid = pos <= doc_len - 2  # bigram stays inside its document
        w1 = toks[:-1][valid[:-1]] if total else toks[:0]
        w2 = toks[1:][valid[:-1]] if total else toks[:0]
        out = (
            pd.DataFrame({"w1": w1, "w2": w2})
            .groupby(["w1", "w2"], sort=False, as_index=False)
            .size()
        )
        return pa.table(
            {
                "w1": pa.array(out["w1"], pa.string()),
                "w2": pa.array(out["w2"], pa.string()),
                "c2": pa.array(out["size"].to_numpy().astype(np.int64)),
            }
        )

    big = (
        ds.map_batches(bi_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("c2", alias_name="c2"))
        .materialize()
    )
    n2 = int(big.sum("c2") or 0)
    gated = big.filter(expr=f"c2 >= {int(min_count)}")

    uni_a = uni.map_batches(
        lambda t: t.rename_columns(["w1", "c1a"]), batch_format="pyarrow"
    )
    uni_b = uni.map_batches(
        lambda t: t.rename_columns(["w2", "c1b"]), batch_format="pyarrow"
    )
    joined = equi_join(
        equi_join(gated, uni_a, on="w1", num_buckets=num_buckets),
        uni_b,
        on="w2",
        num_buckets=num_buckets,
    )

    n1f, n2f = float(n1), float(n2)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c2 = df["c2"].to_numpy(np.float64)
        c1a = df["c1a"].to_numpy(np.float64)
        c1b = df["c1b"].to_numpy(np.float64)
        # left-associated exactly like the SQL twin's expression
        pmi = np.floor(
            np.log((c2 * n1f * n1f) / (n2f * c1a * c1b)) * 1e6
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                "w1": df["w1"],
                "w2": df["w2"],
                "n": df["c2"].to_numpy(np.int64),
                "pmi_micro": pmi,
            }
        )
        return out.sort_values(
            ["pmi_micro", "w1", "w2"], ascending=[False, True, True], kind="stable"
        ).head(k)

    top = joined.map_batches(score, batch_format="pandas").to_pandas()
    top = top.sort_values(
        ["pmi_micro", "w1", "w2"], ascending=[False, True, True], kind="stable"
    ).head(k)
    return top.reset_index(drop=True)


DSIR_BUCKETS = 64


def _md5_buckets(tokens: pd.Series, m: int) -> np.ndarray:
    """md5-60bit (the engine's SQL-replayable hash) mod m per token —
    the shared ``partition.md5_mod`` contract."""
    from .partition import md5_mod

    return md5_mod(tokens, m)


def dsir_weights(
    ds: ray.data.Dataset,
    target_col: str,
    target_values: Sequence[str],
    m: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """DSIR importance weights (Data Selection via Importance
    Resampling — Xie et al. 2023, arXiv:2302.03169): score every
    document by how much more likely its hashed-unigram bag is under
    the TARGET distribution (rows where ``target_col`` ∈
    ``target_values``) than under the raw corpus. Selection is then a
    top-k / threshold epilogue (the paper's Gumbel resampling swapped
    for the repo's deterministic-ordering discipline).

    Per-bucket log-ratio λ(b) = ln(p_t(b)/p_r(b)) with Laplace
    smoothing (p(b) = (c(b)+1)/(total+m)) is quantized to integer
    MICRO-units BEFORE the per-document sum (the unigram_surprisal
    discipline): doc score = Σ_tokens floor(λ(bucket(token))·1e6) —
    integer addition, order-independent, exactly SQL-reproducible.

    Scale plan: pass 1 collapses every batch to one m-row bucket-count
    partial (raw + target), reduced by an m-row groupby; the λ table
    is MODEL-sized (m buckets) — the only driver hop — and ships in
    the task closure. Pass 2 is embarrassingly parallel: tokenize,
    hash distinct tokens once per batch, one ``np.bincount`` segmented
    sum per document. Payload never shuffles; the exchange is m rows
    per block."""
    from ray.data.aggregate import Sum

    tvals = list(target_values)

    def counts(t: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(t, text_col)
        b = _md5_buckets(pd.Series(flat.to_pandas(), dtype=object), m)
        is_tgt = np.isin(
            t[target_col].to_numpy(zero_copy_only=False), tvals
        )[doc_idx]
        return pa.table(
            {
                "bucket": np.arange(m, dtype=np.int64),
                "c_raw": np.bincount(b, minlength=m).astype(np.int64),
                "c_tgt": np.bincount(b[is_tgt], minlength=m).astype(np.int64),
            }
        )

    red = (
        ds.map_batches(counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("c_raw", alias_name="c_raw"), Sum("c_tgt", alias_name="c_tgt"))
        .to_pandas()  # m rows: bounded by the model, not the data
        .sort_values("bucket", kind="stable")
    )
    c_raw = np.zeros(m, dtype=np.int64)
    c_tgt = np.zeros(m, dtype=np.int64)
    c_raw[red["bucket"].to_numpy(np.int64)] = red["c_raw"].to_numpy(np.int64)
    c_tgt[red["bucket"].to_numpy(np.int64)] = red["c_tgt"].to_numpy(np.int64)
    R, T = int(c_raw.sum()), int(c_tgt.sum())
    lam_micro = np.floor(
        (
            np.log(c_tgt.astype(np.float64) + 1.0)
            - np.log(float(T + m))
            - np.log(c_raw.astype(np.float64) + 1.0)
            + np.log(float(R + m))
        )
        * 1e6
    ).astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        flat, doc_idx = _tokenize(t, text_col)
        b = _md5_buckets(pd.Series(flat.to_pandas(), dtype=object), m)
        s = np.bincount(doc_idx, weights=lam_micro[b].astype(np.float64),
                        minlength=len(t)).astype(np.int64)
        # bincount weights go through float64: exact for |sum| < 2^53
        # micro-units (~9e8 tokens/doc at λ ~ 10 — far past any doc)
        return pa.table(
            {
                id_col: t[id_col],
                "dsir_score_micro": pa.array(s),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
