"""Text scrubbing (PII redaction) and benchmark-contamination flags —
the safety/decontamination stages of a training-data prep pipeline.

Reference analogue: the label translation / projection stages that
rewrite record content before export (``utils/TranslateObject.py:1-23``
— static string remap; ``condition.py:130-157`` — content rewritten to
the output vocabulary). Here the rewrite is a vectorized regex pass
over the text payload and the "vocabulary" is a redaction rule list.

Scale notes:
- ``scrub_text`` is embarrassingly parallel: zero-copy Arrow batches,
  one ``pc.replace_substring_regex`` kernel per rule (RE2, compiled
  once inside Arrow) — no shuffle, no Python rows.
- ``contamination_flags`` broadcasts the benchmark snippet list ONCE
  via ``ray.put`` (benchmark suites are small by construction — a few
  thousand strings); every batch runs |snippets| vectorized
  ``pc.match_substring`` passes. For benchmark sets too large to
  broadcast, shard the snippet list and union the flag columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

# Order matters: rules apply sequentially (counts are taken on the
# text as already scrubbed by earlier rules). RE2-compatible — the
# exact same pattern/flags run in Arrow and in DuckDB's
# regexp_replace(..., 'g'), so the output is bit-checkable in SQL.
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
]


def scrub_column(
    col, rules: list[tuple[str, str]] | None = None
):
    """The one shared scrub kernel: sequentially apply (pattern,
    replacement) regex rules to an Arrow string array/chunked-array
    and count total redactions per row. Null text stays null with 0
    redactions (a null through the count kernel becomes NaN and would
    astype to INT64_MIN). Each rule's count is measured on the text
    AFTER earlier rules ran (sequential semantics — what a nested
    ``regexp_replace`` chain computes). Returns (scrubbed_col,
    n_redactions int64 ndarray). Used by both the bounded scrub_text
    and the streaming ``pii_scrub`` enrich stage — one copy of the
    semantics."""
    import pyarrow.compute as pc

    rules = PII_RULES if rules is None else rules
    isnull = pc.is_null(col)
    cur = pc.coalesce(col, pa.scalar("", pa.string()))
    total = np.zeros(len(col), dtype=np.int64)
    for pat, rep in rules:
        total += (
            pc.count_substring_regex(cur, pat).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=rep)
    cur = pc.if_else(isnull, pa.scalar(None, pa.string()), cur)
    return cur, total


def scrub_text(
    ds: ray.data.Dataset,
    rules: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_clean",
) -> ray.data.Dataset:
    """Sequentially apply (pattern, replacement) regex rules to
    ``text_col`` and count total redactions. Returns
    (id_col, out_col, n_redactions); see ``scrub_column`` for the
    kernel contract."""

    def kernel(t: pa.Table) -> pa.Table:
        cur, total = scrub_column(t[text_col], rules)
        return pa.table(
            {id_col: t[id_col], out_col: cur, "n_redactions": pa.array(total)}
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def contamination_flags(
    ds: ray.data.Dataset,
    snippets: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Benchmark decontamination check: for each document, how many of
    the given benchmark ``snippets`` appear verbatim in its text
    (substring containment), and a boolean contamination flag.

    The snippet list is deduplicated and shipped once (``ray.put``);
    ``n_hits`` counts DISTINCT contained snippets (one hit per snippet,
    not per occurrence). Returns (id_col, n_hits, contaminated)."""
    # drop empty snippets: "" is a substring of everything (including
    # the null-coalesced empty text) and would flag the whole corpus
    uniq = sorted(s for s in set(snippets) if s)
    ref = ray.put(uniq)

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        snips = ray.get(ref)
        hits = np.zeros(len(t), dtype=np.int64)
        # null text counts as uncontaminated (see scrub_text)
        col = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
        for s in snips:
            hits += (
                pc.match_substring(col, s)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        return pa.table(
            {
                id_col: t[id_col],
                "n_hits": pa.array(hits),
                "contaminated": pa.array(hits > 0),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def cross_split_contamination(
    ds: ray.data.Dataset,
    n: int = 8,
    pct: tuple[int, int] = (90, 5),
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Test-set decontamination at SUBSTRING granularity: every val /
    test document that shares a verbatim ``n``-token window with ANY
    train document — the leakage whole-document dedup misses (a test
    doc quoting a train doc's paragraph is still leaked). Split
    assignment is the engine's deterministic ``train_split`` hash, so
    no join is needed to label rows and the SQL oracle reproduces it
    exactly. Output: distinct (id, split) of contaminated eval docs.

    Scale plan: the window expansion is the shared vectorized kernel
    with per-batch (id, ngram) distinct partials; only KEY rows
    shuffle, grouped by hash(ngram). Per bucket, a C-level
    transform('max') flags windows seen in train and emits the eval
    docs under them; one final key-only distinct. Unlike
    ``window_dup_pairs`` there is no pair blowup — hot boilerplate
    windows emit their eval docs linearly, so no df cap is needed.
    Window keys ship as STRINGS here to keep the flag exact in one
    pass; at web scale, switch to int64 window hashes plus a verify
    pass against the matched train docs (the ``window_dup_pairs``
    plan) to cut the exchange to 8 B per window."""
    import pandas as pd

    from .partition import apply_per_bucket, to_clean_arrow
    from .text import _ngram_arrays

    train_p, val_p = pct

    def grams_with_split(t: pa.Table) -> pa.Table:
        ids, _, grams = _ngram_arrays(t, n, text_col, id_col)
        df = pd.DataFrame({id_col: ids, "ngram": grams}).drop_duplicates()
        h = (df[id_col].astype(np.int64) * 2654435761) % 1000
        df["split"] = np.where(
            h < train_p * 10,
            "train",
            np.where(h < (train_p + val_p) * 10, "val", "test"),
        )
        return to_clean_arrow(df)

    keyed = ds.map_batches(grams_with_split, batch_format="pyarrow")

    def eval_docs_under_train_windows(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    id_col: np.array([], dtype=np.int64),
                    "split": np.array([], dtype=object),
                }
            )
        g = g.drop_duplicates()  # cross-batch repeats of (id, ngram)
        is_train = (g["split"] == "train").to_numpy()
        has_train = (
            pd.Series(is_train).groupby(g["ngram"].to_numpy()).transform("max")
        ).to_numpy()
        out = g.loc[has_train & ~is_train, [id_col, "split"]]
        return out.drop_duplicates()

    flagged = apply_per_bucket(
        keyed, eval_docs_under_train_windows, key="ngram", num_buckets=num_buckets
    )

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    # the same eval doc can surface under windows in different ngram
    # buckets: one key-only distinct of the (small) flagged list
    return apply_per_bucket(flagged, distinct, key=id_col, num_buckets=num_buckets)


def fuzzy_split_contamination(
    ds: ray.data.Dataset,
    threshold_milli: int = 700,
    pct: tuple[int, int] = (90, 5),
    k: int = 5,
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> "pd.DataFrame":
    """Cross-split NEAR-duplicate contamination: every val / test
    document whose text is an approximate duplicate (exact ``k``-gram
    Jaccard ≥ ``threshold_milli``/1000) of ANY train document — the
    leakage that verbatim-window decontamination
    (``cross_split_contamination``) misses when the copied passage was
    lightly edited. Reference analogue: the near-identical-frame
    suppression the harvest loop applies before export
    (``services/harvest_service.py:206-232``) — here applied ACROSS
    dataset splits instead of across time.

    Scale plan: candidates come from the shared MinHash-LSH band pass
    (signatures once per doc, band-hash shuffle, candidate-scale pair
    table); pairs are pre-filtered to CROSS-split pairs by the
    deterministic split hash — a pure function of the id, so no join
    ships split labels — BEFORE exact verification, so the expensive
    text attachment runs only on train×eval candidates. Verification
    reuses ``verify_pairs_jaccard`` (broadcast under the involved cap,
    two key-only hash joins past it). Output is pair-scale:
    (eval_id, train_id, split, jaccard_milli), sorted.
    """
    import pandas as pd

    from .dedup_approx import minhash_candidates, verify_pairs_jaccard

    train_p, val_p = pct
    cand = minhash_candidates(ds, k=k, num_buckets=num_buckets)

    def cross_only(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        ha = (a * 2654435761) % 1000
        hb = (b * 2654435761) % 1000
        at = ha < train_p * 10
        bt = hb < train_p * 10
        return df[at != bt]

    cross = cand.map_batches(cross_only, batch_format="pandas")
    verified = verify_pairs_jaccard(
        ds, cross, k=k, num_buckets=num_buckets
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["jaccard_milli"].to_numpy() >= threshold_milli]
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        ha = (a * 2654435761) % 1000
        hb = (b * 2654435761) % 1000
        at = ha < train_p * 10
        eval_id = np.where(at, b, a)
        train_id = np.where(at, a, b)
        he = np.where(at, hb, ha)
        split = np.where(he < (train_p + val_p) * 10, "val", "test")
        return pd.DataFrame(
            {
                "eval_id": eval_id,
                "train_id": train_id,
                "split": split,
                "jaccard_milli": df["jaccard_milli"].to_numpy(np.int64),
            }
        )

    out = verified.map_batches(orient, batch_format="pandas").to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "eval_id": np.array([], np.int64),
                "train_id": np.array([], np.int64),
                "split": np.array([], dtype=object),
                "jaccard_milli": np.array([], np.int64),
            }
        )
    # a pair may match in several bands upstream of the distinct pass
    out = out.drop_duplicates()
    return out.sort_values(["eval_id", "train_id"], kind="stable").reset_index(
        drop=True
    )


def overlap_contamination_ratio(
    ds: ray.data.Dataset,
    n: int = 8,
    threshold_milli: int = 200,
    pct: tuple[int, int] = (90, 5),
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """GPT-3-appendix-style decontamination score: for every val/test
    document, the FRACTION of its distinct word ``n``-grams that also
    occur in any train document (the binary window flag of
    ``cross_split_contamination`` graded into a ratio, so borderline
    quote-a-sentence cases are separable from wholesale leaks).
    Output: (id, split, n_grams, n_overlap, ratio_milli, contaminated)
    per eval doc with at least one full window.

    Integer contract: ratio_milli = n_overlap·1000 // n_grams — exact
    counts, floor division, no floats. Scale plan: same key-only
    exchange as cross_split_contamination (distinct (id, ngram) rows
    grouped by hash(ngram)); each bucket emits ONE partial row per
    (eval doc, bucket) — counts, not windows — and a doc-keyed sum
    finishes. No pair blowup, no train-set broadcast."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .partition import apply_per_bucket, to_clean_arrow
    from .text import _ngram_arrays

    train_p, val_p = pct

    def grams_with_split(t: pa.Table) -> pa.Table:
        ids, _, grams = _ngram_arrays(t, n, text_col, id_col)
        df = pd.DataFrame({id_col: ids, "ngram": grams}).drop_duplicates()
        h = (df[id_col].astype(np.int64) * 2654435761) % 1000
        df["split"] = np.where(
            h < train_p * 10,
            "train",
            np.where(h < (train_p + val_p) * 10, "val", "test"),
        )
        return to_clean_arrow(df)

    keyed = ds.map_batches(grams_with_split, batch_format="pyarrow")

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    id_col: np.array([], dtype=np.int64),
                    "split": np.array([], dtype=object),
                    "n_grams": np.array([], dtype=np.int64),
                    "n_overlap": np.array([], dtype=np.int64),
                }
            )
        g = g.drop_duplicates()  # cross-batch repeats of (id, ngram)
        is_train = (g["split"] == "train").to_numpy()
        has_train = (
            pd.Series(is_train).groupby(g["ngram"].to_numpy()).transform("max")
        ).to_numpy()
        ev = g[~is_train].assign(hit=has_train[~is_train].astype(np.int64))
        out = ev.groupby([id_col, "split"], sort=False, as_index=False).agg(
            n_grams=("hit", "size"), n_overlap=("hit", "sum")
        )
        out["n_grams"] = out["n_grams"].astype(np.int64)
        out["n_overlap"] = out["n_overlap"].astype(np.int64)
        return out

    per_bucket = apply_per_bucket(
        keyed, partials, key="ngram", num_buckets=num_buckets
    )

    summed = per_bucket.groupby([id_col, "split"]).aggregate(
        Sum("n_grams", alias_name="n_grams"),
        Sum("n_overlap", alias_name="n_overlap"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        no = t["n_overlap"].to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = no * 1000 // np.maximum(ng, 1)
        return pa.table(
            {
                id_col: t[id_col],
                "split": t["split"],
                "n_grams": pa.array(ng),
                "n_overlap": pa.array(no),
                "ratio_milli": pa.array(ratio),
                "contaminated": pa.array(ratio >= threshold_milli),
            }
        )

    return summed.map_batches(finalize, batch_format="pyarrow")
