"""Text analysis operators over the documents table.

The reference's scalar/enrichment stages (M8 label translation, M9-M11
color scalar functions — ``utils/TranslateObject.py``,
``utils/ColorDetector.py``) map here to per-document text metrics:
fingerprinting, token statistics, quality scoring, and a heuristic
language id. All are stateless vectorized ``map_batches`` stages; the
ratio metrics use pure integer arithmetic (milli-units) so Ray and
DuckDB agree bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")

# Tiny per-language stopword profiles for the heuristic lang-id (the
# shape of a real n-gram language model stage; deterministic).
LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "is", "to"},
    "de": {"der", "die", "das", "und", "ist", "ein"},
    "fr": {"le", "la", "et", "les", "des", "est"},
    "es": {"el", "la", "los", "las", "es", "una"},
}


def fingerprint_batch(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    fps = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
    return pa.table({"doc_id": t["doc_id"], "fp": pa.array(fps, pa.string())})


def fingerprint_docs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact document fingerprint (md5 of text)."""
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def token_stats_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = df["text"].str.strip().str.split()
    n_tokens = toks.map(len).to_numpy(dtype=np.int64)
    n_unique = toks.map(lambda ws: len(set(w.lower() for w in ws))).to_numpy(dtype=np.int64)
    sum_chars = toks.map(lambda ws: sum(len(w) for w in ws)).to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": n_tokens,
            "n_unique_tokens": n_unique,
            "mean_token_len_milli": np.where(
                n_tokens > 0, (sum_chars * 1000) // np.maximum(n_tokens, 1), 0
            ).astype(np.int64),
        }
    )


def token_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(token_stats_batch, batch_format="pandas")


# BPE-ish pre-tokenizer: word pieces / digit runs / punctuation runs,
# each optionally absorbing one leading space (the GPT-2 convention,
# minus RE2-unsupported lookaheads). RE2 semantics are identical in
# Arrow (pc.count_substring_regex) and DuckDB (regexp_extract_all),
# so the count is exactly SQL-checkable.
BPE_ISH_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+"


def bpe_token_count_batch(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = pc.count_substring_regex(t["text"], BPE_ISH_PATTERN)
    return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())})


def bpe_token_count(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Regex (BPE-ish) token counts — zero-copy Arrow, no Python rows."""
    return ds.map_batches(bpe_token_count_batch, batch_format="pyarrow")


def quality_batch(df: pd.DataFrame) -> pd.DataFrame:
    toks = df["text"].str.strip().str.split()
    n_tokens = toks.map(len).to_numpy(dtype=np.int64)
    stop = frozenset(STOPWORDS)
    n_stop = toks.map(lambda ws: sum(1 for w in ws if w.lower() in stop)).to_numpy(
        dtype=np.int64
    )
    n_chars = df["text"].str.len().to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "stop_ratio_milli": np.where(
                n_tokens > 0, (n_stop * 1000) // np.maximum(n_tokens, 1), 0
            ).astype(np.int64),
        }
    )


def quality_score(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Quality metrics (length / stopword ratio) — the text analogue of
    the reference's confidence/size gates (M4/A3)."""
    return ds.map_batches(quality_batch, batch_format="pandas")


class LangId:
    """Heuristic stopword-profile language id — a stateful enrichment
    stage shaped like the reference's model scorer (ST1: load once per
    actor in __init__, score per batch).

    Fully vectorized (r3 verdict item 6): Arrow lower/trim/regex-split
    explodes tokens once, one ``pc.is_in`` membership probe per
    profile, segmented per-doc counts via ``np.bincount`` over the
    repeat-index — no Python loop over rows or tokens. Tie semantics
    match the original per-row loop exactly: first profile in
    ``LANG_PROFILES`` order with the strictly-highest hit count wins;
    zero hits everywhere → "unknown"."""

    def __init__(self):
        self.langs = list(LANG_PROFILES)
        self.value_sets = [
            pa.array(sorted(LANG_PROFILES[lang])) for lang in self.langs
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc

        n = len(df)
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                pc.utf8_lower(pa.array(df["text"], pa.string()))
            ),
            pattern=r"\s+",
        )
        lengths = (
            pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(lists)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
        counts = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, vs in enumerate(self.value_sets):
            hit = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            if hit.any():
                counts[:, j] = np.bincount(doc_idx[hit], minlength=n)
        best = counts.argmax(axis=1)  # first max = LANG_PROFILES order
        lang = np.asarray(self.langs, dtype=object)[best]
        lang[counts.max(axis=1, initial=0) == 0] = "unknown"
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": lang})


def lang_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 2))


def explode_tokens(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One-to-many expansion (the generic flat_map): each document's
    whitespace tokens as (id, pos, token) rows — the token-level view
    that vocabulary builds, position-weighted features, and n-gram
    scans consume. Embarrassingly parallel, vectorized end-to-end
    (Arrow split + list_flatten; ids/positions by ``np.repeat`` over
    list lengths — no Python rows). Matches DuckDB
    ``unnest(regexp_split_to_array(trim(text), '\\s+'))`` exactly,
    including the single-empty-token row for an empty document.

    Reference analogue: the video→frame expansion of S3
    (``services/harvest_service.py:131-158``) — one input record
    becoming an ordered stream of derived records."""

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t[text_col]), pattern=r"\s+"
        )
        lengths = (
            pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
        pos = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(
            offsets, lengths
        )
        return pa.table(
            {
                id_col: pa.array(
                    np.repeat(t[id_col].to_numpy(zero_copy_only=False), lengths)
                ),
                "pos": pa.array(pos),
                "token": pc.list_flatten(lists),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def explode_ngrams(
    ds: ray.data.Dataset,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Word n-grams as (id, pos, ngram) rows — the n-gram-granular
    expansion behind shingle fingerprints and benchmark-overlap checks
    (contamination at phrase rather than snippet granularity).
    Documents with fewer than ``n`` tokens emit nothing.

    Vectorized: one Arrow split per batch, then the n-gram strings are
    assembled by n-1 shifted pandas object-array concatenations over
    the FLAT token array; windows that would cross a document boundary
    are masked out by position, so no per-document loop runs."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def kernel(t: pa.Table) -> pa.Table:
        ids, pos, grams = _ngram_arrays(t, n, text_col, id_col)
        return pa.table(
            {
                id_col: pa.array(ids),
                "pos": pa.array(pos),
                "ngram": pa.array(grams, pa.string()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def _ngram_arrays(t: pa.Table, n: int, text_col: str, id_col: str):
    """Shared vectorized n-gram expansion over one batch: (doc ids,
    in-doc positions, ngram strings) for every valid window. One Arrow
    split, n-1 shifted object-array concatenations over the FLAT token
    array; windows crossing a document boundary are masked by
    position — no per-document loop."""
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(t[text_col]), pattern=r"\s+"
    )
    lengths = (
        pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    flat = pd.Series(pc.list_flatten(lists).to_pandas(), dtype=object)
    total = int(lengths.sum())
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets, lengths)
    doc_len = np.repeat(lengths, lengths)
    valid = pos <= doc_len - n  # window stays inside its document
    if total and n > 1:
        grams = flat.copy()
        for k in range(1, n):
            grams = grams + " " + flat.shift(-k)
    else:
        grams = flat
    ids = np.repeat(t[id_col].to_numpy(zero_copy_only=False), lengths)
    return ids[valid], pos[valid], grams.to_numpy()[valid]


def ngram_repetition(
    ds: ray.data.Dataset,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Within-document n-gram repetition — the published
    repetition-based quality gate (Gopher / MassiveText-style filters:
    a document whose n-grams are mostly repeats of themselves is
    boilerplate or degenerate generation). Output per document with
    ≥ n tokens: total windows, distinct windows, and
    ``dup_ratio_milli = (total - distinct) * 1000 // total`` — integer
    milli-units so the SQL oracle compares exactly (the d_quality
    convention). Documents shorter than ``n`` tokens emit nothing
    (they have no window), matching the SQL explode.

    Embarrassingly parallel: the shared vectorized window expansion
    runs per batch and the distinct count is a C-level per-batch
    drop_duplicates — documents never leave their batch, nothing
    shuffles."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def kernel(t: pa.Table) -> pa.Table:
        ids, _, grams = _ngram_arrays(t, n, text_col, id_col)
        if not len(ids):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_ngrams": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "dup_ratio_milli": pa.array([], pa.int64()),
                }
            )
        df = pd.DataFrame({id_col: ids, "ngram": grams})
        tot = df.groupby(id_col, sort=True).size()
        dis = df.drop_duplicates().groupby(id_col, sort=True).size()
        tot_v = tot.to_numpy().astype(np.int64)
        dis_v = dis.to_numpy().astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(tot.index.to_numpy()),
                "n_ngrams": pa.array(tot_v),
                "n_distinct": pa.array(dis_v),
                "dup_ratio_milli": pa.array((tot_v - dis_v) * 1000 // tot_v),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def doc_dedup_exact(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact text dedup: one surviving doc (min doc_id) per distinct
    text, via content-hash groupby — the scalable exact-dedup pattern
    (hash first in map_batches, shuffle only the hash + id)."""
    from ray.data.aggregate import Count, Min

    fp = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return fp.groupby("fp").aggregate(
        Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dups")
    )


def assistant_echo_rate(
    ds: ray.data.Dataset,
    num_buckets: int | None = None,
    prev_role: str | None = "user",
    within_role: str | None = None,
) -> ray.data.Dataset:
    """Transcript-native quality signal: for every assistant turn
    whose PREVIOUS turn (in turn order) is a user turn, the fraction
    of the assistant's distinct tokens that already appear in that
    user turn — ``echo_milli = 1000 * |A ∩ U| // |A|`` on distinct
    token sets. High echo = the assistant is parroting the prompt
    (low-value training signal); the per-turn twin of the corpus
    repetition gate.

    One hash(conv_id) shuffle of (conv, turn, role, text); per bucket
    the previous row comes from the shared dedup+sort pass
    (``prepare_bucket``) and a factorized-code boundary mask, token
    sets from ONE Arrow split per column + C-level distinct, and the
    intersection from a vectorized (row, token) self-merge — no
    per-row Python.

    Reference analogue: M2's skip-counter compares each detection to
    the PREVIOUS state of its track before keeping it
    (``condition.py:79-101``); here the "previous state" is the prior
    turn's token set.

    ``prev_role`` selects the comparison turn's role: "user" (default)
    measures prompt parroting against the immediately preceding turn;
    ``prev_role=None`` with ``within_role="assistant"`` restricts the
    sequence to the assistant's OWN turns first and compares each to
    the assistant's previous response — SELF-repetition, the
    degenerate-loop detector (an agent stuck re-emitting its own
    output). The role filter runs BEFORE the shuffle, so the loop
    detector ships only assistant rows."""
    from .dedup import prepare_bucket
    from .partition import apply_per_bucket

    def _explode_distinct(texts: np.ndarray) -> pd.DataFrame:
        import pyarrow.compute as pc

        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pa.array(texts, pa.string())), pattern=r"\s+"
        )
        lengths = (
            pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        row = np.repeat(np.arange(len(texts), dtype=np.int64), lengths)
        return pd.DataFrame(
            {"r": row, "tok": pc.list_flatten(lists).to_pandas()}
        ).drop_duplicates()

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = prepare_bucket(g)
        empty = pd.DataFrame(
            {
                "conv_id": np.array([], dtype=object),
                "turn_idx": np.array([], dtype=np.int64),
                "echo_milli": np.array([], dtype=np.int64),
            }
        )
        if not len(g):
            return empty
        codes, _ = pd.factorize(g["conv_id"].to_numpy(), sort=False)
        same_conv = np.empty(len(g), dtype=bool)
        same_conv[0] = False
        same_conv[1:] = codes[1:] == codes[:-1]
        role = g["role"].to_numpy()
        text = g["text"].to_numpy()
        prev_role_v = np.roll(role, 1)
        prev_text = np.roll(text, 1)
        mask = same_conv & (role == "assistant")
        if prev_role is not None:
            mask &= prev_role_v == prev_role
        if not mask.any():
            return empty
        cur = text[mask]
        prev = prev_text[mask]
        a = _explode_distinct(cur)
        u = _explode_distinct(prev)
        n = int(mask.sum())
        inter = (
            a.merge(u, on=["r", "tok"]).groupby("r").size()
            .reindex(range(n), fill_value=0)
            .to_numpy()
            .astype(np.int64)
        )
        denom = (
            a.groupby("r").size().reindex(range(n), fill_value=1).to_numpy()
        ).astype(np.int64)  # split of any string yields >= 1 token
        return pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy()[mask],
                "turn_idx": g["turn_idx"].to_numpy()[mask],
                "echo_milli": inter * 1000 // np.maximum(denom, 1),
            }
        )

    if within_role is not None:
        # restrict the sequence BEFORE the shuffle: the loop detector
        # ships only that role's rows
        ds = ds.filter(expr=f"role == '{within_role}'")
    return apply_per_bucket(ds, kernel, key="conv_id", num_buckets=num_buckets)


def lang_confusion(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Model-evaluation confusion matrix as an operator: predicted
    language (the LangId heuristic) vs the labeled ``lang`` column,
    counted per (lang, lang_pred) cell. Per-batch partial counts keep
    the exchange confusion-matrix-sized — the prediction pass never
    shuffles documents. The eval-loop shape of any per-record model
    stage (reference analogue: M9's scorer feeding A7's vote,
    ``utils/ClassificationObject.py:105-113``)."""
    from ray.data.aggregate import Sum

    lid = LangId()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = lid(df)
        out = pd.DataFrame(
            {
                "lang": df["lang"].to_numpy(),
                "lang_pred": out["lang_pred"].to_numpy(),
                "n": np.int64(1),
            }
        )
        return out.groupby(["lang", "lang_pred"], sort=False, as_index=False)["n"].sum()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
    )


def length_percentile_gate(
    ds: ray.data.Dataset, q_num: int = 3, q_den: int = 4
) -> ray.data.Dataset:
    """Per-language percentile quality calibration: keep documents at
    or above their language's q-th length percentile (default: top
    quartile by ``n_chars``), with "at the percentile" defined by
    strict rank so the gate is pure integer arithmetic — a doc
    survives iff ``q_den * |{same-lang docs with smaller n_chars}| >=
    q_num * n_lang``. Calibrating a filter threshold per group instead
    of globally is the standard quality-gate refinement (a fixed
    global cutoff over/under-prunes whole languages).

    Scale plan: per-batch (lang, n_chars, cnt) partial counts collapse
    the corpus to a languages-by-distinct-values table (lengths are
    integers; for continuous scores quantize to fixed-width bins
    first) before the one tiny groupby; per-language thresholds come
    from the cumulative counts of that table (driver-side, its size
    is model-shaped, not corpus-shaped) and broadcast back as a
    lang -> min-surviving-value map probed per batch. Documents never
    shuffle. Reference analogue: the per-class confidence thresholds
    applied before accepting a detection (``.env:46``,
    ``services/harvest_service.py:170-176``), made data-calibrated.

    Output: (doc_id, lang, n_chars) of surviving docs."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "lang": df["lang"].to_numpy(),
                "n_chars": df["n_chars"].to_numpy(np.int64),
                "cnt": np.int64(1),
            }
        )
        return out.groupby(["lang", "n_chars"], sort=False, as_index=False)["cnt"].sum()

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # langs x distinct-lengths rows: model-shaped
    )
    hist = hist.sort_values(["lang", "n_chars"], kind="stable")
    grp = hist.groupby("lang", sort=False)
    n_lang = grp["cnt"].transform("sum").to_numpy(np.int64)
    cum_less = (grp["cnt"].cumsum() - hist["cnt"]).to_numpy(np.int64)
    ok = q_den * cum_less >= q_num * n_lang
    thr = (
        hist.loc[ok]
        .groupby("lang", sort=False)["n_chars"]
        .min()  # survival is monotone in value: keep iff value >= threshold
        .to_dict()
    )
    thr_ref = ray.put(thr)

    def gate(t: pa.Table) -> pa.Table:
        th = ray.get(thr_ref)
        langs = t["lang"].to_pylist()
        nc = t["n_chars"].to_numpy(zero_copy_only=False)
        keep = np.fromiter(
            (lang in th and c >= th[lang] for lang, c in zip(langs, nc)),
            dtype=bool,
            count=len(langs),
        )
        return t.select(["doc_id", "lang", "n_chars"]).filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow")


def freq_spectrum(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Vocabulary frequency-of-frequencies (the Zipf / Good-Turing
    spectrum): for each global token frequency f, how many distinct
    tokens occur exactly f times. The corpus-QA curve that data
    curation reads to spot boilerplate floods (mass at huge f) and
    OCR noise (mass at f=1).

    Scale plan: per-batch Arrow ``value_counts`` collapses each block
    to (token, cnt) partials before the ONE vocab-sized exchange; the
    spectrum reduction is then a second, spectrum-sized groupby over
    per-block (freq, 1) partials — the corpus itself never shuffles.
    Tokenization is the shared trim+``\\s+`` split, matching DuckDB's
    ``regexp_split_to_array`` exactly."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def vocab_partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t[text_col]), pattern=r"\s+"
        )
        vc = pc.value_counts(pc.list_flatten(lists))
        return pa.table(
            {
                "token": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    vocab = (
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("cnt", alias_name="freq"))
    )

    def spec_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["freq"])
        return pa.table(
            {
                "freq": vc.field("values").cast(pa.int64()),
                "n_tokens": vc.field("counts").cast(pa.int64()),
            }
        )

    return (
        vocab.map_batches(spec_partial, batch_format="pyarrow")
        .groupby("freq")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"))
    )


def source_dup_stats(ds: ray.data.Dataset) -> pd.DataFrame:
    """Per-source corpus hygiene profile: document count, distinct
    content count (by md5 fingerprint), and duplicated-doc count — the
    "which domains are flooding us with boilerplate" report that
    drives per-source sampling weights.

    Scale plan: ONE pass, one exchange. Each batch collapses to
    (source, fp, cnt) partials — the row count rides along with the
    distinct pair, so doc counts and distinct counts come from the
    same exchange; pairs co-locate by hash(fp) — NOT by source, whose
    handful of values would funnel the corpus's whole distinct set
    through a few buckets — the bucket kernel merges duplicate pairs
    exactly and emits sources-sized (n_docs, n_distinct) partials,
    and the final groupby is sources-sized. Only distinct (source,
    fp, cnt) rows ever cross the exchange, never text.
    Output: (source, n_docs, n_distinct)."""
    from ray.data.aggregate import Sum

    from .partition import apply_per_bucket, to_clean_arrow

    def fp_partial(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in t["text"].to_pylist()
        ]
        df = pd.DataFrame(
            {"source": t["source"].to_pylist(), "fp": fps, "cnt": np.int64(1)}
        )
        return to_clean_arrow(
            df.groupby(["source", "fp"], sort=False, as_index=False)["cnt"].sum()
        )

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby(["source", "fp"], sort=False, as_index=False)["cnt"].sum()
        return (
            u.assign(n_distinct=np.int64(1))
            .groupby("source", sort=False, as_index=False)
            .agg(n_docs=("cnt", "sum"), n_distinct=("n_distinct", "sum"))
        )

    pairs = ds.map_batches(fp_partial, batch_format="pyarrow")
    out = (
        apply_per_bucket(pairs, bucket_count, key="fp")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_distinct", alias_name="n_distinct"),
        )
        .to_pandas()  # sources-sized
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def _token_counts(ds: ray.data.Dataset, out_col: str) -> ray.data.Dataset:
    """(token, count) reduction: per-batch Arrow value_counts partials
    before the one vocab-sized groupby (shared by freq_spectrum /
    vocab_drift)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t["text"]), pattern=r"\s+"
        )
        vc = pc.value_counts(pc.list_flatten(lists))
        return pa.table(
            {"token": vc.field("values"), out_col: vc.field("counts").cast(pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum(out_col, alias_name=out_col))
    )


def vocab_drift(
    docs_a: ray.data.Dataset,
    docs_b: ray.data.Dataset,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Vocabulary drift between two corpus snapshots: per token, its
    count in snapshot A vs snapshot B, tokens present in EITHER — the
    distribution-shift report (new slang, vanished boilerplate, burst
    topics) a continuously-harvested corpus needs per epoch.

    Plan: each side reduces to (token, count) via per-batch
    value_counts partials; the FULL OUTER ``equi_join`` co-locates the
    two vocab-sized tables with one hash(token) exchange; absent-side
    counts coalesce to 0 in the final projection (keeping the gate's
    int64 hashing exact). Documents never shuffle.
    Output: (token, n_a, n_b)."""
    from .join import equi_join

    a = _token_counts(docs_a, "n_a")
    b = _token_counts(docs_b, "n_b")
    joined = equi_join(a, b, on="token", how="outer", num_buckets=num_buckets)

    def coalesce(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "token": df["token"].to_numpy(),
                "n_a": df["n_a"].fillna(0).to_numpy(np.int64),
                "n_b": df["n_b"].fillna(0).to_numpy(np.int64),
            }
        )

    return joined.map_batches(coalesce, batch_format="pandas")


def winnow_fingerprints(
    ds: ray.data.Dataset,
    n: int = 3,
    window: int = 4,
) -> ray.data.Dataset:
    """Winnowing document fingerprints (the MOSS sketch — Schleimer,
    Wilkerson & Aiken, SIGMOD'03): hash every word ``n``-gram
    (md5-60bit, the engine's SQL-replayable hash) and keep the DISTINCT
    per-window minima over each run of ``window`` consecutive gram
    hashes. Two documents sharing a sufficiently long verbatim span
    are guaranteed to share a selected fingerprint — the
    plagiarism/boilerplate sketch whose size is ~2/(window+1) of the
    gram count, independent of where duplication sits.

    Vectorized and embarrassingly parallel: one Arrow split + shifted
    concatenations build grams (shared ``_ngram_arrays``), one flat
    ``sliding_window_view`` min with doc-boundary masking — a document
    is atomic within its batch, so per-batch distinct IS global
    distinct and nothing shuffles. Documents with fewer than
    ``n + window - 1`` tokens emit nothing (no full window exists).
    Output: (doc_id, hv) exploded fingerprint rows."""
    from numpy.lib.stride_tricks import sliding_window_view

    def kernel(t: pa.Table) -> pa.Table:
        ids, pos, grams = _ngram_arrays(t, n, "text", "doc_id")
        if len(grams) < window:
            return pa.table(
                {
                    "doc_id": pa.array(np.array([], np.int64)),
                    "hv": pa.array(np.array([], np.int64)),
                }
            )
        hv = np.fromiter(
            (
                int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
                for g in grams
            ),
            dtype=np.int64,
            count=len(grams),
        )
        sw = sliding_window_view(hv, window).min(axis=1)
        # a window is valid iff it stays inside one document: grams are
        # flat in doc order, so same doc id at both ends suffices
        valid = ids[: len(sw)] == ids[window - 1 :]
        out = pd.DataFrame(
            {"doc_id": ids[: len(sw)][valid], "hv": sw[valid]}
        ).drop_duplicates()
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
                "hv": pa.array(out["hv"].to_numpy(np.int64)),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


# Gopher-style document-quality rule bounds (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Table A1 heuristics, adapted
# to integer-exact comparisons so the SQL oracle hashes identically):
# word count in [min,max]; mean word length in [3,10] chars; symbol
# ("#", "...") to word ratio <= 0.1; >= 80% of words contain an
# alphabetic character.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 400


def gopher_gate_batch(t: pa.Table) -> pa.Table:
    """One zero-copy Arrow pass; every rule is integer arithmetic over
    RE2 counts (identical semantics in Arrow and DuckDB — the
    BPE_ISH_PATTERN discipline), so flags never touch floats."""
    import pyarrow.compute as pc

    txt = t["text"]
    i64 = pa.int64()
    wc = pc.cast(pc.count_substring_regex(txt, r"\S+"), i64)
    sl = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(txt, r"\s", "")), i64
    )
    na = pc.cast(pc.count_substring_regex(txt, r"\S*[A-Za-z]\S*"), i64)
    nsym = pc.cast(
        pc.add(pc.count_substring(txt, "#"), pc.count_substring(txt, "...")),
        i64,
    )
    gate_words = pc.and_(
        pc.greater_equal(wc, GOPHER_MIN_WORDS),
        pc.less_equal(wc, GOPHER_MAX_WORDS),
    )
    # 3 <= mean word length <= 10  <=>  3*wc <= sl AND sl <= 10*wc
    gate_mean_len = pc.and_(
        pc.less_equal(pc.multiply(pa.scalar(3, i64), wc), sl),
        pc.less_equal(sl, pc.multiply(pa.scalar(10, i64), wc)),
    )
    # symbol-to-word ratio <= 0.1  <=>  10*nsym <= wc
    gate_symbols = pc.less_equal(pc.multiply(pa.scalar(10, i64), nsym), wc)
    # alpha-word fraction >= 0.8  <=>  5*na >= 4*wc
    gate_alpha = pc.greater_equal(
        pc.multiply(pa.scalar(5, i64), na), pc.multiply(pa.scalar(4, i64), wc)
    )
    keep = pc.and_(pc.and_(gate_words, gate_mean_len), pc.and_(gate_symbols, gate_alpha))
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": wc,
            "n_word_chars": sl,
            "n_alpha_words": na,
            "n_symbols": nsym,
            "gate_words": gate_words,
            "gate_mean_len": gate_mean_len,
            "gate_symbols": gate_symbols,
            "gate_alpha": gate_alpha,
            "keep": keep,
        }
    )


def gopher_gate(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Gopher-rule quality gate per document — the reference's
    confidence/class filter (M4) shape, applied with the published
    LLM-corpus heuristics. Embarrassingly parallel, no shuffle."""
    return ds.map_batches(gopher_gate_batch, batch_format="pyarrow")


def char_entropy(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Character-entropy quality signal per document — near-zero
    entropy flags degenerate/repetitive text (one repeated char/page
    of padding), abnormally high flags binary-ish noise; the cheap
    first-pass filter before any tokenizer sees the doc.

    Integer-exact contract (the unigram_surprisal discipline): each
    character class contributes ``k · floor(1e6·ln(L/k))``; the
    per-doc sum divides by L with floor at the END, so the value is
    order-independent integer arithmetic and hashes identically to
    the SQL oracle. Entropy is over Unicode code points (utf-32
    view == DuckDB's per-character regexp match).

    Embarrassingly parallel: one utf-32 reinterpret per batch, one
    ``np.unique`` over (doc, codepoint) keys — a document is atomic in
    its batch, so nothing shuffles."""

    def kernel(t: pa.Table) -> pa.Table:
        # null text == empty text: emits nothing (the SQL side's
        # regexp over NULL unnests to zero rows — same absence)
        texts = [s if isinstance(s, str) else "" for s in t["text"].to_pylist()]
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64, count=len(texts))
        nz = lens > 0  # empty docs emit nothing (no chars — matches SQL)
        if not nz.any():
            return pa.table(
                {
                    "doc_id": pa.array(np.array([], np.int64)),
                    "entropy_micro": pa.array(np.array([], np.int64)),
                }
            )
        cp = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        doc_pos = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        # (doc, codepoint) combined key: codepoints < 0x110000
        key = doc_pos * 0x110000 + cp
        uniq, counts = np.unique(key, return_counts=True)
        d = uniq // 0x110000
        L = lens[d]
        term = counts * np.floor(
            1e6 * np.log(L.astype(np.float64) / counts.astype(np.float64))
        ).astype(np.int64)
        sums = np.bincount(d, weights=term.astype(np.float64), minlength=len(texts)).astype(
            np.int64
        )  # exact: |term sums| < 2^53 for any real document
        ent = sums[nz] // lens[nz]
        return pa.table(
            {
                "doc_id": pa.array(ids[nz]),
                "entropy_micro": pa.array(ent),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def normalize_text(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical text normalization: Unicode NFC → lowercase →
    whitespace collapse → trim, plus the normalized length and a
    changed flag — the deterministic pre-pass shared by dedup keys
    and tokenizers (normalizing INSIDE each consumer would fork the
    canon; reference analogue: the per-record normalize step M3,
    services/harvest_service.py:169-183).

    The lower / collapse / trim steps are zero-copy Arrow kernels with
    exact DuckDB equivalents (lower / regexp_replace 'g' / trim). NFC
    goes through ``unicodedata.normalize`` — this build's
    ``pc.utf8_normalize`` does NOT apply canonical composition
    (A + U+0301 stays decomposed, diverging from DuckDB's
    nfc_normalize), so the one per-row step is the composition pass;
    ASCII-only batches skip it entirely (one vectorized is-ascii
    check). The gate hashes the exact normalized strings."""
    import unicodedata

    import pyarrow.compute as pc

    def kernel(t: pa.Table) -> pa.Table:
        txt = t["text"]
        # NFC is the identity on pure-ASCII input: normalize only when
        # a batch actually carries non-ASCII (the vectorized check is
        # one regex over the batch)
        if pc.any(pc.match_substring_regex(txt, r"[^\x00-\x7F]")).as_py():
            txt = pa.array(
                [
                    None if s is None else unicodedata.normalize("NFC", s)
                    for s in txt.to_pylist()
                ],
                pa.string(),
            )
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(pc.utf8_lower(txt), r"\s+", " ")
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": norm,
                "n_chars_norm": pc.cast(pc.utf8_length(norm), pa.int64()),
                "changed": pc.not_equal(norm, t["text"]),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow")


def tokenizer_fertility(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Tokenizer fertility per predicted language: characters per
    BPE-ish token (milli-exact: 1000·Σchars // Σtokens) plus the doc
    and token totals — the "is the tokenizer efficient for this
    language" health metric a multilingual corpus pipeline tracks
    (high fertility = the vocabulary underserves that language).

    One fused metric pass (LangId + regex token count share the
    batch), then a per-batch partial per language — the exchange is
    |languages| rows per block."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    lang_stage = LangId()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # null text counts as an empty doc (0 chars / 0 tokens); the
        # Arrow count kernels would otherwise propagate nulls and
        # refuse the zero-copy numpy conversion
        df = df.assign(text=df["text"].fillna(""))
        lang = lang_stage(df)["lang_pred"].to_numpy()
        txt = pa.array(df["text"], pa.string())
        n_bpe = (
            pc.count_substring_regex(txt, BPE_ISH_PATTERN)
            .cast(pa.int64())
            .to_numpy()
        )
        n_chars = pc.utf8_length(txt).cast(pa.int64()).to_numpy()
        out = pd.DataFrame(
            {
                "lang_pred": lang,
                "n_docs": np.int64(1),
                "n_chars": n_chars,
                "n_bpe_tokens": n_bpe,
            }
        )
        return out.groupby("lang_pred", sort=False, as_index=False).sum()

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang_pred")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
            Sum("n_bpe_tokens", alias_name="n_bpe_tokens"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        ch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        tk = t["n_bpe_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "fertility_milli", pa.array(ch * 1000 // np.maximum(tk, 1))
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
