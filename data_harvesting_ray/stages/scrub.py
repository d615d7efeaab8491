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


def scrub_text(
    ds: ray.data.Dataset,
    rules: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_clean",
) -> ray.data.Dataset:
    """Sequentially apply (pattern, replacement) regex rules to
    ``text_col`` and count total redactions. Returns
    (id_col, out_col, n_redactions); each rule's count is measured on
    the text AFTER earlier rules ran (sequential semantics — what a
    nested ``regexp_replace`` chain computes)."""
    rules = PII_RULES if rules is None else rules

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null text stays null with 0 redactions (a null through the
        # count kernel becomes NaN and would astype to INT64_MIN)
        isnull = pc.is_null(t[text_col])
        cur = pc.coalesce(t[text_col], pa.scalar("", pa.string()))
        total = np.zeros(len(t), dtype=np.int64)
        for pat, rep in rules:
            total += (
                pc.count_substring_regex(cur, pat).to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            cur = pc.replace_substring_regex(cur, pattern=pat, replacement=rep)
        cur = pc.if_else(isnull, pa.scalar(None, pa.string()), cur)
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
