"""End-to-end corpus-prep composite: the "switch your whole prep flow
to this engine" showcase.

The reference's harvesting loop chains its gates the same way in one
pass over the stream (``main.py:86-178``: conf/class filter -> non-empty
gate -> dup suppression -> projection -> sink); the training-data
analogue chains language id -> quality gate -> near-dup-group
suppression -> token metrics -> train/val/test split over the
``documents`` table.

Scale plan (100 TB):

- ONE pass over the payload computes every per-doc metric fused
  (``CorpusMetrics``: lang id + quality + BPE-ish token count share the
  tokenization work); the gates then filter INSIDE the stream, so
  rejected docs never reach the expensive sketch stage.
- near-dup suppression runs the banded MinHash-LSH plan
  (``stages.dedup_approx``) over the *survivors only* — candidates,
  verification and connected components all stay distributed; the
  final loser-id set lands on the driver and is broadcast back via
  ``ray.put`` for the filter ONLY while it is provably small — past
  ``losers_cap`` grouped ids the plan switches to a fully distributed
  anti-join over survivor metadata (zero corpus-proportional driver
  hops; the broadcast stays the fast path for realistic dup rates).
  Exact duplicates need no separate pass: identical texts share every
  shingle (Jaccard = 1000 >= any threshold), so the component's
  min-id keep-one subsumes exact dedup.
- the output projection drops the payload; everything after the metric
  pass ships metadata only.

The whole chain is SQL-checkable bit-for-bit (driver query
``d_corpus_prep``): every metric is integer milli-units, the split is
the golden-ratio integer hash, and the near-dup closure has the exact
5-gram-Jaccard recursive-CTE oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.partition import to_clean_arrow
from ..stages.text import BPE_ISH_PATTERN, LangId, quality_batch


class CorpusMetrics:
    """Fused one-pass per-doc metrics (ST1-style: profile tables built
    once per actor in ``__init__``). Keeps the payload column — the
    downstream near-dup sketcher still needs it; the final projection
    drops it."""

    def __init__(self) -> None:
        self._lang = LangId()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = quality_batch(df)  # doc_id, n_chars, n_tokens, stop_ratio_milli
        out["lang_pred"] = self._lang(df)["lang_pred"].to_numpy()
        txt = pa.array(df["text"], pa.string())
        out["n_bpe_tokens"] = (
            pc.count_substring_regex(txt, BPE_ISH_PATTERN)
            .cast(pa.int64())
            .to_numpy()
        )
        # Gopher-rule inputs (stages/text.gopher_gate definitions),
        # fused into the same pass — integer counts, no extra
        # tokenization (word count reuses n_tokens: both count \S+
        # runs)
        out["n_word_chars"] = (
            pc.utf8_length(pc.replace_substring_regex(txt, r"\s", ""))
            .cast(pa.int64())
            .to_numpy()
        )
        out["n_alpha_words"] = (
            pc.count_substring_regex(txt, r"\S*[A-Za-z]\S*")
            .cast(pa.int64())
            .to_numpy()
        )
        out["n_symbols"] = (
            pc.add(
                pc.count_substring(txt, "#"), pc.count_substring(txt, "...")
            )
            .cast(pa.int64())
            .to_numpy()
        )
        out["text"] = df["text"].to_numpy()
        return out


def _gate(
    df: pd.DataFrame,
    lang: str,
    min_tokens: int,
    min_stop_milli: int,
    gopher: bool = False,
) -> pa.Table:
    keep = (
        (df["lang_pred"].to_numpy() == lang)
        & (df["n_tokens"].to_numpy() >= min_tokens)
        & (df["stop_ratio_milli"].to_numpy() >= min_stop_milli)
    )
    if gopher:
        from ..stages.text import GOPHER_MAX_WORDS, GOPHER_MIN_WORDS

        wc = df["n_tokens"].to_numpy()
        sl = df["n_word_chars"].to_numpy()
        na = df["n_alpha_words"].to_numpy()
        ns = df["n_symbols"].to_numpy()
        keep &= (
            (wc >= GOPHER_MIN_WORDS)
            & (wc <= GOPHER_MAX_WORDS)
            & (3 * wc <= sl)
            & (sl <= 10 * wc)
            & (10 * ns <= wc)
            & (5 * na >= 4 * wc)
        )
    # Arrow out, metadata-less: pandas blocks carry an unhashable
    # schema that knocks every downstream shuffle aggregator off its
    # schema-dedup fast path (logged once per aggregator)
    return to_clean_arrow(df[keep])


def corpus_prep(
    docs: ray.data.Dataset,
    *,
    lang: str = "en",
    min_tokens: int = 20,
    min_stop_milli: int = 30,
    neardup_threshold_milli: int = 700,
    split_pct: tuple[int, int] = (90, 5),
    num_buckets: int | None = 16,
    keep: str = "min_id",
    losers_cap: int = 2_000_000,
    gopher: bool = False,
) -> ray.data.Dataset:
    """documents (doc_id, text) -> curated corpus manifest
    (doc_id, lang_pred, n_tokens, stop_ratio_milli, n_bpe_tokens, split).

    Lineage note: ``survivors`` is consumed by FOUR downstream passes
    (sketch, verify's involved-doc semi-join, finalize, plus the
    caller); it is materialized once rather than recomputed per
    consumer. The gate output is also the natural checkpoint of a prep
    flow (the resume point before the expensive dedup phase) — at
    100 TB this materialization is the spill-backed equivalent of
    writing the gated corpus to parquet and reading it back, traded
    against 4x re-read + re-compute of the fused metric pass.
    """
    from ..stages.components import connected_components
    from ..stages.dedup_approx import minhash_near_dups

    survivors = docs.map_batches(
        CorpusMetrics,
        batch_format="pandas",
        concurrency=(1, 8),
        # fractional reservation: a whole-CPU autoscaling pool can grab
        # every core of a small session and starve the upstream read
        # task (observed livelock at 4 CPUs) — same rationale as the
        # streaming shard actors
        num_cpus=0.25,
    ).map_batches(
        _gate,
        fn_args=(lang, min_tokens, min_stop_milli, gopher),
        batch_format="pandas",
    ).materialize()

    pairs = minhash_near_dups(
        survivors.select_columns(["doc_id", "text"]),
        threshold_milli=neardup_threshold_milli,
        num_buckets=num_buckets,
    )
    groups_ds = connected_components(
        ray.data.from_pandas(pairs), num_buckets=8
    ).materialize()

    train_p, val_p = split_pct
    meta_cols = [
        "doc_id",
        "lang_pred",
        "n_tokens",
        "stop_ratio_milli",
        "n_bpe_tokens",
    ]

    def split_batch(df: pd.DataFrame) -> pd.DataFrame:
        h = (df["doc_id"].to_numpy(dtype=np.int64) * 2654435761) % 1000
        split = np.where(
            h < train_p * 10,
            "train",
            np.where(h < (train_p + val_p) * 10, "val", "test"),
        )
        return pd.DataFrame(
            {**{c: df[c].to_numpy() for c in meta_cols}, "split": split}
        )

    # Grouped-doc count is corpus-dup-rate-proportional: past the cap
    # the loser-id set is no longer a safe driver hop + broadcast, so
    # switch to the fully distributed anti-join plan (the exchange then
    # moves survivor METADATA only — payload was already projected
    # away). At or below the cap, keep the cheaper broadcast filter.
    if keep not in ("min_id", "best_tokens"):
        raise ValueError(f"unsupported keep={keep!r}")
    if groups_ds.count() > losers_cap:
        from ..stages.join import equi_join
        from ..stages.partition import apply_per_bucket

        if keep == "min_id":
            def min_id_losers(t: pa.Table) -> pa.Table:
                return t.filter(
                    pc.not_equal(t["doc_id"], t["group_id"])
                ).select(["doc_id"])

            losers_ds = groups_ds.map_batches(
                min_id_losers, batch_format="pyarrow"
            )
        else:
            scored = equi_join(
                groups_ds,
                survivors.select_columns(["doc_id", "n_bpe_tokens"]),
                on="doc_id",
                how="inner",
                num_buckets=8,
                # groups are dup-scale, survivors corpus-scale: the
                # group-id key set prunes the survivor shuffle
                prefilter="left",
            )

            def rank_losers(g: pd.DataFrame) -> pd.DataFrame:
                g = g.sort_values(
                    ["group_id", "n_bpe_tokens", "doc_id"],
                    ascending=[True, False, True],
                    kind="stable",
                )
                return g[g.duplicated("group_id")][["doc_id"]]

            losers_ds = apply_per_bucket(
                scored, rank_losers, key="group_id", num_buckets=8
            )
        kept = equi_join(
            survivors.select_columns(meta_cols),
            losers_ds,
            on="doc_id",
            how="anti",
            num_buckets=num_buckets,
        )
        return kept.map_batches(split_batch, batch_format="pandas")

    groups = groups_ds.to_pandas()
    if keep == "min_id":
        losers = groups.loc[
            groups["doc_id"].to_numpy() != groups["group_id"].to_numpy(), "doc_id"
        ].to_numpy(dtype=np.int64)
    elif keep == "best_tokens":
        # quality-ranked survivor: the group member with the most
        # BPE-ish tokens (ties to the smallest id); scores for grouped
        # docs only ride the broadcast-id semi-join
        from ..stages.dedup_approx import _fetch_involved_map

        ids = np.unique(groups["doc_id"].to_numpy().astype(np.int64))
        score_map = _fetch_involved_map(
            survivors, ids, "doc_id", "n_bpe_tokens"
        )
        ranked = groups.assign(
            _score=groups["doc_id"].map(score_map)
        ).sort_values(
            ["group_id", "_score", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        keepers = ranked.drop_duplicates("group_id")["doc_id"].to_numpy(np.int64)
        losers = np.setdiff1d(
            groups["doc_id"].to_numpy().astype(np.int64), keepers
        )
    losers_ref = ray.put(losers)  # at most losers_cap ids: broadcast once

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["doc_id"].isin(ray.get(losers_ref))]
        return split_batch(df)

    return survivors.select_columns(meta_cols).map_batches(
        finalize, batch_format="pandas"
    )
