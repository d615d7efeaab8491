"""Exact turn dedup — keep one row per (conv_id, turn_idx).

The reference suppresses near-duplicate detections pairwise in
arrival order (D2, ``condition.py:66-77``); per input_hint duplicates
here are byte-identical rows, so dedup is exact and any copy can be
kept (SURVEY.md §7.3).

Physical plan (round 2 — the payload never shuffles):

1. KEY PASS: per batch, hash (conv_id, turn_idx) to one int64
   fingerprint and emit partial counts per fp; a tiny
   ``groupby(fp).sum`` finds fingerprints with multiplicity > 1.
   The shuffle moves ONE int64 per distinct key per block, not rows.
2. FILTER PASS: re-stream the input; rows whose fp is NOT in the dup
   set are globally unique and pass through with zero movement; only
   rows in the dup set (the duplicates themselves, a small fraction)
   go through a hash shuffle + vectorized drop_duplicates.

Fingerprint collisions are conservative-safe: a colliding unique row
is merely routed to the (exact, true-key) dedup path. The dup-fp set
never visits the driver: the per-bucket dup arrays stay in the object
store and one remote task concatenates them into the single sorted
membership array (plasma holds it once per node; split tasks read it
zero-copy). Past ``dup_fp_cap`` dup fingerprints the membership array
itself is no longer a safe per-node broadcast, and the plan degrades
(with a warning naming the cap) to the standard one-shuffle keyed
dedup — payload moves once, correct at any dup rate. The input
dataset's lineage executes twice on the fast path (both passes stream
from the source) — the 100 TB trade is two streaming reads vs
shuffling every payload byte once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .partition import _ensure_hash_shuffle, _stable_hash, apply_per_bucket, default_num_buckets


def dedup_kernel(g: pd.DataFrame) -> pd.DataFrame:
    return g.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")


def prepare_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Dedup on (conv_id, turn_idx) AND sort by (conv, turn_idx) in one
    vectorized pass over factorized int64 keys — far cheaper than
    pandas string-pair drop_duplicates + sort_values, and done ONCE
    per bucket for all kernels (session/CEP/join each used to redo
    it). Conversations come out grouped in first-appearance order
    (kernels need key grouping + turn order, not lexicographic conv
    order)."""
    if not len(g):
        return g
    codes, _ = pd.factorize(g["conv_id"].to_numpy(), sort=False)
    key = (codes.astype(np.int64) << np.int64(32)) | g["turn_idx"].to_numpy().astype(
        np.int64
    )
    order = np.argsort(key, kind="stable")
    sk = key[order]
    keep = np.empty(len(sk), dtype=bool)
    keep[0] = True
    keep[1:] = sk[1:] != sk[:-1]
    return g.iloc[order[keep]].reset_index(drop=True)


def _key_fp(t: pa.Table) -> np.ndarray:
    h = _stable_hash(t["conv_id"].to_numpy(zero_copy_only=False))
    return (
        h * np.uint64(1_000_003)
        + t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
    ).astype(np.int64)


def _dup_fps_ds(ds: ray.data.Dataset, num_buckets: int | None = None) -> ray.data.Dataset:
    """Fingerprints with global multiplicity > 1, as a DATASET (one
    int64 column ``fp``). Partial (fp, n) counts per block,
    hash-repartitioned by fp (the engine's shared bucket primitive —
    far cheaper than a groupby().aggregate() actor round for a single
    int column), summed per partition."""
    b = num_buckets or default_num_buckets()

    def partial_counts(t: pa.Table) -> pa.Table:
        fp, counts = np.unique(_key_fp(t), return_counts=True)
        return pa.table(
            {
                "fp": fp,
                "n": counts.astype(np.int64),
                "bucket": (fp.astype(np.uint64) % np.uint64(b)).astype(np.int64),
            }
        )

    def dups_in_bucket(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy()
        n = t["n"].to_numpy()
        order = np.argsort(fp, kind="stable")
        fp, n = fp[order], n[order]
        uniq, idx = np.unique(fp, return_index=True)
        sums = np.add.reduceat(n, idx) if len(n) else n
        return pa.table({"fp": uniq[sums > 1]})

    _ensure_hash_shuffle()
    parts = ds.map_batches(partial_counts, batch_format="pyarrow").repartition(
        b, keys=["bucket"], sort=False
    )
    return parts.map_batches(dups_in_bucket, batch_format="pyarrow")


def _dup_fps(ds: ray.data.Dataset, num_buckets: int | None = None) -> np.ndarray:
    """Driver-side form of ``_dup_fps_ds`` (tests / small inputs)."""
    out = _dup_fps_ds(ds, num_buckets).to_pandas()
    return np.sort(out["fp"].to_numpy().astype(np.int64))


@ray.remote
def _assemble_sorted(*chunks: pa.Table) -> np.ndarray:
    """Concatenate + sort the per-bucket dup-fp chunks INSIDE a task —
    the membership array is born in the object store and the driver
    only ever holds its ref."""
    # empty blocks come back with an EMPTY schema (no "fp" column)
    arrs = [
        c["fp"].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in chunks
        if "fp" in c.column_names
    ]
    dropped = [c for c in chunks if "fp" not in c.column_names]
    assert all(c.num_rows == 0 for c in dropped), "non-empty chunk without fp"
    if not arrs:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(arrs))


# Above this many dup fingerprints the sorted membership array (~8 B
# each) stops being a safe per-node plasma object + per-task np.isin
# probe, and dedup degrades to the full keyed shuffle.
DUP_FP_CAP = 100_000_000

# Below this many duplicated fingerprints the dup-row branch coalesces
# into one block instead of a keyed hash shuffle (rows carry payload,
# so the cap stays small enough that ~2-4x this many full rows fit one
# worker comfortably).
SMALL_DUP_COALESCE_CAP = 250_000


def dedup_exact(
    ds: ray.data.Dataset,
    num_buckets: int | None = None,
    dup_fp_cap: int = DUP_FP_CAP,
) -> ray.data.Dataset:
    import warnings

    fps = _dup_fps_ds(ds, num_buckets).materialize()
    if fps.count() > dup_fp_cap:
        warnings.warn(
            f"dedup_exact: dup fingerprints exceed dup_fp_cap={dup_fp_cap}; "
            "falling back to the full keyed shuffle (payload moves once)"
        )
        return apply_per_bucket(ds, dedup_kernel, num_buckets=num_buckets)
    dup_set = _assemble_sorted.remote(*fps.to_arrow_refs())

    def split(t: pa.Table, want_dups: bool) -> pa.Table:
        fps = _key_fp(t)
        mask = np.isin(fps, ray.get(dup_set))
        return t.filter(pa.array(mask if want_dups else ~mask))

    unique_rows = ds.map_batches(
        lambda t: split(t, False), batch_format="pyarrow", zero_copy_batch=True
    )
    dup_rows = ds.map_batches(
        lambda t: split(t, True), batch_format="pyarrow", zero_copy_batch=True
    )
    if fps.count() <= SMALL_DUP_COALESCE_CAP:
        # tiny dup set: coalesce the (key-bounded) dup rows into one
        # block and dedup there — skips a keyed hash shuffle whose
        # aggregator-actor spawn cost dwarfs the data (the common case:
        # dup rates are low, so dup ROWS ≈ 2× fps count). Payload rides
        # along, hence the conservative cap; past it the keyed shuffle
        # scales arbitrarily.
        deduped_dups = dup_rows.repartition(1).map_batches(
            dedup_kernel, batch_format="pandas", batch_size=None
        )
    else:
        deduped_dups = apply_per_bucket(
            dup_rows, dedup_kernel, num_buckets=num_buckets
        )
    return unique_rows.union(deduped_dups)


def incremental_dedup(
    new_docs: ray.data.Dataset,
    history: ray.data.Dataset,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Cross-snapshot exact dedup: drop every NEW document whose text
    already exists in a HISTORY corpus (the per-epoch incremental
    ingest pattern — a fresh crawl snapshot deduped against everything
    already harvested, without ever reshuffling or re-materializing
    the history payload).

    Plan: both sides reduce to (fingerprint[, metadata]) rows inside
    ``map_batches`` — md5 of the text, so only 16-byte keys plus the
    new side's few metadata ints cross any exchange, never document
    payloads — then one distributed ANTI ``equi_join`` on the
    fingerprint keeps exactly the unseen new docs. History re-reads
    stream key-only every epoch; the 100 TB variant persists the
    history fingerprint table once and appends to it per epoch, which
    this function accepts as-is (any dataset with an ``fp`` column or
    a ``text`` column works as ``history``).

    Reference analogue: delete-after-process on the queue
    (``queue_harvesting.py:57``) is the reference's only
    "don't re-harvest" mechanism; this is the content-level form.
    Output: (doc_id, lang, n_chars) of surviving new docs."""
    from .join import equi_join
    from .text import fingerprint_batch

    def new_fp(t: pa.Table) -> pa.Table:
        fp = fingerprint_batch(t)["fp"]
        return pa.table(
            {
                "fp": fp,
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "n_chars": t["n_chars"],
            }
        )

    def hist_fp(t: pa.Table) -> pa.Table:
        if "fp" in t.column_names:  # pre-fingerprinted history table
            return t.select(["fp"])
        import hashlib

        fps = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in t["text"].to_pylist()
        ]
        return pa.table({"fp": pa.array(fps, pa.string())})

    left = new_docs.map_batches(new_fp, batch_format="pyarrow")
    right = history.map_batches(hist_fp, batch_format="pyarrow")
    surv = equi_join(left, right, on="fp", how="anti", num_buckets=num_buckets)
    return surv.select_columns(["doc_id", "lang", "n_chars"])


def conv_dedup(
    ds: ray.data.Dataset, num_buckets: int | None = None
) -> ray.data.Dataset:
    """CONVERSATION-level exact dedup: fingerprint each conversation's
    rendered transcript (order-sensitive — same turns in a different
    order are different conversations) and keep the smallest conv_id
    per fingerprint. The whole-sample dedup an SFT corpus needs on top
    of turn-level dedup: re-ingested conversations under new ids
    collapse to one survivor.

    Plan: ``render_conversations``' one hash(conv_id) pass assembles
    each transcript (dedup + turn-order sort fused); per-batch md5
    reduces to (fp, conv_id) KEY pairs; one hash(fp) shuffle of those
    keys picks min(conv_id) per fp. Payload crosses one exchange (the
    irreducible render co-location); the dedup exchange is keys-only.
    Output: (fp, conv_id) survivors.

    Reference analogue: the sink's by-media grouping plus
    delete-after-process (``queue_harvesting.py:57``) — here made
    content-addressed."""
    import hashlib

    from .render import render_conversations

    rendered = render_conversations(ds, num_buckets=num_buckets)

    def fp_batch(t: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(s.encode("utf-8")).hexdigest()
            for s in t["doc"].to_pylist()
        ]
        return pa.table(
            {"fp": pa.array(fps, pa.string()), "conv_id": t["conv_id"]}
        )

    keys = rendered.map_batches(fp_batch, batch_format="pyarrow")

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("fp", sort=False, as_index=False)["conv_id"].min()

    return apply_per_bucket(keys, keep_min, key="fp", num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# Corpus-wide LINE-level exact dedup (the CCNet pre-dedup step)
# ---------------------------------------------------------------------------

# Above this many loser (doc_id, line_idx) pairs the per-node broadcast
# (two int64 arrays, ~16 B/pair) stops being safe and the plan degrades
# to a co-shuffle of docs + losers on hash(doc_id) — payload moves once.
LINE_LOSER_CAP = 50_000_000


def _md5_60(strs) -> np.ndarray:
    """SQL-replayable 60-bit line key: the engine-side twin of DuckDB's
    ``CAST('0x' || substr(md5(line), 1, 15) AS BIGINT)``. Hashing is
    inherently per-string; the caller factorizes first so only UNIQUE
    lines of the batch pay the md5."""
    import hashlib

    return np.fromiter(
        (
            int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
            for s in strs
        ),
        dtype=np.int64,
        count=len(strs),
    )


def _split_lines(t: pa.Table, text_col: str, sep: str):
    """Arrow-native doc→lines explode. Returns (valid_rows_table,
    flat_lines StringArray, counts int64[n_rows], line_idx
    int64[n_lines]) — null-text rows are dropped first (SQL parity:
    ``unnest(string_split(NULL))`` emits nothing)."""
    import pyarrow.compute as pc

    tt = t.filter(pc.is_valid(t[text_col]))
    lists = pc.split_pattern(tt[text_col], pattern=sep)
    flat = pc.list_flatten(lists)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    line_idx = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64), counts
    )
    return tt, flat, counts, line_idx


@ray.remote
def _assemble_losers(*chunks: pa.Table):
    """Concatenate per-bucket loser chunks into the broadcast pair
    (sorted unique doc_ids, sorted composite (doc_rank<<32 | line_idx)
    keys) INSIDE a task — the driver only holds the ref."""
    ds_ = [c for c in chunks if "doc_id" in c.column_names]
    if not ds_:
        e = np.array([], dtype=np.int64)
        return e, np.array([], dtype=np.uint64)
    d = np.concatenate([c["doc_id"].to_numpy(zero_copy_only=False) for c in ds_])
    i = np.concatenate([c["line_idx"].to_numpy(zero_copy_only=False) for c in ds_])
    uniq = np.unique(d)
    rank = np.searchsorted(uniq, d).astype(np.uint64)
    assert i.max(initial=0) < (1 << 32), "a single document with >=2^32 lines"
    comp = (rank << np.uint64(32)) | i.astype(np.uint64)
    return uniq, np.sort(comp)


def _rebuild_batch(
    t: pa.Table,
    drop_docs: np.ndarray,
    drop_comp: np.ndarray,
    text_col: str,
    id_col: str,
    sep: str,
    out_col: str,
) -> pa.Table:
    """Re-emit each doc with its loser lines removed (Arrow-native:
    split → boolean keep mask → rebuilt ListArray → ``binary_join``).
    Docs with zero surviving lines are dropped."""
    import pyarrow.compute as pc

    tt, flat, counts, line_idx = _split_lines(t, text_col, sep)
    if tt.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                out_col: pa.array([], pa.string()),
                "n_kept": pa.array([], pa.int64()),
                "n_dropped": pa.array([], pa.int64()),
            }
        )
    doc = tt[id_col].to_numpy(zero_copy_only=False)
    keep = np.ones(len(flat), dtype=bool)
    if len(drop_docs):
        r = np.searchsorted(drop_docs, doc)
        has = (r < len(drop_docs)) & (
            drop_docs[np.minimum(r, len(drop_docs) - 1)] == doc
        )
        if has.any():
            rows_rep = np.repeat(has, counts)
            ranks_rep = np.repeat(r.astype(np.uint64), counts)[rows_rep]
            comp = (ranks_rep << np.uint64(32)) | line_idx[rows_rep].astype(
                np.uint64
            )
            pos = np.searchsorted(drop_comp, comp)
            hit = (pos < len(drop_comp)) & (
                drop_comp[np.minimum(pos, len(drop_comp) - 1)] == comp
            )
            keep[np.flatnonzero(rows_rep)[hit]] = False
    return _emit_kept(doc, flat, counts, keep, id_col, sep, out_col)


def _emit_kept(
    doc: np.ndarray,
    flat,
    counts: np.ndarray,
    keep: np.ndarray,
    id_col: str,
    sep: str,
    out_col: str,
) -> pa.Table:
    """Shared doc re-assembly: filter the exploded lines by ``keep``,
    rebuild each doc's text (Arrow ListArray + ``binary_join``), drop
    docs with zero survivors. Used by both the exact and the
    bloom-filter line-dedup paths."""
    ck = np.concatenate([[0], np.cumsum(keep)]).astype(np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    n_kept = ck[ends] - ck[starts]
    new_flat = flat.filter(pa.array(keep))
    new_off = np.concatenate([[0], np.cumsum(n_kept)]).astype(np.int32)
    joined = pa.compute.binary_join(
        pa.ListArray.from_arrays(pa.array(new_off, pa.int32()), new_flat),
        sep,
    )
    alive = n_kept > 0
    am = pa.array(alive)
    return pa.table(
        {
            id_col: pa.array(doc[alive], pa.int64()),
            out_col: joined.filter(am),
            "n_kept": pa.array(n_kept[alive], pa.int64()),
            "n_dropped": pa.array((counts - n_kept)[alive], pa.int64()),
        }
    )


def dedup_lines(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    num_buckets: int | None = None,
    loser_cap: int = LINE_LOSER_CAP,
) -> ray.data.Dataset:
    """Corpus-wide LINE-level exact dedup — the CCNet paragraph-hash
    step (Wenzek et al. 2020: hash every paragraph, drop all but one
    copy corpus-wide) that removes boilerplate headers/footers/nav
    lines before document-level dedup.

    Semantics: every line (``sep``-delimited) keeps its FIRST
    occurrence in (doc_id, line_idx) order; later copies anywhere in
    the corpus are dropped. Docs are re-emitted with surviving lines
    in original order; docs with zero survivors vanish. Line identity
    is the 60-bit md5 prefix (``_md5_60``) on BOTH the engine and the
    DuckDB oracle, so the gate is bit-exact by construction.

    Physical plan (payload never shuffles on the fast path):
    1. KEY PASS: explode each doc to (doc_id, line_idx, h) inside
       ``map_batches`` — 24 B/line, text stays at the source. Batch
       lines are factorized so only unique lines pay the md5.
    2. One hash(h) keys-only shuffle; per bucket the lexicographic
       min (doc_id, line_idx) per h wins; LOSER pairs (the duplicate
       volume — the irreducible output of the decision) come back.
    3. REBUILD PASS: re-stream the input; the loser set is broadcast
       once per node (sorted unique docs + composite rank<<32|idx
       keys, exact membership by binary search) and each batch
       re-emits its docs minus loser lines — zero payload movement.
    Past ``loser_cap`` pairs the broadcast is no longer safe and the
    plan degrades to ONE hash(doc_id) co-shuffle of docs + losers
    (payload moves once), same kernel per bucket.

    Reference analogue: D2 near-dup suppression
    (``condition.py:66-77``) works frame-pairwise; this is the
    corpus-global, content-addressed form a 100 TB text pipeline
    needs. Output: (doc_id, text_dedup, n_kept, n_dropped)."""
    import warnings

    b = num_buckets or default_num_buckets()

    def explode_keys(t: pa.Table) -> pa.Table:
        tt, flat, counts, line_idx = _split_lines(t, text_col, sep)
        if tt.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "line_idx": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        codes, uniq = pd.factorize(
            flat.to_numpy(zero_copy_only=False), sort=False
        )
        h = _md5_60(uniq)[codes]
        return pa.table(
            {
                "doc_id": np.repeat(
                    tt[id_col].to_numpy(zero_copy_only=False), counts
                ),
                "line_idx": line_idx,
                "h": h,
                "bucket": (h.astype(np.uint64) % np.uint64(b)).astype(
                    np.int64
                ),
            }
        )

    def losers_in_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "h" not in t.column_names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "line_idx": pa.array([], pa.int64()),
                }
            )
        h = t["h"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        i = t["line_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, d, h))
        hs = h[order]
        first = np.empty(len(hs), dtype=bool)
        first[0] = True
        first[1:] = hs[1:] != hs[:-1]
        lose = order[~first]
        return pa.table(
            {
                "doc_id": pa.array(d[lose], pa.int64()),
                "line_idx": pa.array(i[lose], pa.int64()),
            }
        )

    _ensure_hash_shuffle()
    losers = (
        ds.map_batches(explode_keys, batch_format="pyarrow")
        .repartition(b, keys=["bucket"], sort=False)
        .map_batches(losers_in_bucket, batch_format="pyarrow")
        .materialize()
    )

    if losers.count() > loser_cap:
        warnings.warn(
            f"dedup_lines: loser pairs exceed loser_cap={loser_cap}; "
            "degrading to the hash(doc_id) co-shuffle (payload moves once)"
        )
        return _dedup_lines_coshuffle(
            ds, losers, text_col, id_col, sep, num_buckets
        )

    pair_ref = _assemble_losers.remote(*losers.to_arrow_refs())

    def rebuild(t: pa.Table) -> pa.Table:
        drop_docs, drop_comp = ray.get(pair_ref)
        return _rebuild_batch(
            t, drop_docs, drop_comp, text_col, id_col, sep, "text_dedup"
        )

    return ds.map_batches(rebuild, batch_format="pyarrow", zero_copy_batch=True)


def _dedup_lines_coshuffle(
    ds: ray.data.Dataset,
    losers: ray.data.Dataset,
    text_col: str,
    id_col: str,
    sep: str,
    num_buckets: int | None,
) -> ray.data.Dataset:
    """Scale fallback for ``dedup_lines``: co-shuffle docs and loser
    pairs on hash(doc_id) and rebuild per bucket — payload crosses one
    exchange, the loser set never sits on one node."""
    b = num_buckets or default_num_buckets()

    def tag_docs(t: pa.Table) -> pa.Table:
        doc = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(doc, pa.int64()),
                text_col: t[text_col],
                "line_idx": pa.nulls(t.num_rows, pa.int64()),
                "bucket": (
                    _stable_hash(doc) % np.uint64(b)
                ).astype(np.int64),
            }
        )

    def tag_losers(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names or t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    text_col: pa.array([], pa.string()),
                    "line_idx": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(doc, pa.int64()),
                text_col: pa.nulls(t.num_rows, pa.string()),
                "line_idx": t["line_idx"],
                "bucket": (
                    _stable_hash(doc) % np.uint64(b)
                ).astype(np.int64),
            }
        )

    def rebuild_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_doc = pc.is_valid(t[text_col]).to_numpy(zero_copy_only=False)
        docs_t = t.filter(pa.array(is_doc)).select([id_col, text_col])
        lose_t = t.filter(pa.array(~is_doc))
        d = lose_t[id_col].to_numpy(zero_copy_only=False)
        i = lose_t["line_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, d))
        d, i = d[order], i[order]
        uniq = np.unique(d)
        rank = np.searchsorted(uniq, d).astype(np.uint64)
        comp = np.sort((rank << np.uint64(32)) | i.astype(np.uint64))
        return _rebuild_batch(
            docs_t, uniq, comp, text_col, id_col, sep, "text_dedup"
        )

    _ensure_hash_shuffle()
    both = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        losers.map_batches(tag_losers, batch_format="pyarrow")
    )
    return both.repartition(b, keys=["bucket"], sort=False).map_batches(
        rebuild_bucket, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Bloom-filter line dedup (the memory-bounded approximate path)
# ---------------------------------------------------------------------------


def _bloom_positions(strs, m_bits: int):
    """Three SQL-replayable bloom positions per string, all derived
    from ONE md5: a = hex[0:15], b = hex[15:30] (60-bit ints),
    p1 = a%m, p2 = b%m, p3 = (p1 * (2654435761%m) + p2) % m.
    ``m_bits`` must be <= 2^30 so p3's product stays in int64 on both
    the numpy and the DuckDB side."""
    import hashlib

    m = m_bits
    a = np.empty(len(strs), dtype=np.int64)
    b = np.empty(len(strs), dtype=np.int64)
    for j, s in enumerate(strs):
        hx = hashlib.md5(s.encode("utf-8")).hexdigest()
        a[j] = int(hx[0:15], 16)
        b[j] = int(hx[15:30], 16)
    p1 = a % m
    p2 = b % m
    p3 = (p1 * (2654435761 % m) + p2) % m
    return p1, p2, p3


@ray.remote
def _assemble_bitset(m_bits: int, *chunks: pa.Table) -> np.ndarray:
    """OR the per-block position chunks into the single m-bit bloom
    bitset (as a bool ndarray, m/8 bytes packed would also do — at
    m<=2^30 the bool array is <=1 GiB; callers size m to the budget).
    Born in the object store; the driver only holds the ref."""
    bits = np.zeros(m_bits, dtype=bool)
    for c in chunks:
        if "p" in c.column_names and c.num_rows:
            bits[c["p"].to_numpy(zero_copy_only=False)] = True
    return bits


def bloom_line_dedup(
    new_docs: ray.data.Dataset,
    history: ray.data.Dataset,
    m_bits: int = 1 << 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> ray.data.Dataset:
    """APPROXIMATE line-level dedup against a history corpus via a
    bloom filter — the memory-bounded path large-scale text pipelines
    (e.g. Dolma's dedupe step) use when the exact line-key table stops
    fitting anywhere: the filter is ``m_bits`` bits NO MATTER how many
    history lines exist, so it broadcasts at any corpus scale and the
    new side streams in ONE pass with zero shuffle.

    Every new doc drops each line whose three bloom positions are all
    set by some history line; docs with zero survivors vanish (same
    output contract as the exact ``dedup_lines``). False positives
    (rate ~ fill^3) drop innocent lines — the documented bloom trade;
    false negatives never happen. The hash family is three
    md5-slice-derived positions (``_bloom_positions``), bit-exactly
    replayable in SQL, so the gate verifies the engine INCLUDING its
    false positives.

    Plan: history streams once through a keys-only position explode;
    one remote reduce ORs the per-block position sets into the bitset
    (object store, driver holds a ref); new docs stream once through
    split -> hash -> mask -> rebuild. No exchange anywhere.

    Reference analogue: delete-after-process on the queue
    (``queue_harvesting.py:57``) is the reference's only don't-repeat
    mechanism; this is its content-addressed, bounded-memory form."""
    if not (0 < m_bits <= (1 << 30)):
        raise ValueError("m_bits must be in (0, 2^30] for int64-safe hashing")

    def hist_positions(t: pa.Table) -> pa.Table:
        _, flat, _, _ = _split_lines(t, text_col, sep)
        if len(flat) == 0:
            return pa.table({"p": pa.array([], pa.int64())})
        codes, uniq = pd.factorize(
            flat.to_numpy(zero_copy_only=False), sort=False
        )
        p1, p2, p3 = _bloom_positions(uniq, m_bits)
        return pa.table(
            {"p": np.unique(np.concatenate([p1, p2, p3])).astype(np.int64)}
        )

    pos = history.map_batches(hist_positions, batch_format="pyarrow").materialize()
    bits_ref = _assemble_bitset.remote(m_bits, *pos.to_arrow_refs())

    def rebuild(t: pa.Table) -> pa.Table:
        tt, flat, counts, _ = _split_lines(t, text_col, sep)
        if tt.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "text_dedup": pa.array([], pa.string()),
                    "n_kept": pa.array([], pa.int64()),
                    "n_dropped": pa.array([], pa.int64()),
                }
            )
        bits = ray.get(bits_ref)
        doc = tt[id_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            flat.to_numpy(zero_copy_only=False), sort=False
        )
        p1, p2, p3 = _bloom_positions(uniq, m_bits)
        hit = (bits[p1] & bits[p2] & bits[p3])[codes]
        return _emit_kept(doc, flat, counts, ~hit, id_col, sep, "text_dedup")

    return new_docs.map_batches(
        rebuild, batch_format="pyarrow", zero_copy_batch=True
    )
