"""Projection / scalar-function operators (SURVEY §2.2 M6-M8, §2.6).

- M6 crop-to-union-bbox (``condition.py:98-127``: union box + padding,
  clamp, slice) → trim ``text`` to the matched call-id span ± padding.
- M8 label translation (``utils/TranslateObject.py:1-23``: static
  person→pedestrian remap) → static tool-name remap via vectorized
  dictionary lookup.
- A9 per-key output cap (``MAX_NUMBER_OF_PREDICTIONS`` per video,
  ``services/harvest_service.py:175-176``) → first N turns per conv.
- SO3 systematic sampling → deterministic hash-mod sample (exactly
  reproducible in SQL — no RNG).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .partition import apply_per_bucket

# M8: the reference's static label remap, for tools.
TOOL_TRANSLATION = {
    "search": "web_search",
    "calculator": "math",
    "browser": "web_browser",
    "python": "code",
    "sql": "database",
}

SPAN_PAD = 10  # M6 padding (the reference pads crops by 100 px)


def translate_tools(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Static tool-name remap; unknown/empty names pass through
    (the reference leaves unmapped labels unchanged)."""
    keys = pa.array(list(TOOL_TRANSLATION), pa.string())
    vals = pa.array(list(TOOL_TRANSLATION.values()), pa.string())

    def remap(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["tool"], keys)
        translated = pc.coalesce(pc.take(vals, idx), t["tool"])
        return t.set_column(t.schema.get_field_index("tool"), "tool", translated)

    return ds.map_batches(remap, batch_format="pyarrow", zero_copy_batch=True)


def call_span_batch(df: pd.DataFrame) -> pd.DataFrame:
    """M6: slice text to the ``[call-...]`` token ± SPAN_PAD chars;
    rows without a token project to ''."""
    text = df["text"]
    start = text.str.find("[")
    end = text.str.find("]")
    has = (start >= 0) & (end > start)
    lo = np.maximum(0, start.to_numpy() - SPAN_PAD)
    hi = end.to_numpy() + 1 + SPAN_PAD
    spans = [
        s[int(a) : int(b)] if h else ""
        for s, a, b, h in zip(text, lo, hi, has)
    ]
    return pd.DataFrame(
        {
            "conv_id": df["conv_id"],
            "turn_idx": df["turn_idx"],
            "call_span": spans,
        }
    )


def call_spans(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(call_span_batch, batch_format="pandas")


def head_per_conv(ds: ray.data.Dataset, n: int = 3, num_buckets: int | None = None) -> ray.data.Dataset:
    """A9: cap output at the first n turns per conversation.

    Top-k-per-key partial pattern: each block locally keeps its own
    first-n per conv (a superset of the global first-n — any globally
    kept row is in its block's local head), so the shuffle moves at
    most n × blocks rows per conv instead of whole conversations with
    payload."""
    from .dedup import prepare_bucket

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = prepare_bucket(g)
        conv = g["conv_id"].to_numpy()
        m = len(g)
        if m == 0:
            return g
        starts = np.flatnonzero(
            np.concatenate([[True], conv[1:] != conv[:-1]])
        )
        counts = np.diff(np.append(starts, m))
        rank = np.arange(m) - np.repeat(starts, counts)
        return g[rank < n]

    local = ds.map_batches(kernel, batch_format="pandas")
    return apply_per_bucket(local, kernel, num_buckets=num_buckets)


def train_split(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    pct: tuple[int, int] = (90, 5),
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment — the split step of a
    training-data pipeline. Pure integer hash on the id (golden-ratio
    multiply mod 1000), so the assignment is reproducible across runs,
    machines, and the SQL oracle, and rows never need co-location
    (embarrassingly parallel map_batches). ``pct=(train, val)``; the
    remainder is test."""
    train_p, val_p = pct

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        h = (df[key].astype(np.int64) * 2654435761) % 1000
        split = np.where(
            h < train_p * 10, "train", np.where(h < (train_p + val_p) * 10, "val", "test")
        )
        return pd.DataFrame({key: df[key], "split": split})

    return ds.map_batches(gate, batch_format="pandas")


def stratified_split(
    ds: ray.data.Dataset,
    key: str,
    id_col: str,
    pct: tuple[int, int] = (90, 5),
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Per-group proportional train/val/test assignment: every ``key``
    group contributes floor(size*train%/100) rows to train, up to
    floor(size*(train+val)%/100) to val, the rest to test — rows
    picked by golden-ratio hash order of ``id_col`` (deterministic,
    arrival-order independent). The stratified form of
    ``train_split``: a plain global hash split can starve a small
    group's val/test; this one cannot.

    Scale plan: one hash(key) co-location shuffle (the shared bucket
    primitive); rank and group size computed vectorized across all
    groups in the bucket (one stable sort + groupby transform/cumcount
    — no per-group Python, no driver stage). Pure integer arithmetic,
    so the SQL window oracle matches bit-for-bit."""
    from .partition import apply_per_bucket

    train_p, val_p = pct

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__h"] = (df[id_col].to_numpy().astype(np.int64) * 2654435761) % 1000000007
        return df

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "__h", id_col], kind="stable")
        grp = g.groupby(key, sort=False)
        sz = grp[id_col].transform("size").to_numpy()
        rn = grp.cumcount().to_numpy() + 1
        split = np.where(
            rn <= (sz * train_p) // 100,
            "train",
            np.where(rn <= (sz * (train_p + val_p)) // 100, "val", "test"),
        )
        out = g.drop(columns=["__h"]).copy()
        out["split"] = split
        return out

    return apply_per_bucket(
        ds.map_batches(add_h, batch_format="pandas"),
        kernel,
        key=key,
        num_buckets=num_buckets,
    )


def systematic_sample(ds: ray.data.Dataset, pct: int = 10) -> ray.data.Dataset:
    """SO3: deterministic pseudo-random sample — hash-mod on
    (conv number, turn_idx) with exact integer arithmetic, so the same
    rows are selected by the SQL oracle. (For true random sampling use
    ``ds.random_sample(frac, seed=...)``.)"""

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        conv_num = df["conv_id"].str.slice(5).astype(np.int64)
        key = (conv_num * 31 + df["turn_idx"].astype(np.int64)) * 2654435761 % 997
        return df[key < pct * 10]

    return ds.map_batches(gate, batch_format="pandas")


def weighted_sample(
    ds: ray.data.Dataset,
    weight_expr=None,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic weighted Bernoulli sample: keep each row with
    probability proportional to a per-row integer milli-weight — the
    quality-weighted downsampling step of corpus curation (keep good
    documents with high probability, noise with low, without a global
    sort or shuffle). The coin is the golden-ratio integer hash of the
    id (the train_split/systematic_sample discipline), so membership
    is a pure row predicate: reproducible across runs, machines,
    partitionings, and the SQL oracle — and embarrassingly parallel.

    ``weight_expr``: callable(pd.DataFrame) -> int64 milli-weights in
    [0, 1000] (values are clipped). Default: longer documents are
    likelier kept — ``min(n_tokens * 20, 900)``."""

    def default_weight(df: pd.DataFrame) -> np.ndarray:
        n_tokens = (
            df["text"].str.strip().str.split().map(len).to_numpy(dtype=np.int64)
        )
        return np.minimum(n_tokens * 20, 900)

    weight = weight_expr or default_weight

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        w = np.clip(np.asarray(weight(df), dtype=np.int64), 0, 1000)
        h = (df[id_col].to_numpy(dtype=np.int64) * 2654435761) % 1000
        out = df[h < w].copy()
        out["weight_milli"] = w[h < w]
        return out

    return ds.map_batches(gate, batch_format="pandas")


def hash_sample(
    ds: ray.data.Dataset,
    k: int,
    id_col: str = "doc_id",
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """Deterministic uniform k-sample: the k rows with the smallest
    md5(id) — hash order is a fixed random permutation of ids, so this
    IS a uniform sample, yet it's reproducible across runs, cluster
    sizes, and engines (the property ``ds.random_sample`` lacks). The
    eval-set / spot-check draw every corpus pipeline needs.

    Scale plan: per-block partial top-k by hash (at most k rows leave
    any block), one repartition(1) merge, k rows on the driver. No
    shuffle of the corpus; cost is one streaming pass."""
    import hashlib

    keep = [id_col] + [c for c in (columns or []) if c != id_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hv = np.fromiter(
            (
                int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
                for i in df[id_col]
            ),
            dtype=np.int64,
            count=len(df),
        )
        out = df[keep].assign(_hv=hv)
        return out.nsmallest(k, "_hv", keep="first")

    merged = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(lambda df: df.nsmallest(k, "_hv"), batch_format="pandas")
        .to_pandas()
    )
    out = merged.nsmallest(k, "_hv").drop(columns=["_hv"])
    return out.sort_values(id_col).reset_index(drop=True)
