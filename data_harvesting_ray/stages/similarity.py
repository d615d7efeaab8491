"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast
once with ``ray.put`` and every batch does one numpy matmul against
it; per-batch partial top-k rows are reduced by a tiny groupby (the
partial-aggregation pattern — the shuffle moves k rows per (query,
batch), never embeddings).

Scale path: IVF — centroids trained on a driver-side sample (small),
vectors assigned to their nearest centroid in one map_batches pass,
queries probe only the ``nprobe`` nearest partitions. Also hyperplane
LSH near-dup pairs for embedding-cosine dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def knn_bruteforce(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
) -> pd.DataFrame:
    """Exact cosine top-k per query. Ties break by neighbor_id asc; a
    query's own vec_id is excluded. Output (query_id, neighbor_id, rank)."""
    qn = _normalize_rows(query_vecs)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids, q = ray.get(ref)
        m = _normalize_rows(_stack(df["embedding"]))
        ids = df["vec_id"].to_numpy().astype(np.int64)
        sims = q @ m.T  # (n_queries, batch)
        out = []
        top = min(k, sims.shape[1])
        for qi in range(len(qids)):
            s = sims[qi].copy()
            s[ids == qids[qi]] = -np.inf  # exclude self
            # partial top-k with deterministic (sim desc, id asc) order
            idx = np.lexsort((ids, -s))[:top]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": ids[idx],
                        "sim": s[idx],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    partials = partials[np.isfinite(partials["sim"])]
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    topk = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = (topk.groupby("query_id").cumcount() + 1).astype(np.int64)
    return topk[["query_id", "neighbor_id", "rank"]]


# Expected row budget for driver-side centroid training: the sample
# lands on the driver, so it must be bounded by a CONSTANT, not a
# fraction of the corpus (a fractional sample of 10^9 embeddings is a
# driver OOM). ~64k rows x 64 float64 dims = 32 MB.
IVF_SAMPLE_BUDGET = 65_536


def ivf_sample_threshold_micro(
    n_rows: int,
    sample_frac: float = 0.5,
    sample_budget: int = IVF_SAMPLE_BUDGET,
) -> int:
    """Count-bounded sampling threshold (micro-units, of 1e6): the
    effective fraction is ``min(sample_frac, sample_budget / n_rows)``,
    so the expected driver-side sample stays ~``sample_budget`` rows at
    ANY corpus size. Pure function of (count, params) — the side-table
    oracle recomputes it from the same inputs."""
    frac = min(float(sample_frac), sample_budget / max(int(n_rows), 1))
    return max(1, min(1_000_000, int(frac * 1_000_000)))


def ivf_sample_mask(
    ids: np.ndarray,
    sample_frac: float = 0.5,
    threshold_micro: int | None = None,
) -> np.ndarray:
    """Deterministic training-sample membership by golden-ratio integer
    hash on the id — a pure function of the TABLE, reproducible in
    plain pandas (the side-table oracle) and stable across block
    layouts/parallelism (``ds.random_sample``'s per-block RNG is
    neither). Pass ``threshold_micro`` (from
    ``ivf_sample_threshold_micro``) for the count-bounded form."""
    t = (
        int(threshold_micro)
        if threshold_micro is not None
        else int(sample_frac * 1_000_000)
    )
    return (ids.astype(np.int64) * 2654435761) % 1_000_000 < t


def kmeans_lloyd(
    sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 13
) -> np.ndarray:
    """Plain Lloyd k-means on an in-memory sample (deterministic seed) —
    shared by the engine and the driver-side oracle recompute."""
    sample = _normalize_rows(sample)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize_rows(cents)
    return cents


def train_centroids(
    ds: ray.data.Dataset,
    n_centroids: int = 16,
    sample_frac: float = 0.5,
    iters: int = 10,
    seed: int = 13,
    sample_budget: int = IVF_SAMPLE_BUDGET,
) -> np.ndarray:
    """k-means on a driver-side sample (Lloyd, deterministic seed) —
    the small-model-training step of an IVF index. The sample is the
    deterministic ``ivf_sample_mask`` subset with a COUNT-BOUNDED
    threshold (expected ~``sample_budget`` rows at any corpus size —
    the one deliberate driver hop in the IVF plan stays constant-size),
    so the centroids remain a pure function of the table (the IVF
    side-table oracle recomputes the same threshold from the same
    count)."""
    thr = ivf_sample_threshold_micro(ds.count(), sample_frac, sample_budget)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[
            ivf_sample_mask(df["vec_id"].to_numpy(), threshold_micro=thr)
        ][["vec_id", "embedding"]]

    # Sort the driver-side sample by vec_id: Ray's streaming executor
    # does NOT preserve block order (preserve_order is off), so the
    # sample's arrival order is nondeterministic — and both the k-means
    # init draw (rng.choice indexes INTO the sample) and the float mean
    # summation order depend on row order. Canonical id order makes the
    # centroids a pure function of the TABLE, matching the side-table
    # oracle's recompute.
    picked = (
        ds.map_batches(pick, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id", kind="stable")
    )
    sample = _stack(picked["embedding"])
    return kmeans_lloyd(sample, n_centroids, iters=iters, seed=seed)


def knn_ivf(
    ds: ray.data.Dataset,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> pd.DataFrame:
    """Approximate top-k: search only the nprobe nearest IVF partitions
    per query. Same output schema as knn_bruteforce."""
    cents = train_centroids(ds, n_centroids=n_centroids)
    qn = _normalize_rows(np.asarray(query_vecs, dtype=np.float64))
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn, cents, probe))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qids, q, c, pr = ray.get(ref)
        m = _normalize_rows(_stack(df["embedding"]))
        ids = df["vec_id"].to_numpy().astype(np.int64)
        cell = np.argmax(m @ c.T, axis=1)
        out = []
        for qi in range(len(qids)):
            mask = np.isin(cell, pr[qi]) & (ids != qids[qi])
            if not mask.any():
                continue
            s = (q[qi] @ m[mask].T).ravel()
            sub_ids = ids[mask]
            idx = np.lexsort((sub_ids, -s))[: min(k, len(s))]
            out.append(
                pd.DataFrame({"query_id": qids[qi], "neighbor_id": sub_ids[idx], "sim": s[idx]})
            )
        if not out:
            return pd.DataFrame(
                {
                    "query_id": np.array([], np.int64),
                    "neighbor_id": np.array([], np.int64),
                    "sim": np.array([], np.float64),
                }
            )
        return pd.concat(out, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    topk = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    topk["rank"] = (topk.groupby("query_id").cumcount() + 1).astype(np.int64)
    return topk[["query_id", "neighbor_id", "rank"]]


def embedding_near_dups(
    ds: ray.data.Dataset,
    threshold: float = 0.9,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 23,
    involved_cap: int | None = None,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs via multi-band hyperplane LSH —
    the SCALE path. ``n_bands`` bands of ``band_bits`` sign bits each:
    a pair is a candidate if any band matches exactly (for cosine
    ≥ 0.95 and 8×8-bit bands, per-band match prob ≈ (1-θ/π)^8 ≈ 0.63 →
    miss prob ≈ 3e-4; tune bands/bits per threshold). Candidates stay
    a Dataset; exact cosine verification fetches only involved vectors
    via a broadcast-id semi-join (no driver-side corpus scan).
    Output (vec_a, vec_b, sim_milli). ``embedding_near_dups_exact`` is
    the brute-force baseline it is recall-tested against."""
    rng = np.random.default_rng(seed)
    first = ds.take(1)
    dim = len(first[0]["embedding"]) if first else 0
    n_planes = n_bands * band_bits
    planes = rng.normal(size=(dim, n_planes)) if dim else np.zeros((0, n_planes))
    pref = ray.put(planes)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(pref)
        m = _normalize_rows(_stack(df["embedding"]))
        bits = (m @ p) > 0  # (n, n_bands*band_bits)
        outs = []
        for band in range(n_bands):
            sub = bits[:, band * band_bits : (band + 1) * band_bits]
            code = (sub.astype(np.int64) << np.arange(band_bits, dtype=np.int64)).sum(axis=1)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": df["vec_id"].astype(np.int64),
                        "band": np.int64(band),
                        "band_hash": code,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    from .dedup_approx import (
        INVOLVED_BROADCAST_CAP,
        _collect_involved,
        _involved_docs,
        attach_value_distributed,
        band_candidate_pairs,
    )

    if involved_cap is None:
        involved_cap = INVOLVED_BROADCAST_CAP
    pairs = band_candidate_pairs(
        ds.map_batches(sketch, batch_format="pandas"), num_buckets=num_buckets
    )
    involved = _collect_involved(pairs)
    empty = pd.DataFrame(
        {
            "vec_a": np.array([], np.int64),
            "vec_b": np.array([], np.int64),
            "sim_milli": np.array([], np.int64),
        }
    )
    if not len(involved):
        return empty
    thr = int(threshold * 1000)
    kv = ds.select_columns(["vec_id", "embedding"])

    if len(involved) > involved_cap:
        # exploded hash-join fallback: involved vectors co-partitioned
        # with pair rows by hash(id), twice — no driver staging. The
        # embedding rides as raw float64 BYTES (Acero joins reject any
        # nested/tensor payload type; binary is supported).
        def as_bytes(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["embedding"] = [
                np.asarray(v, dtype=np.float64).tobytes() for v in df["embedding"]
            ]
            return df

        inv = _involved_docs(kv, involved, "vec_id", "embedding").map_batches(
            as_bytes, batch_format="pandas"
        )
        wa = attach_value_distributed(
            pairs, inv, "doc_a", "__va", key="vec_id", value="embedding",
            num_buckets=num_buckets,
        )
        wb = attach_value_distributed(
            wa, inv, "doc_b", "__vb", key="vec_id", value="embedding",
            num_buckets=num_buckets,
        )

        def score(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return empty.copy()
            va = _normalize_rows(
                np.stack([np.frombuffer(v, dtype=np.float64) for v in df["__va"]])
            )
            vb = _normalize_rows(
                np.stack([np.frombuffer(v, dtype=np.float64) for v in df["__vb"]])
            )
            sims = np.einsum("ij,ij->i", va, vb)
            out = pd.DataFrame(
                {
                    "vec_a": df["doc_a"].to_numpy().astype(np.int64),
                    "vec_b": df["doc_b"].to_numpy().astype(np.int64),
                    "sim_milli": (sims * 1000).astype(np.int64),
                }
            )
            return out[out["sim_milli"].to_numpy() >= thr]

        out = wb.map_batches(score, batch_format="pandas").to_pandas()
        if out.empty:
            return empty
        out = out.drop_duplicates()
        return out.sort_values(["vec_a", "vec_b"], kind="stable").reset_index(drop=True)

    iref = ray.put(np.sort(involved))

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        keep = np.isin(df["vec_id"].to_numpy(), ray.get(iref))
        return df[keep][["vec_id", "embedding"]]

    small = kv.map_batches(filt, batch_format="pandas").to_pandas()
    vec_ids = small["vec_id"].to_numpy().astype(np.int64)
    mat = _normalize_rows(_stack(small["embedding"]))
    vref = ray.put((vec_ids, mat))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ids, m = ray.get(vref)
        pos = {int(v): i for i, v in enumerate(ids)}
        ia = np.fromiter((pos[int(x)] for x in df["doc_a"]), dtype=np.int64, count=len(df))
        ib = np.fromiter((pos[int(x)] for x in df["doc_b"]), dtype=np.int64, count=len(df))
        sims = np.einsum("ij,ij->i", np.take(m, ia, axis=0), np.take(m, ib, axis=0))
        out = pd.DataFrame(
            {
                "vec_a": df["doc_a"].to_numpy(),
                "vec_b": df["doc_b"].to_numpy(),
                "sim_milli": (sims * 1000).astype(np.int64),
            }
        )
        return out[out["sim_milli"].to_numpy() >= thr]

    out = pairs.map_batches(verify, batch_format="pandas").to_pandas()
    if out.empty:
        return empty
    out = out.drop_duplicates()  # a pair may match in several bands
    return out.sort_values(["vec_a", "vec_b"], kind="stable").reset_index(drop=True)


def embedding_near_dups_exact(
    ds: ray.data.Dataset, threshold: float = 0.45
) -> pd.DataFrame:
    """Exact all-pairs cosine near-dups — the brute-force BASELINE
    (mirrors knn_bruteforce): the normalized corpus matrix is broadcast
    once via ``ray.put`` and each batch emits its pairs against it
    (i < j, one matmul per batch). Valid while the matrix fits the
    object store; the LSH variant above is the 100 TB path. Output
    (vec_a, vec_b) — thresholded exact pairs, SQL-checkable."""
    all_df = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = all_df["vec_id"].to_numpy().astype(np.int64)
    mat = _normalize_rows(_stack(all_df["embedding"]))
    ref = ray.put((ids, mat))
    thr = float(threshold)

    def pairs_batch(df: pd.DataFrame) -> pd.DataFrame:
        aids, m = ray.get(ref)
        bids = df["vec_id"].to_numpy().astype(np.int64)
        bm = _normalize_rows(_stack(df["embedding"]))
        sims = bm @ m.T  # (batch, corpus)
        bi, ci = np.nonzero((sims >= thr) & (bids[:, None] < aids[None, :]))
        return pd.DataFrame(
            {"vec_a": bids[bi], "vec_b": aids[ci]}
        )

    out = ds.map_batches(pairs_batch, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"vec_a": np.array([], np.int64), "vec_b": np.array([], np.int64)}
        )
    return out.sort_values(["vec_a", "vec_b"], kind="stable").reset_index(drop=True)


def group_centroids(
    ds: ray.data.Dataset,
    key: str = "label",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Per-group embedding centroid — the k-means assignment-step /
    class-prototype aggregate (reference analogue: the per-class
    accumulation the tracker keeps across a track's detections,
    ``utils/ClassificationObject.py``). Output rows are EXPLODED per
    dimension: (key, dim 1-based, sum_micro int64, n int64,
    centroid float64 = sum_micro / n / 1e6-ish in micro-units).

    Exactness: each component is floored to int64 MICRO-units before
    summation (float32 -> float64 -> *1e6 -> floor is bit-identical in
    numpy and DuckDB, and int64 addition is associative), so the sums
    are shuffle-order-independent and bit-exact vs SQL — the float
    centroid is then ONE deterministic double division. The partial
    sums are computed per batch (sort + ``np.add.reduceat`` over the
    factorized key, no per-group Python), so the exchange moves
    |groups| x dims rows per block, never vectors."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    key: np.array([], dtype=np.int64),
                    "dim": np.array([], dtype=np.int64),
                    "s": np.array([], dtype=np.int64),
                    "cnt": np.array([], dtype=np.int64),
                }
            )
        micro = np.floor(_stack(df[vec_col]) * 1_000_000.0).astype(np.int64)
        d = micro.shape[1]
        keys = df[key].to_numpy()
        order = np.argsort(keys, kind="stable")
        keys_s, micro_s = keys[order], np.take(micro, order, axis=0)
        new_grp = np.empty(len(keys_s), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = keys_s[1:] != keys_s[:-1]
        starts = np.flatnonzero(new_grp)
        sums = np.add.reduceat(micro_s, starts, axis=0)  # (n_groups, d)
        counts = np.diff(np.append(starts, len(keys_s)))
        n_groups = len(starts)
        return pd.DataFrame(
            {
                key: np.repeat(keys_s[starts], d).astype(np.int64),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), n_groups),
                "s": sums.ravel(),
                "cnt": np.repeat(counts, d).astype(np.int64),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key, "dim"])
        .aggregate(Sum("s", alias_name="sum_micro"), Sum("cnt", alias_name="n"))
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        s = df["sum_micro"].to_numpy(dtype=np.int64)
        n = df["n"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                key: df[key].to_numpy(dtype=np.int64),
                "dim": df["dim"].to_numpy(dtype=np.int64),
                "sum_micro": s,
                "n": n,
                "centroid_micro": s.astype(np.float64) / n.astype(np.float64),
            }
        )

    return agg.map_batches(finalize, batch_format="pandas")


def train_centroids_distributed(
    ds: ray.data.Dataset,
    n_centroids: int = 16,
    iters: int = 10,
    seed: int = 13,
    init_budget: int = 4096,
) -> np.ndarray:
    """Fully DISTRIBUTED Lloyd k-means over the WHOLE corpus — the
    scale path past ``train_centroids``' count-bounded driver sample:
    no vector payload ever reaches the driver. Per iteration, the k×d
    centroid matrix broadcasts once (``ray.put``); every batch assigns
    its vectors (one matmul) and emits EXACT integer-micro partial
    sums per centroid (``floor(x·1e6)`` int64 — the group_centroids
    discipline), reduced by one k-row-per-block groupby; the driver
    touches only the k×(d+1) reduced table. Integer partials make the
    result independent of partitioning/batch layout, so the trainer is
    a pure function of (table, params) — conformance-tested against a
    single-process reference of the same quantized algorithm.

    Initialization draws from the deterministic hash-mask pool
    (expected ~``init_budget`` rows — the only, constant-size, driver
    hop) with the same seeded choice as ``kmeans_lloyd``. Empty
    centroids keep their previous position (same as Lloyd's
    no-members case)."""
    from ray.data.aggregate import Sum

    n_rows = int(ds.count())
    thr = ivf_sample_threshold_micro(n_rows, 1.0, init_budget)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        return df[ivf_sample_mask(df["vec_id"].to_numpy(), threshold_micro=thr)][
            ["vec_id", "embedding"]
        ]

    # id-sorted for the same reason as train_centroids: block arrival
    # order is nondeterministic, the init draw must not be.
    pool_df = (
        ds.map_batches(pick, batch_format="pandas")
        .to_pandas()
        .sort_values("vec_id", kind="stable")
    )
    pool = _normalize_rows(_stack(pool_df["embedding"]))
    rng = np.random.default_rng(seed)
    cents = pool[
        rng.choice(len(pool), size=min(n_centroids, len(pool)), replace=False)
    ].copy()
    k, d = cents.shape
    sum_cols = [f"s{j}" for j in range(d)]

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(ref)
            m = _normalize_rows(_stack(df["embedding"]))
            assign = np.argmax(m @ c.T, axis=1)
            micro = np.floor(m * 1e6).astype(np.int64)
            order = np.argsort(assign, kind="stable")
            a_sorted = assign[order]
            boundaries = np.concatenate(
                ([0], np.nonzero(np.diff(a_sorted))[0] + 1)
            )
            sums = np.add.reduceat(micro[order], boundaries, axis=0)
            labels = a_sorted[boundaries]
            counts = np.bincount(assign, minlength=len(c))[labels]
            out = pd.DataFrame(sums, columns=sum_cols)
            out.insert(0, "centroid", labels.astype(np.int64))
            out.insert(1, "n", counts.astype(np.int64))
            return out

        red = (
            ds.map_batches(partial, batch_format="pandas")
            .groupby("centroid")
            .aggregate(
                Sum("n", alias_name="n"),
                *[Sum(c, alias_name=c) for c in sum_cols],
            )
            .to_pandas()  # ≤ k rows: bounded by the model, not the data
        )
        new = cents.copy()
        lbl = red["centroid"].to_numpy().astype(np.int64)
        n = red["n"].to_numpy().astype(np.float64)
        s = red[sum_cols].to_numpy().astype(np.float64)
        nonzero = n > 0
        new[lbl[nonzero]] = (s[nonzero] / 1e6) / n[nonzero, None]
        cents = _normalize_rows(new)
    return cents


def dim_stats(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-dimension feature statistics over the embedding column —
    the whitening/normalization pre-pass every embedding-space stage
    (IVF training, LSH hyperplanes, cosine dedup) wants: count, sum
    and sum-of-squares per coordinate, quantized to integer micro
    units (floor(double(v)*1e6)) so the sums are order-independent
    integer addition and the gate is an exact hash compare.

    Scale plan: each batch collapses to one dims-row partial (a single
    vectorized column sum per batch), so the exchange and the final
    groupby are dims-sized — vectors never shuffle. ``dim`` is
    1-based, matching SQL's generate_subscripts. Mean/std in floats
    are a trivial driver-side epilogue of the returned table."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        micro = np.floor(vecs * 1e6).astype(np.int64)
        d = micro.shape[1]
        return pd.DataFrame(
            {
                "dim": np.arange(1, d + 1, dtype=np.int64),
                "n": np.int64(len(micro)),
                "sum_micro": micro.sum(axis=0),
                "sumsq_micro": (micro * micro).sum(axis=0),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_micro", alias_name="sum_micro"),
            Sum("sumsq_micro", alias_name="sumsq_micro"),
        )
    )


def label_centroid_dist(
    ds: ray.data.Dataset,
    key: str = "label",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Embedding-space outlier QA: squared distance of every vector to
    its group's centroid, entirely in integer micro-units so the gate
    is an exact hash compare — the "how far is each example from its
    class prototype" scan that flags mislabeled / degenerate
    embeddings before training.

    Exactness: components quantize to int64 micros (floor(double(v)
    *1e6)); the per-group centroid is the exact FLOOR-division of the
    micro sums (sum // n, floor semantics spelled out in SQL as
    (s - ((s % n + n) % n)) // n since SQL's // truncates); the
    distance is then pure integer arithmetic.

    Scale plan: pass 1 reuses ``group_centroids``'s partial reduction
    (groups x dims rows cross the exchange, never vectors); the
    centroid table is model-shaped and broadcasts once via ``ray.put``;
    pass 2 is one embarrassingly-parallel map_batches emitting
    (vec_id, key, dist2) — vectors never shuffle at all."""
    cent = group_centroids(ds, key=key, vec_col=vec_col).to_pandas()
    cent = cent.sort_values([key, "dim"], kind="stable")
    lut = {}
    for lab, sub in cent.groupby(key, sort=False):
        s = sub["sum_micro"].to_numpy(np.int64)
        n = sub["n"].to_numpy(np.int64)
        lut[lab] = s // n  # numpy int64 // floors, matching the SQL form
    lut_ref = ray.put(lut)

    def dist(df: pd.DataFrame) -> pd.DataFrame:
        cm = ray.get(lut_ref)
        micro = np.floor(_stack(df[vec_col]) * 1_000_000.0).astype(np.int64)
        keys = df[key].to_numpy()
        c = np.stack([cm[k] for k in keys])
        diff = micro - c
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(np.int64),
                key: keys.astype(np.int64),
                "dist2": (diff * diff).sum(axis=1).astype(np.int64),
            }
        )

    return ds.map_batches(dist, batch_format="pandas")


# Within-cell all-pairs bound for semdedup: a cell larger than this
# means the centroid model is far too coarse for the corpus (SemDeDup
# sizes k so cells hold ~corpus/k rows); raising is the honest move —
# silently subsampling the cell would change the survivor set.
SEMDEDUP_CELL_CAP = 200_000
# Soft budget (float64 elements) for one chunked similarity slab —
# bounds kernel memory at chunk_rows x cell_rows.
_SEMDEDUP_SLAB_BUDGET = 8_000_000


def semdedup(
    ds: ray.data.Dataset,
    n_centroids: int = 8,
    threshold: float = 0.9,
    sample_frac: float = 0.5,
    seed: int = 13,
    cell_cap: int = SEMDEDUP_CELL_CAP,
    keep: str = "min_id",
) -> ray.data.Dataset:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    drop within each cluster every vector whose cosine similarity to a
    LOWER-vec_id cluster-mate reaches ``threshold`` — the keep-first
    rule every dedup stage in this repo uses (``keep="min_id"``).
    ``keep="low_centroid"`` is the PAPER's rule: form the within-cell
    duplicate GROUPS (connected components of the thresholded sim
    graph) and keep each group's member with the LOWEST cosine to the
    cell centroid (ties to smallest vec_id) — the example farthest
    from the cluster prototype, which the paper argues preserves the
    most diversity. Returns the survivors as (vec_id, cell).

    The point vs ``embedding_near_dups``: all-pairs work is confined
    to a cell (~corpus/k rows), so the total comparison count drops
    from O(N²) to O(N²/k) with recall bounded by the clustering (two
    near-dups in different cells are never compared — the documented
    SemDeDup trade; the paper picks k ~ sqrt(N) so cells stay small).

    Scale plan: centroid training is the count-bounded driver sample
    (``train_centroids`` — constant-size at any corpus); assignment is
    one broadcast + matmul map_batches pass; the ONLY shuffle moves
    each vector once to its cell (groupby); the per-cell kernel is
    chunked matmul (slab memory bounded by ``_SEMDEDUP_SLAB_BUDGET``)
    and raises past ``cell_cap`` rather than degrade silently.

    Reference analogue: the frame-similarity suppression gate
    (services/harvest_service.py:206-232) — same "seen something too
    similar already, drop it" semantics, lifted to embedding space."""
    cents = train_centroids(
        ds, n_centroids=n_centroids, sample_frac=sample_frac, seed=seed
    )
    ref = ray.put(cents)

    def assign(df: pd.DataFrame):
        from .partition import to_clean_arrow

        c = ray.get(ref)
        m = _normalize_rows(_stack(df["embedding"]))
        return to_clean_arrow(
            pd.DataFrame(
                {
                    "vec_id": df["vec_id"].to_numpy(np.int64),
                    "cell": np.argmax(m @ c.T, axis=1).astype(np.int64),
                    "embedding": df["embedding"],
                }
            )
        )

    if keep not in ("min_id", "low_centroid"):
        raise ValueError(f"unsupported keep={keep!r}")

    def cell_survivors(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n > cell_cap:
            raise ValueError(
                f"semdedup cell has {n} rows > cell_cap={cell_cap}; "
                f"raise n_centroids so cells shrink (k ~ sqrt(N))"
            )
        g = g.sort_values("vec_id", kind="stable")
        ids = g["vec_id"].to_numpy(np.int64)
        m = _normalize_rows(_stack(g["embedding"]))
        dup = np.zeros(n, dtype=bool)
        edges: list[np.ndarray] = []
        chunk = max(1, _SEMDEDUP_SLAB_BUDGET // max(n, 1))
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            s = m[lo:hi] @ m.T  # (hi-lo, n) slab
            # row r (global i = lo+r) may only match columns j < i
            mask = np.tri(hi - lo, n, k=lo - 1, dtype=bool)
            hit = (s >= threshold) & mask
            dup[lo:hi] = hit.any(axis=1)
            if keep == "low_centroid" and hit.any():
                r, j = np.nonzero(hit)  # thresholded pairs are dup-scale
                edges.append(np.stack([r + lo, j], axis=1))
        if keep == "min_id":
            return pd.DataFrame(
                {
                    "vec_id": ids[~dup],
                    "cell": g["cell"].to_numpy(np.int64)[~dup],
                }
            )
        # paper rule: components of the thresholded graph, keep the
        # member with the lowest centroid cosine (ties: smallest id)
        parent = np.arange(n, dtype=np.int64)

        def find(a: int) -> int:
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        if edges:
            for a, b in np.concatenate(edges):
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        root = np.fromiter((find(i) for i in range(n)), np.int64, n)
        cell_id = int(g["cell"].iloc[0])
        c = ray.get(ref)[cell_id]
        csim = m @ c  # cosine to the (unit-norm) cell centroid
        # quantize to integer micro-units before ordering (the repo's
        # discipline for every float-derived ordering): raw float64
        # csim can flip the survivor vs the SQL oracle when two group
        # members sit within an ulp of each other
        csim_micro = np.floor(csim * 1_000_000.0).astype(np.int64)
        # order members by (centroid-sim asc, id asc); the first row of
        # each component survives; singleton components always survive
        order = np.lexsort((ids, csim_micro))
        first = (
            pd.Series(order)
            .groupby(root[order], sort=False)
            .transform("first")
            .to_numpy()
        )
        survive = np.zeros(n, dtype=bool)
        survive[order] = order == first
        return pd.DataFrame(
            {
                "vec_id": ids[survive],
                "cell": g["cell"].to_numpy(np.int64)[survive],
            }
        )

    def survivors_block(df: pd.DataFrame) -> pd.DataFrame:
        # a bucket-partition holds a handful of WHOLE cells (cell is
        # the shuffle key), so the per-cell loop is over the model's k,
        # never over rows
        outs = [cell_survivors(g) for _, g in df.groupby("cell", sort=False)]
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                {
                    "vec_id": np.array([], dtype=np.int64),
                    "cell": np.array([], dtype=np.int64),
                }
            )
        )

    from .partition import apply_per_bucket, default_num_buckets

    assigned = ds.map_batches(assign, batch_format="pandas")
    b = max(1, min(n_centroids, default_num_buckets()))
    return apply_per_bucket(assigned, survivors_block, key="cell", num_buckets=b)


def quantize_embeddings(
    ds: ray.data.Dataset, levels: int = 127, explode: bool = True
) -> ray.data.Dataset:
    """Symmetric per-vector int8-style quantization: each vector's
    components quantize to ``code = floor(micro·levels / scale)`` with
    ``scale = max |micro component|`` (micro = floor(v·1e6) int64) —
    the 4× memory cut that keeps a 10^9-vector ANN index in RAM, with
    the scale riding along for dequantization. Pure integer arithmetic
    after the one micro floor, so the gate is an exact hash compare
    (floor division spelled sign-safely, matching the SQL oracle's
    truncating ``//``).

    Embarrassingly parallel, one pass, no shuffle. ``explode=True``
    (the gate layout) emits (vec_id, dim, code, scale_micro) rows —
    dim 1-based like SQL's generate_subscripts; ``explode=False`` is
    the PRODUCTION layout: one row per vector with the codes as an
    int8 list column (the actual 4x memory cut — never materialize
    the exploded form at corpus scale)."""
    import pyarrow as pa

    def kernel(df: pd.DataFrame):
        ids = df["vec_id"].to_numpy(np.int64)
        micro = np.floor(_stack(df["embedding"]) * 1e6).astype(np.int64)
        n, d = micro.shape
        s = np.abs(micro).max(axis=1)  # per-vector scale
        s_safe = np.maximum(s, 1)[:, None]
        x = micro * levels
        # sign-safe floor division (numpy // already floors; the SQL
        # oracle spells the same floor out of truncating division)
        codes = x // s_safe
        codes[s == 0] = 0
        if explode:
            return pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, d),
                    "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
                    "code": codes.reshape(-1),
                    "scale_micro": np.repeat(s, d),
                }
            )
        flat = pa.array(codes.reshape(-1).astype(np.int8), pa.int8())
        offs = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "codes": pa.ListArray.from_arrays(offs, flat),
                "scale_micro": pa.array(s),
            }
        )

    return ds.map_batches(kernel, batch_format="pandas")
