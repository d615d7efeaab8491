"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Extension slot noted in SURVEY §2.7 D2: the reference suppresses
near-duplicate detections by coordinate tolerance
(``condition.py:66-77``); at training-data scale the analogous
operators are document near-dup sketches. All sketches are computed
per-batch (vectorized numpy over each doc's shingle set), exploded to
(band, band_hash, doc_id) rows, bucketed by a single groupby — the
standard shingle→minhash→band→bucket plan — then candidate pairs are
verified exactly with the texts of only the involved docs broadcast
via ``ray.put`` (candidates ≪ corpus, no second full shuffle).

Determinism: all hashing is crc32/blake2b-based (no PYTHONHASHSEED
dependence), so signatures are identical across workers and runs.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

MERSENNE = (1 << 61) - 1


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct crc32 hashes of the k-char shingles of a document."""
    if len(text) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    b = text.encode("utf-8", "ignore")
    return np.unique(
        np.array([zlib.crc32(b[i : i + k]) for i in range(len(b) - k + 1)], dtype=np.uint64)
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


class MinHasher:
    """Actor-pool batch fn: permutation params generated once per actor
    (ST1 pattern); emits (doc_id, band, band_hash) rows."""

    def __init__(self, num_perm: int = 128, bands: int = 32, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = char_shingles(text, self.k).astype(np.uint64)
        # (num_perm, |S|) universal hash, min over shingles
        v = (np.outer(self.a, sh) + self.b[:, None]) % MERSENNE
        return v.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_band, out_hash = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = self.signature(text).reshape(self.bands, self.rows)
            # fold each band's rows into one deterministic bucket hash
            bh = sig[:, 0].copy()
            for r in range(1, self.rows):
                bh = (bh * np.uint64(1_000_003) + sig[:, r]) % np.uint64(MERSENNE)
            out_doc.extend([doc_id] * self.bands)
            out_band.extend(range(self.bands))
            out_hash.extend(bh.tolist())
        return pd.DataFrame(
            {
                "doc_id": np.array(out_doc, dtype=np.int64),
                "band": np.array(out_band, dtype=np.int64),
                "band_hash": np.array(out_hash, dtype=np.uint64).astype(np.int64),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ia].astype(np.int64), "doc_b": ids[ib].astype(np.int64)})


def band_candidate_pairs(sig: ray.data.Dataset, num_buckets: int | None = None) -> pd.DataFrame:
    """Distinct candidate pairs from (band, band_hash) rows: hash
    repartition on band_hash co-locates buckets (same plan as every
    other stateful stage — see stages/partition.py), then pairs are
    emitted per exact (band, band_hash) group within the partition."""
    from .partition import apply_per_bucket

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _bucket_pairs(grp)
            for _, grp in g.groupby(["band", "band_hash"], sort=False)
        ]
        if not outs:
            return pd.DataFrame(
                {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    pairs = apply_per_bucket(sig, kernel, key="band_hash", num_buckets=num_buckets)
    return pairs.to_pandas().drop_duplicates().reset_index(drop=True)


def minhash_candidates(
    docs: ray.data.Dataset, num_perm: int = 128, bands: int = 32, k: int = 5
) -> pd.DataFrame:
    """Distinct candidate near-dup pairs (share ≥ 1 LSH band)."""
    sig = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pandas",
        batch_size=512,
        concurrency=(2, 8),
    )
    return band_candidate_pairs(sig)


def verify_pairs_jaccard(
    docs: ray.data.Dataset, pairs: pd.DataFrame, k: int = 5
) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs; texts of involved docs
    only are broadcast (small side) — no full-corpus shuffle."""
    if pairs.empty:
        return pd.DataFrame(
            {
                "doc_a": np.array([], np.int64),
                "doc_b": np.array([], np.int64),
                "jaccard_milli": np.array([], np.int64),
            }
        )
    involved = set(pairs["doc_a"]) | set(pairs["doc_b"])
    texts = {}
    for b in docs.select_columns(["doc_id", "text"]).iter_batches(batch_format="pandas"):
        m = b[b["doc_id"].isin(involved)]
        texts.update(zip(m["doc_id"], m["text"]))
    ref = ray.put(texts)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(ref)
        cache: dict[int, np.ndarray] = {}

        def sh(i: int) -> np.ndarray:
            if i not in cache:
                cache[i] = char_shingles(tx[i], k)
            return cache[i]

        jm = [
            int(jaccard(sh(a), sh(b)) * 1000)
            for a, b in zip(df["doc_a"], df["doc_b"])
        ]
        return df.assign(jaccard_milli=np.array(jm, dtype=np.int64))

    return (
        ray.data.from_pandas(pairs)
        .map_batches(verify, batch_format="pandas")
        .to_pandas()
    )


def minhash_near_dups(
    docs: ray.data.Dataset, threshold_milli: int = 700, k: int = 5
) -> pd.DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification."""
    cand = minhash_candidates(docs, k=k)
    verified = verify_pairs_jaccard(docs, cand, k=k)
    out = verified[verified["jaccard_milli"] >= threshold_milli]
    return out.sort_values(["doc_a", "doc_b"], kind="stable").reset_index(drop=True)


# ----------------------------------------------------------------- simhash
def _token_hash64(tok: str) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")


def simhash64(text: str) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.lower().split():
        h = _token_hash64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            # store as int64 (two's complement of the uint64 simhash)
            "simhash": np.array(
                [simhash64(t) for t in df["text"]], dtype=np.uint64
            ).astype(np.int64),
        }
    )


def simhash_docs(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(simhash_batch, batch_format="pandas")


def simhash_near_dups(docs: ray.data.Dataset, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dups: 4×16-bit band exact-match candidates (any pair
    within hamming ≤ 3 of a 64-bit hash shares ≥ 1 of 4 bands), then
    exact hamming verify."""
    sig = simhash_docs(docs)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for band in range(4):
            part = ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            rows.append(
                pd.DataFrame(
                    {"doc_id": df["doc_id"], "band": np.int64(band), "band_hash": part}
                )
            )
        return pd.concat(rows, ignore_index=True)

    pairs = band_candidate_pairs(sig.map_batches(explode, batch_format="pandas"))
    if pairs.empty:
        return pd.DataFrame(
            {
                "doc_a": np.array([], np.int64),
                "doc_b": np.array([], np.int64),
                "hamming": np.array([], np.int64),
            }
        )
    sp = sig.to_pandas()
    sig_map = dict(zip(sp["doc_id"], sp["simhash"]))
    a = pairs["doc_a"].map(sig_map).to_numpy().astype(np.uint64)
    b = pairs["doc_b"].map(sig_map).to_numpy().astype(np.uint64)
    x = a ^ b
    ham = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        ham += (x & 1).astype(np.int64)
        x >>= 1
    out = pairs.assign(hamming=ham)
    out = out[out["hamming"] <= max_hamming]
    return out.sort_values(["doc_a", "doc_b"], kind="stable").reset_index(drop=True)
