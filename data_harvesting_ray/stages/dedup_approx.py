"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Extension slot noted in SURVEY §2.7 D2: the reference suppresses
near-duplicate detections by coordinate tolerance
(``condition.py:66-77``); at training-data scale the analogous
operators are document near-dup sketches. The plan is the standard
shingle→minhash→band→bucket pipeline, kept distributed end-to-end:

- sketches are computed per batch with VECTORIZED numpy kernels (a
  sliding-window polynomial hash over the document's bytes; token
  hashes via ``pd.util.hash_array`` — no per-shingle/per-token Python
  hashing),
- (band, band_hash) rows are co-located by the engine's shared hash
  repartition and candidate pairs emitted per exact bucket, with a
  hot-bucket cap (a degenerate hash — e.g. many near-empty docs — is
  skipped with a warning instead of going O(n²)),
- candidate pairs stay a ``Dataset``; exact verification fetches ONLY
  the involved documents via a broadcast-id semi-join (distributed
  filter over the corpus, never a driver-side corpus scan) and runs
  inside ``map_batches``. The final thresholded pair list — small by
  construction — is returned as pandas.

When the involved-document set outgrows the driver
(``involved_cap``), verification switches to the exploded two-sided
hash join (``attach_value_distributed``): involved payload rows are
co-partitioned with the pair rows by hash(doc_a) and then hash(doc_b)
— two key-only shuffles, no driver staging of any payload.

Determinism: all hashing is fixed-coefficient polynomial / siphash
with pandas' fixed key (no PYTHONHASHSEED dependence), so signatures
are identical across workers and runs.
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

MERSENNE = (1 << 61) - 1
_POLY_P = np.uint64(1_099_511_628_211)  # FNV-ish odd multiplier, mod 2^64


def _poly_powers(k: int) -> np.ndarray:
    out = np.empty(k, dtype=np.uint64)
    out[0] = np.uint64(1)
    # uint64 wraparound (mod 2^64) is the DESIGN here, not an accident —
    # suppress numpy's overflow RuntimeWarning so real warnings stay
    # visible in bench/pytest output
    with np.errstate(over="ignore"):
        for i in range(1, k):
            out[i] = out[i - 1] * _POLY_P
    return out


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct polynomial hashes of the k-byte shingles of a document
    — one sliding-window view + k vectorized multiply-adds (mod 2^64
    by uint64 wraparound), no per-shingle Python."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    pw = _poly_powers(k)
    with np.errstate(over="ignore"):  # deliberate mod-2^64 wraparound
        if len(b) < k:
            if not len(b):
                return np.array([np.uint64(0)], dtype=np.uint64)
            h = (b.astype(np.uint64) * pw[: len(b)]).sum(dtype=np.uint64)
            return np.array([h], dtype=np.uint64)
        win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        h = win @ pw  # uint64 wraparound == mod 2^64
    return np.unique(h)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def jaccard_milli(a: np.ndarray, b: np.ndarray) -> int:
    """Exact Jaccard in integer milli-units (floor division) — matches
    SQL ``(m * 1000) // (na + nb - m)`` bit-for-bit, so the DuckDB
    5-gram oracle for ``d_minhash_near_dups`` can hash-compare."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return (inter * 1000) // union if union else 1000


class MinHasher:
    """Actor-pool batch fn: permutation params generated once per actor
    (ST1 pattern); emits (doc_id, band, band_hash) rows.

    The signature kernel is vectorized ACROSS documents: all docs'
    shingle arrays are concatenated and the (num_perm, total_shingles)
    universal hash is segmented per doc with ``np.minimum.reduceat`` —
    bit-identical to the per-doc form (elementwise uint64 arithmetic is
    layout-independent) with one numpy dispatch per shingle-bounded
    group instead of one per document. ``group_shingles`` bounds the
    temp to num_perm × group_shingles × 8 B (~34 MB at the default) so
    the kernel stays cache/heap-friendly at any batch size."""

    def __init__(
        self,
        num_perm: int = 128,
        bands: int = 16,
        k: int = 5,
        seed: int = 7,
        group_shingles: int = 1 << 15,
    ):
        # Default 16 bands x 8 rows: the S-curve midpoint (1/b)^(1/r)
        # = (1/16)^(1/8) = 0.707 sits AT the standard verify threshold
        # t = 0.7 (the classic banding rule — Leskovec/Rajaraman/Ullman,
        # "Mining of Massive Datasets" ch. 3). The previous 32x4 curve
        # (midpoint 0.42) admitted the corpus's ambient-similarity mass
        # as candidates: measured 703k candidates for 256 true pairs at
        # 5k docs vs 422 with 16x8.
        #
        # RECALL IS THE S-CURVE, not 1.0: capture probability at
        # J = 0.70 is ~0.61, ~0.95 at 0.80, ~0.9999 at 0.90 — LSH is
        # probabilistic AT the midpoint by construction, and no (b, r)
        # gives both near-1 recall at exactly t and a small candidate
        # set. This default assumes (and the test fixtures satisfy) a
        # MARGIN around the threshold: ambient pairs well below t, true
        # near-dups well above it — the usual shape of duplicated
        # corpora. Pairs sitting near t need either more bands at the
        # same rows (recall up, candidates up: 32x4 gives ~0.9998 at
        # 0.70) or the EXACT prefix-filter join
        # (``ngram_jaccard_near_dups``), whose recall is 1.0 by
        # construction at any threshold.
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k
        self.group_shingles = group_shingles

    def signature(self, text: str) -> np.ndarray:
        sh = char_shingles(text, self.k)
        # (num_perm, |S|) universal hash, min over shingles
        with np.errstate(over="ignore"):  # deliberate mod-2^64 product
            v = (np.outer(self.a, sh) + self.b[:, None]) % MERSENNE
        return v.min(axis=1)

    def _band_hashes(self, shingle_arrays: list[np.ndarray]) -> np.ndarray:
        """(n_docs, bands) band bucket hashes for a group of documents,
        one vectorized pass over the concatenated shingles."""
        counts = np.array([len(s) for s in shingle_arrays], dtype=np.int64)
        allsh = np.concatenate(shingle_arrays)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        with np.errstate(over="ignore"):  # deliberate mod-2^64 product
            v = (self.a[:, None] * allsh[None, :] + self.b[:, None]) % MERSENNE
            mins = np.minimum.reduceat(v, starts, axis=1)  # (num_perm, n)
            # fold each band's rows into one deterministic bucket hash
            s3 = mins.reshape(self.bands, self.rows, -1)
            bh = s3[:, 0, :].copy()
            for r in range(1, self.rows):
                bh = (bh * np.uint64(1_000_003) + s3[:, r, :]) % np.uint64(MERSENNE)
        return bh.T  # (n_docs, bands)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        shingles = [char_shingles(t, self.k) for t in df["text"]]
        sig = np.empty((n, self.bands), dtype=np.uint64)
        # greedy shingle-count-bounded groups keep the vectorized temp
        # small while amortizing numpy dispatch over ~dozens of docs
        start = 0
        while start < n:
            end, total = start, 0
            while end < n and (end == start or total + len(shingles[end]) <= self.group_shingles):
                total += len(shingles[end])
                end += 1
            sig[start:end] = self._band_hashes(shingles[start:end])
            start = end
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy().astype(np.int64), self.bands),
                "band": np.tile(np.arange(self.bands, dtype=np.int64), n),
                "band_hash": sig.reshape(-1).astype(np.int64),
            }
        )


def _bucket_pairs(g: pd.DataFrame, cap: int | None) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].unique())
    empty = pd.DataFrame({"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)})
    if len(ids) < 2:
        return empty
    if cap is not None and len(ids) > cap:
        warnings.warn(
            f"near-dup bucket with {len(ids)} docs exceeds cap {cap}; "
            "skipping (degenerate band hash — e.g. empty documents)"
        )
        return empty
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"doc_a": ids[ia].astype(np.int64), "doc_b": ids[ib].astype(np.int64)})


def band_candidate_pairs(
    sig: ray.data.Dataset,
    num_buckets: int | None = None,
    bucket_cap: int | None = 5000,
) -> ray.data.Dataset:
    """DISTINCT candidate pairs from (band, band_hash) rows, as a
    Dataset: hash repartition on band_hash co-locates buckets (the same
    plan as every other stateful stage — stages/partition.py) and pairs
    are emitted per exact (band, band_hash) group; then a SECOND
    key-only shuffle of the candidate-scale pair table (keyed on doc_a,
    so equal pairs always co-locate) keeps the first copy of each pair.
    A true near-dup typically matches in MANY of the bands — without
    this pass exact verification ran up to #bands times per pair."""
    from .partition import apply_per_bucket

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        outs = [
            _bucket_pairs(grp, bucket_cap)
            for _, grp in g.groupby(["band", "band_hash"], sort=False)
        ]
        if not outs:
            return pd.DataFrame(
                {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
            )
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    pairs = apply_per_bucket(sig, kernel, key="band_hash", num_buckets=num_buckets)
    distinct = apply_per_bucket(
        pairs,
        lambda df: df.drop_duplicates(),
        key="doc_a",
        num_buckets=num_buckets,
    )
    # candidate pairs are consumed twice (involved-id collection, then
    # verification); materialize so the sketch + shuffles don't
    # re-execute per consumer. Candidate-scale (≪ corpus) by design —
    # the hot-bucket cap bounds the degenerate case.
    return distinct.materialize()


def minhash_candidates(
    docs: ray.data.Dataset,
    num_perm: int = 128,
    bands: int = 16,
    k: int = 5,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Distinct candidate near-dup pairs (share ≥ 1 LSH band)."""
    sig = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "k": k},
        batch_format="pandas",
        batch_size=512,
        concurrency=(2, 8),
    )
    return band_candidate_pairs(sig, num_buckets=num_buckets)


def _collect_involved(
    pairs: ray.data.Dataset, id_cols: tuple[str, str] = ("doc_a", "doc_b")
) -> np.ndarray:
    """Distinct ids referenced by the candidate pairs (ids only — a few
    bytes per candidate, never document payloads)."""
    a, b = id_cols

    def ids(t: pa.Table) -> pa.Table:
        u = np.union1d(t[a].to_numpy(zero_copy_only=False), t[b].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": u.astype(np.int64)})

    out = pairs.map_batches(ids, batch_format="pyarrow").to_pandas()
    if "doc_id" not in out.columns:
        return np.array([], dtype=np.int64)
    return np.unique(out["doc_id"].to_numpy())


def _fetch_involved_map(
    ds: ray.data.Dataset, involved: np.ndarray, key: str, value: str
) -> dict:
    """Broadcast-id semi-join: the involved-id set is broadcast via
    ``ray.put`` and the corpus filtered in parallel map_batches tasks —
    only the involved rows (candidate-scale, not corpus-scale) reach
    the driver."""
    ref = ray.put(np.sort(involved))

    # Arrow batches end-to-end: an empty pandas block with object
    # columns trips Ray's size estimator into a noisy per-block warning
    # ("cannot call `vectorize` on size 0 inputs")
    def filt(t: pa.Table) -> pa.Table:
        keep = np.isin(t[key].to_numpy(zero_copy_only=False), ray.get(ref))
        return t.filter(pa.array(keep)).select([key, value])

    small = ds.map_batches(filt, batch_format="pyarrow").to_pandas()
    return dict(zip(small[key], small[value]))


def _involved_docs(
    ds: ray.data.Dataset, involved: np.ndarray, key: str, value: str
) -> ray.data.Dataset:
    """Distributed broadcast-id semi-join: the involved-ID set (8 B per
    candidate doc — driver-safe at any realistic scale) is broadcast
    via ``ray.put`` and the corpus filtered in parallel; the surviving
    rows STAY a Dataset (payloads never visit the driver)."""
    ref = ray.put(np.sort(involved))

    def filt(t: pa.Table) -> pa.Table:
        keep = np.isin(t[key].to_numpy(zero_copy_only=False), ray.get(ref))
        return t.filter(pa.array(keep)).select([key, value])

    return ds.map_batches(filt, batch_format="pyarrow")


def attach_value_distributed(
    pairs: ray.data.Dataset,
    kv: ray.data.Dataset,
    join_col: str,
    out_col: str,
    key: str = "doc_id",
    value: str = "text",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Attach ``kv``'s value column to each pair row with Ray Data's
    native hash join on ``join_col`` — ONE key-only shuffle co-locating
    pair rows with the (involved-only) payload rows; no driver staging.
    Inner join: every pair id has its payload row by construction."""
    from .partition import _ensure_hash_shuffle, default_num_buckets

    _ensure_hash_shuffle()
    b = num_buckets or default_num_buckets()
    rhs = kv.map_batches(
        lambda df: df.rename(columns={key: "__jk", value: out_col})[
            ["__jk", out_col]
        ],
        batch_format="pandas",
    )
    # the join drops the right key column (merged into ``join_col``)
    return pairs.join(
        rhs, join_type="inner", num_partitions=b, on=(join_col,), right_on=("__jk",)
    )


# Above this many involved docs the broadcast verify path would stage
# that many payloads on the driver — switch to the exploded hash-join.
INVOLVED_BROADCAST_CAP = 500_000


def verify_pairs_jaccard(
    docs: ray.data.Dataset,
    pairs: ray.data.Dataset,
    k: int = 5,
    involved_cap: int = INVOLVED_BROADCAST_CAP,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard for candidate pairs, computed inside
    map_batches over the pairs Dataset. Small involved sets (≤
    ``involved_cap`` docs) broadcast the involved texts once via
    ``ray.put``; past the cap the texts are attached by two key-only
    hash-join shuffles (doc_a then doc_b) and scored in place — the
    driver never holds a payload on that path."""
    involved = _collect_involved(pairs)
    kv = docs.select_columns(["doc_id", "text"])
    if len(involved) > involved_cap:
        inv = _involved_docs(kv, involved, "doc_id", "text")
        with_a = attach_value_distributed(
            pairs, inv, "doc_a", "__text_a", num_buckets=num_buckets
        )
        with_b = attach_value_distributed(
            with_a, inv, "doc_b", "__text_b", num_buckets=num_buckets
        )

        def score(df: pd.DataFrame) -> pd.DataFrame:
            cache: dict[int, np.ndarray] = {}

            def sh(i: int, t: str) -> np.ndarray:
                if i not in cache:
                    cache[i] = char_shingles(t, k)
                return cache[i]

            jm = [
                jaccard_milli(sh(a, ta), sh(b, tb))
                for a, b, ta, tb in zip(
                    df["doc_a"], df["doc_b"], df["__text_a"], df["__text_b"]
                )
            ]
            return df.drop(columns=["__text_a", "__text_b"]).assign(
                jaccard_milli=np.array(jm, dtype=np.int64)
            )

        return with_b.map_batches(score, batch_format="pandas")

    texts = _fetch_involved_map(kv, involved, "doc_id", "text")
    ref = ray.put(texts)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(ref)
        cache: dict[int, np.ndarray] = {}

        def sh(i: int) -> np.ndarray:
            if i not in cache:
                cache[i] = char_shingles(tx[i], k)
            return cache[i]

        jm = [
            jaccard_milli(sh(a), sh(b))
            for a, b in zip(df["doc_a"], df["doc_b"])
        ]
        return df.assign(jaccard_milli=np.array(jm, dtype=np.int64))

    return pairs.map_batches(verify, batch_format="pandas")


def minhash_near_dups(
    docs: ray.data.Dataset,
    threshold_milli: int = 700,
    k: int = 5,
    num_buckets: int | None = None,
    involved_cap: int = INVOLVED_BROADCAST_CAP,
) -> pd.DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.
    Candidates and verification stay distributed; only the final
    thresholded pair list (small by construction) lands on the driver."""
    cand = minhash_candidates(docs, k=k, num_buckets=num_buckets)
    verified = verify_pairs_jaccard(
        docs, cand, k=k, involved_cap=involved_cap, num_buckets=num_buckets
    )
    out = verified.map_batches(
        lambda df: df[df["jaccard_milli"].to_numpy() >= threshold_milli],
        batch_format="pandas",
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_a": np.array([], np.int64),
                "doc_b": np.array([], np.int64),
                "jaccard_milli": np.array([], np.int64),
            }
        )
    out = out.drop_duplicates()  # a pair may match in several bands
    return out.sort_values(["doc_a", "doc_b"], kind="stable").reset_index(drop=True)


# ----------------------------------------------------------------- simhash
_BIT_POWS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """64-bit SimHash, vectorized across the WHOLE batch: all documents'
    tokens are hashed in ONE ``pd.util.hash_array`` call (siphash,
    fixed key — no per-token or per-doc Python hashing), the ±1 bit
    sums are segmented per doc with ``np.add.reduceat``, and the sign
    bits packed back into one uint64 per doc."""
    tok_lists = [t.lower().split() for t in df["text"]]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    sig = np.zeros(len(df), dtype=np.uint64)
    nonempty = np.flatnonzero(counts)
    if len(nonempty):
        all_toks = np.concatenate(
            [np.asarray(tok_lists[i], dtype=object) for i in nonempty]
        )
        h = pd.util.hash_array(all_toks, categorize=False)
        pm = (
            2 * ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int8)
            - 1
        ).astype(np.int32)
        starts = np.concatenate([[0], np.cumsum(counts[nonempty])[:-1]])
        sums = np.add.reduceat(pm, starts, axis=0)  # (n_nonempty, 64)
        sig[nonempty] = ((sums > 0).astype(np.uint64) * _BIT_POWS[None, :]).sum(axis=1)
    return pd.DataFrame({"doc_id": df["doc_id"], "simhash": sig.astype(np.int64)})


def simhash64(text: str) -> int:
    """Single-document convenience wrapper over ``simhash_batch``."""
    out = simhash_batch(pd.DataFrame({"doc_id": [0], "text": [text]}))
    return int(out["simhash"].iloc[0]) & 0xFFFFFFFFFFFFFFFF


def simhash_docs(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(simhash_batch, batch_format="pandas")


def simhash_near_dups(
    docs: ray.data.Dataset, max_hamming: int = 3, num_buckets: int | None = None
) -> pd.DataFrame:
    """SimHash near-dups: 4×16-bit band exact-match candidates (any pair
    within hamming ≤ 3 of a 64-bit hash shares ≥ 1 of 4 bands), then
    exact hamming verify. Candidates stay a Dataset; only involved
    signatures (not the full signature table) reach the driver."""
    # sig is consumed twice (band explode + involved-signature fetch):
    # one int64 per doc — materialize instead of recomputing the sketch
    sig = simhash_docs(docs).materialize()

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

    pairs = band_candidate_pairs(
        sig.map_batches(explode, batch_format="pandas"), num_buckets=num_buckets
    )
    involved = _collect_involved(pairs)
    if not len(involved):
        return pd.DataFrame(
            {
                "doc_a": np.array([], np.int64),
                "doc_b": np.array([], np.int64),
                "hamming": np.array([], np.int64),
            }
        )
    sig_map = _fetch_involved_map(sig, involved, "doc_id", "simhash")
    ref = ray.put(sig_map)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(ref)
        a = df["doc_a"].map(sm).to_numpy().astype(np.uint64)
        b = df["doc_b"].map(sm).to_numpy().astype(np.uint64)
        x = a ^ b
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        return df.assign(hamming=ham)

    out = (
        pairs.map_batches(verify, batch_format="pandas")
        .map_batches(
            lambda df: df[df["hamming"].to_numpy() <= max_hamming],
            batch_format="pandas",
        )
        .to_pandas()
    )
    out = out.drop_duplicates()  # a pair may match in several bands
    return out.sort_values(["doc_a", "doc_b"], kind="stable").reset_index(drop=True)


# ------------------------------------------ exact n-gram Jaccard self-join
class PrefixTokens:
    """Actor-pool batch fn for the prefix-filter similarity self-join
    (the AllPairs/PPJoin family — public literature: Chaudhuri et al.
    ICDE'06, Bayardo et al. WWW'07): for each document's distinct
    k-shingle set S, sorted under a GLOBAL total order, emit
    (token, doc_id, size) rows for the first ``|S| - ceil(t*|S|) + 1``
    tokens. Any pair with Jaccard >= t must share >= 1 PREFIX token
    (if A and B shared only suffix tokens their overlap would be <
    ceil(t*|A|) <= the minimum overlap J >= t implies), so bucketing on
    prefix tokens has recall EXACTLY 1.0 — the deterministic
    alternative to MinHash-LSH, trading a larger candidate set for a
    no-miss guarantee.

    The global order is (document frequency asc, hash asc) — AllPairs'
    key insight: prefixes must hold the RAREST tokens or the Zipf head
    of natural text lands in every prefix and the token buckets go
    quadratic (measured: 300 s vs 10 s at 5k docs). Only the df table's
    HEAD (tokens above ``min_df``) is needed for that order — absent
    tokens tie at df=0 and fall back to hash order, which only ever
    moves rare tokens around inside the prefix zone — so the broadcast
    stays Zipf-head-sized at any corpus size. ANY consistent total
    order preserves exact recall; frequency ordering is purely a
    candidate-count optimization."""

    def __init__(self, threshold_milli: int = 700, k: int = 5, common_ref=None):
        self.t = int(threshold_milli)
        self.k = k
        if common_ref is not None:
            common = ray.get(common_ref)  # once per actor (ST1)
            self.c_toks = common["token"]  # uint64, sorted
            self.c_df = common["df"]
        else:
            self.c_toks = np.array([], dtype=np.uint64)
            self.c_df = np.array([], dtype=np.int64)

    def _prefix(self, sh: np.ndarray, p: int) -> np.ndarray:
        """First p tokens of sh under (df asc, hash asc)."""
        if not len(self.c_toks):
            return sh[:p]  # sh is hash-sorted already
        idx = np.searchsorted(self.c_toks, sh)
        idx_c = np.minimum(idx, len(self.c_toks) - 1)
        df = np.where(self.c_toks[idx_c] == sh, self.c_df[idx_c], 0)
        return sh[np.lexsort((sh, df))[:p]]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks: list[np.ndarray] = []
        sizes = np.empty(len(df), dtype=np.int64)
        for i, text in enumerate(df["text"]):
            sh = np.sort(char_shingles(text, self.k))
            n = len(sh)
            alpha = -(-self.t * n // 1000)  # ceil(t * n), integer-exact
            toks.append(self._prefix(sh, n - alpha + 1))
            sizes[i] = n
        counts = np.array([len(x) for x in toks], dtype=np.int64)
        allt = (
            np.concatenate(toks).view(np.int64)
            if toks
            else np.array([], dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "token": allt,
                "doc_id": np.repeat(
                    df["doc_id"].to_numpy().astype(np.int64), counts
                ),
                "size": np.repeat(sizes, counts),
            }
        )


def common_token_df(
    docs: ray.data.Dataset, k: int = 5, min_df: int = 2
) -> dict:
    """Document frequency of the corpus's COMMON shingles (df >=
    min_df), as sorted numpy arrays ready for ``searchsorted`` lookup.
    Keys-only plan: each batch emits per-doc-distinct (token, 1) rows
    pre-aggregated within the batch, one hash groupby sums them, and
    only the Zipf head survives the filter — the table that reaches
    the driver is head-sized, never shingle-universe-sized."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        shs = [char_shingles(t, k) for t in df["text"]]
        if not shs:
            return pd.DataFrame(
                {"token": np.array([], np.int64), "n": np.array([], np.int64)}
            )
        tok, cnt = np.unique(np.concatenate(shs), return_counts=True)
        return pd.DataFrame(
            {"token": tok.view(np.int64), "n": cnt.astype(np.int64)}
        )

    freq = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="df"))
        .map_batches(
            lambda d: d[d["df"].to_numpy() >= min_df], batch_format="pandas"
        )
        .to_pandas()
    )
    if not len(freq):
        return {
            "token": np.array([], dtype=np.uint64),
            "df": np.array([], dtype=np.int64),
        }
    tok = freq["token"].to_numpy().view(np.uint64)
    order = np.argsort(tok)
    return {"token": tok[order], "df": freq["df"].to_numpy()[order].astype(np.int64)}


def prefix_candidate_pairs(
    tok: ray.data.Dataset,
    threshold_milli: int = 700,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """DISTINCT candidate pairs from prefix-token rows: hash
    repartition on token co-locates each token's posting list, pairs
    are emitted per exact token with the size filter
    ``min(|A|,|B|) * 1000 >= t * max(|A|,|B|)`` (J <= min/max, so
    failing pairs cannot reach t — pruned before verification), then
    the same doc_a-keyed distinct pass as ``band_candidate_pairs``.
    NO hot-bucket cap: exact recall is the operator's contract — a
    candidate blow-up surfaces as wall time, never as a silent miss
    (see ``ngram_jaccard_near_dups`` for where the blow-up can come
    from and when to prefer MinHash)."""
    from .partition import apply_per_bucket

    empty = pd.DataFrame(
        {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        # only multi-doc tokens can produce pairs; drop the (vast)
        # single-doc majority up front, then generate all intra-token
        # pairs VECTORIZED PER GROUP-SIZE CLASS: groups of equal size s
        # stack into a (n_groups, s) matrix indexed once with the
        # s-specific triu indices — the Python loop runs over the few
        # dozen distinct sizes, never over the ~10^5 token groups
        g = g[g.duplicated("token", keep=False)]
        if not len(g):
            return empty
        g = g.sort_values(["token", "doc_id"], kind="stable")
        codes, _ = pd.factorize(g["token"].to_numpy(), sort=False)
        counts = np.bincount(codes)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        ids_v = g["doc_id"].to_numpy()
        sz_v = g["size"].to_numpy()
        outs = []
        for s in np.unique(counts):
            if s < 2:
                continue
            sel = np.flatnonzero(counts == s)
            rows = starts[sel][:, None] + np.arange(s)[None, :]  # (n_g, s)
            ids = np.take(ids_v, rows)
            sz = np.take(sz_v, rows)
            ia, ib = np.triu_indices(s, k=1)
            # np.take, NOT fancy indexing: 2-D fancy gathers are
            # pathologically slow on some hosts (100x+, measured)
            a = np.take(ids, ia, axis=1).ravel()
            b = np.take(ids, ib, axis=1).ravel()
            sa = np.take(sz, ia, axis=1).ravel()
            sb = np.take(sz, ib, axis=1).ravel()
            keep = np.minimum(sa, sb) * 1000 >= threshold_milli * np.maximum(sa, sb)
            if keep.any():
                outs.append(
                    pd.DataFrame(
                        {
                            # doc_id-sorted within each token group, so
                            # a < b holds without a min/max pass
                            "doc_a": a[keep].astype(np.int64),
                            "doc_b": b[keep].astype(np.int64),
                        }
                    )
                )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    pairs = apply_per_bucket(tok, kernel, key="token", num_buckets=num_buckets)
    distinct = apply_per_bucket(
        pairs, lambda df: df.drop_duplicates(), key="doc_a", num_buckets=num_buckets
    )
    # consumed twice by verification (involved-id collection + scoring)
    return distinct.materialize()


def ngram_jaccard_near_dups(
    docs: ray.data.Dataset,
    threshold_milli: int = 700,
    k: int = 5,
    num_buckets: int | None = None,
    involved_cap: int = INVOLVED_BROADCAST_CAP,
    min_df: int = 2,
) -> pd.DataFrame:
    """Exact n-gram Jaccard similarity self-join: prefix-filter
    candidates (recall 1.0 by construction) + the shared exact-Jaccard
    verification. Same output schema/semantics as
    ``minhash_near_dups`` — the two differ only in how candidates are
    found, so their outputs at the same threshold must be supersets /
    subsets in exactly one direction (jaccard >= t pairs: equal).

    Cost honesty: candidate volume tracks the corpus's AMBIENT
    similarity, not its match count — that is the price of exactness.
    On natural text the frequency-ordered prefix prunes hard (rare
    shingles are plentiful); on a corpus whose documents all draw from
    one small shingle vocabulary (e.g. templated/synthetic text) every
    prefix token is shared and the join approaches all-pairs — use
    ``minhash_near_dups`` there, where band collisions require high
    similarity rather than one shared token. ``min_df`` bounds the
    broadcast df table (df >= min_df is Zipf-head-sized on natural
    corpora); raise it — or plug in a count-min sketch — if the head
    itself outgrows the driver."""
    common = common_token_df(docs, k=k, min_df=min_df)
    tok = docs.map_batches(
        PrefixTokens,
        fn_constructor_kwargs={
            "threshold_milli": threshold_milli,
            "k": k,
            "common_ref": ray.put(common),
        },
        batch_format="pandas",
        batch_size=512,
        concurrency=(2, 8),
        num_cpus=0.25,
    )
    cand = prefix_candidate_pairs(
        tok, threshold_milli=threshold_milli, num_buckets=num_buckets
    )
    verified = verify_pairs_jaccard(
        docs, cand, k=k, involved_cap=involved_cap, num_buckets=num_buckets
    )
    out = verified.map_batches(
        lambda df: df[df["jaccard_milli"].to_numpy() >= threshold_milli],
        batch_format="pandas",
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_a": np.array([], np.int64),
                "doc_b": np.array([], np.int64),
                "jaccard_milli": np.array([], np.int64),
            }
        )
    out = out.drop_duplicates()
    return out.sort_values(["doc_a", "doc_b"], kind="stable").reset_index(drop=True)


def window_dup_pairs(
    ds: ray.data.Dataset,
    n: int = 8,
    df_cap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    involved_cap: int = INVOLVED_BROADCAST_CAP,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """EXACT substring-overlap dedup: every document pair sharing at
    least one verbatim ``n``-token window — the substring-granular
    duplicate detector of the training-data literature (boilerplate,
    quoted spans, template reuse that whole-document hashing misses).
    Output: distinct (doc_a, doc_b) with doc_a < doc_b. Exact — unlike
    MinHash there is no probabilistic miss, which is why the driver
    gate can hold it to an exact SQL self-join.

    Scale plan: candidate generation shuffles (id, window-HASH int64)
    key rows — 8 bytes per window instead of the ~n·word-length window
    STRING (the byte-volume term that dominates an all-windows
    exchange at web scale). Equal windows always hash equal, so recall
    is exact by construction; a 64-bit collision can only ADD a false
    candidate, and the exact VERIFY pass (window-set intersection over
    the involved documents — fetched via the broadcast-id semi-join,
    or attached by two key-only hash joins past ``involved_cap``, the
    shared minhash machinery) removes it. Window expansion is the
    shared vectorized kernel with per-batch distinct partials; pairs
    are emitted per hash bucket by a vectorized self-merge and made
    globally distinct by one key-only pair shuffle.

    A web-scale corpus has boilerplate windows shared by millions of
    documents, which would go O(n²) at pair emission: any window-hash
    group larger than ``df_cap`` RAISES with the cap named (the
    certified-exactness contract of heavy_hitters) — callers either
    raise the cap knowingly or drop stop-windows upstream; silently
    skipping hot windows would turn an exact operator into an
    approximate one. Collisions only inflate a group, so the cap check
    on hash groups is conservative.

    Reference analogue: D2's tolerance-based duplicate suppression
    (``condition.py:66-77``), at span rather than detection
    granularity."""
    from .partition import apply_per_bucket, to_clean_arrow
    from .text import _ngram_arrays

    def hashed_partial(t: pa.Table) -> pa.Table:
        ids, _, grams = _ngram_arrays(t, n, text_col, id_col)
        if not len(ids):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                }
            )
        h = pd.util.hash_array(np.asarray(grams, dtype=object)).astype(np.int64)
        df = pd.DataFrame({id_col: ids, "h": h}).drop_duplicates()
        return to_clean_arrow(df)

    keyed = ds.map_batches(hashed_partial, batch_format="pyarrow")

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "doc_a": np.array([], dtype=np.int64),
                    "doc_b": np.array([], dtype=np.int64),
                }
            )
        g = g.drop_duplicates()  # cross-batch repeats of (id, h)
        sizes = g.groupby("h", sort=False)[id_col].transform("size")
        hot = int(sizes.max())
        if hot > df_cap:
            raise ValueError(
                f"window_dup_pairs: a {n}-token window (hash group) is "
                f"shared by {hot} documents, exceeding df_cap={df_cap}; "
                "raise df_cap or drop stop-windows upstream — skipping "
                "it silently would make an exact operator approximate"
            )
        m = g.merge(g, on="h", suffixes=("_l", "_r"))
        keep = m[f"{id_col}_l"] < m[f"{id_col}_r"]
        out = m.loc[keep, [f"{id_col}_l", f"{id_col}_r"]].drop_duplicates()
        out.columns = ["doc_a", "doc_b"]
        return out

    pairs = apply_per_bucket(keyed, emit_pairs, key="h", num_buckets=num_buckets)

    def distinct_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    # same pair can surface from several windows in different hash
    # buckets: one key-only shuffle of the (small) pair list dedups
    cand = apply_per_bucket(
        pairs, distinct_pairs, key=["doc_a", "doc_b"], num_buckets=num_buckets
    )

    # exact verify: window-set intersection over the involved docs
    # (candidate-scale) — removes any hash-collision false candidate
    def windows_of(text: str) -> set:
        toks = text.strip().split()
        return {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        }

    involved = _collect_involved(cand)
    kv = ds.select_columns([id_col, text_col])
    if len(involved) > involved_cap:
        inv = _involved_docs(kv, involved, id_col, text_col)
        with_a = attach_value_distributed(
            cand, inv, "doc_a", "__text_a",
            key=id_col, value=text_col, num_buckets=num_buckets,
        )
        with_b = attach_value_distributed(
            with_a, inv, "doc_b", "__text_b",
            key=id_col, value=text_col, num_buckets=num_buckets,
        )

        def check_attached(df: pd.DataFrame) -> pd.DataFrame:
            cache: dict[int, set] = {}

            def w(i: int, t: str) -> set:
                if i not in cache:
                    cache[i] = windows_of(t)
                return cache[i]

            keep = [
                bool(w(a, ta) & w(b, tb))
                for a, b, ta, tb in zip(
                    df["doc_a"], df["doc_b"], df["__text_a"], df["__text_b"]
                )
            ]
            return df.loc[keep, ["doc_a", "doc_b"]]

        return with_b.map_batches(check_attached, batch_format="pandas")

    texts = _fetch_involved_map(kv, involved, id_col, text_col)
    ref = ray.put(texts)

    def check(df: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(ref)
        cache: dict[int, set] = {}

        def w(i: int) -> set:
            if i not in cache:
                cache[i] = windows_of(tx[i])
            return cache[i]

        keep = [bool(w(a) & w(b)) for a, b in zip(df["doc_a"], df["doc_b"])]
        return df.loc[keep]

    return cand.map_batches(check, batch_format="pandas")
