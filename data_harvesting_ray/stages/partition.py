"""Hash partitioning by conv_id — the central physical design decision.

Every stateful transcript operator (dedup, session windows, join, CEP)
needs all rows of a conversation co-located (SURVEY.md §7.4). We add a
``bucket = H(conv_id) % B`` column in a vectorized ``map_batches`` and
run per-bucket vectorized kernels via ``groupby("bucket").map_groups``:
ONE shuffle keyed the same way for every stateful stage, and each
kernel call gets a whole bucket (many conversations) so the work is
numpy/pandas-vectorized across conversations, never per-row Python.

Scale note (100 TB): ``num_buckets`` is sized by the DATA so a bucket
fits a worker's heap (rows_total / B × row_width ≤ ~1 GiB) — it does
not change when the cluster is resized (strong scaling keeps the same
decomposition). Skewed mega-conversations stay within one bucket
here; for unbounded skew use the salted plans (SURVEY.md §7 hard part
(c)): ``stages/windows.session_windows_salted`` partitions by
(conv_id, turn_idx // chunk) and merges partial islands, and
``stages/join.tool_join`` buckets on the true join key
(conv_id, call_id) so a hot conversation's calls spread naturally.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def to_clean_arrow(df: pd.DataFrame) -> pa.Table:
    """pandas -> Arrow WITHOUT pandas schema metadata. Every engine
    stage that emits an Arrow batch built from a DataFrame must use
    this: ``pa.Schema`` with metadata is UNHASHABLE (``hash()`` raises
    on the metadata dict), which silently knocks Ray's hash-shuffle
    aggregators off their schema-dedup fast path — one warning per
    aggregator per shuffle and a slow unify instead (r2 regression,
    structurally guarded since r4)."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(
        None
    )


def md5_mod(values, m: int) -> np.ndarray:
    """The engine's SQL-replayable hash — ``int(md5(str(v))[:15
    hex], 16) % m``, DuckDB's ``CAST('0x' || substr(md5(v), 1, 15) AS
    BIGINT) % m`` — vectorized by hashing each DISTINCT value once per
    batch. ONE copy of the replayable-hash contract (DSIR buckets,
    skew diagnostics, and future oracle-checkable bucketing all share
    it); ``_stable_hash`` below is the internal (non-SQL) shuffle
    hash — do not mix them."""
    import hashlib

    codes, uniq = pd.factorize(pd.Series(values), sort=False)
    hv = np.fromiter(
        (
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % m
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return hv[codes]


def _stable_hash(arr: np.ndarray) -> np.ndarray:
    """Deterministic (cross-process, cross-run) vectorized hash for
    string or integer key columns."""
    if arr.dtype.kind in "iu":
        return pd.util.hash_array(arr.astype(np.uint64), categorize=False)
    return pd.util.hash_array(arr.astype(object), categorize=False)


def _stable_hash_cols(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Combined stable hash over one or more key columns (vectorized).

    Multi-key bucketing lets joins co-locate on their true join key
    (e.g. (conv_id, call_id)) so a hot conversation's calls spread over
    many buckets instead of pinning one straggler partition."""
    h = _stable_hash(t[keys[0]].to_numpy(zero_copy_only=False))
    for k in keys[1:]:
        h = h * np.uint64(1_000_003) + _stable_hash(t[k].to_numpy(zero_copy_only=False))
    return h


# ------------------------------------------------------- volume hint
# Parquet bytes of the current pipeline's inputs, set by the query
# read helpers right before dataset creation. Shuffle width (bucket
# count, hash-aggregate partitions) is CPU-proportional by default —
# right on a loaded cluster — but every hash-shuffle partition carries
# a fixed aggregator-actor cost per exchange (~seconds of spawn +
# readiness, measured: a 5,000-row aggregate spent 5.2 s in a 32-wide
# exchange whose compute was <100 ms), so a KB-scale input paying a
# 32-wide exchange is pure overhead. The hint clamps width to the
# DATA: ~32 MiB of estimated in-memory Arrow per partition (parquet
# bytes × _MEM_FACTOR expansion), floor 4, and NEVER above the
# CPU-proportional width — at sfxxl/cluster volume the clamp is a
# no-op and the physical plan is unchanged.
_VOLUME_HINT_BYTES: int | None = None
_MEM_FACTOR = 5  # conservative parquet -> in-memory Arrow expansion
_TARGET_PARTITION_MEM = 32 << 20
_BASE_HASH_PARALLELISM = 32  # the import-time default (see __init__)


def reset_volume_hint() -> None:
    """Forget the input-volume hint (each driver-contract query starts
    fresh; the streaming engine always runs un-hinted)."""
    global _VOLUME_HINT_BYTES
    _VOLUME_HINT_BYTES = None
    _ensure_hash_shuffle()


def set_volume_hint(n_bytes: int) -> None:
    """Record input volume (accumulating max: a query reading two
    tables sizes its exchanges to the bigger one) and re-apply the
    session's hash-shuffle sizing. Call BEFORE dataset creation — the
    DataContext is snapshotted into each dataset when it is built."""
    global _VOLUME_HINT_BYTES
    if _VOLUME_HINT_BYTES is None or n_bytes > _VOLUME_HINT_BYTES:
        _VOLUME_HINT_BYTES = int(n_bytes)
    _ensure_hash_shuffle()


def _data_clamped(width: int) -> int:
    if _VOLUME_HINT_BYTES is None:
        return width
    est = -(-_VOLUME_HINT_BYTES * _MEM_FACTOR // _TARGET_PARTITION_MEM)
    return min(width, max(4, int(est)))


def default_num_buckets(parallelism_hint: int | None = None) -> int:
    if parallelism_hint is None:
        try:
            parallelism_hint = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            parallelism_hint = 8
    # 2× CPUs gives stragglers room without making buckets tiny; the
    # volume hint (when a read helper set one) caps tiny inputs.
    return _data_clamped(max(8, 2 * parallelism_hint))


def add_bucket(
    ds: ray.data.Dataset,
    key: str | list[str] = "conv_id",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    b = num_buckets or default_num_buckets()
    keys = [key] if isinstance(key, str) else list(key)

    def assign(t: pa.Table) -> pa.Table:
        h = _stable_hash_cols(t, keys)
        # strip schema metadata (parquet/pandas provenance blobs): a
        # pa.Schema with ANY metadata is unhashable, which knocks the
        # shuffle aggregators off their schema-dedup fast path and logs
        # a warning per aggregator; the metadata carries no data
        return t.replace_schema_metadata(None).append_column(
            "bucket", pa.array((h % b).astype(np.int64))
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def apply_per_bucket(
    ds: ray.data.Dataset,
    fn: Callable,
    key: str | list[str] = "conv_id",
    num_buckets: int | None = None,
    drop_bucket: bool = True,
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """Shuffle by hash(key) into B buckets and apply a vectorized kernel
    per partition (a frame holding every row of every conversation
    hashed there; a block may hold several whole buckets — kernels are
    vectorized across conversations, so only key co-location matters).

    ``batch_format="pyarrow"`` hands the kernel the shuffled Arrow
    block zero-copy (``fn``: pa.Table -> pa.Table) — skips the
    Arrow→pandas conversion tax the default pandas mode pays per block
    (object arrays for every string column). Measured r5 A/B: the
    Arrow window-lag kernel cut the per-block kernel+conversion time
    vs the pandas path (BASELINE.md "Arrow-native kernel A/B").

    Physical plan: hash ``repartition(keys=...)`` + ``map_batches`` —
    NOT sort-based ``groupby().map_groups()``: a sort is a sampling
    barrier whose coordination dominated wall time (it contributed
    ~26 s of non-overlapped latency on a 10M-row input; hash
    repartition needs no samples and streams)."""

    if batch_format == "pyarrow":

        def wrapper(t: pa.Table) -> pa.Table:
            return fn(t.drop_columns(["bucket"]) if drop_bucket else t)

    else:

        def wrapper(g: pd.DataFrame) -> pd.DataFrame:
            return fn(g.drop(columns=["bucket"]) if drop_bucket else g)

    _ensure_hash_shuffle()
    b = num_buckets or default_num_buckets()
    parts = add_bucket(ds, key=key, num_buckets=b).repartition(
        b, keys=["bucket"], sort=False
    )
    return parts.map_batches(
        wrapper,
        batch_format=batch_format,
        batch_size=None,
        **({"zero_copy_batch": True} if batch_format == "pyarrow" else {}),
    )


def _ensure_hash_shuffle() -> None:
    """Key-based repartition requires the hash-shuffle strategy (Ray
    defaults to sort-based pull shuffle). Also (re)size the aggregator
    pool to the session: the import-time default (8) capped shuffle
    width identically at every cluster size — a flat ceiling that
    showed up directly as lost 4→16-CPU scaling efficiency. Called at
    pipeline build time, when the Ray session (and its CPU count)
    exists; the context is snapshotted into each dataset at creation."""
    import ray
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    if ctx.shuffle_strategy != ShuffleStrategy.HASH_SHUFFLE:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    if not ray.is_initialized():
        return  # keep import-time defaults until a session exists
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # one aggregator per core scales the shuffle with the session, but
    # each aggregator is an actor with ~1 s spawn cost per shuffle —
    # small shuffles (doc-scale near-dup candidates) drown in spawn
    # time with a 32-wide pool. Cap at 16 for this single node; on a
    # real multi-node cluster this should grow with node count, since
    # spawn cost amortizes over far larger per-shuffle volumes.
    # The per-partition CPU reservation must stay tiny relative to the
    # session or the aggregator pool starves the map tasks (observed
    # livelock at 4 CPUs with 64 partitions × 0.05 = 3.2 CPUs reserved)
    ctx.max_hash_shuffle_aggregators = max(4, min(cpus, 16))
    # Reservation must leave >= 1 whole CPU for map tasks even in a
    # 2-CPU session with a 64-partition shuffle (64 x 0.02 = 1.28 CPUs
    # reserved out of 2 deadlocked the 2-CPU scaling probe: no 1-CPU
    # task could ever schedule).
    ov = 0.05 if cpus >= 16 else (0.02 if cpus >= 4 else 0.005)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = ov
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = ov
    # groupby().aggregate() width: the import-time default, clamped to
    # the input volume when a read helper hinted one (no hint → 32,
    # identical to the pre-hint behavior at every scale point).
    ctx.default_hash_shuffle_parallelism = _data_clamped(_BASE_HASH_PARALLELISM)
