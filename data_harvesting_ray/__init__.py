"""Ray-Data-native structured-streaming / CEP engine over Parquet
transcript tables (see SURVEY.md for the design derivation)."""

import logging as _logging


def _quiet_schema_hash_warning() -> None:
    """Ray's schema-dedup fast path logs a benign WARNING ("Failed to
    hash the schemas ... unhashable type: 'dict'") whenever a schema
    carries metadata (any metadata'd pa.Schema is unhashable), then
    falls back to the full unify — nothing is wrong. The engine strips
    schema metadata before its own shuffles (stages/partition.py), but
    Ray-internal paths (parquet reads) still hit it; drop the logger to
    ERROR so bench/test output stays readable. Must run AFTER
    ``import ray.data``: its logging dictConfig resets the levels of
    loggers it does not name."""
    _logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).setLevel(_logging.ERROR)


def configure_session() -> None:
    """Size Ray Data's hash-shuffle knobs to the live Ray session.

    IMPORTANT ordering: a Dataset snapshots the DataContext at
    CREATION, so this must run after ``ray.init`` and BEFORE the first
    ``read_parquet`` of a pipeline — mutations after dataset creation
    silently do nothing. The engine calls it from every pipeline entry
    point (queries, engines, apply_per_bucket); scripts that build
    datasets directly should call it once after ``ray.init``."""
    from .stages.partition import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    _quiet_schema_hash_warning()


try:  # import-time defaults, safe before ray.init (no session yet):
    # the engine's key-based repartition (stages/partition.py) requires
    # hash shuffle; aggregator sizing is finalized per-session by
    # configure_session()/_ensure_hash_shuffle.
    from ray.data import DataContext as _DataContext
    from ray.data.context import ShuffleStrategy as _ShuffleStrategy

    _ctx = _DataContext.get_current()
    _ctx.shuffle_strategy = _ShuffleStrategy.HASH_SHUFFLE
    # Defaults assume a large cluster (200 partitions / 64 aggregator
    # actors) and deadlock a small local session: aggregators reserve
    # CPUs the map tasks need. Conservative small-session defaults
    # here; per-session sizing happens in configure_session().
    _ctx.default_hash_shuffle_parallelism = 32
    _ctx.max_hash_shuffle_aggregators = 8
    _ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.02
    _ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.02
    # AFTER the ray.data import: its logging dictConfig resets levels
    # of loggers it does not name (set-then-import silently no-ops)
    _quiet_schema_hash_warning()
except Exception:  # pragma: no cover - ray not importable (pure oracle use)
    pass
