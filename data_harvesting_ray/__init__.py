"""Ray-Data-native structured-streaming / CEP engine over Parquet
transcript tables (see SURVEY.md for the design derivation)."""


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
except Exception:  # pragma: no cover - ray not importable (pure oracle use)
    pass
