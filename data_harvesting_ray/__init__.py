"""Ray-Data-native structured-streaming / CEP engine over Parquet
transcript tables (see SURVEY.md for the design derivation)."""

try:  # configure Ray Data before any Dataset is created: the engine's
    # key-based repartition (stages/partition.py) requires hash shuffle,
    # which is also the streaming-friendly strategy for its groupbys.
    from ray.data import DataContext as _DataContext
    from ray.data.context import ShuffleStrategy as _ShuffleStrategy

    _ctx = _DataContext.get_current()
    _ctx.shuffle_strategy = _ShuffleStrategy.HASH_SHUFFLE
    # Defaults assume a large cluster (200 partitions / 64 aggregator
    # actors) and deadlock a small local session: aggregators reserve
    # CPUs the map tasks need. Size both to the actual session; the
    # per-partition CPU override keeps aggregators lightweight.
    _ctx.default_hash_shuffle_parallelism = 32
    _ctx.max_hash_shuffle_aggregators = 8
    _ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    _ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
except Exception:  # pragma: no cover - ray not importable (pure oracle use)
    pass
