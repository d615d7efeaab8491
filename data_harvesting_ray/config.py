"""Typed pipeline configuration — the engine's extension surface.

The reference configures everything through a single env-var object
(``utils/VariableClass.py:10-96``, X5) plus per-project YAML validated
only for arity (``projects/base_project.py:66-82``); plugins register
by name in factories (X1-X3). Here the same surface is a validated
dataclass: window spec + pattern spec (the ``condition_func`` slot,
X1), an arbitrary batch-UDF hook (the model slot, M3/ST1), and sink
options. ``from_yaml`` covers the reference's YAML habit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from .schema import DEFAULT_SESSION_GAP_S, DEFAULT_WATERMARK_DELAY_S, ROLES
from .stages.cep import PatternSpec


@dataclass(frozen=True)
class EngineConfig:
    session_gap_s: int = DEFAULT_SESSION_GAP_S
    watermark_delay_s: int = DEFAULT_WATERMARK_DELAY_S
    pattern: PatternSpec = field(default_factory=PatternSpec)
    num_shards: int | None = None  # None → sized from cluster CPUs
    checkpoint: bool = True
    # keep this many newest committed-epoch checkpoints; older dirs are
    # pruned after each commit (resume only ever uses the newest one —
    # without GC a 10^6-epoch stream accumulates 10^6 snapshot dirs).
    # 0 disables pruning.
    checkpoint_keep: int = 2
    # batch-UDF hook (the reference's model slot, M3/ST1 —
    # projects/base_project.py:84-106): an Arrow-batch fn applied in
    # the router after normalize, before late eviction and routing.
    # It may rewrite columns or add derived ones; derived columns ride
    # the shard buffers and are emitted on the `turns` channel.
    # A string selects a registered UDF by name (X4 — enrich.py), so
    # YAML configs can pick an enrich stage (`enrich: token_count`).
    enrich: Callable[[Any], Any] | str | None = None
    # per-stage scheduling for the enrich slot (the reference pins its
    # model to a device at startup — projects/base_project.py:90-97).
    # Keys: num_cpus/num_gpus/memory/resources (per-actor Ray resource
    # request) + concurrency/batch_size (actor-pool shape). When set,
    # bounded pipelines run the enrich as its OWN actor-pool
    # map_batches stage (enrich.apply_enrich) so e.g. num_gpus=1 lands
    # the model on a GPU and loads weights once per actor; the
    # streaming engine forwards the resource request to its route
    # tasks (enrich.route_task_options). None = fuse the UDF into the
    # existing normalize stage (right for cheap Arrow kernels).
    enrich_resources: dict | None = None
    # emit the deduped on-time turn stream (incl. enrich-derived
    # columns) as a committed `turns` channel
    emit_turns: bool = False
    # optional derived channels to compute/commit (None = all of
    # tumbling/sliding/latency/rolling). At scale the full-volume
    # derived channels dominate close/commit cost when unconsumed —
    # this is output-side pruning, the sink analogue of `columns=`
    channels: tuple[str, ...] | None = None
    tumble_s: int = 600
    slide_size_s: int = 600
    slide_step_s: int = 300
    # sink format for committed channel files (X2 — the reference's
    # export-factory slot; see sinks/registry.py, register_format)
    sink_format: str = "parquet"
    # per-conv state (session counter, CEP tail/frontier, pending
    # calls/responses) is evicted once the watermark passes the conv's
    # last activity by this much; exact session numbering / pattern
    # continuity / join matching are guaranteed for conversations
    # whose silences stay under it (the streaming state-bound contract)
    state_ttl_s: int = 86400

    def validate(self) -> "EngineConfig":
        if self.session_gap_s <= 0:
            raise ValueError("session_gap_s must be positive")
        if self.watermark_delay_s < 0:
            raise ValueError("watermark_delay_s must be >= 0")
        unknown = [r for r in self.pattern.roles if r not in ROLES]
        if unknown:
            raise ValueError(f"pattern roles not in schema ROLES: {unknown}")
        if self.pattern.suppress_turns < 0:
            raise ValueError("suppress_turns must be >= 0")
        if self.num_shards is not None and self.num_shards < 1:
            raise ValueError("num_shards must be >= 1")
        if self.checkpoint_keep < 0:
            raise ValueError("checkpoint_keep must be >= 0 (0 disables pruning)")
        if self.checkpoint and self.checkpoint_keep == 1:
            raise ValueError(
                "checkpoint_keep=1 leaves no older snapshot to fall back to "
                "if the newest checkpoint dir is lost; use >= 2 (or 0 to "
                "disable pruning entirely)"
            )
        if self.tumble_s <= 0 or self.slide_size_s <= 0 or self.slide_step_s <= 0:
            raise ValueError("window sizes must be positive")
        if self.state_ttl_s <= 0:
            raise ValueError("state_ttl_s must be positive")
        if self.channels is not None:
            allowed = {"tumbling", "sliding", "latency", "rolling", "tool_counts"}
            bad = set(self.channels) - allowed
            if bad:
                raise ValueError(
                    f"unknown channels {sorted(bad)}; choose from {sorted(allowed)}"
                )
        from .sinks.registry import get_format

        get_format(self.sink_format)  # raises on unregistered formats
        if isinstance(self.enrich, str):
            from .enrich import get_enrich

            get_enrich(self.enrich)  # raises on unregistered UDF names
        if self.enrich_resources is not None:
            if self.enrich is None:
                raise ValueError("enrich_resources requires enrich to be set")
            from .enrich import validate_resources

            validate_resources(self.enrich_resources)
        return self

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        d = dict(d)
        pat = d.pop("pattern", None)
        if isinstance(pat, dict):
            pat = dict(pat)
            if "roles" in pat:
                pat["roles"] = tuple(pat["roles"])
            pat = PatternSpec(**pat)
        cfg = cls(
            **{k: v for k, v in d.items() if k in cls.__dataclass_fields__},
            **({"pattern": pat} if pat is not None else {}),
        )
        return cfg.validate()

    @classmethod
    def from_yaml(cls, path: str) -> "EngineConfig":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})
