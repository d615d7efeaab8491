"""By-name enrich-UDF registry (X4 — the reference's service registry).

The reference registers service plugins by name and validates the name
against its env config at startup (``services/harvest_service.py:63-82``);
the engine's analogue lets batch-UDFs register by name so a YAML / dict
``EngineConfig`` can select an enrich stage without carrying a Python
callable (``enrich: token_count`` in YAML). Registered functions have
the model-slot shape (M3/ST1): Arrow batch in, Arrow batch out, derived
columns ride the shard buffers to the committed ``turns`` channel.

Accelerator placement: the reference pins its model to a device at
startup (``projects/base_project.py:90-97`` — half-precision CUDA when
available). The engine's analogue is ``EngineConfig.enrich_resources``:
a dict of per-stage scheduling knobs (``num_gpus``/``num_cpus``/
``memory``/``resources``/``concurrency``/``batch_size``) that turns
the enrich slot into its OWN actor-pool ``map_batches`` stage
(``apply_enrich`` below) so a model-backed UDF can claim a GPU and
load its weights once per actor, not once per batch.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

EnrichFn = Callable[[pa.Table], pa.Table]

_ENRICHERS: dict[str, EnrichFn] = {}

# scheduling knobs accepted by EngineConfig.enrich_resources. The first
# four are forwarded to Ray verbatim (per-actor resource request); the
# last two shape the actor pool itself.
_RAY_REMOTE_KEYS = ("num_cpus", "num_gpus", "memory", "resources")
_POOL_KEYS = ("concurrency", "batch_size")
RESOURCE_KEYS = frozenset(_RAY_REMOTE_KEYS + _POOL_KEYS)


def register_enrich(name: str, fn: EnrichFn | type) -> None:
    """User extension point: make ``fn`` selectable as
    ``EngineConfig(enrich=name)`` (and thus from YAML). ``fn`` may also
    be a CLASS (a model factory): it is then instantiated once per
    actor inside the enrich stage (ST1 — weights load in ``__init__``,
    never per batch), and requires actor mode (``enrich_resources``)."""
    _ENRICHERS[name] = fn


def get_enrich(name: str) -> EnrichFn:
    try:
        return _ENRICHERS[name]
    except KeyError:
        raise ValueError(
            f"unknown enrich UDF {name!r}; registered: {sorted(_ENRICHERS)}"
        ) from None


def resolve_enrich(e: EnrichFn | str | None) -> EnrichFn | None:
    """Accept a callable, a registered name, or None (engines call this
    once at spawn; the router ships the resolved callable)."""
    if e is None or callable(e):
        return e
    return get_enrich(e)


def validate_resources(r: dict | None) -> None:
    """Shape-check an ``enrich_resources`` dict (EngineConfig.validate
    delegates here so the contract lives next to the consumer)."""
    if r is None:
        return
    if not isinstance(r, dict):
        raise ValueError("enrich_resources must be a dict")
    unknown = set(r) - RESOURCE_KEYS
    if unknown:
        raise ValueError(
            f"unknown enrich_resources keys {sorted(unknown)}; "
            f"choose from {sorted(RESOURCE_KEYS)}"
        )
    for k in ("num_cpus", "num_gpus", "memory"):
        if k in r and (not isinstance(r[k], (int, float)) or r[k] < 0):
            raise ValueError(f"enrich_resources[{k!r}] must be a number >= 0")
    if "resources" in r and not isinstance(r["resources"], dict):
        raise ValueError("enrich_resources['resources'] must be a dict")
    for k in _POOL_KEYS:
        if k in r and (not isinstance(r[k], int) or r[k] < 1):
            raise ValueError(f"enrich_resources[{k!r}] must be an int >= 1")


def map_batches_kwargs(resources: dict) -> dict:
    """Translate an ``enrich_resources`` dict into ``Dataset.map_batches``
    kwargs for the dedicated actor-pool enrich stage. Split out (and
    unit-tested) so the GPU path is checkable on a GPU-less box."""
    kw: dict = {
        "batch_format": "pyarrow",
        "zero_copy_batch": True,
        # actor pool (callable class): model state loads once per actor
        "concurrency": resources.get("concurrency", 1),
    }
    if "batch_size" in resources:
        kw["batch_size"] = resources["batch_size"]
    for k in _RAY_REMOTE_KEYS:
        if k in resources:
            kw[k] = resources[k]
    return kw


def route_task_options(resources: dict | None) -> dict:
    """Resource options for the STREAMING route task when an enrich
    stage carries a resource request. The streaming ingest path runs
    the enrich inside raw per-part-file route tasks (one Dataset
    execution costs 0.6-3.2 s fixed — see pipelines/streaming.py
    ``_route_files``), so per-stage placement means decorating the
    route task itself: ``num_gpus=1`` here lands every route task (and
    thus the model call) on a GPU node. Pool-shape keys
    (concurrency/batch_size) do not apply — route granularity is the
    part file."""
    if not resources:
        return {}
    return {k: resources[k] for k in _RAY_REMOTE_KEYS if k in resources}


class EnrichActor:
    """Callable-class wrapper for the dedicated enrich stage: resolves
    the UDF once per actor in ``__init__`` — if the registered object
    is a CLASS (model factory), the model is constructed here, on the
    actor, with the stage's resource grant (e.g. its GPU) already
    held."""

    def __init__(self, enrich: EnrichFn | type | str):
        fn = resolve_enrich(enrich)
        if isinstance(fn, type):
            fn = fn()
        self.fn = fn

    def __call__(self, t: pa.Table) -> pa.Table:
        return self.fn(t)


def apply_enrich(ds, enrich: EnrichFn | type | str | None, resources: dict | None = None):
    """Apply the enrich slot to a Dataset. With ``resources`` (or a
    class-shaped UDF) this is a dedicated actor-pool ``map_batches``
    stage carrying the resource request; otherwise a plain fused task
    — zero extra stages for the cheap Arrow-kernel UDFs."""
    if enrich is None:
        return ds
    fn = resolve_enrich(enrich)
    if resources or isinstance(fn, type):
        validate_resources(resources)
        kw = map_batches_kwargs(resources or {})
        return ds.map_batches(EnrichActor, fn_constructor_args=(fn,), **kw)
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _text_len(t: pa.Table) -> pa.Table:
    return t.append_column("text_len", pc.utf8_length(t["text"]))


def _token_count(t: pa.Table) -> pa.Table:
    # whitespace-token count without materializing the split lists
    n = pc.count_substring_regex(t["text"], r"\S+")
    return t.append_column("n_tokens", pc.cast(n, pa.int64()))


def _pii_scrub(t: pa.Table) -> pa.Table:
    """Streaming PII scrub: apply the SHARED scrub kernel
    (stages/scrub.scrub_column — one copy of the sequential-replace
    semantics) to the turn payload IN PLACE and count redactions —
    makes ``enrich: pii_scrub`` in a YAML config redact the stream
    before anything is committed."""
    from .stages.scrub import scrub_column

    cur, total = scrub_column(t["text"])
    idx = t.schema.get_field_index("text")
    return t.set_column(idx, "text", cur).append_column(
        "n_redactions", pa.array(total)
    )


register_enrich("text_len", _text_len)
register_enrich("token_count", _token_count)
register_enrich("pii_scrub", _pii_scrub)
