"""By-name enrich-UDF registry (X4 — the reference's service registry).

The reference registers service plugins by name and validates the name
against its env config at startup (``services/harvest_service.py:63-82``);
the engine's analogue lets batch-UDFs register by name so a YAML / dict
``EngineConfig`` can select an enrich stage without carrying a Python
callable (``enrich: token_count`` in YAML). Registered functions have
the model-slot shape (M3/ST1): Arrow batch in, Arrow batch out, derived
columns ride the shard buffers to the committed ``turns`` channel.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

EnrichFn = Callable[[pa.Table], pa.Table]

_ENRICHERS: dict[str, EnrichFn] = {}


def register_enrich(name: str, fn: EnrichFn) -> None:
    """User extension point: make ``fn`` selectable as
    ``EngineConfig(enrich=name)`` (and thus from YAML)."""
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
