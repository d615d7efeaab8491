"""Turn normalization — the reference's per-record scorer stage (M3).

The reference derives per-frame records with a stateful model call
(``condition.py:20-37``); here the analogous derivation is parsing the
tool-call id token out of ``text`` and flagging tool-call turns.
Stateless, vectorized, zero-copy Arrow: pure ``pyarrow.compute``
kernels inside ``map_batches`` — no Python row loop (SURVEY.md §2.2 M3).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

CALL_ID_PATTERN = r"\[(?P<call_id>call-[^\]]+)\]"


def normalize_batch(t: pa.Table) -> pa.Table:
    is_call = pc.and_(
        pc.not_equal(t["tool"], pa.scalar("")),
        pc.equal(t["role"], pa.scalar("assistant")),
    )
    extracted = pc.extract_regex(t["text"], CALL_ID_PATTERN)
    call_id = pc.coalesce(pc.struct_field(extracted, "call_id"), pa.scalar(""))
    return t.append_column("is_tool_call", is_call).append_column("call_id", call_id)


def normalize_turns(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(normalize_batch, batch_format="pyarrow", zero_copy_batch=True)
