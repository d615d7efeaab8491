"""Canonical Arrow schemas for the transcript engine.

The input table shape comes from BASELINE.json ``input_hint``:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])``.

The reference (uug-ai/data-harvesting) has no schema system — message
dicts and ndarray frames are shape-assumed (see SURVEY.md §1.1,
reference ``services/harvest_service.py:84-108``). This engine declares
schemas up front and validates at the source, the analogue of the
reference's only validation: config arity checks in
``projects/base_project.py:77-82``.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# After the normalize stage (M3 analogue: parse tool-call ids out of
# `text`, derive `is_tool_call`; reference scorer stage condition.py:20-37).
NORMALIZED_SCHEMA = pa.schema(
    list(TRANSCRIPT_SCHEMA)
    + [
        pa.field("is_tool_call", pa.bool_()),
        pa.field("call_id", pa.string()),
    ]
)

# Session / tumbling window outputs (ST3/W2 analogues).
SESSION_WINDOW_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("session_id", pa.int64()),
        pa.field("window_start", pa.timestamp("us")),
        pa.field("window_end", pa.timestamp("us")),
        pa.field("turn_count", pa.int64()),
        pa.field("first_turn_idx", pa.int32()),
        pa.field("last_turn_idx", pa.int32()),
    ]
)

# Tool-call ↔ response correlation output (J3 generalization).
TOOL_JOIN_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("call_id", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("call_turn_idx", pa.int32()),
        pa.field("resp_turn_idx", pa.int32()),
        pa.field("call_ts", pa.timestamp("us")),
        pa.field("resp_ts", pa.timestamp("us")),
    ]
)

# CEP match output (W5 analogue).
CEP_MATCH_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("pattern", pa.string()),
        pa.field("start_turn_idx", pa.int32()),
        pa.field("end_turn_idx", pa.int32()),
    ]
)

ROLES = ("user", "assistant", "tool", "system")
TOOLS = ("search", "calculator", "browser", "python", "sql")

# Session gap used across queries / oracle / engine (seconds).
DEFAULT_SESSION_GAP_S = 1800
# Watermark delay: arrival disorder in the default fixture is bounded by
# this, so streaming output == bounded-batch output (late-data cases are
# exercised by dedicated pytest fixtures instead).
DEFAULT_WATERMARK_DELAY_S = 900
