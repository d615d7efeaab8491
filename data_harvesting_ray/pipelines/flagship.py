"""Bounded (throughput-mode) flagship: the streaming engine's exact
semantics — normalize → dedup → session windows + CEP + tool join —
executed as ONE Ray Data pipeline with a single hash(conv_id) shuffle.

The streaming epoch loop (streaming.py) optimizes window-close
latency; this path optimizes throughput for backfills/batch reruns.
The per-bucket kernel computes all three channels in one pass and
returns them IN-BAND as a union frame tagged by ``channel`` — output
stays in the object store and is written once, in parallel, by
``ds.write_parquet`` at the sink (writing per-channel files from
inside kernel tasks serializes on the shared disk and anti-scales).
Scaling efficiency (N vs 4N) is measured on this path (BASELINE.md).

Union schema:
  channel: string               -- 'session' | 'match' | 'pair'
  conv_id: string
  session_id: int64             -- session rows, else -1
  window_start/window_end: timestamp[us] (also call_ts/resp_ts for pairs)
  turn_count: int64
  a_idx, b_idx: int32           -- first/last, start/end, call/resp turn idx
  pattern: string               -- match rows, else ''
  call_id, tool: string         -- pair rows, else ''
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..enrich import resolve_enrich
from ..stages.cep import PatternSpec, cep_kernel
from ..stages.dedup import prepare_bucket
from ..stages.join import join_kernel
from ..stages.normalize import normalize_turns
from ..stages.windows import session_kernel

_EPOCH_US = "datetime64[us]"


def _union(sessions: pd.DataFrame, matches: pd.DataFrame, pairs: pd.DataFrame) -> pd.DataFrame:
    n_s, n_m, n_p = len(sessions), len(matches), len(pairs)
    nat = np.datetime64("NaT", "us")
    return pd.DataFrame(
        {
            "channel": np.repeat(
                np.array(["session", "match", "pair"], dtype=object), [n_s, n_m, n_p]
            ),
            "conv_id": np.concatenate(
                [sessions["conv_id"], matches["conv_id"], pairs["conv_id"]]
            ),
            "session_id": np.concatenate(
                [
                    sessions["session_id"].to_numpy(np.int64),
                    np.full(n_m, -1, np.int64),
                    np.full(n_p, -1, np.int64),
                ]
            ),
            "window_start": np.concatenate(
                [
                    sessions["window_start"].to_numpy(_EPOCH_US),
                    np.full(n_m, nat),
                    pairs["call_ts"].to_numpy(_EPOCH_US),
                ]
            ),
            "window_end": np.concatenate(
                [
                    sessions["window_end"].to_numpy(_EPOCH_US),
                    np.full(n_m, nat),
                    pairs["resp_ts"].to_numpy(_EPOCH_US),
                ]
            ),
            "turn_count": np.concatenate(
                [
                    sessions["turn_count"].to_numpy(np.int64),
                    np.full(n_m, -1, np.int64),
                    np.full(n_p, -1, np.int64),
                ]
            ),
            "a_idx": np.concatenate(
                [
                    sessions["first_turn_idx"].to_numpy(np.int32),
                    matches["start_turn_idx"].to_numpy(np.int32),
                    pairs["call_turn_idx"].to_numpy(np.int32),
                ]
            ),
            "b_idx": np.concatenate(
                [
                    sessions["last_turn_idx"].to_numpy(np.int32),
                    matches["end_turn_idx"].to_numpy(np.int32),
                    pairs["resp_turn_idx"].to_numpy(np.int32),
                ]
            ),
            "pattern": np.concatenate(
                [
                    np.full(n_s, "", dtype=object),
                    matches["pattern"].to_numpy(dtype=object),
                    np.full(n_p, "", dtype=object),
                ]
            ),
            "call_id": np.concatenate(
                [
                    np.full(n_s, "", dtype=object),
                    np.full(n_m, "", dtype=object),
                    pairs["call_id"].to_numpy(dtype=object),
                ]
            ),
            "tool": np.concatenate(
                [
                    np.full(n_s, "", dtype=object),
                    np.full(n_m, "", dtype=object),
                    pairs["tool"].to_numpy(dtype=object),
                ]
            ),
        }
    )


def flagship_bounded(
    ds: rd.Dataset,
    gap_s: int = 1800,
    pattern: PatternSpec | None = None,
    num_buckets: int | None = None,
    config=None,
) -> rd.Dataset:
    """All three channels as one union Dataset (see module docstring).
    An ``EngineConfig`` supplies gap/pattern and the enrich batch-UDF
    (applied after normalize, before the shuffle — same slot as the
    streaming router's)."""
    from ..stages.partition import _ensure_hash_shuffle

    _ensure_hash_shuffle()  # session-size shuffle knobs (note: callers
    # creating `ds` earlier in the same context already snapshotted it;
    # bench/queries call configure_session() before their reads)
    enrich = None
    enrich_resources = None
    if config is not None:
        config = config.validate()
        gap_s = config.session_gap_s
        pattern = config.pattern
        enrich = resolve_enrich(config.enrich)
        enrich_resources = config.enrich_resources
    pattern = pattern or PatternSpec(skip_past_last=True, suppress_turns=0)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one int-key dedup + sort shared by all three kernels
        g = prepare_bucket(g)
        return _union(
            session_kernel(g, gap_s, prepared=True),
            cep_kernel(g, pattern, prepared=True),
            join_kernel(g, prepared=True),
        )

    from ..stages.partition import apply_per_bucket

    # With a resource request (or a class-shaped model UDF) the enrich
    # runs as its OWN actor-pool stage between normalize and the
    # payload projection — that is what lets it claim a GPU and load
    # weights once per actor (enrich.apply_enrich). Cheap Arrow-kernel
    # UDFs stay fused into post_norm: zero extra stages.
    dedicated = enrich is not None and (
        enrich_resources is not None or isinstance(enrich, type)
    )

    def post_norm(t):
        if enrich is not None and not dedicated:
            t = enrich(t)
        # the kernels consume only turn metadata + call_id — the
        # payload must not ride the shuffle (same projection the
        # streaming router does at pipelines/streaming.py)
        return t.drop_columns([c for c in ("text",) if c in t.column_names])

    normalized = normalize_turns(ds)
    if dedicated:
        from ..enrich import apply_enrich

        normalized = apply_enrich(normalized, enrich, enrich_resources)
    normalized = normalized.map_batches(
        post_norm, batch_format="pyarrow", zero_copy_batch=True
    )
    return apply_per_bucket(normalized, per_bucket, num_buckets=num_buckets)


def split_channels(union_df: pd.DataFrame) -> dict[str, pd.DataFrame]:
    """Recover the per-channel frames from flagship output."""
    s = union_df[union_df["channel"] == "session"]
    m = union_df[union_df["channel"] == "match"]
    p = union_df[union_df["channel"] == "pair"]
    sessions = pd.DataFrame(
        {
            "conv_id": s["conv_id"],
            "session_id": s["session_id"].astype(np.int64),
            "window_start": s["window_start"],
            "window_end": s["window_end"],
            "turn_count": s["turn_count"].astype(np.int64),
            "first_turn_idx": s["a_idx"].astype(np.int32),
            "last_turn_idx": s["b_idx"].astype(np.int32),
        }
    ).reset_index(drop=True)
    matches = pd.DataFrame(
        {
            "conv_id": m["conv_id"],
            "pattern": m["pattern"],
            "start_turn_idx": m["a_idx"].astype(np.int32),
            "end_turn_idx": m["b_idx"].astype(np.int32),
        }
    ).reset_index(drop=True)
    pairs = pd.DataFrame(
        {
            "conv_id": p["conv_id"],
            "call_id": p["call_id"],
            "tool": p["tool"],
            "call_turn_idx": p["a_idx"].astype(np.int32),
            "resp_turn_idx": p["b_idx"].astype(np.int32),
            "call_ts": p["window_start"],
            "resp_ts": p["window_end"],
        }
    ).reset_index(drop=True)
    return {"sessions": sessions, "matches": matches, "pairs": pairs}


def conv_scorecard(
    ds: rd.Dataset,
    gap_s: int | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-conversation quality scorecard — the "which conversations
    are good training data" table: turn/tool-call volume, session
    fragmentation, and tool-call outcome quality (answered vs orphan
    calls, as a milli-exact success ratio) in one conv-keyed frame.

    Composed from the already-gated KERNELS (turn stats, session
    islands, tool join, orphan anti-join) — but fused into ONE
    hash(conv_id) pass: every constituent aggregate is conv-keyed, so
    after the one bucket shuffle all four families compute co-located
    inside the same per-bucket kernel and merge LOCALLY (pandas, key
    rows only). The previous plan ran four separate bucket-shuffled
    pipelines plus three distributed equi-joins over the same
    normalized input — 8 serial Dataset executions whose ~1-3 s fixed
    cost each dominated small epochs (r4 verdict item 2); this is one
    lazy pipeline end-to-end (read → normalize → shuffle → kernel).
    Missing pair/orphan counts coalesce to 0 engine-side (int64 out —
    no nullable-Int leaks)."""
    from ..schema import DEFAULT_SESSION_GAP_S
    from ..stages.dedup import prepare_bucket
    from ..stages.join import join_kernel, orphan_kernel
    from ..stages.normalize import normalize_turns
    from ..stages.partition import apply_per_bucket
    from ..stages.windows import session_kernel

    gap = DEFAULT_SESSION_GAP_S if gap_s is None else gap_s

    def _counts(frame: pd.DataFrame, col: str) -> pd.DataFrame:
        out = frame.groupby("conv_id", sort=False, as_index=False).size()
        return out.rename(columns={"size": col})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "conv_id": np.array([], dtype=object),
                    "n_turns": np.array([], np.int64),
                    "n_tool_calls": np.array([], np.int64),
                    "n_sessions": np.array([], np.int64),
                    "n_pairs": np.array([], np.int64),
                    "n_orphans": np.array([], np.int64),
                    "tool_success_milli": np.array([], np.int64),
                }
            )
        g = prepare_bucket(g)  # one int-key dedup + sort for all kernels
        stats = (
            pd.DataFrame(
                {
                    "conv_id": g["conv_id"].to_numpy(),
                    "n_turns": np.int64(1),
                    "n_tool_calls": g["is_tool_call"].to_numpy().astype(np.int64),
                }
            )
            .groupby("conv_id", sort=False, as_index=False)
            .agg(n_turns=("n_turns", "sum"), n_tool_calls=("n_tool_calls", "sum"))
        )
        out = stats.merge(
            _counts(session_kernel(g, gap, prepared=True), "n_sessions"),
            on="conv_id",
            how="inner",  # every conv has >= 1 session
        )
        out = out.merge(
            _counts(join_kernel(g, prepared=True), "n_pairs"),
            on="conv_id",
            how="left",
        )
        out = out.merge(
            _counts(orphan_kernel(g, prepared=True), "n_orphans"),
            on="conv_id",
            how="left",
        )
        for c in ("n_pairs", "n_orphans"):
            out[c] = out[c].fillna(0).astype(np.int64)
        calls = out["n_pairs"] + out["n_orphans"]
        out["tool_success_milli"] = (
            out["n_pairs"] * 1000 // calls.clip(lower=1)
        ).astype(np.int64)
        # convs with no calls at all: define success as 1000 (nothing
        # failed), matching the SQL CASE
        out.loc[calls == 0, "tool_success_milli"] = np.int64(1000)
        return out

    def drop_text(t):
        return t.drop_columns([c for c in ("text",) if c in t.column_names])

    normalized = normalize_turns(ds).map_batches(
        drop_text, batch_format="pyarrow", zero_copy_batch=True
    )
    return apply_per_bucket(normalized, per_bucket, num_buckets=num_buckets)
