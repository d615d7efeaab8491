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

    Composed from the already-gated operators (turn_stats,
    session_windows, tool_join, orphan_calls) — the composite adds
    joins, not new semantics. The normalized stream is materialized
    ONCE for its two payload consumers (the corpus_prep multi-consumer
    checkpoint discipline); every aggregate is conv-scale, so the
    three left joins move key-only rows. Missing pair/orphan counts
    coalesce to 0 engine-side (int64 out — no nullable-Int leaks)."""
    from ..schema import DEFAULT_SESSION_GAP_S
    from ..stages.aggregates import turn_stats
    from ..stages.join import equi_join, orphan_calls, tool_join
    from ..stages.normalize import normalize_turns
    from ..stages.windows import session_windows

    gap = DEFAULT_SESSION_GAP_S if gap_s is None else gap_s
    norm = normalize_turns(ds).materialize()  # two payload consumers

    stats = turn_stats(
        norm.select_columns(["conv_id", "turn_idx", "ts", "role", "tool"]),
        num_buckets=num_buckets,
    ).drop_columns(["first_ts", "last_ts"])

    def count_by_conv(src: rd.Dataset, out_col: str) -> rd.Dataset:
        from ray.data.aggregate import Sum

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("conv_id", sort=False, as_index=False).size()
            return out.rename(columns={"size": out_col})

        return (
            src.map_batches(partial, batch_format="pandas")
            .groupby("conv_id")
            .aggregate(Sum(out_col, alias_name=out_col))
        )

    sess = count_by_conv(
        session_windows(
            norm.select_columns(["conv_id", "turn_idx", "ts"]),
            gap_s=gap,
            num_buckets=num_buckets,
        ),
        "n_sessions",
    )
    pairs = count_by_conv(tool_join(norm, num_buckets=num_buckets), "n_pairs")
    orph = count_by_conv(orphan_calls(norm, num_buckets=num_buckets), "n_orphans")

    j = equi_join(stats, sess, on="conv_id", num_buckets=num_buckets)
    j = equi_join(j, pairs, on="conv_id", how="left", num_buckets=num_buckets)
    j = equi_join(j, orph, on="conv_id", how="left", num_buckets=num_buckets)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
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

    return j.map_batches(finalize, batch_format="pandas")
