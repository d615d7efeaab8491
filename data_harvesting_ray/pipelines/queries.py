"""Driver-contract query registry.

One entry per implemented operator from SURVEY.md §2, each paired
(where SQL-expressible) with ANSI SQL that DuckDB runs on the same
inputs. Column names are identical on both sides — the driver's
compare hashes values after sorting columns by name.

The transcript fixture is deterministic (fixtures/generator.py) and
derived from the sf dir name; its oracle SQL reads the same parquet
file via ``read_parquet``. Table-valued queries over the driver's
pre-registered views (events / documents / lineitem) use the view
names directly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..fixtures.generator import transcripts_path

SESSION_GAP_US = 1800 * 1_000_000
TUMBLE_US = 600 * 1_000_000
SLIDE_SIZE_US = 600 * 1_000_000
SLIDE_STEP_US = 300 * 1_000_000
EVENT_TUMBLE_US = 3600 * 1_000_000
EVENT_SLIDE_US = 1800 * 1_000_000
EVENT_GAP_US = 1800 * 1_000_000

# The driver compares at sf0.01; oracle SQL must point at that fixture.
_ORACLE_SF = "sf0.01"


def _path_bytes(path) -> int:
    import os

    total = 0
    for p in path if isinstance(path, (list, tuple)) else [path]:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


def _rp(path, **kw) -> rd.Dataset:
    """``read_parquet`` with the input-volume hint applied (see
    stages/partition.set_volume_hint): sizes this query's exchanges to
    the data it actually reads — a KB-scale input stops paying the
    cluster-width fixed exchange cost, while at cluster volume the
    hint is a no-op. Must run before dataset creation (the DataContext
    is snapshotted into the dataset)."""
    import data_harvesting_ray

    from ..stages.partition import set_volume_hint

    data_harvesting_ray.configure_session()
    try:
        set_volume_hint(_path_bytes(path))
    except OSError:
        pass
    return rd.read_parquet(path, **kw)


def _fresh_hint(fn: Callable) -> Callable:
    """Each driver-contract query starts with a clean volume hint (the
    hint accumulates max within one query across its table reads)."""
    import functools

    @functools.wraps(fn)
    def wrapped(sf_dir, *a, **kw):
        from ..stages.partition import reset_volume_hint

        reset_volume_hint()
        return fn(sf_dir, *a, **kw)

    return wrapped


def _read_blocks() -> int:
    # Ray's parallelism heuristic fragments small single-file inputs
    # into ~2k-row blocks; pin block count near the CPU count so batch
    # fns see meaningful batches (at 100 TB the 128 MiB target block
    # size governs instead and this override is a no-op upper bound).
    import ray

    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _t(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Transcript read, pruned at the source: every query passes only
    the columns its operators touch (`columns=` reaches the parquet
    reader, so pruned columns never leave storage — at 100 TB this is
    the difference between scanning transcripts and scanning turn
    metadata)."""
    import data_harvesting_ray

    data_harvesting_ray.configure_session()  # before dataset creation
    return _rp(
        transcripts_path(sf_dir),
        columns=columns,
        override_num_blocks=_read_blocks(),
    )


_META = ["conv_id", "turn_idx", "ts"]  # session/sliding windows
_META_RT = ["conv_id", "turn_idx", "role", "tool", "ts"]  # + tool-call flag
_META_ROLE = ["conv_id", "turn_idx", "role"]  # CEP / role mode


def _norm(sf_dir: str) -> rd.Dataset:
    from ..stages.normalize import normalize_turns

    return normalize_turns(_t(sf_dir))


# --------------------------------------------------------------- callables
def q_t_normalize(sf_dir: str) -> Any:
    return _norm(sf_dir)


def q_t_dedup(sf_dir: str) -> Any:
    from ..stages.dedup import dedup_exact

    return dedup_exact(_t(sf_dir))


def q_t_render_convs(sf_dir: str) -> Any:
    from ..stages.render import render_conversations

    return render_conversations(
        _t(sf_dir, ["conv_id", "turn_idx", "role", "text"])
    )


def q_t_conv_dedup(sf_dir: str) -> Any:
    """Conversation-level exact dedup: md5 of the rendered transcript
    (order-sensitive), min conv_id survives per fingerprint — one
    render co-location pass plus a keys-only fp exchange."""
    from ..stages.dedup import conv_dedup

    return conv_dedup(_t(sf_dir, ["conv_id", "turn_idx", "role", "text"]))


def q_d_hash_sample(sf_dir: str) -> Any:
    """Deterministic uniform k-sample: k smallest md5(doc_id) rows —
    per-block partial top-k, one k-sized merge, no corpus shuffle."""
    from ..stages.projection import hash_sample

    return hash_sample(
        _rp(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        ),
        k=64,
        columns=["lang", "n_chars"],
    )


def q_t_session_windows(sf_dir: str) -> Any:
    from ..stages.windows import session_windows

    return session_windows(_t(sf_dir, _META))


def q_t_session_windows_salted(sf_dir: str) -> Any:
    """Hot-key-salted session plan (partial islands per turn-range
    chunk + tiny merge shuffle); must equal the unsalted SQL oracle.
    salt_chunk=256 so the fixture's hot conversations (600 turns)
    actually split across chunks at sf0.01."""
    from ..stages.windows import session_windows_salted

    return session_windows_salted(_t(sf_dir, _META), salt_chunk=256)


def q_t_tumbling_windows(sf_dir: str) -> Any:
    from ..stages.windows import tumbling_windows

    return tumbling_windows(_t(sf_dir, _META_RT))


def q_t_sliding_windows(sf_dir: str) -> Any:
    from ..stages.windows import sliding_windows

    return sliding_windows(_t(sf_dir, _META))


def q_t_tool_join(sf_dir: str) -> Any:
    from ..stages.join import tool_join

    return tool_join(_norm(sf_dir))


def q_t_orphan_calls(sf_dir: str) -> Any:
    from ..stages.join import orphan_calls

    return orphan_calls(_norm(sf_dir))


def q_t_cep_matches(sf_dir: str) -> Any:
    from ..stages.cep import cep_matches

    return cep_matches(_t(sf_dir, _META_ROLE))


def q_t_cep_suppressed(sf_dir: str) -> Any:
    from ..stages.cep import PatternSpec, cep_matches

    return cep_matches(
        _t(sf_dir, _META_ROLE), PatternSpec(skip_past_last=True, suppress_turns=5)
    )


def q_t_stride_sample(sf_dir: str) -> Any:
    from ..stages.aggregates import stride_sample
    from ..stages.dedup import dedup_exact

    # stride gate commutes with key-exact dedup; filtering first means
    # dedup's key pass only scans the surviving stride
    return dedup_exact(stride_sample(_t(sf_dir), k=4))


def q_t_turn_stats(sf_dir: str) -> Any:
    from ..stages.aggregates import turn_stats

    return turn_stats(_t(sf_dir, _META_RT))


def q_t_gap_quantiles(sf_dir: str) -> Any:
    from ..stages.aggregates import gap_quantiles

    return gap_quantiles(_t(sf_dir, _META))


def q_t_response_latency(sf_dir: str) -> Any:
    """LAG window function: each turn's gap to the previous turn of
    the same conversation (response latency). First turns (no
    predecessor) are dropped so the output stays null-free int64."""
    import numpy as np
    import pandas as pd

    from ..stages.dedup import dedup_kernel
    from ..stages.window_fns import with_lag

    lagged = with_lag(
        _t(sf_dir, _META),
        key="conv_id",
        order="turn_idx",
        col="ts",
        out_col="prev_ts",
        prepare=dedup_kernel,
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        gap = (
            (df["ts"].to_numpy() - df["prev_ts"].to_numpy())
            .astype("timedelta64[us]")
            .astype(np.int64)
        )
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                "turn_idx": df["turn_idx"].to_numpy(),
                "gap_us": gap,
            }
        )

    return lagged.map_batches(project, batch_format="pandas")


def q_t_response_latency_salted(sf_dir: str) -> Any:
    """Hot-key-safe LAG plan (salt on turn_idx // chunk, carry rows
    bridge chunk heads) — must be output-identical to
    t_response_latency under the same oracle."""
    import numpy as np
    import pandas as pd

    from ..stages.dedup import dedup_kernel
    from ..stages.window_fns import with_lag_salted

    lagged = with_lag_salted(
        _t(sf_dir, _META),
        key="conv_id",
        order="turn_idx",
        col="ts",
        out_col="prev_ts",
        salt_chunk=64,
        prepare=dedup_kernel,
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        gap = (
            (df["ts"].to_numpy() - df["prev_ts"].to_numpy())
            .astype("timedelta64[us]")
            .astype(np.int64)
        )
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                "turn_idx": df["turn_idx"].to_numpy(),
                "gap_us": gap,
            }
        )

    return lagged.map_batches(project, batch_format="pandas")


def q_t_rolling_tool_rate(sf_dir: str) -> Any:
    """Bounded trailing window: tool calls among the last 5 turns of
    the conversation, per turn (burst detection). The tool-call flag
    is projected per batch BEFORE the shuffle — only (conv_id,
    turn_idx, int flag) rides the exchange."""
    import pandas as pd

    from ..stages.dedup import dedup_kernel
    from ..stages.window_fns import rolling_sum
    from ..stages.windows import _is_tool_call

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                "turn_idx": df["turn_idx"].to_numpy(),
                "is_call": _is_tool_call(df),
            }
        )

    flagged = _t(sf_dir, _META_RT).map_batches(flag, batch_format="pandas")
    rolled = rolling_sum(
        flagged,
        key="conv_id",
        order="turn_idx",
        col="is_call",
        window=5,
        out_col="calls_last5",
        prepare=dedup_kernel,
    )
    return rolled.map_batches(
        lambda df: df[["conv_id", "turn_idx", "calls_last5"]],
        batch_format="pandas",
    )


def q_t_cumulative_calls(sf_dir: str) -> Any:
    """UNBOUNDED-PRECEDING running total: cumulative tool calls per
    conversation up to each turn (rolling_sum with window=None)."""
    import pandas as pd

    from ..stages.dedup import dedup_kernel
    from ..stages.window_fns import rolling_sum
    from ..stages.windows import _is_tool_call

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                "turn_idx": df["turn_idx"].to_numpy(),
                "is_call": _is_tool_call(df),
            }
        )

    flagged = _t(sf_dir, _META_RT).map_batches(flag, batch_format="pandas")
    rolled = rolling_sum(
        flagged,
        key="conv_id",
        order="turn_idx",
        col="is_call",
        window=None,
        out_col="calls_cum",
        prepare=dedup_kernel,
    )
    return rolled.map_batches(
        lambda df: df[["conv_id", "turn_idx", "calls_cum"]],
        batch_format="pandas",
    )


def q_t_role_mode(sf_dir: str) -> Any:
    from ..stages.aggregates import role_mode

    return role_mode(_t(sf_dir, _META_ROLE))


def q_t_topk_tools(sf_dir: str) -> Any:
    from ..stages.aggregates import topk_tools

    return topk_tools(_t(sf_dir, ["conv_id", "turn_idx", "role", "tool"]), k=3)


_STREAM_MEMO: dict[str, Any] = {}


def _run_streaming(sf_dir: str):
    """One engine run per sf_dir per process: every t_streaming_*
    query reads a different committed channel of the same run."""
    eng = _STREAM_MEMO.get(sf_dir)
    if eng is None:
        import tempfile

        from ..fixtures.generator import epochs_root
        from .streaming import StreamingEngine

        eng = StreamingEngine(tempfile.mkdtemp(prefix="graft-stream-"))
        eng.run(epochs_root=epochs_root(sf_dir))
        _STREAM_MEMO[sf_dir] = eng
    return eng


def q_t_streaming_sessions(sf_dir: str) -> Any:
    """Full streaming engine (epochs + watermarks + exactly-once sink);
    committed session output must equal the bounded SQL oracle."""
    return _run_streaming(sf_dir).results("sessions")


def q_t_streaming_pairs(sf_dir: str) -> Any:
    return _run_streaming(sf_dir).results("pairs")


def q_t_streaming_tumbling(sf_dir: str) -> Any:
    """Streaming tumbling-count channel: per-epoch partials merged in
    shard state, emitted when the watermark passes window end — must
    equal the bounded t_tumbling_windows SQL exactly."""
    return _run_streaming(sf_dir).results("tumbling")


def q_t_streaming_sliding(sf_dir: str) -> Any:
    return _run_streaming(sf_dir).results("sliding")


def q_t_streaming_latency(sf_dir: str) -> Any:
    """Streaming-LAG channel: per-turn response gap emitted
    incrementally as turns clear the watermark (one carried row per
    conv keeps gaps exact across epochs) — must equal the bounded
    LAG-window oracle."""
    return _run_streaming(sf_dir).results("latency")


def q_t_streaming_rolling(sf_dir: str) -> Any:
    """Streaming trailing-window channel: tool calls among each turn's
    last 5 turns, emitted incrementally (the carried last window-1
    flags per conv keep counts exact across epochs) — must equal the
    bounded rolling_sum oracle."""
    return _run_streaming(sf_dir).results("rolling")


def q_t_streaming_topk(sf_dir: str) -> Any:
    """Streaming top-k tools: the tool_counts channel emits per-close
    per-tool PARTIALS (deduped, watermark-gated), so global top-3 is a
    channel-scale SUM + sort epilogue — must equal the bounded
    t_topk_tools oracle over any epoch decomposition."""
    import numpy as np

    parts = _run_streaming(sf_dir).results_pandas("tool_counts")
    agg = parts.groupby("tool", as_index=False)["n"].sum()
    agg = agg.rename(columns={"n": "n_calls"})
    agg["n_calls"] = agg["n_calls"].astype(np.int64)
    agg = agg.sort_values(
        ["n_calls", "tool"], ascending=[False, True], kind="stable"
    )
    return agg.head(3).reset_index(drop=True)


def q_t_tool_latency(sf_dir: str) -> Any:
    """Per-tool response-latency p50/p90 over the call↔response pairs
    (the generic per-key discrete-quantile op on the join output) —
    exact, quantile_disc semantics."""
    import pandas as pd

    from ..stages.aggregates import value_quantiles_per_key
    from ..stages.join import tool_join

    pairs = tool_join(_norm(sf_dir))

    def lat(df: pd.DataFrame) -> pd.DataFrame:
        gap = (
            (df["resp_ts"].to_numpy() - df["call_ts"].to_numpy())
            .astype("timedelta64[us]")
            .astype("int64")
        )
        return pd.DataFrame({"tool": df["tool"].to_numpy(), "latency_us": gap})

    return value_quantiles_per_key(
        pairs.map_batches(lat, batch_format="pandas"),
        key="tool",
        value="latency_us",
        num_buckets=8,
    )


def q_t_conv_scorecard(sf_dir: str) -> Any:
    """Per-conversation quality scorecard: volume + session
    fragmentation + tool-call outcome quality, composed from the
    gated turn_stats / session_windows / tool_join / orphan_calls."""
    from .flagship import conv_scorecard

    return conv_scorecard(_t(sf_dir))


def q_t_key_skew(sf_dir: str) -> Any:
    """Shuffle-skew diagnostics over the raw turn stream keyed by
    conv_id: per md5-bucket row/key totals + hottest key — the
    pre-flight salting check."""
    from ..stages.aggregates import key_skew_stats

    return key_skew_stats(_t(sf_dir, ["conv_id"]), key="conv_id", num_buckets=16)


def q_t_sessions_repaired(sf_dir: str) -> Any:
    """Late-data REPAIR invariant: a tight-watermark streaming run over
    a deterministically disordered epoch layout (every 50th row arrives
    one epoch late) plus the repair pass must equal the bounded/SQL
    session truth — shares t_session_windows' oracle. The run would be
    vacuous without late rows, so it asserts some exist."""
    import tempfile

    from ..config import EngineConfig
    from ..fixtures.generator import late_epochs_root
    from .repair import repair_sessions
    from .streaming import StreamingEngine

    root = late_epochs_root(sf_dir)
    out = tempfile.mkdtemp(prefix="repair-gate-")
    eng = StreamingEngine(
        out, config=EngineConfig(channels=(), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    n_late = len(eng.results_pandas("late"))
    if n_late == 0:
        raise RuntimeError("repair gate is vacuous: no late rows produced")
    return repair_sessions(out, root)


def q_t_pairs_repaired(sf_dir: str) -> Any:
    """Same repair invariant for the call↔response join channel —
    shares t_tool_join's oracle."""
    import tempfile

    from ..config import EngineConfig
    from ..fixtures.generator import late_epochs_root
    from .repair import repair_pairs
    from .streaming import StreamingEngine

    root = late_epochs_root(sf_dir)
    out = tempfile.mkdtemp(prefix="repair-pairs-gate-")
    eng = StreamingEngine(
        out, config=EngineConfig(channels=(), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    if len(eng.results_pandas("late")) == 0:
        raise RuntimeError("repair gate is vacuous: no late rows produced")
    return repair_pairs(out, root)


def q_t_matches_repaired(sf_dir: str) -> Any:
    """Same repair invariant for the CEP matches channel — a late turn
    can create or shift a role-sequence match; shares t_cep_matches'
    oracle."""
    import tempfile

    from ..config import EngineConfig
    from ..fixtures.generator import late_epochs_root
    from .repair import repair_matches
    from .streaming import StreamingEngine

    root = late_epochs_root(sf_dir)
    out = tempfile.mkdtemp(prefix="repair-matches-gate-")
    eng = StreamingEngine(
        out, config=EngineConfig(channels=(), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    if len(eng.results_pandas("late")) == 0:
        raise RuntimeError("repair gate is vacuous: no late rows produced")
    return repair_matches(out, root)


def q_t_orphans_repaired(sf_dir: str) -> Any:
    """Same repair invariant for the orphan-calls channel — a late
    response RETIRES a committed orphan, the retraction case only the
    repair pass can express; shares t_orphan_calls' oracle."""
    import tempfile

    from ..config import EngineConfig
    from ..fixtures.generator import late_epochs_root
    from .repair import repair_orphans
    from .streaming import StreamingEngine

    root = late_epochs_root(sf_dir)
    out = tempfile.mkdtemp(prefix="repair-orphans-gate-")
    eng = StreamingEngine(
        out, config=EngineConfig(channels=(), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    if len(eng.results_pandas("late")) == 0:
        raise RuntimeError("repair gate is vacuous: no late rows produced")
    return repair_orphans(out, root)


def q_t_latency_repaired(sf_dir: str) -> Any:
    """Repair invariant for the streaming-LAG (latency) channel — a
    late turn changes its successor's gap and gains its own; shares
    t_response_latency's oracle."""
    import tempfile

    from ..config import EngineConfig
    from ..fixtures.generator import late_epochs_root
    from .repair import repair_latency
    from .streaming import StreamingEngine

    root = late_epochs_root(sf_dir)
    out = tempfile.mkdtemp(prefix="repair-latency-gate-")
    eng = StreamingEngine(
        out, config=EngineConfig(channels=("latency",), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    if len(eng.results_pandas("late")) == 0:
        raise RuntimeError("repair gate is vacuous: no late rows produced")
    return repair_latency(out, root)


def q_t_rolling_repaired(sf_dir: str) -> Any:
    """Repair invariant for the streaming trailing-window (rolling)
    channel — a late turn shifts every window that would have
    contained it; shares t_rolling_tool_rate's oracle."""
    import tempfile

    from ..config import EngineConfig
    from ..fixtures.generator import late_epochs_root
    from .repair import repair_rolling
    from .streaming import StreamingEngine

    root = late_epochs_root(sf_dir)
    out = tempfile.mkdtemp(prefix="repair-rolling-gate-")
    eng = StreamingEngine(
        out, config=EngineConfig(channels=("rolling",), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    if len(eng.results_pandas("late")) == 0:
        raise RuntimeError("repair gate is vacuous: no late rows produced")
    return repair_rolling(out, root)


def q_t_tumbling_repaired(sf_dir: str) -> Any:
    """Repair invariant for the tumbling-window channel — a late turn
    lands in an already-emitted window; shares t_tumbling_windows'
    oracle. With this, EVERY committed channel (core + derived) has a
    gated late-data correction path."""
    import tempfile

    from ..config import EngineConfig
    from ..fixtures.generator import late_epochs_root
    from .repair import repair_tumbling
    from .streaming import StreamingEngine

    root = late_epochs_root(sf_dir)
    out = tempfile.mkdtemp(prefix="repair-tumbling-gate-")
    eng = StreamingEngine(
        out, config=EngineConfig(channels=("tumbling",), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    if len(eng.results_pandas("late")) == 0:
        raise RuntimeError("repair gate is vacuous: no late rows produced")
    return repair_tumbling(out, root)


def q_t_sliding_repaired(sf_dir: str) -> Any:
    """Repair invariant for the sliding-window channel; shares
    t_sliding_windows' oracle."""
    import tempfile

    from ..config import EngineConfig
    from ..fixtures.generator import late_epochs_root
    from .repair import repair_sliding
    from .streaming import StreamingEngine

    root = late_epochs_root(sf_dir)
    out = tempfile.mkdtemp(prefix="repair-sliding-gate-")
    eng = StreamingEngine(
        out, config=EngineConfig(channels=("sliding",), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    if len(eng.results_pandas("late")) == 0:
        raise RuntimeError("repair gate is vacuous: no late rows produced")
    return repair_sliding(out, root)


def q_e_tumbling(sf_dir: str) -> Any:
    from ..stages.events import tumbling_events

    return tumbling_events(
        _rp(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    )


def q_e_window_distinct(sf_dir: str) -> Any:
    """Daily active users (distinct-count per window): per-batch
    DISTINCT (window, user) partials shrink the exchange to activity
    rows; one hash(window) shuffle; C-level nunique per bucket."""
    from ..stages.events import window_distinct_users

    return window_distinct_users(
        _rp(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]),
        size_s=86400,
    )


def q_e_daily_spikes(sf_dir: str) -> Any:
    """Volume-anomaly days per event type (integer-exact z-score):
    per-batch (type, day) count partials collapse the stream to a
    types-by-days table before any exchange; the spike test itself is
    exact integer arithmetic so the gate is a pure hash compare."""
    from ..stages.events import daily_spikes

    return daily_spikes(
        _rp(f"{sf_dir}/events.parquet", columns=["event_type", "ts"]),
        sigma=1,
    )


def q_e_sliding_mau(sf_dir: str) -> Any:
    """Rolling weekly active users (sliding COUNT DISTINCT): events
    replicate into covering windows as KEY pairs only; per-batch
    distinct partials bound the exchange by windows x users x 7."""
    from ..stages.events import sliding_mau

    return sliding_mau(
        _rp(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]),
        size_s=7 * 86400,
        slide_s=86400,
    )


def q_e_type_cooccurrence(sf_dir: str) -> Any:
    """Market-basket support counts: users performing BOTH of each
    event-type pair — distinct activity partials, one hash(user)
    shuffle, vectorized per-user pair expansion, pairs-sized result."""
    from ..stages.events import type_cooccurrence

    return type_cooccurrence(
        _rp(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
    )


def q_e_session(sf_dir: str) -> Any:
    from ..stages.events import session_events

    return session_events(
        _rp(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
        )
    )


def q_e_cep(sf_dir: str) -> Any:
    from ..stages.events import cep_events

    return cep_events(
        _rp(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "event_type", "ts"],
        )
    )


def q_e_sliding(sf_dir: str) -> Any:
    from ..stages.events import sliding_events

    return sliding_events(
        _rp(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])
    )


def q_e_value_quantiles(sf_dir: str) -> Any:
    """Exact global p50/p90/p99 of the event value (integer cents) —
    histogram partials, no row shuffle."""
    from ..stages.aggregates import global_value_quantiles

    ev = _rp(f"{sf_dir}/events.parquet", columns=["value"])
    cents = ev.map_batches(
        lambda t: pa.table(
            {
                "cents": pc.cast(
                    pc.round(pc.multiply(t["value"], pa.scalar(100.0))), pa.int64()
                )
            }
        ),
        batch_format="pyarrow",
    )
    return global_value_quantiles(cents)


def q_e_histogram(sf_dir: str) -> Any:
    """Fixed-width value histogram (bin width 10): per-batch bin
    partials, exchange moves occupied bins only."""
    import data_harvesting_ray
    from ..stages.aggregates import value_histogram

    data_harvesting_ray.configure_session()
    ev = _rp(f"{sf_dir}/events.parquet", columns=["value"])
    return value_histogram(ev, "value", bin_width=10.0)


def q_e_funnel(sf_dir: str) -> Any:
    """Ordered view -> click -> purchase funnel: users completing each
    step prefix in event-time order."""
    import data_harvesting_ray
    from ..stages.events import funnel_events

    data_harvesting_ray.configure_session()
    ev = _rp(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    return funnel_events(ev, ["view", "click", "purchase"], num_buckets=8)


def q_t_role_pivot(sf_dir: str) -> Any:
    """Long->wide pivot: per-conversation role mix as one row of
    conditional counts over deduped turns."""
    from ..stages.aggregates import pivot_counts
    from ..stages.dedup import dedup_exact

    turns = dedup_exact(_t(sf_dir, ["conv_id", "turn_idx", "role"]))
    return pivot_counts(turns, "conv_id", "role", ["user", "assistant", "tool"])


def q_e_asof_attribution(sf_dir: str) -> Any:
    """Purchase→click attribution: each purchase joins the latest click
    at-or-before it by the same user (the as-of / point-in-time join).
    Columns pruned at the read; sides filtered before the one shuffle."""
    from ..stages.asof import asof_join

    ev = _rp(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    purchases = ev.filter(
        expr="event_type == 'purchase'"
    ).drop_columns(["event_type"])
    clicks = (
        ev.filter(expr="event_type == 'click'")
        .drop_columns(["event_type", "value"])
        .map_batches(
            lambda t: t.rename_columns(
                ["click_event_id" if c == "event_id" else c for c in t.column_names]
            ).append_column("click_ts", t["ts"]),
            batch_format="pyarrow",
        )
    )
    return asof_join(purchases, clicks, by="user_id", on="ts", num_buckets=16)


def q_e_asof_salted(sf_dir: str) -> Any:
    """Salted as-of join (hot-user-safe): must be output-identical to
    q_e_asof_attribution — same SQL oracle."""
    from ..stages.asof import asof_join_salted

    ev = _rp(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    purchases = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    clicks = (
        ev.filter(expr="event_type == 'click'")
        .drop_columns(["event_type", "value"])
        .map_batches(
            lambda t: t.rename_columns(
                ["click_event_id" if c == "event_id" else c for c in t.column_names]
            ).append_column("click_ts", t["ts"]),
            batch_format="pyarrow",
        )
    )
    return asof_join_salted(
        purchases, clicks, by="user_id", on="ts", chunk_s=86400, num_buckets=16
    )


def q_e_session_assign(sf_dir: str) -> Any:
    """Range join: assign every event to the session window containing
    it (start <= ts <= end, per user) — the generic interval join over
    the windows the session operator itself produced."""
    from ..stages.asof import interval_join
    from ..stages.events import session_events

    ev = _rp(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    wins = session_events(
        _rp(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
        )
    )
    return interval_join(
        ev,
        wins,
        by="user_id",
        on="ts",
        start="window_start",
        end="window_end",
        num_buckets=16,
    )


def q_t_stats_join(sf_dir: str) -> Any:
    """Generic big-to-big equi-join: deduped turn rows joined with the
    per-conversation aggregate (every turn annotated with its
    conversation's stats) — exercises ``stages.join.equi_join``."""
    from ..stages.aggregates import turn_stats
    from ..stages.dedup import dedup_exact
    from ..stages.join import equi_join

    left = dedup_exact(_t(sf_dir, ["conv_id", "turn_idx", "role"]))
    stats = turn_stats(_t(sf_dir, _META_RT))
    # prefilter="right" exercises the semi-join pushdown path under the
    # gate (a no-op filter on this fixture — every conv has stats — but
    # the code path is the one selective joins run). left_fields: dedup
    # preserves the pruned read's schema, so the hint keeps the deduped
    # side lazy — it fuses into the final join execution instead of
    # materializing for schema resolution.
    import pyarrow as _pa

    return equi_join(
        left,
        stats,
        on="conv_id",
        how="inner",
        prefilter="right",
        left_fields=[
            ("conv_id", _pa.string()),
            ("turn_idx", _pa.int32()),
            ("role", _pa.string()),
        ],
    )


def q_t_stats_join_broadcast(sf_dir: str) -> Any:
    """Same join as t_stats_join via the broadcast (no-shuffle) plan —
    the small conversation-stats side ships once via ray.put; output
    must be identical (shares the SQL oracle)."""
    from ..stages.aggregates import turn_stats
    from ..stages.dedup import dedup_exact
    from ..stages.join import broadcast_join

    left = dedup_exact(_t(sf_dir, ["conv_id", "turn_idx", "role"]))
    stats = turn_stats(_t(sf_dir, _META_RT))
    return broadcast_join(left, stats, on="conv_id", how="inner")


def q_t_distinct_tools(sf_dir: str) -> Any:
    """Exact distinct tools per conversation (COUNT(DISTINCT ...)):
    the partial projects to distinct (conv, tool) pairs before the
    shuffle — |distinct pairs| rows move, never the turns."""
    from ..stages.aggregates import distinct_per_key

    ds = _t(sf_dir, ["conv_id", "role", "tool"])
    tool_rows = ds.filter(
        expr="tool != '' and role == 'assistant'"
    ).select_columns(["conv_id", "tool"])
    return distinct_per_key(tool_rows, key="conv_id", value="tool", out_col="n_tools")


def q_t_translate_tools(sf_dir: str) -> Any:
    from ..stages.projection import translate_tools

    return translate_tools(_t(sf_dir))


def q_t_call_spans(sf_dir: str) -> Any:
    from ..stages.projection import call_spans

    return call_spans(_t(sf_dir))


def q_t_head_per_conv(sf_dir: str) -> Any:
    from ..stages.projection import head_per_conv

    return head_per_conv(_t(sf_dir), n=3)


def q_t_systematic_sample(sf_dir: str) -> Any:
    from ..stages.projection import systematic_sample

    return systematic_sample(_t(sf_dir), pct=10)


def _docs(sf_dir: str) -> rd.Dataset:
    import data_harvesting_ray

    data_harvesting_ray.configure_session()
    return _rp(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def q_d_fingerprint(sf_dir: str) -> Any:
    from ..stages.text import fingerprint_docs

    return fingerprint_docs(_docs(sf_dir))


def q_d_dedup_exact(sf_dir: str) -> Any:
    from ..stages.text import doc_dedup_exact

    return doc_dedup_exact(_docs(sf_dir))


def q_d_line_dedup(sf_dir: str) -> Any:
    """Corpus-wide LINE-level exact dedup (the CCNet paragraph-hash
    step): every line keeps its first (doc_id, line_idx) occurrence,
    docs are re-emitted minus duplicate lines, all-duplicate docs
    vanish. Runs over the planted multi-line fixture
    (fixtures.generator.multiline_docs_path — the driver's documents
    are single-line, so line dedup over them is a no-op); the oracle
    recomputes winners with the SAME 60-bit md5-prefix line key."""
    import data_harvesting_ray
    from ..fixtures.generator import multiline_docs_path
    from ..stages.dedup import dedup_lines

    data_harvesting_ray.configure_session()
    docs = _rp(multiline_docs_path(sf_dir))
    return dedup_lines(docs)


def q_d_bloom_line_dedup(sf_dir: str) -> Any:
    """Bloom-filter line dedup (Dolma-style): new docs (doc_id%3 != 0
    of the multi-line fixture) drop every line whose three bloom
    positions were all set by the history corpus (doc_id%3 == 0) —
    m_bits=8192 keeps the fixture's fill ~0.2 so a few FALSE POSITIVES
    occur and the gate verifies the engine's bloom semantics exactly,
    false positives included (the oracle replays the same md5-slice
    hash family)."""
    import data_harvesting_ray
    import pyarrow as pa

    from ..fixtures.generator import multiline_docs_path
    from ..stages.dedup import bloom_line_dedup

    data_harvesting_ray.configure_session()
    path = multiline_docs_path(sf_dir)

    def _part(t: pa.Table, want_hist: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = (ids % 3 == 0) if want_hist else (ids % 3 != 0)
        return t.filter(pa.array(mask))

    hist = _rp(path).map_batches(
        lambda t: _part(t, True), batch_format="pyarrow"
    )
    new = _rp(path).map_batches(
        lambda t: _part(t, False), batch_format="pyarrow"
    )
    return bloom_line_dedup(new, hist, m_bits=8192)


def q_d_chunk_windows(sf_dir: str) -> Any:
    """Context-window chunking: every document split into 120-char
    windows starting every 100 chars (20-char overlap) — the
    fit-long-docs-into-a-context-window prep step; one row per chunk,
    chunk text itself hashed by the gate."""
    from ..stages.packing import chunk_windows

    return chunk_windows(_docs(sf_dir), size=120, stride=100)


def q_d_token_stats(sf_dir: str) -> Any:
    from ..stages.text import token_stats

    return token_stats(_docs(sf_dir))


def q_d_quality(sf_dir: str) -> Any:
    from ..stages.text import quality_score

    return quality_score(_docs(sf_dir))


def q_d_lang_id(sf_dir: str) -> Any:
    from ..stages.text import lang_id

    return lang_id(_docs(sf_dir))


def q_d_winsorize(sf_dir: str) -> Any:
    """Per-language winsorization of doc length at the discrete
    [5%, 95%] quantiles — quantile_disc index semantics shared with
    gap_quantiles."""
    import data_harvesting_ray
    from ..stages.aggregates import winsorize_per_key

    data_harvesting_ray.configure_session()
    docs = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return winsorize_per_key(
        docs, key="lang", value="n_chars", p_lo_milli=50, p_hi_milli=950,
        num_buckets=8,
    )


def q_d_normalize_text(sf_dir: str) -> Any:
    """Canonical text normalization (NFC -> lower -> whitespace
    collapse -> trim) with the normalized strings themselves hashed
    by the gate."""
    from ..stages.text import normalize_text

    return normalize_text(_docs(sf_dir))


def q_d_char_entropy(sf_dir: str) -> Any:
    """Character-entropy quality signal, integer micro-quantized
    per character class before the per-doc sum (exact SQL parity)."""
    from ..stages.text import char_entropy

    return char_entropy(_docs(sf_dir))


def q_d_dsir(sf_dir: str) -> Any:
    """DSIR importance weights: hashed-unigram bag log-ratio of a
    target slice (source src0/src1) vs the raw corpus, integer
    micro-quantized per bucket before the per-doc sum (exact SQL
    parity — the unigram_surprisal discipline)."""
    import data_harvesting_ray
    from ..stages.relevance import dsir_weights

    data_harvesting_ray.configure_session()
    docs = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return dsir_weights(docs, target_col="source", target_values=["src0", "src1"])


def q_d_profile(sf_dir: str) -> Any:
    """Table profiler: per-column n / nulls / exact distinct /
    lexicographic min-max of the VARCHAR rendering over the documents
    metadata columns (free text profiled via fingerprints, not raw
    values — see profile_table docstring)."""
    import data_harvesting_ray
    from ..stages.aggregates import profile_table

    data_harvesting_ray.configure_session()
    cols = ["doc_id", "lang", "source", "n_chars"]
    docs = _rp(f"{sf_dir}/documents.parquet", columns=cols)
    return profile_table(docs, columns=cols, num_buckets=4)


SOURCE_MIX_QUOTAS = {
    "src0": 10,
    "src1": 5,
    "src2": 15,
    "src3": 8,
    "src4": 25,  # == the source's full count (cap exactly met)
    "src5": 30,  # > count (quota not binding)
}


def q_d_source_mix(sf_dir: str) -> Any:
    """Source-mix resampling: rebalance the corpus to a target per-
    source quota (unlisted sources dropped), selected in deterministic
    hash order — quotas exercise the binding, exactly-met and
    non-binding cases."""
    import data_harvesting_ray
    from ..stages.aggregates import quota_sample

    data_harvesting_ray.configure_session()
    docs = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return quota_sample(
        docs, key="source", quotas=SOURCE_MIX_QUOTAS, id_col="doc_id",
        num_buckets=8,
    )


def q_d_fertility(sf_dir: str) -> Any:
    """Tokenizer fertility per predicted language: milli-exact chars
    per BPE-ish token plus doc/char/token totals — |languages|-row
    partials per block, one tiny groupby."""
    from ..stages.text import tokenizer_fertility

    return tokenizer_fertility(_docs(sf_dir))


def q_d_gopher_gate(sf_dir: str) -> Any:
    """Gopher-rule quality gate (word count, mean word length, symbol
    ratio, alpha-word fraction) — every rule integer-exact so the
    DuckDB oracle hashes identically; RE2 regex semantics shared by
    Arrow and DuckDB."""
    from ..stages.text import gopher_gate

    return gopher_gate(_docs(sf_dir))


def q_d_train_split(sf_dir: str) -> Any:
    from ..stages.projection import train_split

    return train_split(_docs(sf_dir), key="doc_id", pct=(90, 5))


def q_d_stratified_split(sf_dir: str) -> Any:
    from ..stages.projection import stratified_split
    import data_harvesting_ray

    data_harvesting_ray.configure_session()
    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return stratified_split(ds, key="lang", id_col="doc_id", pct=(90, 5))


def q_d_bpe_tokens(sf_dir: str) -> Any:
    from ..stages.text import bpe_token_count

    return bpe_token_count(_docs(sf_dir))


def q_d_heavy_tokens(sf_dir: str) -> Any:
    """Exact corpus-wide top-10 BPE-ish tokens via the Misra-Gries
    candidate pass + exact recount (stages/sketches.py) — the
    bounded-shuffle alternative to a full vocabulary groupby."""
    from ..stages.sketches import heavy_tokens

    return heavy_tokens(_docs(sf_dir), k=10)


def q_d_minhash_near_dups(sf_dir: str) -> Any:
    # num_buckets sized to the (small) candidate shuffle, not the CPU
    # count — partition count tracks data volume
    from ..stages.dedup_approx import minhash_near_dups

    return minhash_near_dups(_docs(sf_dir), threshold_milli=700, num_buckets=16)


def q_d_jaccard_near_dups(sf_dir: str) -> Any:
    """Exact-recall near-dup pairs via the prefix-filter similarity
    self-join — same exact-Jaccard SQL oracle shape as minhash, at a
    lower threshold (600) so the size filter and larger candidate set
    are actually exercised. Unlike LSH there is no probabilistic miss:
    a single absent pair is a red driver row."""
    from ..stages.dedup_approx import ngram_jaccard_near_dups

    return ngram_jaccard_near_dups(_docs(sf_dir), threshold_milli=600, num_buckets=16)


def q_d_dedup_groups(sf_dir: str) -> Any:
    """Near-dup GROUPS: verified minhash pairs clustered into connected
    components (keep-one-per-group is then a trivial filter). The pair
    list is output-scale by construction; components run distributed."""
    from ..stages.components import connected_components
    from ..stages.dedup_approx import minhash_near_dups

    pairs = minhash_near_dups(_docs(sf_dir), threshold_milli=700, num_buckets=16)
    return connected_components(rd.from_pandas(pairs), num_buckets=8)


def q_d_keep_best(sf_dir: str) -> Any:
    """Quality-ranked dedup end-game: one canonical survivor per
    near-dup group — the member with the most BPE-ish tokens (ties to
    the smallest id). Scores for grouped docs only ride the broadcast
    semi-join; everything else never leaves the cluster."""
    from ..stages.components import connected_components, keep_best_per_group
    from ..stages.dedup_approx import minhash_near_dups
    from ..stages.text import bpe_token_count

    docs = _docs(sf_dir)
    pairs = minhash_near_dups(docs, threshold_milli=700, num_buckets=16)
    groups = connected_components(rd.from_pandas(pairs), num_buckets=8)
    return keep_best_per_group(
        groups, bpe_token_count(docs), score="n_bpe_tokens", num_buckets=8
    )


def q_e_asof_left(sf_dir: str) -> Any:
    """LEFT as-of join: every purchase keeps its row even with no
    prior click. The gate projection COALESCEs the nullable click id
    to -1 (a total order for the value compare); the operator itself
    emits true nulls (nullable Int64 / NaT)."""
    import pandas as pd

    from ..stages.asof import asof_join

    ev = _rp(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    purchases = ev.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    clicks = (
        ev.filter(expr="event_type == 'click'")
        .drop_columns(["event_type", "value"])
        .map_batches(
            lambda t: t.rename_columns(
                ["click_event_id" if c == "event_id" else c for c in t.column_names]
            ).append_column("click_ts", t["ts"]),
            batch_format="pyarrow",
        )
    )
    j = asof_join(purchases, clicks, by="user_id", on="ts", num_buckets=16, how="left")

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["click_event_id"] = (
            df["click_event_id"].fillna(-1).astype("int64")
        )
        return df

    return j.map_batches(fill, batch_format="pandas")


def q_e_overlap_join(sf_dir: str) -> Any:
    """Range x range join: per user, every (odd-event 10-min window,
    even-event 7-min window) pair that overlaps — the chunk-replication
    interval-intersection join, each pair emitted exactly once by its
    intersection-start chunk."""
    import numpy as np

    from ..stages.asof import overlap_join

    ev = _rp(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def spans(side: int):
        def fn(t: pa.Table) -> pa.Table:
            ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            sub = t.filter(pa.array(ids % 2 == side))
            p = "a" if side == 1 else "b"
            ts = sub["ts"]
            end = pc.add(ts, pa.scalar((600 if side == 1 else 420) * 1_000_000, pa.duration("us")))
            return pa.table(
                {
                    "user_id": sub["user_id"],
                    f"{p}_id": sub["event_id"],
                    f"{p}_start": ts,
                    f"{p}_end": end,
                }
            )

        return fn

    a = ev.map_batches(spans(1), batch_format="pyarrow")
    b = ev.map_batches(spans(0), batch_format="pyarrow")
    return overlap_join(
        a,
        b,
        by="user_id",
        l_span=("a_start", "a_end"),
        r_span=("b_start", "b_end"),
        chunk_s=900,
        num_buckets=16,
    )


def q_d_simhash_near_dups(sf_dir: str) -> Any:
    """SQL-checked via a side signature table: the oracle reads the
    (doc_id, simhash) parquet computed driver-side with the SAME
    ``simhash_batch`` kernel (fixtures.generator.simhash_sigs_path)
    and recomputes all-pairs hamming with bit_count(xor(...)) — the
    distributed part (16-bit banding, candidates, hamming verify) is
    independently gated even though the siphash token hash itself is
    not SQL-expressible."""
    from ..fixtures.generator import simhash_sigs_path
    from ..stages.dedup_approx import simhash_near_dups

    simhash_sigs_path(sf_dir)  # ensure the oracle's input exists
    return simhash_near_dups(_docs(sf_dir), max_hamming=3, num_buckets=16)


def _query_vectors(sf_dir: str, n: int = 10):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas()
    df = df[df["vec_id"] < n].sort_values("vec_id")
    import numpy as np

    return df["vec_id"].to_numpy(), np.stack(df["embedding"].map(lambda v: np.asarray(v, np.float64)))


def q_v_knn(sf_dir: str) -> Any:
    from ..stages.similarity import knn_bruteforce

    qids, qvecs = _query_vectors(sf_dir)
    emb = _rp(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_bruteforce(emb, qids, qvecs, k=5)


def q_v_group_centroid(sf_dir: str) -> Any:
    """Per-label embedding centroid, exact via int64 micro-unit sums
    (floor(x*1e6) is bit-identical in numpy and DuckDB, int64 addition
    is associative → shuffle-order-independent)."""
    import data_harvesting_ray
    from ..stages.similarity import group_centroids

    data_harvesting_ray.configure_session()
    emb = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return group_centroids(emb, key="label")


def q_v_knn_ivf(sf_dir: str) -> Any:
    """SQL-checked via IVF side tables: centroid training is not
    SQL-expressible, but the (vec_id, cell) assignments and per-query
    probe lists — recomputed independently driver-side with the same
    shared kernels (fixtures.generator.ivf_side_paths) — let DuckDB
    verify the distributed probed-cell scan, self-exclusion, cosine
    ranking and top-k."""
    from ..fixtures.generator import ivf_side_paths
    from ..stages.similarity import knn_ivf

    ivf_side_paths(sf_dir)  # ensure the oracle's input exists
    qids, qvecs = _query_vectors(sf_dir)
    emb = _rp(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_ivf(emb, qids, qvecs, k=5)


def q_v_near_dups(sf_dir: str) -> Any:
    """Embedding near-dup pairs via the LSH SCALE path (multi-band
    hyperplane sketch → band-bucket candidates → exact-cosine verify,
    all distributed) over a derived table with PLANTED near-dups
    (fixtures.generator.neardup_embeddings_path — deterministic, read
    by the DuckDB oracle too). The SQL oracle is exact all-pairs
    cosine ≥ 0.9, so a single missed pair fails the gate: this row
    certifies the banded plan's recall, not the brute-force baseline
    (embedding_near_dups_exact is demoted to the recall test in
    tests/test_extensions.py). 16 bands × 8 bits: planted pairs sit at
    cosine ≈ 0.97 (per-band match p ≈ 0.52, miss ≈ 0.48^16 ≈ 8e-6 —
    and deterministic under the fixed seed, verified at every sf)."""
    from ..fixtures.generator import neardup_embeddings_path
    from ..stages.similarity import embedding_near_dups

    emb = _rp(
        neardup_embeddings_path(sf_dir), columns=["vec_id", "embedding"]
    )
    pairs = embedding_near_dups(emb, threshold=0.9, n_bands=16, band_bits=8)
    return pairs[["vec_a", "vec_b"]]


def q_v_semdedup(sf_dir: str) -> Any:
    """SemDeDup (k-means cells → within-cell keep-first cosine
    suppression) over the planted-near-dup embeddings table. Gated via
    a side cell-assignment table exactly like v_knn_ivf: centroid
    training is not SQL, but with (vec_id, cell) as an INPUT table —
    recomputed independently driver-side with the same shared kernels
    (fixtures.generator.semdedup_cells_path) — DuckDB verifies the
    whole distributed part: assignment-joined grouping and the
    NOT-EXISTS lower-id cosine rule. Planted pairs sit at cosine
    ≈ 0.97 and natural pairs ≤ ~0.6, so the 0.9 threshold has wide
    float margins on both engines."""
    from ..fixtures.generator import neardup_embeddings_path, semdedup_cells_path
    from ..stages.similarity import semdedup

    semdedup_cells_path(sf_dir)  # ensure the oracle's input exists
    emb = _rp(
        neardup_embeddings_path(sf_dir), columns=["vec_id", "embedding"]
    )
    return semdedup(emb, n_centroids=8, threshold=0.9)


def q_v_quantize(sf_dir: str) -> Any:
    """Symmetric per-vector int8 quantization of the embeddings table
    — integer-exact codes + scale, exploded to (vec_id, dim) rows."""
    import data_harvesting_ray
    from ..stages.similarity import quantize_embeddings

    data_harvesting_ray.configure_session()
    emb = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return quantize_embeddings(emb)


def q_v_semdedup_far(sf_dir: str) -> Any:
    """SemDeDup with the PAPER's keep rule: within-cell duplicate
    groups (connected components of the thresholded cosine graph)
    each keep their lowest-centroid-cosine member — verified against
    a recursive-CTE closure over the same side cell table plus the
    (cell → centroid) side table."""
    from ..fixtures.generator import neardup_embeddings_path, semdedup_cells_path
    from ..stages.similarity import semdedup

    semdedup_cells_path(sf_dir)  # ensures cells + centroids exist
    emb = _rp(
        neardup_embeddings_path(sf_dir), columns=["vec_id", "embedding"]
    )
    return semdedup(emb, n_centroids=8, threshold=0.9, keep="low_centroid")


def q_d_corpus_prep(sf_dir: str) -> Any:
    """Composite corpus-prep flow (lang gate -> quality gate ->
    near-dup-group keep-one -> token metrics -> train/val/test split)
    as ONE streamed pipeline — the end-to-end showcase; every stage is
    the already-gated operator, chained."""
    from .corpus_prep import corpus_prep

    return corpus_prep(_docs(sf_dir))


def q_d_corpus_prep_best(sf_dir: str) -> Any:
    """Corpus prep with the quality-ranked survivor mode: each near-dup
    group keeps its highest-BPE-token member (ties to smallest id)
    instead of the smallest id."""
    from .corpus_prep import corpus_prep

    return corpus_prep(_docs(sf_dir), keep="best_tokens")


def q_d_corpus_prep_gopher(sf_dir: str) -> Any:
    """Corpus prep with the Gopher quality rules fused into the gate
    (word count, mean word length, symbol ratio, alpha-word fraction
    on top of lang/length/stopword) — the full published-heuristics
    curation flow as ONE streamed pipeline."""
    from .corpus_prep import corpus_prep

    return corpus_prep(_docs(sf_dir), gopher=True)


def q_d_topk_per_lang(sf_dir: str) -> Any:
    """Grouped top-k: the 3 longest (BPE-token) docs per predicted
    language — partial per-batch top-k before the shuffle, exact per
    key after it."""
    from ..stages.aggregates import topk_per_key
    from .corpus_prep import CorpusMetrics

    m = _docs(sf_dir).map_batches(
        CorpusMetrics, batch_format="pandas", concurrency=(1, 8), num_cpus=0.25
    )
    m = m.select_columns(["doc_id", "lang_pred", "n_bpe_tokens"])
    return topk_per_key(
        m, key="lang_pred", value="n_bpe_tokens", k=3, tie="doc_id", num_buckets=8
    )


def q_d_sample_per_lang(sf_dir: str) -> Any:
    """Per-key downsampling cap: at most 5 docs per predicted language,
    picked by deterministic hash order (not arrival order)."""
    from ..stages.aggregates import sample_per_key
    from .corpus_prep import CorpusMetrics

    m = _docs(sf_dir).map_batches(
        CorpusMetrics, batch_format="pandas", concurrency=(1, 8), num_cpus=0.25
    )
    m = m.select_columns(["doc_id", "lang_pred"])
    return sample_per_key(m, key="lang_pred", n=5, id_col="doc_id", num_buckets=8)


# Gate rules for d_scrub: the PII preset plus a corpus-matching entity
# rule (the synthetic documents carry no emails/IPs, so the entity rule
# guarantees the replace path is exercised on real rows; the PII rules
# are exercised on constructed strings in tests/).
_SCRUB_RULES = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
    (r"\b(customer|supplier)\b", "<NAME>"),
]


def q_d_scrub(sf_dir: str) -> Any:
    """PII/text scrubbing: sequential vectorized regex redaction with a
    per-doc redaction count — zero-copy Arrow, no shuffle."""
    from ..stages.scrub import scrub_text

    return scrub_text(_docs(sf_dir), rules=_SCRUB_RULES)


# d_contamination's benchmark set: a 40-char snippet from every 97th
# document (deterministic, derived from the corpus itself so the SQL
# oracle can recompute it without string literals).
_SNIP_EVERY, _SNIP_START, _SNIP_LEN, _SNIP_MINLEN = 97, 50, 40, 120


def q_d_contamination(sf_dir: str) -> Any:
    """Benchmark decontamination: flag documents containing any
    benchmark snippet verbatim. The snippet list (benchmark-sized,
    small by construction) is collected once and broadcast; the corpus
    scan is embarrassingly parallel substring matching."""
    from ..stages.scrub import contamination_flags

    docs = _docs(sf_dir)

    def pick(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pc.and_(
            pa.array(ids % _SNIP_EVERY == 0),
            pc.greater_equal(pc.utf8_length(t["text"]), _SNIP_MINLEN),
        )
        sub = t.filter(keep)
        return pa.table(
            {"s": pc.utf8_slice_codeunits(sub["text"], _SNIP_START, _SNIP_START + _SNIP_LEN)}
        )

    snippets = docs.map_batches(pick, batch_format="pyarrow").to_pandas()["s"].tolist()
    return contamination_flags(docs, snippets)


def q_d_pack_sequences(sf_dir: str) -> Any:
    """Sequence packing: global token offsets over docs in doc_id order
    (concatenate-and-chunk into 512-token training sequences) via the
    distributed prefix sum — the exchange moves range totals, never
    documents."""
    from ..stages.packing import pack_sequences
    from ..stages.text import bpe_token_count

    toks = bpe_token_count(_docs(sf_dir))
    return pack_sequences(
        toks, budget=512, tokens_col="n_bpe_tokens", range_size=64, num_buckets=8
    )


def q_d_token_explode(sf_dir: str) -> Any:
    """Generic one-to-many expansion (flat_map): whitespace tokens as
    (doc_id, pos, token) rows, vectorized Arrow split + flatten."""
    from ..stages.text import explode_tokens

    return explode_tokens(_docs(sf_dir))


def q_d_trigram_explode(sf_dir: str) -> Any:
    """Word-trigram expansion: (doc_id, pos, ngram) rows — the
    phrase-granular view for shingle fingerprints and n-gram
    contamination checks."""
    from ..stages.text import explode_ngrams

    return explode_ngrams(_docs(sf_dir), n=3)


def q_d_lang_rollup(sf_dir: str) -> Any:
    """Multi-level ROLLUP counts over (lang, source): one pass over the
    input, coarser levels re-aggregate the finest result."""
    import data_harvesting_ray

    from ..stages.aggregates import rollup_counts

    data_harvesting_ray.configure_session()
    ds = _rp(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    return rollup_counts(ds, keys=["lang", "source"])


def q_t_turn_rank(sf_dir: str) -> Any:
    """RANK() window function: each turn's length rank within its
    conversation (longest first; ties share a rank) over deduped
    turns. Payload is projected to a length before the shuffle."""
    import pyarrow.compute as pc

    from ..stages.dedup import dedup_kernel
    from ..stages.window_fns import with_rank

    ds = _t(sf_dir, ["conv_id", "turn_idx", "text"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
            }
        )

    return with_rank(
        ds.map_batches(project, batch_format="pyarrow"),
        key="conv_id",
        order="n_chars",
        method="rank",
        descending=True,
        out_col="len_rank",
        prepare=dedup_kernel,
    )


def q_t_turn_ntile(sf_dir: str) -> Any:
    """NTILE(4) window function: each turn's conversation-progress
    quartile (position binning for curriculum sampling / per-quartile
    quotas) over deduped turns, ordered by the tie-free turn_idx —
    NTILE is tie-sensitive, so the order key must be unique per
    conversation for the SQL gate to hold."""
    from ..stages.dedup import dedup_kernel
    from ..stages.window_fns import with_ntile

    return with_ntile(
        _t(sf_dir, ["conv_id", "turn_idx"]),
        key="conv_id",
        order="turn_idx",
        n_tiles=4,
        out_col="quartile",
        prepare=dedup_kernel,
    )


# Fixed query-term set for the TF-IDF gate (drawn from the fixture
# vocabulary; the oracle SQL is GENERATED from the same list so both
# sides sum per-document scores in the same term order).
_TFIDF_TERMS = ("join", "window", "hash", "stream", "vector")


def q_d_tfidf(sf_dir: str) -> Any:
    """TF-IDF relevance of every document to a fixed query-term set:
    one bounded DF pass (≤|terms|+1 rows reach the driver) + one
    embarrassingly parallel scoring pass."""
    from ..stages.relevance import tfidf_scores

    return tfidf_scores(_docs(sf_dir), terms=_TFIDF_TERMS)


def q_d_window_dups(sf_dir: str) -> Any:
    """Exact substring-overlap dedup: distinct document pairs sharing
    a verbatim 8-token window. Key-only shuffles; exactness certified
    (hot windows past df_cap raise, never silently skip)."""
    from ..stages.dedup_approx import window_dup_pairs

    return window_dup_pairs(_docs(sf_dir), n=8)


def q_d_repetition(sf_dir: str) -> Any:
    """Within-doc trigram repetition (the Gopher-style repetition
    quality gate): total vs distinct windows + integer milli dup
    ratio. Embarrassingly parallel — nothing shuffles."""
    from ..stages.text import ngram_repetition

    return ngram_repetition(_docs(sf_dir), n=3)


def q_d_lang_cube(sf_dir: str) -> Any:
    """GROUP BY CUBE (lang, source): counts at every key subset in one
    input pass (every set re-aggregates the materialized finest
    result)."""
    import data_harvesting_ray

    from ..stages.aggregates import cube_counts

    data_harvesting_ray.configure_session()
    ds = _rp(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    return cube_counts(ds, keys=["lang", "source"])


def q_t_echo_rate(sf_dir: str) -> Any:
    """Assistant echo rate: fraction of each assistant turn's distinct
    tokens already present in the immediately preceding user turn
    (prompt-parroting signal). One conv-keyed shuffle, vectorized
    token-set intersection per bucket."""
    from ..stages.text import assistant_echo_rate

    return assistant_echo_rate(_t(sf_dir, ["conv_id", "turn_idx", "role", "text"]))


def q_t_self_echo(sf_dir: str) -> Any:
    """Self-repetition (degenerate-loop detector): echo of each
    assistant turn against the assistant's PREVIOUS RESPONSE in the
    conversation — same one-shuffle machinery as t_echo_rate over the
    role-filtered subsequence (only assistant rows ship)."""
    from ..stages.text import assistant_echo_rate

    return assistant_echo_rate(
        _t(sf_dir, ["conv_id", "turn_idx", "role", "text"]),
        prev_role=None,
        within_role="assistant",
    )


def q_t_role_transitions(sf_dir: str) -> Any:
    """Role transition counts (the Markov view of dialogue shape):
    adjacent-pair partials per bucket, transition-matrix-sized final
    groupby."""
    from ..stages.aggregates import role_transitions

    return role_transitions(_t(sf_dir, ["conv_id", "turn_idx", "role"]))


def q_d_split_contamination(sf_dir: str) -> Any:
    """Cross-split substring leakage: val/test docs sharing a verbatim
    8-token window with any train doc (the engine's deterministic
    split hash — no join). Key-only shuffles, no pair blowup."""
    from ..stages.scrub import cross_split_contamination

    return cross_split_contamination(_docs(sf_dir), n=8)


def q_d_fuzzy_contamination(sf_dir: str) -> Any:
    """Cross-split NEAR-dup leakage: val/test docs that are an
    approximate duplicate (exact 5-gram Jaccard >= 0.7) of any train
    doc. Shared MinHash-LSH candidate pass, cross-split prefilter by
    the pure split hash (no label join), exact verify on the survivors
    only."""
    from ..stages.scrub import fuzzy_split_contamination

    return fuzzy_split_contamination(_docs(sf_dir), threshold_milli=700)


def q_d_overlap_ratio(sf_dir: str) -> Any:
    """Graded decontamination: fraction of each eval doc's distinct
    8-gram windows that occur in train (GPT-3-appendix style),
    integer milli-exact."""
    from ..stages.scrub import overlap_contamination_ratio

    return overlap_contamination_ratio(_docs(sf_dir), n=8)


def q_e_dow_profile(sf_dir: str) -> Any:
    """Day-of-week volume + exact distinct-user profile per event
    type; dow via pure integer date arithmetic (0=Mon), identical in
    the oracle."""
    import data_harvesting_ray
    from ..stages.events import dow_profile

    data_harvesting_ray.configure_session()
    ev = _rp(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "user_id"]
    )
    return dow_profile(ev)


def q_d_surprisal(sf_dir: str) -> Any:
    """CCNet-style unigram surprisal per document: mean per-token
    integer-micro surprisal under the corpus's own unigram model —
    counts joined by key (never broadcast), per-token floor makes the
    sum order-independent."""
    from ..stages.relevance import unigram_surprisal

    return unigram_surprisal(_docs(sf_dir))


def q_d_keywords(sf_dir: str) -> Any:
    """Top-3 TF-IDF keywords per document (salient-term extraction):
    tf completes inside the doc batch, df by vocabulary-scale groupby,
    counts joined by key, per-block top-k pruning before the final
    shuffle. Integer-micro scores for the exact SQL gate."""
    from ..stages.relevance import doc_keywords

    return doc_keywords(_docs(sf_dir), k=3)


def q_e_props_extract(sf_dir: str) -> Any:
    """Semi-structured extraction + aggregate: parse the integer field
    out of the JSON-ish props column with one vectorized RE2 pass and
    reduce (count, sum) per event_type — partials before the
    shuffle."""
    import data_harvesting_ray

    from ..stages.events import props_extract_agg

    data_harvesting_ray.configure_session()
    ds = _rp(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    return props_extract_agg(ds)


def q_e_retention(sf_dir: str) -> Any:
    """Week-over-week cohort retention over events: distinct (user,
    week) partials before one hash(user) shuffle, vectorized
    adjacent-week flags per bucket, |weeks|-sized final groupby."""
    import data_harvesting_ray

    from ..stages.events import user_retention

    data_harvesting_ray.configure_session()
    ds = _rp(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return user_retention(ds)


def q_d_lang_confusion(sf_dir: str) -> Any:
    """Language-id confusion matrix (predicted vs labeled lang):
    per-batch partial counts keep the exchange matrix-sized."""
    import data_harvesting_ray

    from ..stages.text import lang_confusion

    data_harvesting_ray.configure_session()
    ds = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return lang_confusion(ds)


def q_m_binary_meta(sf_dir: str) -> Any:
    from ..stages.multimodal import binary_meta

    return binary_meta(_docs(sf_dir))


def q_m_features(sf_dir: str) -> Any:
    """Actor-pool decode/feature stage; the integer byte-checksum of
    the (deterministic md5-stub) feature vector is the SQL-checkable
    witness — the float features themselves ride alongside."""
    from ..stages.multimodal import extract_features

    return extract_features(_docs(sf_dir)).select_columns(["doc_id", "feat_checksum"])


def q_m_features_png(sf_dir: str) -> Any:
    """REAL PNG decode through the actor pool: the planted side table
    holds one PNG-encoded image per document (scanline filters cycle
    0..4) plus a GOLDEN checksum computed from the raw pre-encoding
    pixels at fixture-generation time — so the oracle verifies the
    whole zlib-inflate + unfilter + feature path, not a stub. The
    reference decodes real compressed media in its core loop
    (services/harvest_service.py:149-158)."""
    import data_harvesting_ray
    import ray.data as rd

    from ..fixtures.generator import png_payloads_path
    from ..stages.multimodal import extract_features_real

    data_harvesting_ray.configure_session()
    binary = _rp(
        png_payloads_path(sf_dir), columns=["doc_id", "payload"]
    )
    return extract_features_real(binary).select_columns(["doc_id", "feat_checksum"])


def q_m_features_gif(sf_dir: str) -> Any:
    """REAL GIF decode through the actor pool: the planted side table
    holds one GIF89a palette image per document (palette sizes cycle
    4/16/64/256, every third doc a 2-frame animated GIF exercising
    poster-frame semantics and extension-block skipping) plus a GOLDEN
    checksum computed from the raw palette[indices] pixels at
    fixture-generation time — verifies the pure-Python LZW decode +
    palette mapping + feature path end-to-end (the third no-codec
    sibling of m_features_png / m_features_wav; the reference decodes
    real compressed media in its core loop,
    services/harvest_service.py:149-158)."""
    import data_harvesting_ray

    from ..fixtures.generator import gif_payloads_path
    from ..stages.multimodal import extract_features_real

    data_harvesting_ray.configure_session()
    binary = _rp(
        gif_payloads_path(sf_dir), columns=["doc_id", "payload"]
    )
    return extract_features_real(binary).select_columns(["doc_id", "feat_checksum"])


def q_m_gif_frame_sample(sf_dir: str) -> Any:
    """REAL frame sampling over decoded media: every stride-2 frame of
    each planted animated GIF (1 + doc_id%5 value-shifted frames) is
    LZW-decoded in the actor pool and witnessed by its feature
    checksum — the reference's CLASSIFICATION_FPS stride gate (M1,
    services/harvest_service.py:156-157) over actual frames. The
    golden side table's checksums were computed from the raw
    pre-encoding pixels of every sampled frame, so the gate verifies
    multi-frame decode, not just the poster frame."""
    import data_harvesting_ray

    from ..fixtures.generator import gif_anim_paths
    from ..stages.multimodal import sample_gif_frames

    data_harvesting_ray.configure_session()
    pay, _ = gif_anim_paths(sf_dir)
    binary = _rp(pay, columns=["doc_id", "payload"])
    return sample_gif_frames(binary, stride=2)


def q_m_gif_resize(sf_dir: str) -> Any:
    """Fused REAL decode + stride-sample + nearest-neighbor resize in
    one actor stage over the planted animated GIFs; the golden side
    table's checksums were computed from independently regenerated and
    resized raw pixels (integer NN grid spelled inline), so the gate
    verifies the whole media pipeline including the resize kernel —
    the reference's frame-resize step with an actual kernel."""
    import data_harvesting_ray

    from ..fixtures.generator import gif_anim_paths
    from ..stages.multimodal import resize_gif_frames

    data_harvesting_ray.configure_session()
    pay, _ = gif_anim_paths(sf_dir)
    binary = _rp(pay, columns=["doc_id", "payload"])
    return resize_gif_frames(binary, stride=2, out_h=4, out_w=5)


def q_m_features_bmp(sf_dir: str) -> Any:
    """REAL BMP RLE8 decode through the actor pool: the planted side
    table holds one run-length-encoded 8-bit BMP per document (stripes
    + noise spans so encoded runs AND absolute-mode blocks both occur)
    plus a GOLDEN checksum computed from the raw palette[indices]
    pixels at fixture-generation time — verifies the RLE8 decode +
    BGRX palette mapping + bottom-up row order end-to-end (the fifth
    no-codec format after PPM/PNG/GIF/WAV)."""
    import data_harvesting_ray

    from ..fixtures.generator import bmp_payloads_path
    from ..stages.multimodal import extract_features_real

    data_harvesting_ray.configure_session()
    binary = _rp(
        bmp_payloads_path(sf_dir), columns=["doc_id", "payload"]
    )
    return extract_features_real(binary).select_columns(["doc_id", "feat_checksum"])


def q_m_features_wav(sf_dir: str) -> Any:
    """REAL PCM-WAV audio decode through the actor pool: planted side
    table holds one 16-bit clip per document (mono/stereo, varied
    rates) plus a GOLDEN checksum computed from the raw pre-encoding
    samples — verifies the stdlib-wave decode + integer audio-feature
    path end-to-end (the audio analogue of m_features_png)."""
    import data_harvesting_ray
    import ray.data as rd

    from ..fixtures.generator import wav_payloads_path
    from ..stages.multimodal import extract_features_real

    data_harvesting_ray.configure_session()
    binary = _rp(
        wav_payloads_path(sf_dir), columns=["doc_id", "payload"]
    )
    return extract_features_real(binary).select_columns(["doc_id", "feat_checksum"])


def q_m_frame_sample(sf_dir: str) -> Any:
    from ..stages.multimodal import sample_frames

    return sample_frames(_docs(sf_dir))


def q_m_resize(sf_dir: str) -> Any:
    from ..stages.multimodal import resize_frames

    return resize_frames(_docs(sf_dir))


def q_lineitem_rollup(sf_dir: str) -> Any:
    from ..stages.aggregates import lineitem_rollup

    return lineitem_rollup(
        _rp(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_linestatus", "l_quantity"],
        )
    )


def q_h_revenue_topk(sf_dir: str) -> Any:
    """Three-table analytics (TPC-H Q3 shape): top-10 BUILDING-segment
    orders by integer-micro line-item revenue — per-order partial
    reduction, distributed semi join against filtered customer keys,
    key join, per-block top-k pruning."""
    import data_harvesting_ray

    from ..stages.aggregates import segment_revenue_topk

    data_harvesting_ray.configure_session()
    return segment_revenue_topk(
        _rp(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        ),
        _rp(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ),
        _rp(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ),
        segment="BUILDING",
        k=10,
    )


def q_h_local_supplier_volume(sf_dir: str) -> Any:
    """Six-table analytics (TPC-H Q5 shape): per-nation revenue where
    customer and supplier share a nation inside EUROPE over one order
    year — driver-reduced constant dims, broadcast nation-set pruning,
    count-gated supplier broadcast-vs-distributed join, two int-only
    fact exchanges, nations-sized result."""
    import data_harvesting_ray

    from ..stages.aggregates import local_supplier_volume

    data_harvesting_ray.configure_session()
    return local_supplier_volume(
        _rp(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        ),
        _rp(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ),
        _rp(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ),
        _rp(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ),
        pd.read_parquet(f"{sf_dir}/nation.parquet"),
        pd.read_parquet(f"{sf_dir}/region.parquet"),
        region_name="EUROPE",
        date_lo="1996-01-01",
        date_hi="1997-01-01",
    )


def q_d_incremental_dedup(sf_dir: str) -> Any:
    """Cross-snapshot exact dedup: new epoch (upper half of doc_ids)
    anti-joined on md5 fingerprints against the history corpus (lower
    half) — only 16-byte keys + int metadata cross the exchange."""
    import data_harvesting_ray

    from ..stages.dedup import incremental_dedup

    data_harvesting_ray.configure_session()
    docs = _rp(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars"],
    )
    split = docs.count() // 2
    new_docs = docs.filter(expr=f"doc_id >= {split}")
    history = docs.filter(expr=f"doc_id < {split}").select_columns(["text"])
    return incremental_dedup(new_docs, history)


def q_d_length_percentile(sf_dir: str) -> Any:
    """Per-language percentile quality calibration: keep docs at or
    above their language's 75th length percentile (strict-rank integer
    test); corpus collapses to a langs-by-lengths histogram, thresholds
    broadcast back — documents never shuffle."""
    import data_harvesting_ray

    from ..stages.text import length_percentile_gate

    data_harvesting_ray.configure_session()
    return length_percentile_gate(
        _rp(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
        ),
        q_num=3,
        q_den=4,
    )


def q_v_dim_stats(sf_dir: str) -> Any:
    """Per-dimension embedding stats (count/sum/sumsq in integer
    micro-units): one dims-row partial per batch, dims-sized exchange
    — the whitening pre-pass for IVF/LSH/cosine stages."""
    from ..stages.similarity import dim_stats

    return dim_stats(
        _rp(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    )


def q_h_promo_revenue(sf_dir: str) -> Any:
    """TPC-H Q14 shape: per ship-month promo vs total revenue mix —
    part table reduced to (partkey, is_promo) int pairs (count-gated
    broadcast-vs-distributed join), months-sized exchange."""
    import data_harvesting_ray

    from ..stages.aggregates import promo_revenue_share

    data_harvesting_ray.configure_session()
    return promo_revenue_share(
        _rp(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ),
        _rp(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]),
    )


def q_v_label_dist(sf_dir: str) -> Any:
    """Embedding outlier QA: exact integer-micro squared distance of
    every vector to its label centroid — groups x dims exchange for
    the centroids, then one embarrassingly-parallel distance pass."""
    import data_harvesting_ray

    from ..stages.similarity import label_centroid_dist

    data_harvesting_ray.configure_session()
    return label_centroid_dist(
        _rp(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "label", "embedding"],
        )
    )


def q_d_jsonl_ingest(sf_dir: str) -> Any:
    """Source-format breadth: sharded JSONL document drops (the
    fixture re-materializes documents.parquet as deterministic .jsonl
    shards) streamed through ``read_json`` into per (source, lang)
    count + char-mass partials — the standard corpus-intake profile
    pass over a non-parquet landing format."""
    import data_harvesting_ray

    from ..fixtures.generator import documents_jsonl_path
    from ..sources.jsonl import read_documents_jsonl

    data_harvesting_ray.configure_session()
    ds = read_documents_jsonl(documents_jsonl_path(sf_dir))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "source": df["source"].to_numpy(),
                "lang": df["lang"].to_numpy(),
                "n_docs": np.int64(1),
                "sum_chars": df["n_chars"].to_numpy(np.int64),
            }
        )
        return out.groupby(["source", "lang"], sort=False, as_index=False).sum()

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["source", "lang"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )


def q_d_distinct_kmv(sf_dir: str) -> Any:
    """KMV cardinality sketch over the token vocabulary — k smallest
    md5-60bit hashes per block, one k-sized merge; deterministic
    integer estimate, bit-exact vs the SQL sketch replay."""
    from ..stages.sketches import kmv_distinct_tokens

    return kmv_distinct_tokens(_docs(sf_dir), k=256)


def q_d_winnow(sf_dir: str) -> Any:
    """Winnowing (MOSS) fingerprints: distinct per-window minima of
    md5-60bit trigram hashes — embarrassingly parallel, no shuffle."""
    from ..stages.text import winnow_fingerprints

    return winnow_fingerprints(_docs(sf_dir), n=3, window=4)


def q_d_vocab_drift(sf_dir: str) -> Any:
    """Vocabulary drift between two corpus halves: per-token counts
    FULL-OUTER joined (tokens in either half survive, absent side
    coalesces to 0) — vocab-sized exchanges only."""
    import data_harvesting_ray

    from ..stages.text import vocab_drift

    data_harvesting_ray.configure_session()
    docs = _rp(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    split = docs.count() // 2
    return vocab_drift(
        docs.filter(expr=f"doc_id < {split}"),
        docs.filter(expr=f"doc_id >= {split}"),
    )


def q_d_freq_spectrum(sf_dir: str) -> Any:
    """Vocabulary frequency-of-frequencies (Zipf / Good-Turing
    spectrum): vocab-sized then spectrum-sized exchanges only."""
    from ..stages.text import freq_spectrum

    return freq_spectrum(_docs(sf_dir))


def q_h_late_orders(sf_dir: str) -> Any:
    """TPC-H Q4 shape: orders per priority with >= 1 line item shipped
    90+ days after the order date — one key join, per-batch late
    filter + distinct partials, priorities-sized result."""
    import data_harvesting_ray

    from ..stages.aggregates import late_order_counts

    data_harvesting_ray.configure_session()
    return late_order_counts(
        _rp(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        ),
        _rp(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        ),
        late_days=90,
    )


def q_d_source_dup_stats(sf_dir: str) -> Any:
    """Per-source corpus hygiene: doc count vs distinct-content count
    (md5) — hash(fp) co-located exact distinct, sources-sized result."""
    import data_harvesting_ray

    from ..stages.text import source_dup_stats

    data_harvesting_ray.configure_session()
    return source_dup_stats(
        _rp(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    )


def q_d_collocations(sf_dir: str) -> Any:
    """Top-10 word bigrams by PMI (phrase detection / collocation
    mining): vocab-scale count reductions, two key joins for the part
    counts, per-block top-k pruning; integer-micro PMI for the exact
    SQL gate."""
    from ..stages.relevance import top_collocations

    return top_collocations(_docs(sf_dir), k=10, min_count=5)


def q_d_weighted_sample(sf_dir: str) -> Any:
    """Deterministic weighted Bernoulli sample: longer docs likelier
    kept (weight = min(n_tokens*20, 900) milli); hash-coin membership
    is a pure row predicate — embarrassingly parallel, SQL-exact."""
    from ..stages.projection import weighted_sample

    return weighted_sample(_docs(sf_dir)).select_columns(
        ["doc_id", "weight_milli"]
    )


def q_v_centroids_distributed(sf_dir: str) -> Any:
    """Fully distributed Lloyd k-means over the whole embeddings table
    (no vector payload on the driver; integer-micro partials make the
    result layout-invariant). k-means itself is not SQL, but the
    result is a PURE FUNCTION of the table, so the gate reads a
    driver-side single-process recompute of the same quantized
    algorithm as an INPUT table (fixtures.generator.dist_centroids_path
    — the "golden outputs from a single-process reference" criterion)
    and hash-compares exactly."""
    import data_harvesting_ray

    from ..fixtures.generator import dist_centroids_path
    from ..stages.similarity import train_centroids_distributed

    dist_centroids_path(sf_dir)  # ensure the oracle's input exists
    data_harvesting_ray.configure_session()
    ds = _rp(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    cents = train_centroids_distributed(ds, n_centroids=8, iters=5)
    out = pd.DataFrame(
        np.floor(cents * 1e6).astype(np.int64),
        columns=[f"c{j}" for j in range(cents.shape[1])],
    )
    out.insert(0, "centroid", np.arange(len(cents), dtype=np.int64))
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    qs = {
        "t_normalize": q_t_normalize,
        "t_dedup": q_t_dedup,
        "t_render_convs": q_t_render_convs,
        "t_session_windows": q_t_session_windows,
        "t_session_windows_salted": q_t_session_windows_salted,
        "t_tumbling_windows": q_t_tumbling_windows,
        "t_sliding_windows": q_t_sliding_windows,
        "t_tool_join": q_t_tool_join,
        "t_orphan_calls": q_t_orphan_calls,
        "t_cep_matches": q_t_cep_matches,
        "t_cep_suppressed": q_t_cep_suppressed,
        "t_stride_sample": q_t_stride_sample,
        "t_turn_stats": q_t_turn_stats,
        "t_gap_quantiles": q_t_gap_quantiles,
        "t_response_latency": q_t_response_latency,
        "t_response_latency_salted": q_t_response_latency_salted,
        "t_rolling_tool_rate": q_t_rolling_tool_rate,
        "t_cumulative_calls": q_t_cumulative_calls,
        "t_role_mode": q_t_role_mode,
        "t_topk_tools": q_t_topk_tools,
        "t_translate_tools": q_t_translate_tools,
        "t_stats_join": q_t_stats_join,
        "t_stats_join_broadcast": q_t_stats_join_broadcast,
        "t_distinct_tools": q_t_distinct_tools,
        "t_call_spans": q_t_call_spans,
        "t_head_per_conv": q_t_head_per_conv,
        "t_systematic_sample": q_t_systematic_sample,
        "t_streaming_sessions": q_t_streaming_sessions,
        "t_streaming_pairs": q_t_streaming_pairs,
        "t_streaming_tumbling": q_t_streaming_tumbling,
        "t_streaming_sliding": q_t_streaming_sliding,
        "t_streaming_latency": q_t_streaming_latency,
        "t_streaming_rolling": q_t_streaming_rolling,
        "t_streaming_topk": q_t_streaming_topk,
        "t_key_skew": q_t_key_skew,
        "t_tool_latency": q_t_tool_latency,
        "t_conv_scorecard": q_t_conv_scorecard,
        "e_dow_profile": q_e_dow_profile,
        "t_sessions_repaired": q_t_sessions_repaired,
        "t_pairs_repaired": q_t_pairs_repaired,
        "t_matches_repaired": q_t_matches_repaired,
        "t_orphans_repaired": q_t_orphans_repaired,
        "t_latency_repaired": q_t_latency_repaired,
        "t_rolling_repaired": q_t_rolling_repaired,
        "t_tumbling_repaired": q_t_tumbling_repaired,
        "t_sliding_repaired": q_t_sliding_repaired,
        "e_tumbling": q_e_tumbling,
        "e_window_distinct": q_e_window_distinct,
        "e_daily_spikes": q_e_daily_spikes,
        "e_session": q_e_session,
        "e_cep": q_e_cep,
        "e_sliding": q_e_sliding,
        "e_value_quantiles": q_e_value_quantiles,
        "e_histogram": q_e_histogram,
        "e_funnel": q_e_funnel,
        "t_role_pivot": q_t_role_pivot,
        "e_asof_attribution": q_e_asof_attribution,
        "e_asof_left": q_e_asof_left,
        "e_overlap_join": q_e_overlap_join,
        "e_asof_salted": q_e_asof_salted,
        "e_session_assign": q_e_session_assign,
        "d_fingerprint": q_d_fingerprint,
        "d_dedup_exact": q_d_dedup_exact,
        "d_line_dedup": q_d_line_dedup,
        "d_chunk_windows": q_d_chunk_windows,
        "d_bloom_line_dedup": q_d_bloom_line_dedup,
        "d_token_stats": q_d_token_stats,
        "d_bpe_tokens": q_d_bpe_tokens,
        "d_heavy_tokens": q_d_heavy_tokens,
        "d_train_split": q_d_train_split,
        "d_stratified_split": q_d_stratified_split,
        "d_quality": q_d_quality,
        "d_lang_id": q_d_lang_id,
        "d_gopher_gate": q_d_gopher_gate,
        "d_fertility": q_d_fertility,
        "d_source_mix": q_d_source_mix,
        "d_profile": q_d_profile,
        "d_dsir": q_d_dsir,
        "d_char_entropy": q_d_char_entropy,
        "d_normalize_text": q_d_normalize_text,
        "d_winsorize": q_d_winsorize,
        "d_corpus_prep_gopher": q_d_corpus_prep_gopher,
        "d_overlap_ratio": q_d_overlap_ratio,
        "d_minhash_near_dups": q_d_minhash_near_dups,
        "d_jaccard_near_dups": q_d_jaccard_near_dups,
        "d_dedup_groups": q_d_dedup_groups,
        "d_keep_best": q_d_keep_best,
        "d_simhash_near_dups": q_d_simhash_near_dups,
        "d_corpus_prep": q_d_corpus_prep,
        "d_corpus_prep_best": q_d_corpus_prep_best,
        "d_topk_per_lang": q_d_topk_per_lang,
        "d_sample_per_lang": q_d_sample_per_lang,
        "d_scrub": q_d_scrub,
        "d_contamination": q_d_contamination,
        "d_pack_sequences": q_d_pack_sequences,
        "d_token_explode": q_d_token_explode,
        "d_trigram_explode": q_d_trigram_explode,
        "d_lang_rollup": q_d_lang_rollup,
        "t_turn_rank": q_t_turn_rank,
        "t_turn_ntile": q_t_turn_ntile,
        "d_tfidf": q_d_tfidf,
        "d_window_dups": q_d_window_dups,
        "d_repetition": q_d_repetition,
        "d_lang_cube": q_d_lang_cube,
        "d_split_contamination": q_d_split_contamination,
        "d_fuzzy_contamination": q_d_fuzzy_contamination,
        "t_echo_rate": q_t_echo_rate,
        "t_self_echo": q_t_self_echo,
        "t_role_transitions": q_t_role_transitions,
        "e_retention": q_e_retention,
        "d_lang_confusion": q_d_lang_confusion,
        "d_surprisal": q_d_surprisal,
        "d_keywords": q_d_keywords,
        "e_props_extract": q_e_props_extract,
        "v_knn": q_v_knn,
        "v_group_centroid": q_v_group_centroid,
        "v_knn_ivf": q_v_knn_ivf,
        "v_near_dups": q_v_near_dups,
        "v_semdedup": q_v_semdedup,
        "v_semdedup_far": q_v_semdedup_far,
        "v_quantize": q_v_quantize,
        "m_binary_meta": q_m_binary_meta,
        "m_features": q_m_features,
        "m_features_png": q_m_features_png,
        "m_features_gif": q_m_features_gif,
        "m_gif_frame_sample": q_m_gif_frame_sample,
        "m_gif_resize": q_m_gif_resize,
        "m_features_bmp": q_m_features_bmp,
        "m_features_wav": q_m_features_wav,
        "m_frame_sample": q_m_frame_sample,
        "m_resize": q_m_resize,
        "lineitem_rollup": q_lineitem_rollup,
        "h_revenue_topk": q_h_revenue_topk,
        "h_local_supplier_volume": q_h_local_supplier_volume,
        "d_incremental_dedup": q_d_incremental_dedup,
        "d_length_percentile": q_d_length_percentile,
        "v_dim_stats": q_v_dim_stats,
        "h_promo_revenue": q_h_promo_revenue,
        "v_label_dist": q_v_label_dist,
        "d_jsonl_ingest": q_d_jsonl_ingest,
        "d_freq_spectrum": q_d_freq_spectrum,
        "h_late_orders": q_h_late_orders,
        "d_source_dup_stats": q_d_source_dup_stats,
        "e_sliding_mau": q_e_sliding_mau,
        "d_distinct_kmv": q_d_distinct_kmv,
        "t_conv_dedup": q_t_conv_dedup,
        "d_hash_sample": q_d_hash_sample,
        "d_vocab_drift": q_d_vocab_drift,
        "e_type_cooccurrence": q_e_type_cooccurrence,
        "d_winnow": q_d_winnow,
        "d_collocations": q_d_collocations,
        "v_centroids_distributed": q_v_centroids_distributed,
        "d_weighted_sample": q_d_weighted_sample,
    }
    return {k: _fresh_hint(fn) for k, fn in qs.items()}


# -------------------------------------------------------------- oracle SQL
def oracle_sql(sf_name: str = _ORACLE_SF) -> dict[str, str]:
    from ..fixtures.generator import (
        documents_jsonl_path,
        ivf_side_paths,
        multiline_docs_path,
        neardup_embeddings_path,
        semdedup_cells_path,
        simhash_sigs_path,
    )

    p = transcripts_path(sf_name)  # ensures the fixture exists
    jd = documents_jsonl_path(sf_name)  # documents as sharded JSONL
    ep = neardup_embeddings_path(sf_name)  # planted-near-dup embeddings
    sp = simhash_sigs_path(sf_name)  # engine-kernel simhash signatures
    ivf_cells, ivf_probes = ivf_side_paths(sf_name)  # IVF assignments/probes
    sd_cells = semdedup_cells_path(sf_name)  # SemDeDup cell assignments
    from ..fixtures.generator import dist_centroids_path

    dk_cents = dist_centroids_path(sf_name)  # distributed-kmeans goldens
    from ..fixtures.generator import semdedup_cents_path

    sd_cents = semdedup_cents_path(sf_name)  # SemDeDup cell centroids
    from ..fixtures.generator import (
        gif_payloads_path,
        png_payloads_path,
        wav_payloads_path,
    )

    png_side = png_payloads_path(sf_name)  # PNG payloads + golden checksums
    gif_side = gif_payloads_path(sf_name)  # GIF payloads + golden checksums
    from ..fixtures.generator import gif_anim_paths

    _, gif_anim_gold = gif_anim_paths(sf_name)  # per-frame sampling goldens
    from ..fixtures.generator import gif_resize_golden_path

    gif_rs_gold = gif_resize_golden_path(sf_name)  # resized-frame goldens
    from ..fixtures.generator import bmp_payloads_path

    bmp_side = bmp_payloads_path(sf_name)  # BMP payloads + golden checksums
    ml_docs = multiline_docs_path(sf_name)  # planted multi-line documents
    wav_side = wav_payloads_path(sf_name)  # WAV payloads + golden checksums
    RAW = f"read_parquet('{p}')"
    T = f"(SELECT DISTINCT * FROM {RAW})"
    NORM = (
        f"(SELECT *, (tool <> '' AND role = 'assistant') AS is_tool_call, "
        f"coalesce(regexp_extract(text, '\\[(call-[^\\]]+)\\]', 1), '') AS call_id "
        f"FROM {T})"
    )
    CALLS = (
        f"(SELECT conv_id, call_id, tool, turn_idx AS call_turn_idx, ts AS call_ts "
        f"FROM {NORM} WHERE is_tool_call AND call_id <> '')"
    )
    RESPS = (
        f"(SELECT conv_id, call_id, turn_idx AS resp_turn_idx, ts AS resp_ts "
        f"FROM {NORM} WHERE role = 'tool' AND call_id <> '')"
    )
    sqls = {
        "t_normalize": (
            f"SELECT conv_id, turn_idx, role, text, tool, ts, "
            f"(tool <> '' AND role = 'assistant') AS is_tool_call, "
            f"coalesce(regexp_extract(text, '\\[(call-[^\\]]+)\\]', 1), '') AS call_id "
            f"FROM {RAW}"
        ),
        "t_dedup": f"SELECT DISTINCT * FROM {RAW}",
        "t_render_convs": f"""
            WITH t AS (
              SELECT DISTINCT conv_id, turn_idx, role, text FROM {RAW}
            )
            SELECT conv_id,
                   count(*) AS n_turns,
                   string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx)
                       AS doc
            FROM t GROUP BY conv_id
        """,
        "t_session_windows": f"""
            WITH o AS (
              SELECT conv_id, turn_idx, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS news
              FROM {T}
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ), s AS (
              SELECT *, CAST(sum(news) OVER (PARTITION BY conv_id ORDER BY turn_idx
                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
              FROM o
            )
            SELECT conv_id, session_id, min(ts) AS window_start, max(ts) AS window_end,
                   count(*) AS turn_count, min(turn_idx) AS first_turn_idx,
                   max(turn_idx) AS last_turn_idx
            FROM s GROUP BY conv_id, session_id
        """,
        "t_tumbling_windows": f"""
            SELECT conv_id,
                   make_timestamp((epoch_us(ts) // {TUMBLE_US}) * {TUMBLE_US}) AS window_start,
                   count(*) AS turn_count,
                   CAST(sum(CASE WHEN tool <> '' AND role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS tool_call_count
            FROM {T} GROUP BY 1, 2
        """,
        "t_sliding_windows": f"""
            WITH e AS (SELECT conv_id, epoch_us(ts) AS us FROM {T}),
            w AS (
              SELECT conv_id,
                     unnest(range((us - {SLIDE_SIZE_US}) // {SLIDE_STEP_US} + 1,
                                  us // {SLIDE_STEP_US} + 1)) AS k
              FROM e
            )
            SELECT conv_id, make_timestamp(k * {SLIDE_STEP_US}) AS window_start,
                   count(*) AS turn_count
            FROM w GROUP BY 1, 2
        """,
        "t_tool_join": f"""
            SELECT conv_id, call_id, tool, call_turn_idx, resp_turn_idx, call_ts, resp_ts
            FROM (
              SELECT c.conv_id, c.call_id, c.tool, c.call_turn_idx, c.call_ts,
                     r.resp_turn_idx, r.resp_ts,
                     row_number() OVER (PARTITION BY c.conv_id, c.call_id
                                        ORDER BY r.resp_turn_idx) AS rn
              FROM {CALLS} c JOIN {RESPS} r
                ON c.conv_id = r.conv_id AND c.call_id = r.call_id
               AND r.resp_turn_idx > c.call_turn_idx
            ) WHERE rn = 1
        """,
        "t_orphan_calls": f"""
            SELECT c.conv_id, c.call_id, c.call_turn_idx
            FROM {CALLS} c
            WHERE NOT EXISTS (
              SELECT 1 FROM {RESPS} r
              WHERE r.conv_id = c.conv_id AND r.call_id = c.call_id
                AND r.resp_turn_idx > c.call_turn_idx)
        """,
        "t_cep_matches": f"""
            WITH s AS (
              SELECT conv_id, turn_idx, role,
                     lead(role, 1) OVER w AS r1, lead(role, 2) OVER w AS r2,
                     lead(turn_idx, 2) OVER w AS t2
              FROM {T}
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            )
            SELECT conv_id, 'user>assistant>tool' AS pattern,
                   turn_idx AS start_turn_idx, t2 AS end_turn_idx
            FROM s
            WHERE role = 'user' AND r1 = 'assistant' AND r2 = 'tool'
              AND t2 = turn_idx + 2
        """,
        "t_stride_sample": f"SELECT * FROM {T} WHERE turn_idx % 4 = 0",
        "t_translate_tools": f"""
            SELECT conv_id, turn_idx, role, text,
                   CASE tool WHEN 'search' THEN 'web_search'
                             WHEN 'calculator' THEN 'math'
                             WHEN 'browser' THEN 'web_browser'
                             WHEN 'python' THEN 'code'
                             WHEN 'sql' THEN 'database'
                             ELSE tool END AS tool,
                   ts
            FROM {RAW}
        """,
        "t_call_spans": f"""
            SELECT conv_id, turn_idx,
                   CASE WHEN strpos(text, '[') > 0 AND strpos(text, ']') > strpos(text, '[')
                        THEN substr(text,
                                    greatest(1, strpos(text, '[') - 10),
                                    (strpos(text, ']') + 10) - greatest(0, strpos(text, '[') - 11))
                        ELSE '' END AS call_span
            FROM {RAW}
        """,
        "t_head_per_conv": f"""
            SELECT conv_id, turn_idx, role, text, tool, ts FROM (
              SELECT *, row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
              FROM {T}
            ) WHERE rn <= 3
        """,
        "t_systematic_sample": f"""
            SELECT * FROM {RAW}
            WHERE ((CAST(substr(conv_id, 6) AS BIGINT) * 31 + turn_idx) * 2654435761) % 997 < 100
        """,
        "t_turn_stats": f"""
            SELECT conv_id, count(*) AS n_turns,
                   CAST(sum(CASE WHEN tool <> '' AND role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls,
                   min(ts) AS first_ts, max(ts) AS last_ts
            FROM {T} GROUP BY 1
        """,
        "t_gap_quantiles": f"""
            WITH g AS (
              SELECT conv_id,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (
                         PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
              FROM {T}
            )
            SELECT conv_id, count(gap_us) AS n_gaps,
                   CAST(quantile_disc(gap_us, 0.5) AS BIGINT) AS p50_gap_us,
                   CAST(quantile_disc(gap_us, 0.9) AS BIGINT) AS p90_gap_us
            FROM g WHERE gap_us IS NOT NULL GROUP BY 1
        """,
        "t_response_latency": f"""
            WITH g AS (
              SELECT conv_id, turn_idx,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (
                         PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
              FROM {T}
            )
            SELECT conv_id, turn_idx, gap_us FROM g WHERE gap_us IS NOT NULL
        """,
        "t_rolling_tool_rate": f"""
            SELECT conv_id, turn_idx,
                   CAST(sum(CASE WHEN tool <> '' AND role = 'assistant'
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY conv_id ORDER BY turn_idx
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS calls_last5
            FROM {T}
        """,
        "t_role_pivot": f"""
            SELECT conv_id,
                   CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
                   CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant,
                   CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool
            FROM {T} GROUP BY conv_id
        """,
        "t_cumulative_calls": f"""
            SELECT conv_id, turn_idx,
                   CAST(sum(CASE WHEN tool <> '' AND role = 'assistant'
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY conv_id ORDER BY turn_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS calls_cum
            FROM {T}
        """,
        "t_role_mode": f"""
            SELECT conv_id, role AS top_role, role_count FROM (
              SELECT conv_id, role, count(*) AS role_count,
                     row_number() OVER (PARTITION BY conv_id
                                        ORDER BY count(*) DESC, role) AS rn
              FROM {T} GROUP BY conv_id, role
            ) WHERE rn = 1
        """,
        "t_topk_tools": f"""
            SELECT tool, count(*) AS n_calls FROM {T}
            WHERE tool <> '' AND role = 'assistant'
            GROUP BY 1 ORDER BY n_calls DESC, tool LIMIT 3
        """,
        # Day-of-week profile: integer date arithmetic (0=Mon), exact
        # distinct users.
        "e_dow_profile": """
            SELECT event_type,
                   CAST(((epoch_us(ts) // 86400000000) + 3) % 7 AS BIGINT)
                       AS dow,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1, 2
        """,
        # Per-tool response-latency discrete quantiles over the pair
        # join output (quantile_disc == ceil(q*n)-1).
        "t_tool_latency": f"""
            WITH j AS (
              SELECT tool,
                     epoch_us(resp_ts) - epoch_us(call_ts) AS latency_us
              FROM (
                SELECT c.tool, c.call_ts, r.resp_ts,
                       row_number() OVER (PARTITION BY c.conv_id, c.call_id
                                          ORDER BY r.resp_turn_idx) AS rn
                FROM {CALLS} c JOIN {RESPS} r
                  ON c.conv_id = r.conv_id AND c.call_id = r.call_id
                 AND r.resp_turn_idx > c.call_turn_idx
              ) WHERE rn = 1
            )
            SELECT tool, CAST(count(*) AS BIGINT) AS n,
                   quantile_disc(latency_us, 0.5) AS p50_latency_us,
                   quantile_disc(latency_us, 0.9) AS p90_latency_us
            FROM j GROUP BY 1
        """,
        # Skew diagnostics: per md5-bucket totals + hottest key over
        # the RAW (pre-dedup) turn stream — the physical shuffle input.
        "t_key_skew": f"""
            WITH k AS (
              SELECT conv_id, CAST(count(*) AS BIGINT) AS n
              FROM {RAW} GROUP BY 1
            ), b AS (
              SELECT conv_id, n,
                     CAST('0x' || substr(md5(conv_id), 1, 15) AS BIGINT) % 16
                         AS bucket
              FROM k
            ), s AS (
              SELECT bucket, CAST(sum(n) AS BIGINT) AS n_rows,
                     CAST(count(*) AS BIGINT) AS n_keys
              FROM b GROUP BY 1
            ), h AS (
              SELECT bucket, conv_id AS hot_key, n AS hot_rows
              FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY bucket ORDER BY n DESC, conv_id) AS rn
                FROM b
              ) WHERE rn = 1
            )
            SELECT s.bucket, s.n_rows, s.n_keys, h.hot_key,
                   CAST(h.hot_rows AS BIGINT) AS hot_rows
            FROM s JOIN h USING (bucket)
        """,
        # streaming twin: summed tool_counts channel partials must
        # reproduce the same bounded top-3
        "t_streaming_topk": f"""
            SELECT tool, count(*) AS n_calls FROM {T}
            WHERE tool <> '' AND role = 'assistant'
            GROUP BY 1 ORDER BY n_calls DESC, tool LIMIT 3
        """,
        "e_tumbling": f"""
            SELECT user_id,
                   make_timestamp((epoch_us(ts) // {EVENT_TUMBLE_US}) * {EVENT_TUMBLE_US}) AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events GROUP BY 1, 2
        """,
        "e_window_distinct": """
            SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS window_start,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY 1
        """,
        "e_daily_spikes": """
            WITH d AS (
              SELECT event_type,
                     make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS day,
                     count(*) AS cnt
              FROM events GROUP BY 1, 2
            ), s AS (
              SELECT *, count(*) OVER w AS n,
                     sum(cnt) OVER w AS s1,
                     sum(cnt * cnt) OVER w AS s2
              FROM d WINDOW w AS (PARTITION BY event_type)
            )
            SELECT event_type, day, cnt FROM s
            WHERE (n * cnt - s1) > 0
              AND (n * cnt - s1) * (n * cnt - s1) > (n * s2 - s1 * s1)
        """,
        "e_sliding": f"""
            WITH e AS (
              SELECT user_id, epoch_us(ts) AS us,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events
            ), w AS (
              SELECT user_id, cents,
                     unnest(range((us - {EVENT_TUMBLE_US}) // {EVENT_SLIDE_US} + 1,
                                  us // {EVENT_SLIDE_US} + 1)) AS k
              FROM e
            )
            SELECT user_id, make_timestamp(k * {EVENT_SLIDE_US}) AS window_start,
                   count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM w GROUP BY 1, 2
        """,
        "e_session": f"""
            WITH o AS (
              SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {EVENT_GAP_US}
                     THEN 1 ELSE 0 END AS news
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, CAST(sum(news) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
              FROM o
            )
            SELECT user_id, session_id, min(ts) AS window_start, max(ts) AS window_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, session_id
        """,
        "e_cep": """
            WITH s AS (
              SELECT user_id, event_id, event_type,
                     lead(event_type, 1) OVER w AS e1, lead(event_type, 2) OVER w AS e2,
                     lead(event_id, 2) OVER w AS id2
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, event_id AS start_event_id, id2 AS end_event_id
            FROM s WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
        """,
        "e_histogram": """
            SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1
        """,
        "e_funnel": """
            WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY 1),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                        JOIN s1 ON e.user_id = s1.user_id
                        WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
                 s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
                        JOIN s2 ON e.user_id = s2.user_id
                        WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)
            SELECT * FROM (
              SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
                     CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
              UNION ALL
              SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
              UNION ALL
              SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
            )
        """,
        "e_value_quantiles": """
            SELECT CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_cents,
                   CAST(quantile_disc(c, 0.9) AS BIGINT) AS p90_cents,
                   CAST(quantile_disc(c, 0.99) AS BIGINT) AS p99_cents
            FROM (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events)
        """,
        "e_asof_attribution": """
            SELECT p.event_id, p.ts, p.user_id, p.value,
                   c.event_id AS click_event_id, c.ts AS click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "e_asof_left": """
            SELECT p.event_id, p.ts, p.user_id, p.value,
                   COALESCE(c.event_id, -1) AS click_event_id,
                   c.ts AS click_ts
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "e_overlap_join": """
            WITH a AS (
              SELECT user_id, event_id AS a_id, ts AS a_start,
                     ts + INTERVAL 10 MINUTE AS a_end
              FROM events WHERE event_id % 2 = 1
            ), b AS (
              SELECT user_id, event_id AS b_id, ts AS b_start,
                     ts + INTERVAL 7 MINUTE AS b_end
              FROM events WHERE event_id % 2 = 0
            )
            SELECT a.user_id, a_id, a_start, a_end, b_id, b_start, b_end
            FROM a JOIN b ON a.user_id = b.user_id
                         AND a_start <= b_end AND b_start <= a_end
        """,
        "e_session_assign": f"""
            WITH o AS (
              SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {EVENT_GAP_US}
                     THEN 1 ELSE 0 END AS news
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, CAST(sum(news) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
              FROM o
            ), w AS (
              SELECT user_id, session_id, min(ts) AS window_start,
                     max(ts) AS window_end, count(*) AS n_events
              FROM s GROUP BY 1, 2
            )
            SELECT s.event_id, s.ts, s.user_id, w.session_id,
                   w.window_start, w.window_end, w.n_events
            FROM s JOIN w USING (user_id, session_id)
        """,
        "lineitem_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "d_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "d_dedup_exact": """
            SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "d_line_dedup": f"""
            WITH src AS (
              SELECT doc_id, text FROM read_parquet('{ml_docs}')
            ),
            lines AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS idx
              FROM src
            ),
            keyed AS (
              SELECT doc_id, idx, line,
                     CAST(('0x' || substr(md5(line), 1, 15)) AS BIGINT) AS h
              FROM lines
            ),
            winners AS (
              SELECT doc_id, idx, line
              FROM (SELECT *, row_number() OVER (
                        PARTITION BY h ORDER BY doc_id, idx) AS rn
                    FROM keyed)
              WHERE rn = 1
            ),
            tot AS (SELECT doc_id, count(*) AS n_lines FROM keyed GROUP BY doc_id)
            SELECT w.doc_id,
                   string_agg(w.line, chr(10) ORDER BY w.idx) AS text_dedup,
                   count(*) AS n_kept,
                   CAST(any_value(t.n_lines) - count(*) AS BIGINT) AS n_dropped
            FROM winners w JOIN tot t USING (doc_id)
            GROUP BY w.doc_id
        """,
        "d_bloom_line_dedup": f"""
            WITH src AS (
              SELECT doc_id, text FROM read_parquet('{ml_docs}')
            ),
            hl AS (
              SELECT DISTINCT unnest(string_split(text, chr(10))) AS line
              FROM src WHERE doc_id % 3 = 0 AND text IS NOT NULL
            ),
            hab AS (
              SELECT CAST(('0x' || substr(md5(line), 1, 15)) AS BIGINT) AS a,
                     CAST(('0x' || substr(md5(line), 16, 15)) AS BIGINT) AS b
              FROM hl
            ),
            hpos AS (
              SELECT DISTINCT p FROM (
                SELECT unnest([
                  a % 8192, b % 8192,
                  ((a % 8192) * (2654435761 % 8192) + (b % 8192)) % 8192
                ]) AS p FROM hab
              )
            ),
            lines AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     generate_subscripts(string_split(text, chr(10)), 1) AS idx
              FROM src WHERE doc_id % 3 <> 0
            ),
            pos AS (
              SELECT doc_id, idx, line,
                     CAST(('0x' || substr(md5(line), 1, 15)) AS BIGINT) AS a,
                     CAST(('0x' || substr(md5(line), 16, 15)) AS BIGINT) AS b
              FROM lines
            ),
            flag AS (
              SELECT doc_id, idx, line,
                     (a % 8192 IN (SELECT p FROM hpos))
                 AND (b % 8192 IN (SELECT p FROM hpos))
                 AND (((a % 8192) * (2654435761 % 8192) + (b % 8192)) % 8192
                      IN (SELECT p FROM hpos)) AS hit
              FROM pos
            )
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY idx)
                       FILTER (WHERE NOT hit) AS text_dedup,
                   count(*) FILTER (WHERE NOT hit) AS n_kept,
                   count(*) FILTER (WHERE hit) AS n_dropped
            FROM flag
            GROUP BY doc_id
            HAVING count(*) FILTER (WHERE NOT hit) > 0
        """,
        "d_chunk_windows": """
            WITH n AS (
              SELECT doc_id, text, length(text) AS L
              FROM documents WHERE text IS NOT NULL AND length(text) > 0
            ),
            idx AS (
              SELECT doc_id, text, L,
                     unnest(generate_series(
                         0, CAST(ceil(L / 100.0) AS BIGINT) - 1)) AS c
              FROM n
            )
            SELECT doc_id, c AS chunk_idx,
                   substr(text, CAST(c * 100 + 1 AS BIGINT), 120) AS chunk,
                   CAST(length(substr(text, CAST(c * 100 + 1 AS BIGINT), 120))
                        AS BIGINT) AS n_chunk_chars
            FROM idx WHERE c * 100 < L
        """,
        "d_train_split": """
            SELECT doc_id,
                   CASE WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'train'
                        WHEN (doc_id * 2654435761) % 1000 < 950 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "d_stratified_split": """
            WITH h AS (
              SELECT doc_id, lang,
                     count(*) OVER (PARTITION BY lang) AS sz,
                     row_number() OVER (
                         PARTITION BY lang
                         ORDER BY (doc_id * 2654435761) % 1000000007, doc_id
                     ) AS rn
              FROM documents
            )
            SELECT doc_id, lang,
                   CASE WHEN rn <= (sz * 90) // 100 THEN 'train'
                        WHEN rn <= (sz * 95) // 100 THEN 'val'
                        ELSE 'test' END AS split
            FROM h
        """,
        "d_bpe_tokens": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        ' ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+')) AS BIGINT)
                        AS n_bpe_tokens
            FROM documents
        """,
        "d_heavy_tokens": r"""
            SELECT tok AS token, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(text,
                       ' ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+')) AS tok
                  FROM documents)
            GROUP BY tok ORDER BY n DESC, token LIMIT 10
        """,
        "d_token_stats": r"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
            )
            SELECT doc_id,
                   CAST(length(toks) AS BIGINT) AS n_tokens,
                   CAST(length(list_distinct(list_transform(toks, x -> lower(x)))) AS BIGINT) AS n_unique_tokens,
                   CAST((list_sum(list_transform(toks, x -> length(x))) * 1000)
                        // greatest(length(toks), 1) AS BIGINT) AS mean_token_len_milli
            FROM t
        """,
        # Graded n-gram-overlap decontamination: exact counts, floor
        # division — the engine's split hash reproduced inline.
        "d_overlap_ratio": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\s+') AS toks,
                     CASE WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'train'
                          WHEN (doc_id * 2654435761) % 1000 < 950 THEN 'val'
                          ELSE 'test' END AS split
              FROM documents
            ), g AS (
              SELECT DISTINCT doc_id, split,
                     array_to_string(toks[i:i+7], ' ') AS ngram
              FROM t, LATERAL (SELECT unnest(generate_series(
                  1, greatest(len(toks) - 7, 0))) AS i)
            ), traing AS (
              SELECT DISTINCT ngram FROM g WHERE split = 'train'
            ), ev AS (
              SELECT g.doc_id, g.split,
                     CAST(count(*) AS BIGINT) AS n_grams,
                     CAST(sum(CASE WHEN tg.ngram IS NOT NULL
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
              FROM g LEFT JOIN traing tg USING (ngram)
              WHERE g.split <> 'train'
              GROUP BY 1, 2
            )
            SELECT doc_id, split, n_grams, n_overlap,
                   CAST(n_overlap * 1000 // n_grams AS BIGINT) AS ratio_milli,
                   (n_overlap * 1000 // n_grams >= 200) AS contaminated
            FROM ev
        """,
        # Winsorization: per-key discrete-quantile clip (quantile_disc
        # == the engine's ceil(q*n)-1 index rule).
        "d_winsorize": r"""
            WITH q AS (
              SELECT lang,
                     quantile_disc(n_chars, 0.05) AS lo,
                     quantile_disc(n_chars, 0.95) AS hi
              FROM documents GROUP BY 1
            )
            SELECT d.doc_id, d.lang, d.n_chars,
                   CAST(least(greatest(d.n_chars, q.lo), q.hi) AS BIGINT)
                       AS n_chars_wins
            FROM documents d JOIN q USING (lang)
        """,
        # Text normalization: exact string equality via ICU NFC +
        # lower + RE2 whitespace collapse on both engines.
        "d_normalize_text": r"""
            WITH t AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(nfc_normalize(text)),
                                         '\s+', ' ', 'g')) AS norm_text,
                     text
              FROM documents
            )
            SELECT doc_id, norm_text,
                   CAST(length(norm_text) AS BIGINT) AS n_chars_norm,
                   (norm_text <> text) AS changed
            FROM t
        """,
        # Character entropy: per-class floor-quantized micro terms,
        # floor division by L at the end — pure integer arithmetic.
        "d_char_entropy": r"""
            WITH ch AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
              FROM documents
            ), cnt AS (
              SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k
              FROM ch GROUP BY 1, 2
            ), tot AS (
              SELECT doc_id, CAST(sum(k) AS BIGINT) AS L FROM cnt GROUP BY 1
            )
            SELECT cnt.doc_id,
                   CAST(sum(k * CAST(floor(1e6 * ln(CAST(L AS DOUBLE) / k))
                                     AS BIGINT)) // max(L) AS BIGINT)
                       AS entropy_micro
            FROM cnt JOIN tot USING (doc_id)
            GROUP BY cnt.doc_id
        """,
        # DSIR: hashed-unigram (md5-60bit % 64) bucket log-ratio of the
        # target slice vs the raw corpus, floor-quantized to micro
        # units per bucket BEFORE the per-doc sum (integer-exact).
        "d_dsir": r"""
            WITH toks AS (
              SELECT doc_id, source,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS w
              FROM documents
            ), b AS (
              SELECT doc_id, source,
                     CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 64 AS bucket
              FROM toks
            ), agg AS (
              SELECT bucket, count(*) AS c_raw,
                     sum(CASE WHEN source IN ('src0','src1') THEN 1 ELSE 0 END) AS c_tgt
              FROM b GROUP BY 1
            ), tot AS (
              SELECT sum(c_raw) AS r_total, sum(c_tgt) AS t_total FROM agg
            ), lam AS (
              SELECT bucket,
                     CAST(floor((ln(c_tgt + 1.0) - ln(t_total + 64.0)
                               - ln(c_raw + 1.0) + ln(r_total + 64.0)) * 1e6)
                          AS BIGINT) AS s
              FROM agg, tot
            )
            SELECT b.doc_id, CAST(sum(lam.s) AS BIGINT) AS dsir_score_micro
            FROM b JOIN lam USING (bucket)
            GROUP BY b.doc_id
        """,
        # Column profiler: one UNION ALL branch per profiled column,
        # VARCHAR min/max matching the engine's uniform string schema.
        "d_profile": r"""
            SELECT 'doc_id' AS col, count(*) AS n,
                   count(*) - count(doc_id) AS n_null,
                   count(DISTINCT doc_id) AS n_distinct,
                   min(CAST(doc_id AS VARCHAR)) AS min_str,
                   max(CAST(doc_id AS VARCHAR)) AS max_str
            FROM documents
            UNION ALL
            SELECT 'lang', count(*), count(*) - count(lang),
                   count(DISTINCT lang), min(lang), max(lang)
            FROM documents
            UNION ALL
            SELECT 'source', count(*), count(*) - count(source),
                   count(DISTINCT source), min(source), max(source)
            FROM documents
            UNION ALL
            SELECT 'n_chars', count(*), count(*) - count(n_chars),
                   count(DISTINCT n_chars),
                   min(CAST(n_chars AS VARCHAR)), max(CAST(n_chars AS VARCHAR))
            FROM documents
        """,
        # Per-source quota resampling in deterministic hash order —
        # quotas mirror queries.SOURCE_MIX_QUOTAS.
        "d_source_mix": r"""
            WITH q AS (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id * 2654435761) % 1000000007, doc_id
                     ) AS rn
              FROM documents
              WHERE source IN ('src0','src1','src2','src3','src4','src5')
            )
            SELECT doc_id, source, CAST(rn AS BIGINT) AS rank
            FROM q
            WHERE rn <= CASE source
                          WHEN 'src0' THEN 10 WHEN 'src1' THEN 5
                          WHEN 'src2' THEN 15 WHEN 'src3' THEN 8
                          WHEN 'src4' THEN 25 WHEN 'src5' THEN 30
                        END
        """,
        # Tokenizer fertility per predicted language (lang CTE shared
        # with d_lang_id; totals integer, ratio milli-floored).
        "d_fertility": r"""
            WITH t AS (
              SELECT doc_id, text,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS toks
              FROM documents
            ), c AS (
              SELECT doc_id, text,
                list_sum(list_transform(toks, x -> CASE WHEN list_contains(['the','and','of','a','is','to'], x) THEN 1 ELSE 0 END)) AS n_en,
                list_sum(list_transform(toks, x -> CASE WHEN list_contains(['der','die','das','und','ist','ein'], x) THEN 1 ELSE 0 END)) AS n_de,
                list_sum(list_transform(toks, x -> CASE WHEN list_contains(['le','la','et','les','des','est'], x) THEN 1 ELSE 0 END)) AS n_fr,
                list_sum(list_transform(toks, x -> CASE WHEN list_contains(['el','la','los','las','es','una'], x) THEN 1 ELSE 0 END)) AS n_es
              FROM t
            ), langed AS (
              SELECT doc_id, text, CASE
                WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
                WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
                WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
                WHEN n_es > 0 THEN 'es'
                ELSE 'unknown' END AS lang_pred
              FROM c
            )
            SELECT lang_pred,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars,
                   CAST(sum(len(regexp_extract_all(text,
                        ' ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+'))) AS BIGINT)
                       AS n_bpe_tokens,
                   CAST(sum(length(text)) * 1000 //
                        greatest(sum(len(regexp_extract_all(text,
                          ' ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+'))), 1)
                        AS BIGINT) AS fertility_milli
            FROM langed GROUP BY 1
        """,
        # Gopher rules as pure integer arithmetic over RE2 counts —
        # bounds mirror stages/text.py GOPHER_* constants.
        "d_gopher_gate": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
                     CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_word_chars,
                     CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT) AS n_alpha_words,
                     CAST((length(text) - length(replace(text, '#', '')))
                        + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_symbols
              FROM documents
            )
            SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_symbols,
                   (n_words BETWEEN 20 AND 400) AS gate_words,
                   (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words) AS gate_mean_len,
                   (10 * n_symbols <= n_words) AS gate_symbols,
                   (5 * n_alpha_words >= 4 * n_words) AS gate_alpha,
                   ((n_words BETWEEN 20 AND 400)
                    AND (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words)
                    AND (10 * n_symbols <= n_words)
                    AND (5 * n_alpha_words >= 4 * n_words)) AS keep
            FROM t
        """,
        "d_quality": r"""
            WITH t AS (
              SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
            )
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(toks) AS BIGINT) AS n_tokens,
                   CAST((list_sum(list_transform(toks,
                          x -> CASE WHEN list_contains(
                                 ['the','a','of','to','and','in','is','for','on','with'],
                                 lower(x)) THEN 1 ELSE 0 END)) * 1000)
                        // greatest(length(toks), 1) AS BIGINT) AS stop_ratio_milli
            FROM t
        """,
        "v_group_centroid": """
            SELECT label, dim,
                   CAST(sum(e_micro) AS BIGINT) AS sum_micro,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(e_micro) AS DOUBLE) / count(*) AS centroid_micro
            FROM (SELECT label,
                         generate_subscripts(embedding, 1) AS dim,
                         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                              AS BIGINT) AS e_micro
                  FROM embeddings)
            GROUP BY label, dim
        """,
        "v_knn_ivf": f"""
            WITH cells AS (SELECT * FROM read_parquet('{ivf_cells}')),
            probes AS (SELECT * FROM read_parquet('{ivf_probes}')),
            cand AS (
              SELECT p.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding, e.embedding) AS sim
              FROM probes p
              JOIN cells c ON c.cell = p.cell
              JOIN embeddings e ON e.vec_id = c.vec_id
              JOIN embeddings q ON q.vec_id = p.query_id
              WHERE e.vec_id <> p.query_id
            )
            SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS rn
              FROM cand
            ) WHERE rn <= 5
        """,
        "v_knn": """
            SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM (
              SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, n.embedding) DESC,
                                n.vec_id) AS rn
              FROM embeddings q, embeddings n
              WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id
            ) WHERE rn <= 5
        """,
        "m_binary_meta": "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents",
        "t_cep_suppressed": f"""
            WITH RECURSIVE cand AS (
              SELECT conv_id, turn_idx AS s, t2 AS e,
                     row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
              FROM (
                SELECT conv_id, turn_idx, role,
                       lead(role, 1) OVER w AS r1, lead(role, 2) OVER w AS r2,
                       lead(turn_idx, 2) OVER w AS t2
                FROM {T}
                WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
              )
              WHERE role = 'user' AND r1 = 'assistant' AND r2 = 'tool'
                AND t2 = turn_idx + 2
            ), walk AS (
              -- greedy after-match suppression: a candidate survives iff
              -- it starts more than suppress_turns (5) past the end of
              -- the previous SURVIVING match in the same conversation
              SELECT conv_id, rn, s, e, TRUE AS kept, e AS frontier
              FROM cand WHERE rn = 1
              UNION ALL
              SELECT c.conv_id, c.rn, c.s, c.e,
                     c.s > w.frontier + 5,
                     CASE WHEN c.s > w.frontier + 5 THEN c.e ELSE w.frontier END
              FROM walk w JOIN cand c ON c.conv_id = w.conv_id AND c.rn = w.rn + 1
            )
            SELECT conv_id, 'user>assistant>tool' AS pattern,
                   s AS start_turn_idx, e AS end_turn_idx
            FROM walk WHERE kept
        """,
        "d_lang_id": r"""
            WITH t AS (
              SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
              FROM documents
            ), c AS (
              SELECT doc_id,
                list_sum(list_transform(toks, x -> CASE WHEN list_contains(['the','and','of','a','is','to'], x) THEN 1 ELSE 0 END)) AS n_en,
                list_sum(list_transform(toks, x -> CASE WHEN list_contains(['der','die','das','und','ist','ein'], x) THEN 1 ELSE 0 END)) AS n_de,
                list_sum(list_transform(toks, x -> CASE WHEN list_contains(['le','la','et','les','des','est'], x) THEN 1 ELSE 0 END)) AS n_fr,
                list_sum(list_transform(toks, x -> CASE WHEN list_contains(['el','la','los','las','es','una'], x) THEN 1 ELSE 0 END)) AS n_es
              FROM t
            )
            SELECT doc_id, CASE
              WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
              WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
              WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
              WHEN n_es > 0 THEN 'es'
              ELSE 'unknown' END AS lang_pred
            FROM c
        """,
        "m_features": """
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(0, 8),
                        i -> CAST('0x' || substr(md5(text), CAST(i * 2 + 1 AS INT), 2) AS BIGINT)))
                        AS BIGINT) AS feat_checksum
            FROM documents
        """,
        # golden-recompute oracle (same pattern as v_centroids_
        # distributed): the checksum column was computed from the raw
        # pre-encoding pixels at fixture-generation time, so comparing
        # against it verifies the engine's zlib-inflate + unfilter +
        # feature arithmetic end-to-end
        "m_features_png": f"""
            SELECT doc_id, feat_checksum
            FROM read_parquet('{png_side}')
        """,
        # same golden-recompute pattern for the GIF LZW decode: the
        # checksum was computed from the raw palette[indices] pixels
        # at fixture-generation time
        "m_features_gif": f"""
            SELECT doc_id, feat_checksum
            FROM read_parquet('{gif_side}')
        """,
        # golden-recompute per-frame oracle: one row per stride-2
        # sampled frame of each animated GIF, checksums computed from
        # the raw pre-encoding pixels of THAT frame — gates multi-frame
        # LZW decode, not just the poster frame
        "m_gif_frame_sample": f"""
            SELECT doc_id, frame_idx, frame_checksum
            FROM read_parquet('{gif_anim_gold}')
        """,
        # independently regenerated + resized golden pixels: gates the
        # decode+sample+resize fused stage including the NN kernel
        "m_gif_resize": f"""
            SELECT doc_id, frame_idx, resized_checksum
            FROM read_parquet('{gif_rs_gold}')
        """,
        # same golden-recompute pattern for the BMP RLE8 decode
        "m_features_bmp": f"""
            SELECT doc_id, feat_checksum
            FROM read_parquet('{bmp_side}')
        """,
        # same golden-recompute pattern for the PCM WAV audio decode:
        # the checksum was computed from the raw pre-encoding samples
        # at fixture-generation time (integer-exact audio features)
        "m_features_wav": f"""
            SELECT doc_id, feat_checksum
            FROM read_parquet('{wav_side}')
        """,
        # transitive closure of the verified near-dup pairs; group id
        # = min doc id of the connected component
        "d_dedup_groups": """
            WITH RECURSIVE sh AS (
                SELECT DISTINCT doc_id, substr(text, i, 5) AS g
                FROM documents,
                     LATERAL (SELECT unnest(generate_series(
                         1, greatest(length(text) - 4, 1))) AS i)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            p AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE (m * 1000) // (sa.n + sb.n - m) >= 700
            ),
            edges AS (
                SELECT doc_a AS u, doc_b AS v FROM p
                UNION
                SELECT doc_b, doc_a FROM p
            ),
            reach(x, y) AS (
                SELECT u, v FROM edges
                UNION
                SELECT r.x, e.v FROM reach r JOIN edges e ON r.y = e.u
            )
            SELECT x AS doc_id, least(x, min(y)) AS group_id
            FROM reach GROUP BY x
        """,
        # Same transitive closure, then one survivor per group: argmax
        # BPE-token count, ties to the smallest doc_id.
        "d_keep_best": r"""
            WITH RECURSIVE sh AS (
                SELECT DISTINCT doc_id, substr(text, i, 5) AS g
                FROM documents,
                     LATERAL (SELECT unnest(generate_series(
                         1, greatest(length(text) - 4, 1))) AS i)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            p AS (
                SELECT doc_a, doc_b
                FROM inter
                JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
                WHERE (m * 1000) // (sa.n + sb.n - m) >= 700
            ),
            edges AS (
                SELECT doc_a AS u, doc_b AS v FROM p
                UNION
                SELECT doc_b, doc_a FROM p
            ),
            reach(x, y) AS (
                SELECT u, v FROM edges
                UNION
                SELECT r.x, e.v FROM reach r JOIN edges e ON r.y = e.u
            ),
            comp AS (
                SELECT x AS doc_id, least(x, min(y)) AS group_id
                FROM reach GROUP BY x
            ),
            toks AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text,
                            ' ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+')) AS BIGINT)
                            AS n_bpe_tokens
                FROM documents
            )
            SELECT group_id, keep_doc_id, n_bpe_tokens FROM (
                SELECT c.group_id, c.doc_id AS keep_doc_id, t.n_bpe_tokens,
                       row_number() OVER (
                           PARTITION BY c.group_id
                           ORDER BY t.n_bpe_tokens DESC, c.doc_id) AS rn
                FROM comp c JOIN toks t ON t.doc_id = c.doc_id
            ) WHERE rn = 1
        """,
        # frame-sampling witness: every 2nd 64-byte frame of the
        # (ASCII) payload; byte slicing == substr on this corpus
        "m_frame_sample": """
            WITH f AS (
              SELECT doc_id, text, length(text) AS n,
                     unnest(range(0, (length(text) + 63) // 64, 2)) AS frame_idx
              FROM documents
            )
            SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                   CAST(least(64, n - frame_idx * 64) AS BIGINT) AS frame_bytes,
                   md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)) AS frame_fp
            FROM f
        """,
        # crop-resize witness: first 32 bytes of every sampled frame
        "m_resize": """
            WITH f AS (
              SELECT doc_id, text, length(text) AS n,
                     unnest(range(0, (length(text) + 63) // 64, 2)) AS frame_idx
              FROM documents
            )
            SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
                   CAST(least(32, n - frame_idx * 64) AS BIGINT) AS out_bytes,
                   md5(substr(text, CAST(frame_idx * 64 + 1 AS INT), 32)) AS resized_fp
            FROM f
        """,
        # All-pairs hamming over the driver-side signature table: the
        # 4×16-bit banding is exact by pigeonhole (≤3 differing bits →
        # ≥1 identical band), so the engine must find EVERY pair.
        "d_simhash_near_dups": f"""
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM read_parquet('{sp}') a
            JOIN read_parquet('{sp}') b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        # Exact all-pairs cosine over the derived planted-near-dup
        # table (same parquet the Ray LSH path reads): certifies the
        # banded scale plan's recall — one missed pair = red row.
        "v_near_dups": f"""
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM read_parquet('{ep}') a
            JOIN read_parquet('{ep}') b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
        """,
        # Distributed k-means: the single-process golden recompute of
        # the same quantized algorithm IS the oracle (pure function of
        # the table — see dist_centroids_path).
        "v_centroids_distributed": f"""
            SELECT * FROM read_parquet('{dk_cents}')
        """,
        # Per-vector symmetric quantization: micro floor once, then
        # pure integer arithmetic (floor division spelled sign-safely
        # out of SQL's truncating //, the label_centroid_dist form).
        "v_quantize": """
            WITH m AS (
              SELECT vec_id,
                     list_transform(CAST(embedding AS DOUBLE[]),
                       v -> CAST(floor(v * 1e6) AS BIGINT)) AS micro
              FROM embeddings
            ), s AS (
              SELECT vec_id, micro,
                     list_max(list_transform(micro, x -> abs(x))) AS scale_micro
              FROM m
            )
            SELECT vec_id,
                   CAST(gs.dim AS BIGINT) AS dim,
                   CASE WHEN scale_micro = 0 THEN 0
                        ELSE (micro[dim] * 127
                              - ((micro[dim] * 127 % scale_micro + scale_micro)
                                 % scale_micro)) // scale_micro
                   END AS code,
                   scale_micro
            FROM s, LATERAL (SELECT unnest(generate_series(
                1, len(micro))) AS dim) gs
        """,
        # SemDeDup, paper keep rule: within-cell components of the
        # thresholded cosine graph each keep the lowest-centroid-
        # cosine member (ties to smallest id); singletons survive.
        "v_semdedup_far": f"""
            WITH RECURSIVE base AS (
              SELECT e.vec_id, e.embedding, c.cell
              FROM read_parquet('{ep}') e
              JOIN read_parquet('{sd_cells}') c USING (vec_id)
            ), p AS (
              SELECT a.vec_id AS u, b.vec_id AS v
              FROM base a JOIN base b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
            ), edges AS (
              SELECT u, v FROM p UNION SELECT v, u FROM p
            ), reach(x, y) AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.x, e.v FROM reach r JOIN edges e ON r.y = e.u
            ), grp AS (
              SELECT x AS vec_id, least(x, min(y)) AS gid
              FROM reach GROUP BY x
            ), scored AS (
              SELECT b.vec_id, g.gid,
                     CAST(floor(list_cosine_similarity(
                       CAST(b.embedding AS DOUBLE[]), ct.centroid)
                       * 1000000) AS BIGINT) AS csim
              FROM base b
              JOIN grp g ON g.vec_id = b.vec_id
              JOIN read_parquet('{sd_cents}') ct ON ct.cell = b.cell
            ), keepers AS (
              SELECT vec_id FROM (
                SELECT vec_id, row_number() OVER (
                  PARTITION BY gid ORDER BY csim, vec_id) AS rn
                FROM scored
              ) WHERE rn = 1
            )
            SELECT b.vec_id, b.cell
            FROM base b
            LEFT JOIN grp g ON g.vec_id = b.vec_id
            WHERE g.vec_id IS NULL
               OR b.vec_id IN (SELECT vec_id FROM keepers)
        """,
        # SemDeDup over the side cell table: survivor = no lower-id
        # cluster-mate at cosine >= threshold (keep-first rule).
        "v_semdedup": f"""
            SELECT e.vec_id, c.cell
            FROM read_parquet('{ep}') e
            JOIN read_parquet('{sd_cells}') c USING (vec_id)
            WHERE NOT EXISTS (
              SELECT 1
              FROM read_parquet('{ep}') e2
              JOIN read_parquet('{sd_cells}') c2 ON e2.vec_id = c2.vec_id
              WHERE c2.cell = c.cell
                AND e2.vec_id < e.vec_id
                AND list_cosine_similarity(e2.embedding, e.embedding) >= 0.9
            )
        """,
        # Exact 5-gram Jaccard in integer milli-units — the LSH path
        # must find every pair >= threshold with the same floor-divided
        # score (char shingles == byte shingles on the ASCII corpus;
        # docs shorter than k collapse to one whole-text shingle on
        # both sides).
        "d_minhash_near_dups": """
            WITH sh AS (
                SELECT DISTINCT doc_id, substr(text, i, 5) AS g
                FROM documents,
                     LATERAL (SELECT unnest(generate_series(
                         1, greatest(length(text) - 4, 1))) AS i)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   (m * 1000) // (sa.n + sb.n - m) AS jaccard_milli
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE (m * 1000) // (sa.n + sb.n - m) >= 700
            ORDER BY doc_a, doc_b
        """,
        # Same exact 5-gram Jaccard, lower threshold — gates the
        # prefix-filter self-join, whose recall must be exactly 1.0.
        "d_jaccard_near_dups": """
            WITH sh AS (
                SELECT DISTINCT doc_id, substr(text, i, 5) AS g
                FROM documents,
                     LATERAL (SELECT unnest(generate_series(
                         1, greatest(length(text) - 4, 1))) AS i)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   (m * 1000) // (sa.n + sb.n - m) AS jaccard_milli
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE (m * 1000) // (sa.n + sb.n - m) >= 600
            ORDER BY doc_a, doc_b
        """,
    }
    # Composite corpus-prep: the per-stage oracles chained — metrics
    # CTE (d_lang_id + d_quality + d_bpe_tokens expressions verbatim),
    # gates, exact-Jaccard near-dup transitive closure over the
    # SURVIVORS (d_dedup_groups structure), keep-one-per-group, split
    # hash (d_train_split). Engine and oracle must agree end-to-end.
    sqls["d_corpus_prep"] = r"""
        WITH RECURSIVE m AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\s+') AS toks,
                 regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
          FROM documents
        ), c AS (
          SELECT doc_id, text,
            CAST(length(toks) AS BIGINT) AS n_tokens,
            CAST((list_sum(list_transform(toks,
                   x -> CASE WHEN list_contains(
                          ['the','a','of','to','and','in','is','for','on','with'],
                          lower(x)) THEN 1 ELSE 0 END)) * 1000)
                 // greatest(length(toks), 1) AS BIGINT) AS stop_ratio_milli,
            CAST(len(regexp_extract_all(text,
                 ' ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+')) AS BIGINT) AS n_bpe_tokens,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['the','and','of','a','is','to'], x) THEN 1 ELSE 0 END)) AS n_en,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['der','die','das','und','ist','ein'], x) THEN 1 ELSE 0 END)) AS n_de,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['le','la','et','les','des','est'], x) THEN 1 ELSE 0 END)) AS n_fr,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['el','la','los','las','es','una'], x) THEN 1 ELSE 0 END)) AS n_es
          FROM m
        ), langed AS (
          SELECT *, CASE
            WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
            WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
            WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
            WHEN n_es > 0 THEN 'es'
            ELSE 'unknown' END AS lang_pred
          FROM c
        ), s AS (
          SELECT * FROM langed
          WHERE lang_pred = 'en' AND n_tokens >= 20 AND stop_ratio_milli >= 30
        ), sh AS (
          SELECT DISTINCT s.doc_id, substr(s.text, i, 5) AS g
          FROM s, LATERAL (SELECT unnest(generate_series(
              1, greatest(length(s.text) - 4, 1))) AS i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS mm
            FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        p AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE (mm * 1000) // (sa.n + sb.n - mm) >= 700
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM p
            UNION
            SELECT doc_b, doc_a FROM p
        ),
        reach(x, y) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.x, e.v FROM reach r JOIN edges e ON r.y = e.u
        ),
        grp AS (
            SELECT x AS doc_id, least(x, min(y)) AS gid
            FROM reach GROUP BY x
        )
        SELECT s.doc_id, s.lang_pred, s.n_tokens, s.stop_ratio_milli,
               s.n_bpe_tokens,
               CASE WHEN (s.doc_id * 2654435761) % 1000 < 900 THEN 'train'
                    WHEN (s.doc_id * 2654435761) % 1000 < 950 THEN 'val'
                    ELSE 'test' END AS split
        FROM s LEFT JOIN grp ON grp.doc_id = s.doc_id
        WHERE grp.doc_id IS NULL OR grp.gid = s.doc_id
    """
    # Quality-ranked survivor variant: same chain, but each near-dup
    # group keeps its max-n_bpe_tokens member (ties to smallest id).
    _grp_close = "        )\n        SELECT s.doc_id"
    _ranked_cte = (
        "        ),\n"
        "        ranked AS (\n"
        "            SELECT grp.doc_id AS kid, row_number() OVER (\n"
        "                PARTITION BY grp.gid\n"
        "                ORDER BY s2.n_bpe_tokens DESC, grp.doc_id) AS rn\n"
        "            FROM grp JOIN s s2 ON s2.doc_id = grp.doc_id\n"
        "        )\n"
        "        SELECT s.doc_id"
    )
    _min_id_filter = (
        "FROM s LEFT JOIN grp ON grp.doc_id = s.doc_id\n"
        "        WHERE grp.doc_id IS NULL OR grp.gid = s.doc_id"
    )
    _best_filter = (
        "FROM s LEFT JOIN ranked ON ranked.kid = s.doc_id\n"
        "        WHERE ranked.kid IS NULL OR ranked.rn = 1"
    )
    best = sqls["d_corpus_prep"].replace(_grp_close, _ranked_cte).replace(
        _min_id_filter, _best_filter
    )
    assert best != sqls["d_corpus_prep"] and "ranked" in best
    sqls["d_corpus_prep_best"] = best
    # Gopher variant: extend the gate CTE's WHERE with the four
    # published rules (same integer-exact forms as d_gopher_gate;
    # word count == n_tokens, both count \S+ runs).
    _plain_gate = "WHERE lang_pred = 'en' AND n_tokens >= 20 AND stop_ratio_milli >= 30"
    _gopher_gate_sql = (
        _plain_gate
        + r"""
            AND n_tokens BETWEEN 20 AND 400
            AND 3 * n_tokens <= length(regexp_replace(text, '\s', '', 'g'))
            AND length(regexp_replace(text, '\s', '', 'g')) <= 10 * n_tokens
            AND 10 * ((length(text) - length(replace(text, '#', '')))
                      + (length(text) - length(replace(text, '...', ''))) // 3)
                <= n_tokens
            AND 5 * len(regexp_extract_all(text, '\S*[A-Za-z]\S*'))
                >= 4 * n_tokens"""
    )
    gopher_sql = sqls["d_corpus_prep"].replace(_plain_gate, _gopher_gate_sql)
    assert gopher_sql != sqls["d_corpus_prep"]
    sqls["d_corpus_prep_gopher"] = gopher_sql
    # Exact per-key count-distinct over assistant tool calls.
    sqls["t_distinct_tools"] = f"""
        SELECT conv_id, CAST(count(DISTINCT tool) AS BIGINT) AS n_tools
        FROM {T} WHERE tool <> '' AND role = 'assistant'
        GROUP BY conv_id
    """
    # Generic equi-join: deduped turn rows x per-conv aggregate.
    sqls["t_stats_join"] = f"""
        WITH d AS (SELECT DISTINCT conv_id, turn_idx, role FROM {RAW}),
        s AS (
            SELECT conv_id, count(*) AS n_turns,
                   CAST(sum(CASE WHEN tool <> '' AND role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls,
                   min(ts) AS first_ts, max(ts) AS last_ts
            FROM {T} GROUP BY 1
        )
        SELECT d.conv_id, d.turn_idx, d.role,
               s.n_turns, s.n_tool_calls, s.first_ts, s.last_ts
        FROM d JOIN s USING (conv_id)
    """
    # Grouped top-k: row_number window over the lang-id CTE (the
    # engine's rank column uses the same (value DESC, doc_id ASC)
    # deterministic ordering).
    sqls["d_topk_per_lang"] = r"""
        WITH m AS (
          SELECT doc_id, text,
                 regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
          FROM documents
        ), c AS (
          SELECT doc_id,
            CAST(len(regexp_extract_all(text,
                 ' ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+')) AS BIGINT) AS n_bpe_tokens,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['the','and','of','a','is','to'], x) THEN 1 ELSE 0 END)) AS n_en,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['der','die','das','und','ist','ein'], x) THEN 1 ELSE 0 END)) AS n_de,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['le','la','et','les','des','est'], x) THEN 1 ELSE 0 END)) AS n_fr,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['el','la','los','las','es','una'], x) THEN 1 ELSE 0 END)) AS n_es
          FROM m
        ), langed AS (
          SELECT doc_id, n_bpe_tokens, CASE
            WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
            WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
            WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
            WHEN n_es > 0 THEN 'es'
            ELSE 'unknown' END AS lang_pred
          FROM c
        )
        SELECT doc_id, lang_pred, n_bpe_tokens, CAST(rn AS BIGINT) AS rank
        FROM (
          SELECT doc_id, lang_pred, n_bpe_tokens,
                 row_number() OVER (
                   PARTITION BY lang_pred
                   ORDER BY n_bpe_tokens DESC, doc_id) AS rn
          FROM langed
        ) WHERE rn <= 3
    """
    # Per-key sampling cap: row_number over the deterministic hash
    # order (same lang-id CTE as the top-k oracle).
    sqls["d_sample_per_lang"] = r"""
        WITH m AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ltoks
          FROM documents
        ), c AS (
          SELECT doc_id,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['the','and','of','a','is','to'], x) THEN 1 ELSE 0 END)) AS n_en,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['der','die','das','und','ist','ein'], x) THEN 1 ELSE 0 END)) AS n_de,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['le','la','et','les','des','est'], x) THEN 1 ELSE 0 END)) AS n_fr,
            list_sum(list_transform(ltoks, x -> CASE WHEN list_contains(['el','la','los','las','es','una'], x) THEN 1 ELSE 0 END)) AS n_es
          FROM m
        ), langed AS (
          SELECT doc_id, CASE
            WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
            WHEN n_de > 0 AND n_de >= n_fr AND n_de >= n_es THEN 'de'
            WHEN n_fr > 0 AND n_fr >= n_es THEN 'fr'
            WHEN n_es > 0 THEN 'es'
            ELSE 'unknown' END AS lang_pred
          FROM c
        )
        SELECT doc_id, lang_pred, CAST(rn AS BIGINT) AS rank
        FROM (
          SELECT doc_id, lang_pred,
                 row_number() OVER (
                   PARTITION BY lang_pred
                   ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS rn
          FROM langed
        ) WHERE rn <= 5
    """
    # Sequential regex scrubbing: the nested regexp_replace chain IS
    # the operator's sequential semantics; counts taken per stage.
    sqls["d_scrub"] = r"""
        WITH s1 AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS c1,
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
          FROM documents
        ), s2 AS (
          SELECT doc_id, c1,
                 len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS c2,
                 regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
          FROM s1
        ), s3 AS (
          SELECT doc_id, c1, c2,
                 len(regexp_extract_all(t2, '\+?\d[\d -]{7,}\d')) AS c3,
                 regexp_replace(t2, '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS t3
          FROM s2
        ), s4 AS (
          SELECT doc_id, c1, c2, c3,
                 len(regexp_extract_all(t3, '\b(customer|supplier)\b')) AS c4,
                 regexp_replace(t3, '\b(customer|supplier)\b', '<NAME>', 'g') AS t4
          FROM s3
        )
        SELECT doc_id, t4 AS text_clean,
               CAST(c1 + c2 + c3 + c4 AS BIGINT) AS n_redactions
        FROM s4
    """
    # Contamination: DISTINCT snippet containment count (one hit per
    # snippet, not per occurrence) — the engine's broadcast semantics.
    sqls["d_contamination"] = f"""
        WITH snips AS (
          SELECT DISTINCT substr(text, {_SNIP_START + 1}, {_SNIP_LEN}) AS s
          FROM documents
          WHERE doc_id % {_SNIP_EVERY} = 0 AND length(text) >= {_SNIP_MINLEN}
        )
        SELECT d.doc_id,
               CAST(count(s.s) AS BIGINT) AS n_hits,
               count(s.s) > 0 AS contaminated
        FROM documents d LEFT JOIN snips s ON contains(d.text, s.s)
        GROUP BY d.doc_id
    """
    # Sequence packing: global running token offset in doc_id order,
    # chunked into 512-token sequences.
    sqls["d_pack_sequences"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                      ' ?[a-zA-Z]+| ?[0-9]+| ?[^ \ta-zA-Z0-9]+')) AS BIGINT)
                      AS n_bpe_tokens
          FROM documents
        ), c AS (
          SELECT doc_id, n_bpe_tokens,
                 CAST(COALESCE(SUM(n_bpe_tokens) OVER (
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS off
          FROM t
        )
        SELECT doc_id, n_bpe_tokens,
               CAST(off // 512 AS BIGINT) AS seq_id,
               CAST(off % 512 AS BIGINT) AS seq_off
        FROM c
    """
    sqls["d_token_explode"] = r"""
        SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, token FROM (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS token,
                 generate_subscripts(
                     regexp_split_to_array(trim(text), '\s+'), 1) AS pos
          FROM documents
        )
    """
    sqls["d_trigram_explode"] = r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        )
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
               array_to_string(toks[i:i+2], ' ') AS ngram
        FROM t, LATERAL (SELECT unnest(generate_series(
            1, greatest(len(toks) - 2, 0))) AS i)
    """
    sqls["d_lang_rollup"] = """
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY ROLLUP (lang, source)
    """
    sqls["t_turn_rank"] = f"""
        WITH t AS (
          SELECT DISTINCT conv_id, turn_idx,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM {RAW}
        )
        SELECT conv_id, turn_idx, n_chars,
               CAST(RANK() OVER (
                   PARTITION BY conv_id ORDER BY n_chars DESC) AS BIGINT)
                   AS len_rank
        FROM t
    """
    sqls["d_surprisal"] = r"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents
        ),
        cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT count(*) AS n FROM tok),
        s AS (
          SELECT t.doc_id,
                 CAST(floor(ln(CAST(n AS DOUBLE) / c) * 1e6) AS BIGINT) AS surp
          FROM tok t JOIN cnt USING (token), tot
        )
        SELECT doc_id,
               CAST(sum(surp) // count(*) AS BIGINT) AS mean_surprisal_micro
        FROM s GROUP BY doc_id
    """
    sqls["d_weighted_sample"] = r"""
        WITH w AS (
          SELECT doc_id,
                 least(len(regexp_split_to_array(trim(text), '\s+')) * 20,
                       900) AS weight_milli
          FROM documents
        )
        SELECT doc_id, CAST(weight_milli AS BIGINT) AS weight_milli
        FROM w WHERE (doc_id * 2654435761) % 1000 < weight_milli
    """
    sqls["d_collocations"] = r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        ),
        tok AS (SELECT unnest(toks) AS token FROM t),
        uni AS (SELECT token, count(*) AS c1 FROM tok GROUP BY token),
        t1 AS (SELECT count(*) AS n1 FROM tok),
        bg AS (
          SELECT toks[i] AS w1, toks[i+1] AS w2
          FROM t, LATERAL (SELECT unnest(generate_series(
              1, greatest(len(toks) - 1, 0))) AS i)
        ),
        big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        t2 AS (SELECT count(*) AS n2 FROM bg),
        s AS (
          SELECT w1, w2, c2,
                 CAST(floor(ln((CAST(c2 AS DOUBLE) * n1 * n1)
                      / (CAST(n2 AS DOUBLE) * a.c1 * b.c1)) * 1e6) AS BIGINT)
                     AS pmi_micro
          FROM big JOIN uni a ON a.token = w1 JOIN uni b ON b.token = w2,
               t1, t2
          WHERE c2 >= 5
        )
        SELECT w1, w2, CAST(c2 AS BIGINT) AS n, pmi_micro
        FROM s ORDER BY pmi_micro DESC, w1, w2 LIMIT 10
    """
    sqls["h_revenue_topk"] = """
        WITH rev AS (
          SELECT l_orderkey AS o_orderkey,
                 CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6)
                          AS BIGINT)) AS BIGINT) AS revenue_micro
          FROM lineitem GROUP BY 1
        ),
        seg AS (
          SELECT o_orderkey, o_orderdate
          FROM orders JOIN customer ON c_custkey = o_custkey
          WHERE c_mktsegment = 'BUILDING'
        )
        SELECT s.o_orderkey, s.o_orderdate, r.revenue_micro
        FROM rev r JOIN seg s USING (o_orderkey)
        ORDER BY revenue_micro DESC, o_orderkey LIMIT 10
    """
    sqls["h_local_supplier_volume"] = """
        SELECT n_name,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6)
                        AS BIGINT)) AS BIGINT) AS revenue_micro
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """
    sqls["d_incremental_dedup"] = """
        WITH s AS (SELECT count(*) // 2 AS split FROM documents),
        cur AS (
          SELECT d.doc_id, d.lang, d.n_chars, md5(d.text) AS h
          FROM documents d, s WHERE d.doc_id >= s.split
        ),
        hist AS (
          SELECT DISTINCT md5(d.text) AS h
          FROM documents d, s WHERE d.doc_id < s.split
        )
        -- md5 computed ONCE per row in the CTEs: the previous
        -- correlated NOT EXISTS recomputed it per candidate pair and
        -- DuckDB's decorrelation spilled >70 GB of temp at sf0.1
        SELECT c.doc_id, c.lang, c.n_chars
        FROM cur c ANTI JOIN hist USING (h)
    """
    sqls["d_length_percentile"] = """
        WITH r AS (
          SELECT doc_id, lang, n_chars,
                 rank() OVER (PARTITION BY lang ORDER BY n_chars) - 1
                     AS cum_less,
                 count(*) OVER (PARTITION BY lang) AS n_lang
          FROM documents
        )
        SELECT doc_id, lang, n_chars FROM r
        WHERE 4 * cum_less >= 3 * n_lang
    """
    sqls["v_dim_stats"] = """
        WITH u AS (
          SELECT generate_subscripts(embedding, 1) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                      AS BIGINT) AS m
          FROM embeddings
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(m) AS BIGINT) AS sum_micro,
               CAST(sum(m * m) AS BIGINT) AS sumsq_micro
        FROM u GROUP BY dim
    """
    sqls["h_promo_revenue"] = """
        SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(floor(l_extendedprice * (1 - l_discount) * 1e6)
                                  AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_micro,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6)
                        AS BIGINT)) AS BIGINT) AS total_micro
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1
    """
    sqls["v_label_dist"] = """
        WITH u AS (
          SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1e6)
                      AS BIGINT) AS m
          FROM embeddings
        ), c AS (
          SELECT label, dim, CAST(sum(m) AS BIGINT) AS s,
                 count(*) AS n
          FROM u GROUP BY label, dim
        ), cf AS (
          SELECT label, dim, (s - ((s % n + n) % n)) // n AS cm FROM c
        )
        SELECT u.vec_id, CAST(u.label AS BIGINT) AS label,
               CAST(sum((u.m - cf.cm) * (u.m - cf.cm)) AS BIGINT) AS dist2
        FROM u JOIN cf ON u.label = cf.label AND u.dim = cf.dim
        GROUP BY u.vec_id, u.label
    """
    sqls["d_jsonl_ingest"] = f"""
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM read_json_auto('{jd}/*.jsonl')
        GROUP BY source, lang
    """
    sqls["d_freq_spectrum"] = r"""
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents
        ),
        cnt AS (SELECT token, count(*) AS freq FROM tok GROUP BY token)
        SELECT CAST(freq AS BIGINT) AS freq,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM cnt GROUP BY freq
    """
    sqls["e_type_cooccurrence"] = """
        WITH a AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_users
        FROM a x JOIN a y
          ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY 1, 2
    """
    sqls["d_winnow"] = r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, i, len(toks) - 2 AS n_grams,
                 CAST('0x' || substr(md5(array_to_string(toks[i:i+2], ' ')),
                                     1, 15) AS BIGINT) AS hv
          FROM t, LATERAL (SELECT unnest(generate_series(
              1, greatest(len(toks) - 2, 0))) AS i)
        ),
        m AS (
          SELECT doc_id, i, n_grams,
                 min(hv) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS hv
          FROM g
        )
        SELECT DISTINCT doc_id, hv FROM m WHERE i <= n_grams - 3
    """
    sqls["d_vocab_drift"] = r"""
        WITH s AS (SELECT count(*) // 2 AS split FROM documents),
        ta AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents, s WHERE doc_id < s.split
        ),
        tb AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents, s WHERE doc_id >= s.split
        ),
        a AS (SELECT token, CAST(count(*) AS BIGINT) AS n_a FROM ta GROUP BY 1),
        b AS (SELECT token, CAST(count(*) AS BIGINT) AS n_b FROM tb GROUP BY 1)
        SELECT COALESCE(a.token, b.token) AS token,
               COALESCE(n_a, 0) AS n_a, COALESCE(n_b, 0) AS n_b
        FROM a FULL OUTER JOIN b ON a.token = b.token
    """
    sqls["t_conv_dedup"] = f"""
        WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, text FROM {RAW}),
        r AS (
          SELECT conv_id,
                 md5(string_agg(role || ': ' || text, chr(10)
                     ORDER BY turn_idx)) AS fp
          FROM t GROUP BY conv_id
        )
        SELECT fp, min(conv_id) AS conv_id FROM r GROUP BY fp
    """
    sqls["d_hash_sample"] = """
        SELECT doc_id, lang, n_chars FROM (
          SELECT doc_id, lang, n_chars,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                      AS BIGINT) AS hv
          FROM documents
        ) ORDER BY hv LIMIT 64
    """
    sqls["e_sliding_mau"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        w AS (
          SELECT user_id,
                 unnest(range((us - 604800000000) // 86400000000 + 1,
                              us // 86400000000 + 1)) AS k
          FROM e
        )
        SELECT make_timestamp(k * 86400000000) AS window_start,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               count(*) AS n_events
        FROM w GROUP BY 1
    """
    sqls["d_distinct_kmv"] = r"""
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents
        ),
        h AS (
          SELECT DISTINCT CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS hv
          FROM tok
        ),
        kk AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS k_used,
                 CAST(max(hv) AS BIGINT) AS kth_hv
          FROM kk
        )
        SELECT k_used, kth_hv,
               CASE WHEN k_used < 256 THEN k_used
                    ELSE CAST((CAST(k_used - 1 AS HUGEINT)
                               * (CAST(1 AS HUGEINT) << 60)) // kth_hv
                              AS BIGINT)
               END AS est_distinct
        FROM agg
    """
    sqls["h_late_orders"] = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        )
        GROUP BY o_orderpriority
    """
    sqls["d_source_dup_stats"] = """
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct
        FROM documents GROUP BY source
    """
    sqls["e_props_extract"] = r"""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1),
                                  '') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
    """
    sqls["d_keywords"] = r"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfq AS (SELECT token, count(*) AS dfc FROM tf GROUP BY token),
        nd AS (SELECT count(*) AS n FROM documents),
        s AS (
          SELECT doc_id, token,
                 CAST(floor(CAST(tf AS DOUBLE)
                      * ln(CAST(n AS DOUBLE) / dfc) * 1e6) AS BIGINT)
                     AS score_micro
          FROM tf JOIN dfq USING (token), nd
        ),
        r AS (
          SELECT doc_id, token, score_micro,
                 row_number() OVER (
                     PARTITION BY doc_id
                     ORDER BY score_micro DESC, token) AS rnk
          FROM s
        )
        SELECT doc_id, token, score_micro, CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= 3
    """
    sqls["t_echo_rate"] = f"""
        WITH t AS (
          SELECT DISTINCT conv_id, turn_idx, role, text FROM {RAW}
        ),
        p AS (
          SELECT conv_id, turn_idx, role, text,
                 lag(role) OVER w AS prev_role,
                 lag(text) OVER w AS prev_text
          FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        ),
        a AS (
          SELECT conv_id, turn_idx,
                 list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks,
                 list_distinct(regexp_split_to_array(trim(prev_text), '\\s+')) AS ptoks
          FROM p WHERE role = 'assistant' AND prev_role = 'user'
        )
        SELECT conv_id, turn_idx,
               CAST(len(list_intersect(toks, ptoks)) * 1000
                    // greatest(len(toks), 1) AS BIGINT) AS echo_milli
        FROM a
    """
    sqls["e_retention"] = """
        WITH uw AS (
          SELECT DISTINCT user_id,
                 epoch_us(ts) // 604800000000 AS week
          FROM events
        )
        SELECT a.week,
               CAST(count(*) AS BIGINT) AS n_active,
               CAST(count(b.user_id) AS BIGINT) AS n_retained
        FROM uw a LEFT JOIN uw b
          ON b.user_id = a.user_id AND b.week = a.week + 1
        GROUP BY a.week
    """
    # confusion matrix = the d_lang_id prediction joined to the label
    sqls["d_lang_confusion"] = None  # filled below from d_lang_id
    sqls["t_role_transitions"] = f"""
        WITH t AS (
          SELECT DISTINCT conv_id, turn_idx, role FROM {RAW}
        ),
        p AS (
          SELECT role,
                 lag(role) OVER (
                     PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
          FROM t
        )
        SELECT prev_role, role, CAST(count(*) AS BIGINT) AS n
        FROM p WHERE prev_role IS NOT NULL
        GROUP BY prev_role, role
    """
    sqls["t_self_echo"] = f"""
        WITH t AS (
          SELECT DISTINCT conv_id, turn_idx, role, text FROM {RAW}
        ),
        a0 AS (
          SELECT conv_id, turn_idx, text FROM t WHERE role = 'assistant'
        ),
        p AS (
          SELECT conv_id, turn_idx, text,
                 lag(text) OVER (
                     PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
          FROM a0
        ),
        a AS (
          SELECT conv_id, turn_idx,
                 list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS toks,
                 list_distinct(regexp_split_to_array(trim(prev_text), '\\s+')) AS ptoks
          FROM p WHERE prev_text IS NOT NULL
        )
        SELECT conv_id, turn_idx,
               CAST(len(list_intersect(toks, ptoks)) * 1000
                    // greatest(len(toks), 1) AS BIGINT) AS echo_milli
        FROM a
    """
    sqls["t_turn_ntile"] = f"""
        WITH t AS (
          SELECT DISTINCT conv_id, turn_idx FROM {RAW}
        )
        SELECT conv_id, turn_idx,
               CAST(NTILE(4) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT)
                   AS quartile
        FROM t
    """
    from ..stages.relevance import tfidf_oracle_sql

    sqls["d_tfidf"] = tfidf_oracle_sql("documents", _TFIDF_TERMS)
    sqls["d_window_dups"] = r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS ngram
          FROM t, LATERAL (SELECT unnest(generate_series(
              1, greatest(len(toks) - 7, 0))) AS i)
        ),
        d AS (SELECT DISTINCT doc_id, ngram FROM g)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b USING (ngram)
        WHERE a.doc_id < b.doc_id
    """
    sqls["d_repetition"] = r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS ngram
          FROM t, LATERAL (SELECT unnest(generate_series(
              1, greatest(len(toks) - 2, 0))) AS i)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_ngrams,
               CAST(count(DISTINCT ngram) AS BIGINT) AS n_distinct,
               CAST((count(*) - count(DISTINCT ngram)) * 1000
                    // count(*) AS BIGINT) AS dup_ratio_milli
        FROM g GROUP BY doc_id
    """
    sqls["d_lang_cube"] = """
        SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY CUBE (lang, source)
    """
    sqls["d_split_contamination"] = r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS ngram
          FROM t, LATERAL (SELECT unnest(generate_series(
              1, greatest(len(toks) - 7, 0))) AS i)
        ),
        d AS (SELECT DISTINCT doc_id, ngram FROM g),
        s AS (
          SELECT doc_id,
                 CASE WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'train'
                      WHEN (doc_id * 2654435761) % 1000 < 950 THEN 'val'
                      ELSE 'test' END AS split
          FROM documents
        ),
        x AS (SELECT d.doc_id, d.ngram, s.split FROM d JOIN s USING (doc_id))
        SELECT DISTINCT e.doc_id, e.split
        FROM x e JOIN x tr ON e.ngram = tr.ngram AND tr.split = 'train'
        WHERE e.split <> 'train'
    """
    # Exact cross-split 5-gram Jaccard — the LSH cross-split path must
    # find every train×eval pair >= threshold with the same floor-
    # divided score (same CTE shape as d_minhash_near_dups plus the
    # deterministic split hash).
    sqls["d_fuzzy_contamination"] = """
        WITH sh AS (
            SELECT DISTINCT doc_id, substr(text, i, 5) AS g
            FROM documents,
                 LATERAL (SELECT unnest(generate_series(
                     1, greatest(length(text) - 4, 1))) AS i)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        s AS (SELECT doc_id, (doc_id * 2654435761) % 1000 AS h
              FROM documents),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS m
            FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        j AS (
            SELECT doc_a, doc_b,
                   (m * 1000) // (sa.n + sb.n - m) AS jaccard_milli
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE (m * 1000) // (sa.n + sb.n - m) >= 700
        )
        SELECT CASE WHEN ha.h < 900 THEN doc_b ELSE doc_a END AS eval_id,
               CASE WHEN ha.h < 900 THEN doc_a ELSE doc_b END AS train_id,
               CASE WHEN (CASE WHEN ha.h < 900 THEN hb.h ELSE ha.h END) < 950
                    THEN 'val' ELSE 'test' END AS split,
               jaccard_milli
        FROM j
        JOIN s ha ON ha.doc_id = doc_a
        JOIN s hb ON hb.doc_id = doc_b
        WHERE (ha.h < 900) <> (hb.h < 900)
        ORDER BY eval_id, train_id
    """
    # The streaming engine's committed channels must equal the bounded
    # results — same SQL oracle (exactly-once + watermark conformance).
    sqls["t_session_windows_salted"] = sqls["t_session_windows"]
    sqls["t_streaming_sessions"] = sqls["t_session_windows"]
    sqls["t_streaming_pairs"] = sqls["t_tool_join"]
    sqls["e_asof_salted"] = sqls["e_asof_attribution"]
    sqls["t_streaming_tumbling"] = sqls["t_tumbling_windows"]
    sqls["t_streaming_sliding"] = sqls["t_sliding_windows"]
    sqls["t_streaming_latency"] = sqls["t_response_latency"]
    sqls["t_streaming_rolling"] = sqls["t_rolling_tool_rate"]
    # tight-watermark streaming + late repair == the bounded truth
    sqls["t_sessions_repaired"] = sqls["t_session_windows"]
    sqls["t_pairs_repaired"] = sqls["t_tool_join"]
    sqls["t_matches_repaired"] = sqls["t_cep_matches"]
    sqls["t_orphans_repaired"] = sqls["t_orphan_calls"]
    sqls["t_latency_repaired"] = sqls["t_response_latency"]
    sqls["t_rolling_repaired"] = sqls["t_rolling_tool_rate"]
    sqls["t_tumbling_repaired"] = sqls["t_tumbling_windows"]
    sqls["t_sliding_repaired"] = sqls["t_sliding_windows"]
    # scorecard: assembled verbatim from the gated component oracles
    sqls["t_conv_scorecard"] = f"""
        WITH stats AS (
          SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                 CAST(sum(CASE WHEN tool <> '' AND role = 'assistant'
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls
          FROM {T} GROUP BY 1
        ), sess AS (
          SELECT conv_id, CAST(count(*) AS BIGINT) AS n_sessions
          FROM ({sqls['t_session_windows']}) GROUP BY 1
        ), p AS (
          SELECT conv_id, CAST(count(*) AS BIGINT) AS n_pairs
          FROM ({sqls['t_tool_join']}) GROUP BY 1
        ), o AS (
          SELECT conv_id, CAST(count(*) AS BIGINT) AS n_orphans
          FROM ({sqls['t_orphan_calls']}) GROUP BY 1
        )
        SELECT s.conv_id, s.n_turns, s.n_tool_calls, sess.n_sessions,
               CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(coalesce(o.n_orphans, 0) AS BIGINT) AS n_orphans,
               CAST(CASE WHEN coalesce(p.n_pairs, 0)
                              + coalesce(o.n_orphans, 0) = 0 THEN 1000
                    ELSE coalesce(p.n_pairs, 0) * 1000
                         // (coalesce(p.n_pairs, 0)
                             + coalesce(o.n_orphans, 0))
                    END AS BIGINT) AS tool_success_milli
        FROM stats s
        JOIN sess USING (conv_id)
        LEFT JOIN p USING (conv_id)
        LEFT JOIN o USING (conv_id)
    """
    sqls["t_response_latency_salted"] = sqls["t_response_latency"]
    # broadcast plan must be output-identical to the shuffle plan
    sqls["t_stats_join_broadcast"] = sqls["t_stats_join"]
    sqls["d_lang_confusion"] = f"""
        WITH pred AS ({sqls['d_lang_id']})
        SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM pred p JOIN documents d USING (doc_id)
        GROUP BY d.lang, p.lang_pred
    """
    return sqls
