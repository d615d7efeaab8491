"""Late-data repair: the batch-correction half of a streaming+batch
(lambda) flow.

The streaming engine quarantines rows older than the watermark to a
committed ``late`` channel (W7) instead of corrupting closed windows.
This module turns that quarantine into a CORRECTION: conversations
that received late rows are recomputed from the full source log with
the bounded operator and spliced over their committed streaming
results; every other conversation keeps its exactly-once committed
rows untouched. The invariant (gated as ``t_sessions_repaired``):

    tight-watermark streaming run + repair == the bounded/SQL truth

Reference analogue: the reference has no late-data story at all (its
arrival-order assumption, SURVEY §2.9 W3) — repair is what closes the
gap the watermark design opened intentionally.

Scale plan: the affected-conversation set is LATE-scale (ids only,
broadcast once via ``ray.put``); the committed channel is filtered in
parallel; the recompute reads the source pruned to affected
conversations (broadcast-id semi-join at the read — payload of
unaffected convs never moves) and runs the ordinary bounded operator.
Nothing corpus-scale touches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..schema import DEFAULT_SESSION_GAP_S
from ..sinks.exactly_once import EpochSink
from ..sources.epochs import discover_epochs
from ..state.store import EMPTY_SCHEMAS, empty_frame


def _affected_conv_ids(sink: EpochSink) -> np.ndarray:
    files = sink.committed_files("late")
    if not files:
        return np.array([], dtype=object)
    # NOTE: columns= together with partitioning=None trips a Ray
    # read_parquet bug (UnboundLocalError in partition-column
    # inference) — select after the read instead
    ids = (
        rd.read_parquet(files, partitioning=None)
        .select_columns(["conv_id"])
        .to_pandas()["conv_id"]
        .to_numpy()
    )
    return np.unique(ids)


def _repair_channel(
    out_dir: str,
    epochs_root: str,
    channel: str,
    recompute,
    read_cols: list[str] | None,
) -> rd.Dataset:
    """Generic splice: committed ``channel`` rows of late-affected
    conversations are replaced by ``recompute(affected turns)``; see
    module docstring for the scale contract."""
    sink = EpochSink(out_dir)
    schema = EMPTY_SCHEMAS[channel]

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({c: df[c].astype(t) for c, t in schema.items()})

    files_c = sink.committed_files(channel)
    committed = (
        rd.read_parquet(files_c, partitioning=None)
        if files_c
        else rd.from_pandas(empty_frame(channel))
    )
    affected = _affected_conv_ids(sink)
    if not len(affected):
        return committed.map_batches(cast, batch_format="pandas")
    ref = ray.put(np.sort(affected))

    def drop_affected(t: pa.Table) -> pa.Table:
        keep = ~np.isin(t["conv_id"].to_numpy(zero_copy_only=False), ray.get(ref))
        return t.filter(pa.array(keep))

    def keep_affected(t: pa.Table) -> pa.Table:
        keep = np.isin(t["conv_id"].to_numpy(zero_copy_only=False), ray.get(ref))
        return t.filter(pa.array(keep))

    kept = committed.map_batches(drop_affected, batch_format="pyarrow")
    files = [f for _, fs in discover_epochs(epochs_root) for f in fs]
    # select_columns (not columns=) — Ray's read_parquet breaks when
    # columns= is combined with partitioning=None; the projection
    # still prunes before any shuffle
    turns = rd.read_parquet(files, partitioning=None)
    if read_cols is not None:
        turns = turns.select_columns(read_cols)
    fixed = recompute(turns.map_batches(keep_affected, batch_format="pyarrow"))
    return kept.map_batches(cast, batch_format="pandas").union(
        fixed.map_batches(cast, batch_format="pandas")
    )


def repair_sessions(
    out_dir: str,
    epochs_root: str,
    gap_s: int = DEFAULT_SESSION_GAP_S,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Committed session windows with every late-affected conversation
    recomputed from the full log (bounded ``session_windows``) —
    see module docstring. Returns the merged, corrected channel."""
    from ..stages.windows import session_windows

    return _repair_channel(
        out_dir,
        epochs_root,
        "sessions",
        lambda ds: session_windows(ds, gap_s=gap_s, num_buckets=num_buckets),
        ["conv_id", "turn_idx", "ts"],
    )


def repair_pairs(
    out_dir: str,
    epochs_root: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Committed call↔response pairs with late-affected conversations
    recomputed via the bounded ``tool_join`` (normalization included —
    call ids are parsed from the payload, so the full row rides only
    for affected convs)."""
    from ..stages.join import tool_join
    from ..stages.normalize import normalize_turns

    return _repair_channel(
        out_dir,
        epochs_root,
        "pairs",
        lambda ds: tool_join(normalize_turns(ds), num_buckets=num_buckets),
        None,  # normalize needs the payload; affected-only rows ride
    )


def repair_matches(
    out_dir: str,
    epochs_root: str,
    spec=None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Committed CEP matches with late-affected conversations
    recomputed via the bounded NFA pass (``cep_matches``) — a late
    turn can create, destroy, or shift a role-sequence match, so the
    whole conversation's match set is recomputed, never patched."""
    from ..stages.cep import cep_matches

    return _repair_channel(
        out_dir,
        epochs_root,
        "matches",
        lambda ds: cep_matches(ds, spec, num_buckets=num_buckets),
        ["conv_id", "turn_idx", "role"],
    )


def repair_orphans(
    out_dir: str,
    epochs_root: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Committed orphan calls (tool calls with no later response) with
    late-affected conversations recomputed via the bounded anti-join —
    a late response turn RETIRES a committed orphan, the repair case
    splicing alone can express (the streaming engine rightly never
    retracts committed rows)."""
    from ..stages.join import orphan_calls
    from ..stages.normalize import normalize_turns

    return _repair_channel(
        out_dir,
        epochs_root,
        "orphans",
        lambda ds: orphan_calls(normalize_turns(ds), num_buckets=num_buckets),
        None,  # normalize parses call ids from the payload
    )


def repair_latency(
    out_dir: str,
    epochs_root: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Committed response-latency rows (streaming-LAG channel) with
    late-affected conversations recomputed via the bounded window
    function — a late turn changes its successor's gap AND gains a
    gap of its own, so the conversation's whole LAG output is
    recomputed."""
    import numpy as np

    from ..stages.dedup import dedup_kernel
    from ..stages.window_fns import with_lag

    def recompute(ds: rd.Dataset) -> rd.Dataset:
        lagged = with_lag(
            ds,
            key="conv_id",
            order="turn_idx",
            col="ts",
            out_col="prev_ts",
            prepare=dedup_kernel,
            num_buckets=num_buckets,
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

    return _repair_channel(
        out_dir, epochs_root, "latency", recompute, ["conv_id", "turn_idx", "ts"]
    )


def repair_rolling(
    out_dir: str,
    epochs_root: str,
    window: int = 5,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Committed trailing-window rows (streaming rolling channel) with
    late-affected conversations recomputed via the bounded
    ``rolling_sum`` — a late turn shifts every window that would have
    contained it."""
    from ..stages.dedup import dedup_kernel
    from ..stages.window_fns import rolling_sum
    from ..stages.windows import _is_tool_call

    def recompute(ds: rd.Dataset) -> rd.Dataset:
        def flag(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "conv_id": df["conv_id"].to_numpy(),
                    "turn_idx": df["turn_idx"].to_numpy(),
                    "is_call": _is_tool_call(df),
                }
            )

        flagged = ds.map_batches(flag, batch_format="pandas")
        rolled = rolling_sum(
            flagged,
            key="conv_id",
            order="turn_idx",
            col="is_call",
            window=window,
            out_col="calls_last5",
            prepare=dedup_kernel,
            num_buckets=num_buckets,
        )
        return rolled.map_batches(
            lambda df: df[["conv_id", "turn_idx", "calls_last5"]],
            batch_format="pandas",
        )

    return _repair_channel(
        out_dir,
        epochs_root,
        "rolling",
        recompute,
        ["conv_id", "turn_idx", "role", "tool"],
    )


def repair_tumbling(
    out_dir: str,
    epochs_root: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Committed tumbling-window counts with late-affected
    conversations recomputed via the bounded ``tumbling_windows`` — a
    late turn lands in an already-emitted window, so the conv's whole
    window set is recomputed."""
    from ..stages.windows import tumbling_windows

    return _repair_channel(
        out_dir,
        epochs_root,
        "tumbling",
        lambda ds: tumbling_windows(ds, num_buckets=num_buckets),
        ["conv_id", "turn_idx", "role", "tool", "ts"],
    )


def repair_sliding(
    out_dir: str,
    epochs_root: str,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Committed sliding-window counts with late-affected
    conversations recomputed via the bounded ``sliding_windows``."""
    from ..stages.windows import sliding_windows

    return _repair_channel(
        out_dir,
        epochs_root,
        "sliding",
        lambda ds: sliding_windows(ds, num_buckets=num_buckets),
        ["conv_id", "turn_idx", "ts"],
    )
