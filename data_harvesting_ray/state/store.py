"""Per-shard streaming state core (pure pandas/numpy — no Ray).

The streaming analogue of the reference's in-process session state:
``ClassificationObject`` accumulators keyed by tracker id
(``utils/ClassificationObject.py:84-248``) plus the driver counters
(``services/harvest_service.py:26-29``), generalized to per-conv_id
state with event-time watermarks:

- out-of-order buffering (W3): rows with ts > watermark wait;
  ``close(wm)`` processes the ready set in (conv, turn_idx) order,
- session windows with gap (W2), closed when a later turn opens a new
  island or the watermark passes window_end + gap,
- exact dedup (D2 made exact) against a processed-keys table pruned to
  the watermark horizon,
- symmetric tool-call ↔ response join on (conv_id, call_id) within
  watermark bounds (J3); orphans emitted at flush,
- role-sequence CEP with after-match suppression (W4/W5); carried
  per-conv tails + suppression frontier keep matching exact across
  epoch boundaries,
- late rows (ts < wm at ingest) are evicted to a late channel (W7).

PERFORMANCE MODEL: everything per close is vectorized across the whole
shard — one concat + sort of the ready rows, islands via numpy
reduceat, carry-in state merged as small per-conv DataFrames. The only
Python loop is the after-match suppression greedy scan over CEP
*candidates* (a small set). A shard holds only open state: closed
windows are emitted and dropped; processed dedup keys are pruned to
the horizon. ``snapshot()``/``restore()`` give checkpoint/resume.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd

from ..schema import DEFAULT_SESSION_GAP_S, DEFAULT_WATERMARK_DELAY_S
from ..stages.cep import PatternSpec

US = 1_000_000
NEG_INF = np.iinfo(np.int64).min

EMPTY_SCHEMAS = {
    "sessions": {
        "conv_id": object,
        "session_id": np.int64,
        "window_start": "datetime64[us]",
        "window_end": "datetime64[us]",
        "turn_count": np.int64,
        "first_turn_idx": np.int32,
        "last_turn_idx": np.int32,
    },
    "matches": {
        "conv_id": object,
        "pattern": object,
        "start_turn_idx": np.int32,
        "end_turn_idx": np.int32,
    },
    "pairs": {
        "conv_id": object,
        "call_id": object,
        "tool": object,
        "call_turn_idx": np.int32,
        "resp_turn_idx": np.int32,
        "call_ts": "datetime64[us]",
        "resp_ts": "datetime64[us]",
    },
    "orphans": {
        "conv_id": object,
        "call_id": object,
        "call_turn_idx": np.int32,
    },
    "late": {
        "conv_id": object,
        "turn_idx": np.int32,
        "role": object,
        "text": object,
        "tool": object,
        "ts": "datetime64[us]",
    },
    "turns": {
        "conv_id": object,
        "turn_idx": np.int32,
        "role": object,
        "tool": object,
        "call_id": object,
        "ts": "datetime64[us]",
    },
    "latency": {
        "conv_id": object,
        "turn_idx": np.int32,
        "gap_us": np.int64,
    },
    "rolling": {
        "conv_id": object,
        "turn_idx": np.int32,
        "calls_last5": np.int64,
    },
    "tumbling": {
        "conv_id": object,
        "window_start": "datetime64[us]",
        "turn_count": np.int64,
        "tool_call_count": np.int64,
    },
    "tool_counts": {
        "tool": object,
        "n": np.int64,
    },
    "sliding": {
        "conv_id": object,
        "window_start": "datetime64[us]",
        "turn_count": np.int64,
    },
}

_BUF_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "call_id", "ts_us"]
_OPEN_COLS = ["conv_id", "session_id", "start_us", "end_us", "turn_count", "first_idx", "last_idx"]
_CALL_COLS = ["conv_id", "call_id", "tool", "turn_idx", "ts_us"]
_RESP_COLS = ["conv_id", "call_id", "turn_idx", "ts_us"]


def empty_frame(channel: str) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in EMPTY_SCHEMAS[channel].items()})


def _empty(cols: list[str]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})


class ShardState:
    """State for one hash(conv_id) shard of the keyspace."""

    def __init__(
        self,
        gap_s: int = DEFAULT_SESSION_GAP_S,
        pattern: PatternSpec | None = None,
        dedup_horizon_s: int = 4 * DEFAULT_WATERMARK_DELAY_S,
        tumble_s: int = 600,
        slide_size_s: int = 600,
        slide_step_s: int = 300,
        state_ttl_s: int = 86400,
        emit_turns: bool = False,
        channels: tuple[str, ...] | None = None,
    ):
        # Optional DERIVED channels (the core sessions/matches/pairs/
        # orphans always emit — they are the engine's contract). At
        # scale the full-volume derived channels (latency, rolling)
        # dominate close/commit cost when nobody consumes them —
        # channel selection is the output-side analogue of column
        # pruning at the read. Default: all on (back-compat).
        optional = {"tumbling", "sliding", "latency", "rolling", "tool_counts"}
        if channels is None:
            self.emit_channels = set(optional)
        else:
            unknown = set(channels) - optional
            if unknown:
                raise ValueError(
                    f"unknown optional channels {sorted(unknown)}; "
                    f"choose from {sorted(optional)}"
                )
            self.emit_channels = set(channels)
        self.gap_us = gap_s * US
        self.pattern = pattern or PatternSpec(skip_past_last=True, suppress_turns=0)
        self.dedup_horizon_us = dedup_horizon_s * US
        self.tumble_us = tumble_s * US
        self.slide_size_us = slide_size_s * US
        self.slide_step_us = slide_step_s * US
        self.pending: list[pd.DataFrame] = []  # buffered normalized rows
        self.processed_keys = _empty(["conv_id", "turn_idx", "ts_us"])
        self.open_sess = _empty(_OPEN_COLS)
        self.sess_next: dict = {}  # conv_id -> next session_id
        self.cep_tail = _empty(["conv_id", "role", "turn_idx"])
        self.match_frontier: dict = {}  # conv_id -> last emitted match end idx
        self.pend_calls = _empty(_CALL_COLS)
        self.pend_resps = _empty(_RESP_COLS)
        # windowed-aggregate partials: one row per open (conv, window),
        # merged per close, emitted when the watermark passes window end
        self.open_tumbles = _empty(["conv_id", "ws_us", "turn_count", "tool_call_count"])
        self.open_slides = _empty(["conv_id", "ws_us", "turn_count"])
        self.state_ttl_us = state_ttl_s * US
        self.emit_turns = emit_turns
        # streaming-LAG carry: the last processed turn per conv, so
        # response-latency gaps are exact across close/epoch boundaries
        self.lag_carry = _empty(["conv_id", "turn_idx", "ts_us"])
        # streaming-rolling carry: the last (window - 1) processed
        # turns' tool-call flags per conv — the exact state a trailing
        # ROWS window needs across close/epoch boundaries. The channel
        # column stays "calls_last5" (the default window); roll_window
        # changes the width, not the name.
        self.roll_window = 5
        self.roll_carry = _empty(["conv_id", "turn_idx", "is_call"])
        # per-conv last event ts, for TTL eviction of per-conv state
        self.conv_last = _empty(["conv_id", "last_us"])
        self.max_ts = NEG_INF
        self.frontier_wm = NEG_INF
        self.metrics = {
            "rows_in": 0,
            "dups_dropped": 0,
            "late_rows": 0,
            "sessions_emitted": 0,
            "matches_emitted": 0,
            "pairs_emitted": 0,
            "tumbling_emitted": 0,
            "sliding_emitted": 0,
            "latency_emitted": 0,
            "rolling_emitted": 0,
            "tool_counts_emitted": 0,
        }

    # ------------------------------------------------------------ ingest
    def ingest(self, df: pd.DataFrame) -> pd.DataFrame:
        """Buffer an epoch's (normalized) rows. Rows with ts < current
        watermark are returned as the late channel. Fully vectorized."""
        self.metrics["rows_in"] += len(df)
        if df.empty:
            return empty_frame("late")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if "text" not in df:
            df = df.assign(text="")
        late_mask = ts < self.frontier_wm
        n_late = int(late_mask.sum())
        self.metrics["late_rows"] += n_late
        late = df.loc[late_mask, ["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        ok = df[~late_mask]
        if len(ok):
            self.max_ts = max(self.max_ts, int(ts[~late_mask].max()))
            buf = pd.DataFrame(
                {
                    "conv_id": ok["conv_id"].to_numpy(),
                    "turn_idx": ok["turn_idx"].to_numpy().astype(np.int32),
                    "role": ok["role"].to_numpy(),
                    # the router projects the payload away for on-time
                    # rows (state never needs it); keep schema stable
                    "text": (
                        ok["text"].to_numpy()
                        if "text" in ok
                        else np.full(len(ok), "", dtype=object)
                    ),
                    "tool": ok["tool"].to_numpy(),
                    "call_id": (
                        ok["call_id"].to_numpy()
                        if "call_id" in ok
                        else np.full(len(ok), "", dtype=object)
                    ),
                    "ts_us": ts[~late_mask],
                }
            )
            # user-derived columns (EngineConfig.enrich) ride the buffer
            # and surface on the `turns` channel
            known = set(buf.columns) | {"ts", "is_tool_call"}
            for c in ok.columns:
                if c not in known:
                    buf[c] = ok[c].to_numpy()
            self.pending.append(buf)
        return late.reset_index(drop=True)

    # ------------------------------------------------------------- close
    def close(self, wm: int, flush: bool = False) -> dict[str, pd.DataFrame]:
        self.frontier_wm = max(self.frontier_wm, wm)
        buf = (
            pd.concat(self.pending, ignore_index=True)
            if self.pending
            else _empty(_BUF_COLS)
        )
        self.pending = []
        if len(buf):
            if flush:
                ready, rest = buf, buf.iloc[0:0]
            else:
                m = buf["ts_us"].to_numpy() <= wm
                ready, rest = buf[m], buf[~m]
            if len(rest):
                self.pending.append(rest.reset_index(drop=True))
        else:
            ready = buf
        ready = self._dedup(ready, wm)
        ready = ready.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
        sessions = self._advance_sessions(ready, wm, flush)
        matches = self._advance_cep(ready)
        pairs, orphans = self._advance_join(ready, flush)
        out = {}
        for name, advance in (
            ("tumbling", lambda: self._advance_tumbling(ready, wm, flush)),
            ("sliding", lambda: self._advance_sliding(ready, wm, flush)),
            ("latency", lambda: self._advance_latency(ready)),
            ("rolling", lambda: self._advance_rolling(ready)),
            ("tool_counts", lambda: self._advance_tool_counts(ready)),
        ):
            if name in self.emit_channels:
                out[name] = advance()
                self.metrics[f"{name}_emitted"] += len(out[name])
        ttl_orphans = self._evict_expired(ready, wm)
        if len(ttl_orphans):
            orphans = pd.concat([orphans, ttl_orphans], ignore_index=True)
        self.metrics["sessions_emitted"] += len(sessions)
        self.metrics["matches_emitted"] += len(matches)
        self.metrics["pairs_emitted"] += len(pairs)
        out.update(
            sessions=sessions,
            matches=matches,
            pairs=pairs,
            orphans=orphans,
        )
        if self.emit_turns:
            turns = ready.drop(columns=["text"], errors="ignore").copy()
            turns["ts"] = turns.pop("ts_us").astype(np.int64).astype("datetime64[us]")
            out["turns"] = turns
        # capacity-planning observability: rows currently HELD by this
        # shard's state (surfaces unbounded-growth bugs in metrics.jsonl
        # long before they OOM a worker)
        self.metrics["state_rows"] = int(
            len(self.processed_keys)
            + len(self.open_sess)
            + len(self.cep_tail)
            + len(self.pend_calls)
            + len(self.pend_resps)
            + len(self.open_tumbles)
            + len(self.open_slides)
            + len(self.lag_carry)
            + len(self.roll_carry)
            + len(self.conv_last)
            + sum(len(p) for p in self.pending)
        )
        return out

    # ------------------------------------------------------- TTL eviction
    def _evict_expired(self, ready: pd.DataFrame, wm: int) -> pd.DataFrame:
        """Bound per-conv state on endless streams: once the watermark
        passes a conv's last activity + state_ttl, its session counter,
        CEP tail/frontier and last-ts entry are dropped (exact
        semantics are contracted only for silences < ttl — same shape
        of contract as the dedup horizon). Pending calls older than the
        horizon are emitted as orphans NOW (not only at flush) and
        ghost responses older than it are dropped — without this,
        pend_calls/pend_resps grow forever on an unbounded stream."""
        if len(ready):
            part = (
                pd.DataFrame(
                    {
                        "conv_id": ready["conv_id"].to_numpy(),
                        "last_us": ready["ts_us"].to_numpy().astype(np.int64),
                    }
                )
                .groupby("conv_id", sort=False, as_index=False)
                .max()
            )
            self.conv_last = (
                pd.concat([self.conv_last, part], ignore_index=True)
                .groupby("conv_id", sort=False, as_index=False)
                .max()
                if len(self.conv_last)
                else part
            )
        orphans = empty_frame("orphans")
        if wm <= NEG_INF or not len(self.conv_last):
            return orphans
        horizon = wm - self.state_ttl_us
        last = self.conv_last["last_us"].to_numpy().astype(np.int64)
        expired_mask = last < horizon
        if expired_mask.any():
            expired = set(self.conv_last["conv_id"].to_numpy()[expired_mask])
            for c in expired:
                self.sess_next.pop(c, None)
                self.match_frontier.pop(c, None)
            if len(self.cep_tail):
                self.cep_tail = self.cep_tail[
                    ~self.cep_tail["conv_id"].isin(expired)
                ].reset_index(drop=True)
            if len(self.lag_carry):
                self.lag_carry = self.lag_carry[
                    ~self.lag_carry["conv_id"].isin(expired)
                ].reset_index(drop=True)
            if len(self.roll_carry):
                self.roll_carry = self.roll_carry[
                    ~self.roll_carry["conv_id"].isin(expired)
                ].reset_index(drop=True)
            self.conv_last = self.conv_last[~expired_mask].reset_index(drop=True)
        if len(self.pend_calls):
            call_old = self.pend_calls["ts_us"].to_numpy().astype(np.int64) < horizon
            if call_old.any():
                o = self.pend_calls[call_old].sort_values(
                    ["conv_id", "turn_idx"], kind="stable"
                )
                orphans = pd.DataFrame(
                    {
                        "conv_id": o["conv_id"].to_numpy(),
                        "call_id": o["call_id"].to_numpy(),
                        "call_turn_idx": o["turn_idx"].to_numpy().astype(np.int32),
                    }
                )
                self.pend_calls = self.pend_calls[~call_old].reset_index(drop=True)
        if len(self.pend_resps):
            resp_old = self.pend_resps["ts_us"].to_numpy().astype(np.int64) < horizon
            if resp_old.any():
                self.pend_resps = self.pend_resps[~resp_old].reset_index(drop=True)
        return orphans

    # ------------------------------------------------------ streaming LAG
    def _advance_latency(self, ready: pd.DataFrame) -> pd.DataFrame:
        """Per-turn response latency (streaming ``LAG(ts) OVER
        (PARTITION BY conv_id ORDER BY turn_idx)``): each processed
        turn's event-time gap to the PREVIOUS processed turn of its
        conversation, emitted incrementally as turns clear the
        watermark. One carried row per conversation (its last processed
        turn) makes gaps exact across close/epoch boundaries — the
        streaming counterpart of ``stages/window_fns.with_lag``.

        Assumes event time is non-decreasing in turn order within a
        conversation (the transcript data model; the watermark + dedup
        then guarantee each ready set extends a conv's processed prefix
        in turn order). Fully vectorized: one concat + lexsort of
        (carry + ready), gap by adjacent diff where the conv code
        repeats."""
        if not len(ready):
            return empty_frame("latency")
        new = pd.DataFrame(
            {
                "conv_id": ready["conv_id"].to_numpy(),
                "turn_idx": ready["turn_idx"].to_numpy().astype(np.int64),
                "ts_us": ready["ts_us"].to_numpy().astype(np.int64),
                "_new": True,
            }
        )
        if len(self.lag_carry):
            carry = self.lag_carry.assign(_new=False)
            both = pd.concat([carry, new], ignore_index=True)
        else:
            both = new
        codes, _ = pd.factorize(both["conv_id"].to_numpy(), sort=False)
        idx = np.lexsort((both["turn_idx"].to_numpy().astype(np.int64), codes))
        both = both.iloc[idx].reset_index(drop=True)
        codes = codes[idx]
        ts = both["ts_us"].to_numpy().astype(np.int64)
        n = len(both)
        same_prev = np.empty(n, dtype=bool)
        same_prev[0] = False
        same_prev[1:] = codes[1:] == codes[:-1]
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        emit = same_prev & both["_new"].to_numpy()
        out = pd.DataFrame(
            {
                "conv_id": both["conv_id"].to_numpy()[emit],
                "turn_idx": both["turn_idx"].to_numpy()[emit].astype(np.int32),
                "gap_us": gap[emit],
            }
        )
        last = np.empty(n, dtype=bool)
        last[-1] = True
        last[:-1] = codes[1:] != codes[:-1]
        self.lag_carry = both.loc[last, ["conv_id", "turn_idx", "ts_us"]].reset_index(
            drop=True
        )
        return out

    # ------------------------------------------------- streaming ROLLING
    def _advance_rolling(self, ready: pd.DataFrame) -> pd.DataFrame:
        """Trailing-``roll_window`` tool-call count per turn (streaming
        ``SUM(is_call) OVER (PARTITION BY conv_id ORDER BY turn_idx
        ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``), emitted
        incrementally as turns clear the watermark — the streaming
        counterpart of ``stages/window_fns.rolling_sum``. The carry is
        each conv's last (w - 1) processed rows' flags: exactly the
        state a trailing ROWS window needs, so emissions are identical
        to the bounded operator across any epoch decomposition. Same
        ordering contract and vectorization as ``_advance_latency``."""
        w = self.roll_window
        if not len(ready):
            return empty_frame("rolling")
        is_call = (
            (ready["tool"].to_numpy() != "")
            & (ready["role"].to_numpy() == "assistant")
        ).astype(np.int64)
        new = pd.DataFrame(
            {
                "conv_id": ready["conv_id"].to_numpy(),
                "turn_idx": ready["turn_idx"].to_numpy().astype(np.int64),
                "is_call": is_call,
                "_new": True,
            }
        )
        if len(self.roll_carry):
            both = pd.concat(
                [self.roll_carry.assign(_new=False), new], ignore_index=True
            )
        else:
            both = new
        codes, _ = pd.factorize(both["conv_id"].to_numpy(), sort=False)
        idx = np.lexsort((both["turn_idx"].to_numpy().astype(np.int64), codes))
        both = both.iloc[idx].reset_index(drop=True)
        codes = codes[idx]
        v = both["is_call"].to_numpy().astype(np.int64)
        n = len(both)
        cs = np.cumsum(v)
        new_grp = np.empty(n, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = codes[1:] != codes[:-1]
        starts = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
        # a carry holds exactly min(w-1, processed) rows per conv, so
        # clipping at the LOCAL group start equals clipping at the true
        # group start: young convs carry their whole history, old convs
        # never clip
        lo = np.maximum(starts, np.arange(n) - w + 1)
        roll = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        emit = both["_new"].to_numpy()
        out = pd.DataFrame(
            {
                "conv_id": both["conv_id"].to_numpy()[emit],
                "turn_idx": both["turn_idx"].to_numpy()[emit].astype(np.int32),
                "calls_last5": roll[emit].astype(np.int64),
            }
        )
        self.roll_carry = (
            both.groupby(codes, sort=False)
            .tail(w - 1)[["conv_id", "turn_idx", "is_call"]]
            .reset_index(drop=True)
        )
        return out

    def _advance_tool_counts(self, ready: pd.DataFrame) -> pd.DataFrame:
        """Per-tool call-count PARTIALS over this close's ready rows —
        the streaming feed of a global top-k/heavy-hitter aggregate
        (A8's streaming twin). Emitting decomposable partials instead
        of a running total keeps the channel append-only (exactly-once
        sink files are immutable) and the final ``SUM → top-k`` a
        bounded, channel-scale epilogue: each close contributes at most
        |tools| rows, and because ``ready`` is already deduped and
        watermark-gated, the summed channel equals the bounded operator
        over any epoch decomposition."""
        if not len(ready):
            return empty_frame("tool_counts")
        mask = (ready["tool"].to_numpy() != "") & (
            ready["role"].to_numpy() == "assistant"
        )
        if not mask.any():
            return empty_frame("tool_counts")
        out = (
            pd.DataFrame({"tool": ready["tool"].to_numpy()[mask]})
            .groupby("tool", sort=False, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype(np.int64)
        return out[["tool", "n"]]

    # ---------------------------------------------------- windowed counts
    def _advance_tumbling(self, ready: pd.DataFrame, wm: int, flush: bool) -> pd.DataFrame:
        """Per-(conv, tumbling window) counts, decomposable partials:
        ready rows fold into the open partial per window; a window is
        emitted once the watermark passes its end (no on-time row can
        land in it again — the W2 streaming analogue of
        stages/windows.tumbling_kernel)."""
        open_t = self.open_tumbles
        if len(ready):
            ts = ready["ts_us"].to_numpy().astype(np.int64)
            is_call = (
                (ready["tool"].to_numpy() != "") & (ready["role"].to_numpy() == "assistant")
            ).astype(np.int64)
            part = (
                pd.DataFrame(
                    {
                        "conv_id": ready["conv_id"].to_numpy(),
                        "ws_us": (ts // self.tumble_us) * self.tumble_us,
                        "turn_count": np.int64(1),
                        "tool_call_count": is_call,
                    }
                )
                .groupby(["conv_id", "ws_us"], sort=False, as_index=False)
                .sum()
            )
            open_t = (
                pd.concat([open_t, part], ignore_index=True)
                .groupby(["conv_id", "ws_us"], sort=False, as_index=False)
                .sum()
                if len(open_t)
                else part
            )
        emitted = empty_frame("tumbling")
        if len(open_t):
            ws = open_t["ws_us"].to_numpy().astype(np.int64)
            close_mask = np.full(len(open_t), flush) | (ws + self.tumble_us <= wm)
            if close_mask.any():
                done = open_t[close_mask]
                emitted = pd.DataFrame(
                    {
                        "conv_id": done["conv_id"].to_numpy(),
                        "window_start": done["ws_us"].to_numpy().astype(np.int64).astype("datetime64[us]"),
                        "turn_count": done["turn_count"].to_numpy().astype(np.int64),
                        "tool_call_count": done["tool_call_count"].to_numpy().astype(np.int64),
                    }
                )
                open_t = open_t[~close_mask]
        self.open_tumbles = open_t.reset_index(drop=True)
        return emitted

    def _advance_sliding(self, ready: pd.DataFrame, wm: int, flush: bool) -> pd.DataFrame:
        open_s = self.open_slides
        if len(ready):
            ts = ready["ts_us"].to_numpy().astype(np.int64)
            k_hi = ts // self.slide_step_us
            k_lo = (ts - self.slide_size_us) // self.slide_step_us + 1
            reps = (k_hi - k_lo + 1).astype(np.int64)
            conv = np.repeat(ready["conv_id"].to_numpy(), reps)
            offsets = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
            ws = (np.repeat(k_lo, reps) + offsets) * self.slide_step_us
            part = (
                pd.DataFrame({"conv_id": conv, "ws_us": ws, "turn_count": np.int64(1)})
                .groupby(["conv_id", "ws_us"], sort=False, as_index=False)
                .sum()
            )
            open_s = (
                pd.concat([open_s, part], ignore_index=True)
                .groupby(["conv_id", "ws_us"], sort=False, as_index=False)
                .sum()
                if len(open_s)
                else part
            )
        emitted = empty_frame("sliding")
        if len(open_s):
            ws = open_s["ws_us"].to_numpy().astype(np.int64)
            close_mask = np.full(len(open_s), flush) | (ws + self.slide_size_us <= wm)
            if close_mask.any():
                done = open_s[close_mask]
                emitted = pd.DataFrame(
                    {
                        "conv_id": done["conv_id"].to_numpy(),
                        "window_start": done["ws_us"].to_numpy().astype(np.int64).astype("datetime64[us]"),
                        "turn_count": done["turn_count"].to_numpy().astype(np.int64),
                    }
                )
                open_s = open_s[~close_mask]
        self.open_slides = open_s.reset_index(drop=True)
        return emitted

    # -------------------------------------------------------------- dedup
    def _dedup(self, ready: pd.DataFrame, wm: int) -> pd.DataFrame:
        if not len(ready):
            return ready
        n0 = len(ready)
        ready = ready.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")
        if len(self.processed_keys):
            seen = pd.MultiIndex.from_frame(self.processed_keys[["conv_id", "turn_idx"]])
            keys = pd.MultiIndex.from_frame(ready[["conv_id", "turn_idx"]])
            ready = ready[~keys.isin(seen)]
        self.metrics["dups_dropped"] += n0 - len(ready)
        new_keys = pd.DataFrame(
            {
                "conv_id": ready["conv_id"].to_numpy(),
                "turn_idx": ready["turn_idx"].to_numpy(),
                "ts_us": ready["ts_us"].to_numpy(),
            }
        )
        pk = pd.concat([self.processed_keys, new_keys], ignore_index=True)
        if wm > NEG_INF:
            # duplicates arrive within the watermark horizon (generator /
            # source contract); older keys can be forgotten
            pk = pk[pk["ts_us"].to_numpy().astype(np.int64) >= wm - self.dedup_horizon_us]
        self.processed_keys = pk.reset_index(drop=True)
        return ready

    # ----------------------------------------------------------- sessions
    def _advance_sessions(self, ready: pd.DataFrame, wm: int, flush: bool) -> pd.DataFrame:
        gap = self.gap_us
        open_s = self.open_sess
        emitted: list[pd.DataFrame] = []
        if len(ready):
            conv = ready["conv_id"].to_numpy()
            ts = ready["ts_us"].to_numpy().astype(np.int64)
            tidx = ready["turn_idx"].to_numpy()
            n = len(ready)
            is_new = np.empty(n, dtype=bool)
            is_new[0] = True
            is_new[1:] = (conv[1:] != conv[:-1]) | (ts[1:] - ts[:-1] > gap)
            starts = np.flatnonzero(is_new)
            ends = np.append(starts[1:], n) - 1
            isl = pd.DataFrame(
                {
                    "conv_id": conv[starts],
                    "start_us": ts[starts],
                    "end_us": ts[ends],
                    "turn_count": (ends - starts + 1).astype(np.int64),
                    "first_idx": tidx[starts],
                    "last_idx": tidx[ends],
                }
            )
            isl["ord"] = isl.groupby("conv_id", sort=False).cumcount()
            # merge carry-in: first island of a conv continues the open
            # session iff the gap to it is within bounds
            if len(open_s):
                isl = isl.merge(
                    open_s.add_prefix("o_").rename(columns={"o_conv_id": "conv_id"}),
                    on="conv_id",
                    how="left",
                )
            else:
                for c in _OPEN_COLS[1:]:
                    isl["o_" + c] = np.nan
            has_open = isl["o_session_id"].notna()
            merges = (
                has_open
                & (isl["ord"] == 0)
                & (isl["start_us"] - isl["o_end_us"] <= gap)
            )
            # carried sessions not merged were ended by a later gap → emit
            # (only for convs that appear in ready)
            stale_open = isl[(isl["ord"] == 0) & has_open & ~merges]
            if len(stale_open):
                emitted.append(
                    pd.DataFrame(
                        {
                            "conv_id": stale_open["conv_id"],
                            "session_id": stale_open["o_session_id"].astype(np.int64),
                            "start_us": stale_open["o_start_us"].astype(np.int64),
                            "end_us": stale_open["o_end_us"].astype(np.int64),
                            "turn_count": stale_open["o_turn_count"].astype(np.int64),
                            "first_idx": stale_open["o_first_idx"].astype(np.int64),
                            "last_idx": stale_open["o_last_idx"].astype(np.int64),
                        }
                    )
                )
            # fold merged carry into island 0
            m = merges.to_numpy()
            if m.any():
                isl.loc[m, "start_us"] = isl.loc[m, "o_start_us"].astype(np.int64)
                isl.loc[m, "turn_count"] = (
                    isl.loc[m, "turn_count"] + isl.loc[m, "o_turn_count"].astype(np.int64)
                )
                isl.loc[m, "first_idx"] = isl.loc[m, "o_first_idx"].astype(np.int64)
            # session ids: base = merged carry id, else per-conv counter
            base = np.where(
                m,
                isl["o_session_id"].astype("float64").fillna(0.0).to_numpy(),
                np.array([self.sess_next.get(c, 0) for c in isl["conv_id"]], dtype=np.int64),
            ).astype(np.int64)
            # base is only meaningful at ord==0; ids = base(conv) + ord
            first_base = pd.Series(base).groupby(isl["conv_id"].to_numpy(), sort=False).transform("first")
            isl["session_id"] = first_base.to_numpy() + isl["ord"].to_numpy()
            # last island per conv stays open; previous ones are closed
            is_last = isl.groupby("conv_id", sort=False)["ord"].transform("max") == isl["ord"]
            closed = isl[~is_last]
            if len(closed):
                emitted.append(
                    closed[["conv_id", "session_id", "start_us", "end_us", "turn_count", "first_idx", "last_idx"]]
                )
            new_open = isl[is_last][
                ["conv_id", "session_id", "start_us", "end_us", "turn_count", "first_idx", "last_idx"]
            ].rename(columns={})
            # update sess counters for convs seen this round
            nxt = isl[is_last][["conv_id", "session_id"]]
            for c, s in zip(nxt["conv_id"], nxt["session_id"]):
                self.sess_next[c] = int(s) + 1
            # open sessions of convs not seen this round are untouched
            if len(open_s):
                untouched = open_s[~open_s["conv_id"].isin(set(isl["conv_id"]))]
            else:
                untouched = open_s
            open_s = pd.concat([untouched, new_open], ignore_index=True)
        # watermark/flush close of open sessions
        if len(open_s):
            end_us = open_s["end_us"].to_numpy().astype(np.int64)
            to_close = np.full(len(open_s), flush) | (wm > end_us + gap)
            if to_close.any():
                emitted.append(open_s[to_close])
                open_s = open_s[~to_close]
        self.open_sess = open_s.reset_index(drop=True)
        if not emitted:
            return empty_frame("sessions")
        out = pd.concat(emitted, ignore_index=True)
        return pd.DataFrame(
            {
                "conv_id": out["conv_id"].to_numpy(),
                "session_id": out["session_id"].to_numpy().astype(np.int64),
                "window_start": out["start_us"].to_numpy().astype(np.int64).astype("datetime64[us]"),
                "window_end": out["end_us"].to_numpy().astype(np.int64).astype("datetime64[us]"),
                "turn_count": out["turn_count"].to_numpy().astype(np.int64),
                "first_turn_idx": out["first_idx"].to_numpy().astype(np.int32),
                "last_turn_idx": out["last_idx"].to_numpy().astype(np.int32),
            }
        )

    # ---------------------------------------------------------------- CEP
    def _advance_cep(self, ready: pd.DataFrame) -> pd.DataFrame:
        plen = len(self.pattern.roles)
        if not len(ready):
            return empty_frame("matches")
        active = set(ready["conv_id"].unique())
        if len(self.cep_tail):
            tmask = self.cep_tail["conv_id"].isin(active).to_numpy()
            tails_in, tails_out = self.cep_tail[tmask], self.cep_tail[~tmask]
        else:
            tails_in, tails_out = self.cep_tail, self.cep_tail
        stream = pd.concat(
            [
                tails_in.assign(is_tail=True),
                pd.DataFrame(
                    {
                        "conv_id": ready["conv_id"].to_numpy(),
                        "role": ready["role"].to_numpy(),
                        "turn_idx": ready["turn_idx"].to_numpy(),
                        "is_tail": False,
                    }
                ),
            ],
            ignore_index=True,
        ).sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = stream["conv_id"].to_numpy()
        role = stream["role"].to_numpy()
        tidx = stream["turn_idx"].to_numpy().astype(np.int64)
        is_tail = stream["is_tail"].to_numpy()
        n = len(stream)
        # update tails: last plen-1 rows per active conv (+ untouched)
        new_tails = (
            stream.groupby("conv_id", sort=False)
            .tail(plen - 1)[["conv_id", "role", "turn_idx"]]
            .reset_index(drop=True)
        )
        self.cep_tail = pd.concat([tails_out, new_tails], ignore_index=True)
        if n < plen:
            return empty_frame("matches")
        m = n - plen + 1
        ok = conv[:m] == conv[plen - 1 :]
        ok &= (tidx[plen - 1 :] - tidx[:m]) == plen - 1
        ok &= ~is_tail[plen - 1 :]  # end must be a NEW row
        for j, r in enumerate(self.pattern.roles):
            ok &= role[j : m + j] == r
        cand = np.flatnonzero(ok)
        suppress = self.pattern.skip_past_last or self.pattern.suppress_turns
        kept: list[int] = []
        if suppress:
            for s in cand:
                c = conv[s]
                frontier = self.match_frontier.get(c)
                if frontier is None or tidx[s] > frontier + self.pattern.suppress_turns:
                    kept.append(s)
                    self.match_frontier[c] = int(tidx[s + plen - 1])
        else:
            kept = list(cand)
        if not kept:
            return empty_frame("matches")
        k = np.asarray(kept)
        return pd.DataFrame(
            {
                "conv_id": conv[k],
                "pattern": self.pattern.label(),
                "start_turn_idx": tidx[k].astype(np.int32),
                "end_turn_idx": tidx[k + plen - 1].astype(np.int32),
            }
        )

    # --------------------------------------------------------------- join
    def _advance_join(self, ready: pd.DataFrame, flush: bool) -> tuple[pd.DataFrame, pd.DataFrame]:
        if len(ready):
            has_id = ready["call_id"].to_numpy() != ""
            is_call = has_id & (ready["tool"].to_numpy() != "") & (ready["role"].to_numpy() == "assistant")
            is_resp = has_id & (ready["role"].to_numpy() == "tool")
            calls_new = ready[is_call][["conv_id", "call_id", "tool", "turn_idx", "ts_us"]]
            resps_new = ready[is_resp][["conv_id", "call_id", "turn_idx", "ts_us"]]
            calls = pd.concat([self.pend_calls, calls_new], ignore_index=True)
            resps = pd.concat([self.pend_resps, resps_new], ignore_index=True)
        else:
            calls, resps = self.pend_calls, self.pend_resps
        pairs = empty_frame("pairs")
        if len(calls) and len(resps):
            j = calls.merge(
                resps.rename(columns={"turn_idx": "resp_turn_idx", "ts_us": "resp_ts_us"}),
                on=["conv_id", "call_id"],
                how="inner",
            )
            j = j[j["resp_turn_idx"].to_numpy() > j["turn_idx"].to_numpy()]
            if len(j):
                j = j.sort_values(["conv_id", "call_id", "resp_turn_idx"], kind="stable")
                j = j.drop_duplicates(subset=["conv_id", "call_id"], keep="first")
                pairs = pd.DataFrame(
                    {
                        "conv_id": j["conv_id"].to_numpy(),
                        "call_id": j["call_id"].to_numpy(),
                        "tool": j["tool"].to_numpy(),
                        "call_turn_idx": j["turn_idx"].to_numpy().astype(np.int32),
                        "resp_turn_idx": j["resp_turn_idx"].to_numpy().astype(np.int32),
                        "call_ts": j["ts_us"].to_numpy().astype(np.int64).astype("datetime64[us]"),
                        "resp_ts": j["resp_ts_us"].to_numpy().astype(np.int64).astype("datetime64[us]"),
                    }
                )
                done = pd.MultiIndex.from_frame(j[["conv_id", "call_id"]])
                calls = calls[~pd.MultiIndex.from_frame(calls[["conv_id", "call_id"]]).isin(done)]
                resps = resps[~pd.MultiIndex.from_frame(resps[["conv_id", "call_id"]]).isin(done)]
        orphans = empty_frame("orphans")
        if flush:
            if len(calls):
                o = calls.sort_values(["conv_id", "turn_idx"], kind="stable")
                orphans = pd.DataFrame(
                    {
                        "conv_id": o["conv_id"].to_numpy(),
                        "call_id": o["call_id"].to_numpy(),
                        "call_turn_idx": o["turn_idx"].to_numpy().astype(np.int32),
                    }
                )
            calls = self.pend_calls.iloc[0:0]
            resps = self.pend_resps.iloc[0:0]
        self.pend_calls = calls.reset_index(drop=True)
        self.pend_resps = resps.reset_index(drop=True)
        return pairs, orphans

    # -------------------------------------------------------- checkpoint
    def snapshot(self) -> bytes:
        return pickle.dumps(self.__dict__)

    @classmethod
    def restore(cls, blob: bytes) -> "ShardState":
        d = pickle.loads(blob)
        s = cls.__new__(cls)
        s.__dict__.update(d)
        # forward-compat with checkpoints written before the latency /
        # rolling channels existed (resume across an engine upgrade)
        if "lag_carry" not in s.__dict__:
            s.lag_carry = _empty(["conv_id", "turn_idx", "ts_us"])
        s.metrics.setdefault("latency_emitted", 0)
        if "roll_carry" not in s.__dict__:
            s.roll_window = 5
            s.roll_carry = _empty(["conv_id", "turn_idx", "is_call"])
        s.metrics.setdefault("rolling_emitted", 0)
        s.metrics.setdefault("tool_counts_emitted", 0)
        if "emit_channels" not in s.__dict__:
            s.emit_channels = {"tumbling", "sliding", "latency", "rolling"}
        return s


def reshard_states(blobs: list[bytes], num_shards: int, hash_fn) -> list[bytes]:
    """Redistribute checkpointed shard states across a different shard
    count (resume on an N→4N cluster): every conv-keyed structure is
    split by the same stable hash the router uses."""
    states = [pickle.loads(b) for b in blobs]
    outs = []
    for i in range(num_shards):
        s = ShardState()
        if states:
            s.gap_us = states[0]["gap_us"]
            s.pattern = states[0]["pattern"]
            s.dedup_horizon_us = states[0]["dedup_horizon_us"]
            s.tumble_us = states[0]["tumble_us"]
            s.slide_size_us = states[0]["slide_size_us"]
            s.slide_step_us = states[0]["slide_step_us"]
            s.state_ttl_us = states[0]["state_ttl_us"]
            s.emit_turns = states[0]["emit_turns"]
            s.roll_window = states[0].get("roll_window", 5)
            s.emit_channels = set(
                states[0].get(
                    "emit_channels", {"tumbling", "sliding", "latency", "rolling"}
                )
            )
            s.max_ts = max(st["max_ts"] for st in states)
            s.frontier_wm = max(st["frontier_wm"] for st in states)
            if i == 0:  # cumulative metrics live on shard 0 after reshard
                for st in states:
                    for k, v in st["metrics"].items():
                        s.metrics[k] = s.metrics.get(k, 0) + v
        outs.append(s)

    def split_df(df: pd.DataFrame):
        if not len(df):
            return
        sid = (hash_fn(df["conv_id"].to_numpy()) % num_shards).astype(np.int64)
        for i in range(num_shards):
            part = df[sid == i]
            if len(part):
                yield i, part.reset_index(drop=True)

    for st in states:
        pend = st["pending"]
        if pend:
            for i, part in split_df(pd.concat(pend, ignore_index=True)):
                outs[i].pending.append(part)
        for attr in (
            "processed_keys",
            "open_sess",
            "cep_tail",
            "pend_calls",
            "pend_resps",
            "open_tumbles",
            "open_slides",
            "lag_carry",
            "roll_carry",
            "conv_last",
        ):
            # .get: checkpoints from before a channel existed lack its
            # carry — reshard treats that as empty, like restore()
            for i, part in split_df(st.get(attr, pd.DataFrame())):
                cur = getattr(outs[i], attr)
                setattr(outs[i], attr, pd.concat([cur, part], ignore_index=True))
        for attr in ("sess_next", "match_frontier"):
            d = st[attr]
            if d:
                keys = np.array(list(d.keys()), dtype=object)
                sid = (hash_fn(keys) % num_shards).astype(np.int64)
                for k, i in zip(keys, sid):
                    getattr(outs[int(i)], attr)[k] = d[k]
    return [pickle.dumps(s.__dict__) for s in outs]
