"""Per-shard streaming state core (pure Python/numpy — no Ray).

The streaming analogue of the reference's in-process session state:
``ClassificationObject`` accumulators keyed by tracker id
(``utils/ClassificationObject.py:84-248``) plus the driver counters
(``services/harvest_service.py:26-29``), generalized to per-conv_id
state with event-time watermarks:

- out-of-order buffer per conv (W3): turns with ts > watermark wait;
  on ``close(wm)`` the ready prefix is processed in turn_idx order,
- session windows with gap (W2), closed when wm > window_end + gap,
- exact dedup via per-conv seen turn_idx sets (D2 made exact),
- symmetric tool-call ↔ response join on (conv_id, call_id) within
  watermark bounds (J3 generalization); orphans emitted at flush,
- NFA role-sequence CEP with after-match suppression (W4/W5); a tiny
  per-conv residue (suppression frontier + role tail) survives state
  eviction so suppression is exact across session gaps,
- late rows (ts < wm at ingest) are evicted to a late channel (W7).

Scale notes: a shard holds only open state; closed windows are emitted
and dropped eagerly. One shard's keyspace is hash(conv_id) % B —
B scales with the cluster. Mega-conversations: state per conv is O(open
window + buffered turns), not O(history); the CEP residue is 3 ints.
``snapshot()``/``restore()`` give checkpoint/resume (SURVEY §7.9).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..schema import DEFAULT_SESSION_GAP_S
from ..stages.cep import PatternSpec

US = 1_000_000
NEG_INF = np.iinfo(np.int64).min


@dataclass
class ConvState:
    # out-of-order buffer: turn_idx -> (role, ts_us, tool, call_id, text)
    buffer: dict[int, tuple] = field(default_factory=dict)
    seen: set[int] = field(default_factory=set)
    # open session accumulator
    sess_start: int | None = None
    sess_end: int = NEG_INF
    sess_count: int = 0
    sess_first_idx: int = 0
    sess_last_idx: int = 0
    sess_id: int = -1  # id of the OPEN session (-1: none yet)
    next_session_id: int = 0
    # CEP: tail of last (plen-1) processed (role, turn_idx) + suppression
    cep_tail: list[tuple[str, int]] = field(default_factory=list)
    last_match_end: int = -(10**9)
    # join: call_id -> (tool, turn_idx, ts_us) for unanswered calls
    pending_calls: dict[str, tuple] = field(default_factory=dict)
    # responses that arrived before their call (arrival disorder)
    pending_resps: dict[str, tuple] = field(default_factory=dict)


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
}


def empty_frame(channel: str) -> pd.DataFrame:
    return pd.DataFrame(
        {c: pd.Series(dtype=t) for c, t in EMPTY_SCHEMAS[channel].items()}
    )


class ShardState:
    """State for one hash(conv_id) shard of the keyspace."""

    def __init__(
        self,
        gap_s: int = DEFAULT_SESSION_GAP_S,
        pattern: PatternSpec | None = None,
    ):
        self.gap_us = gap_s * US
        self.pattern = pattern or PatternSpec(skip_past_last=True, suppress_turns=0)
        self.convs: dict[str, ConvState] = {}
        self.max_ts = NEG_INF  # max event ts seen by this shard
        self.frontier_wm = NEG_INF  # last watermark applied
        self.metrics = {
            "rows_in": 0,
            "dups_dropped": 0,
            "late_rows": 0,
            "sessions_emitted": 0,
            "matches_emitted": 0,
            "pairs_emitted": 0,
        }

    # ------------------------------------------------------------ ingest
    def ingest(self, df: pd.DataFrame) -> pd.DataFrame:
        """Buffer an epoch's rows for this shard. Rows with
        ts < current watermark are returned as the late channel."""
        self.metrics["rows_in"] += len(df)
        if df.empty:
            return empty_frame("late")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        late_mask = ts < self.frontier_wm
        late = df[late_mask]
        self.metrics["late_rows"] += int(late_mask.sum())
        ok = df[~late_mask]
        ts_ok = ts[~late_mask]
        if len(ts_ok):
            self.max_ts = max(self.max_ts, int(ts_ok.max()))
        conv_arr = ok["conv_id"].to_numpy()
        tidx_arr = ok["turn_idx"].to_numpy()
        role_arr = ok["role"].to_numpy()
        tool_arr = ok["tool"].to_numpy()
        cid_arr = ok["call_id"].to_numpy() if "call_id" in ok else np.full(len(ok), "")
        for i in range(len(ok)):
            cs = self.convs.get(conv_arr[i])
            if cs is None:
                cs = self.convs[conv_arr[i]] = ConvState()
            t = int(tidx_arr[i])
            if t in cs.seen:
                self.metrics["dups_dropped"] += 1
                continue
            cs.seen.add(t)
            cs.buffer[t] = (role_arr[i], int(ts_ok[i]), tool_arr[i], cid_arr[i])
        return late.drop(columns=[c for c in ("is_tool_call", "call_id", "bucket") if c in late])

    # ------------------------------------------------------------- close
    def close(self, wm: int, flush: bool = False) -> dict[str, pd.DataFrame]:
        """Advance the watermark: process buffered turns with ts <= wm in
        turn order, emit closed sessions / CEP matches / join pairs;
        at ``flush`` emit open sessions and orphan calls too."""
        self.frontier_wm = max(self.frontier_wm, wm)
        out: dict[str, list] = {"sessions": [], "matches": [], "pairs": [], "orphans": []}
        plen = len(self.pattern.roles)
        evict: list[str] = []
        for conv_id, cs in self.convs.items():
            ready = (
                sorted(cs.buffer.items())
                if flush
                else sorted((t, v) for t, v in cs.buffer.items() if v[1] <= wm)
            )
            for t, (role, ts_us, tool, call_id) in ready:
                del cs.buffer[t]
                # ---- session accumulation (W2)
                if cs.sess_start is None:
                    cs.sess_id = cs.next_session_id
                    cs.next_session_id += 1
                    cs.sess_start, cs.sess_end = ts_us, ts_us
                    cs.sess_count, cs.sess_first_idx, cs.sess_last_idx = 1, t, t
                elif ts_us - cs.sess_end > self.gap_us:
                    out["sessions"].append(self._emit_session(conv_id, cs))
                    cs.sess_id = cs.next_session_id
                    cs.next_session_id += 1
                    cs.sess_start, cs.sess_end = ts_us, ts_us
                    cs.sess_count, cs.sess_first_idx, cs.sess_last_idx = 1, t, t
                else:
                    cs.sess_end = max(cs.sess_end, ts_us)
                    cs.sess_count += 1
                    cs.sess_last_idx = t
                # ---- CEP (W5 + W4 suppression)
                cs.cep_tail.append((role, t))
                if len(cs.cep_tail) > plen:
                    cs.cep_tail = cs.cep_tail[-plen:]
                if len(cs.cep_tail) == plen:
                    roles = tuple(r for r, _ in cs.cep_tail)
                    idxs = [i for _, i in cs.cep_tail]
                    if (
                        roles == self.pattern.roles
                        and idxs[-1] - idxs[0] == plen - 1
                        and (
                            not (self.pattern.skip_past_last or self.pattern.suppress_turns)
                            or idxs[0] > cs.last_match_end + self.pattern.suppress_turns
                        )
                    ):
                        out["matches"].append(
                            (conv_id, self.pattern.label(), np.int32(idxs[0]), np.int32(idxs[-1]))
                        )
                        cs.last_match_end = idxs[-1]
                # ---- symmetric join (J3)
                if call_id:
                    if tool and role == "assistant":  # call side
                        if call_id in cs.pending_resps:
                            r_idx, r_ts = cs.pending_resps[call_id]
                            if r_idx > t:
                                del cs.pending_resps[call_id]
                                out["pairs"].append(
                                    (conv_id, call_id, tool, np.int32(t), np.int32(r_idx), ts_us, r_ts)
                                )
                            else:
                                cs.pending_calls[call_id] = (tool, t, ts_us)
                        elif call_id not in cs.pending_calls:
                            cs.pending_calls[call_id] = (tool, t, ts_us)
                    elif role == "tool":  # response side
                        if call_id in cs.pending_calls:
                            c_tool, c_idx, c_ts = cs.pending_calls[call_id]
                            if t > c_idx:
                                del cs.pending_calls[call_id]
                                out["pairs"].append(
                                    (conv_id, call_id, c_tool, np.int32(c_idx), np.int32(t), c_ts, ts_us)
                                )
                        elif call_id not in cs.pending_resps:
                            cs.pending_resps[call_id] = (t, ts_us)
            # ---- session close on watermark (or flush)
            if cs.sess_start is not None and (flush or wm > cs.sess_end + self.gap_us):
                out["sessions"].append(self._emit_session(conv_id, cs))
                cs.sess_start = None
            if flush:
                for call_id, (tool, c_idx, _c_ts) in sorted(
                    cs.pending_calls.items(), key=lambda kv: kv[1][1]
                ):
                    out["orphans"].append((conv_id, call_id, np.int32(c_idx)))
                cs.pending_calls.clear()
                cs.pending_resps.clear()
            # ---- eviction of idle convs (bounded state): keep only the
            # CEP residue once nothing is open or buffered
            if (
                cs.sess_start is None
                and not cs.buffer
                and not cs.pending_calls
                and not cs.pending_resps
                and not flush
            ):
                # prune the dedup seen-set: dups arrive within the
                # watermark horizon (generator bound), safe to drop
                cs.seen.clear()
                if not cs.cep_tail and cs.last_match_end < 0:
                    evict.append(conv_id)
        for conv_id in evict:
            del self.convs[conv_id]

        self.metrics["sessions_emitted"] += len(out["sessions"])
        self.metrics["matches_emitted"] += len(out["matches"])
        self.metrics["pairs_emitted"] += len(out["pairs"])
        return {
            "sessions": _frame(out["sessions"], "sessions"),
            "matches": _frame(out["matches"], "matches"),
            "pairs": _frame(out["pairs"], "pairs"),
            "orphans": _frame(out["orphans"], "orphans"),
        }

    def _emit_session(self, conv_id: str, cs: ConvState) -> tuple:
        return (
            conv_id,
            np.int64(cs.sess_id),
            cs.sess_start,
            cs.sess_end,
            np.int64(cs.sess_count),
            np.int32(cs.sess_first_idx),
            np.int32(cs.sess_last_idx),
        )

    # -------------------------------------------------------- checkpoint
    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "gap_us": self.gap_us,
                "pattern": self.pattern,
                "convs": self.convs,
                "max_ts": self.max_ts,
                "frontier_wm": self.frontier_wm,
                "metrics": self.metrics,
            }
        )

    @classmethod
    def restore(cls, blob: bytes) -> "ShardState":
        d = pickle.loads(blob)
        s = cls()
        s.gap_us = d["gap_us"]
        s.pattern = d["pattern"]
        s.convs = d["convs"]
        s.max_ts = d["max_ts"]
        s.frontier_wm = d["frontier_wm"]
        s.metrics = d["metrics"]
        return s


def _frame(rows: list[tuple], channel: str) -> pd.DataFrame:
    if not rows:
        return empty_frame(channel)
    cols = list(EMPTY_SCHEMAS[channel])
    df = pd.DataFrame(rows, columns=cols)
    for c, t in EMPTY_SCHEMAS[channel].items():
        if t == "datetime64[us]" and df[c].dtype != "datetime64[us]":
            df[c] = pd.to_datetime(df[c], unit="us").astype("datetime64[us]")
        elif t in (np.int32, np.int64):
            df[c] = df[c].astype(t)
    return df
