"""Single-process reference implementation (golden oracle).

The analogue of the reference's ``single-shot.py`` test mode
(/root/reference/single-shot.py:16-62, README.md:67): the same
semantics as the Ray engine, written as plain pandas over one process,
processing rows in arrival (file) order. Conformance tests require the
Ray engine's committed output to equal these rows exactly
(BASELINE.json: "identical output rows for the same input stream +
watermark, per-turn text equality under stable turn ordering").

No Ray imports here — this module must run standalone.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..schema import DEFAULT_SESSION_GAP_S, DEFAULT_WATERMARK_DELAY_S

CALL_ID_RE = re.compile(r"\[(call-[^\]]+)\]")


# ---------------------------------------------------------------- normalize
def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Derive ``is_tool_call`` / ``call_id`` (reference scorer-stage
    analogue, condition.py:20-37): parse the call-id token out of
    ``text``; a tool *call* is an assistant turn with a tool set."""
    out = df.copy()
    out["is_tool_call"] = (out["tool"] != "") & (out["role"] == "assistant")
    out["call_id"] = out["text"].str.extract(CALL_ID_RE, expand=False).fillna("")
    return out


# ------------------------------------------------------------------- dedup
def dedup_keep_first(df: pd.DataFrame) -> pd.DataFrame:
    """Exact dedup on (conv_id, turn_idx), keep first arrival
    (reference near-dup suppression D2, condition.py:66-77, made exact
    per input_hint: duplicates are byte-identical rows)."""
    return df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first").reset_index(
        drop=True
    )


def _ordered(df: pd.DataFrame) -> pd.DataFrame:
    return dedup_keep_first(df).sort_values(["conv_id", "turn_idx"], kind="stable")


# ----------------------------------------------------------------- windows
def session_windows(
    df: pd.DataFrame, gap_s: int = DEFAULT_SESSION_GAP_S
) -> pd.DataFrame:
    """Session windows per conv_id with gap on event time ``ts``
    (reference per-video session scoping W2, harvest_service.py:160-196,
    generalized to a configurable gap). Boundary rule: a gap strictly
    greater than ``gap_s`` starts a new session."""
    d = _ordered(df)
    ts = d["ts"].astype("int64")
    new_conv = d["conv_id"].ne(d["conv_id"].shift())
    gap = ts - ts.shift()
    new_sess = (new_conv | (gap > gap_s * 1_000_000)).astype(np.int64)
    sess_global = new_sess.cumsum()
    d = d.assign(_sess=sess_global)
    g = d.groupby(["conv_id", "_sess"], sort=True)
    out = g.agg(
        window_start=("ts", "min"),
        window_end=("ts", "max"),
        turn_count=("ts", "size"),
        first_turn_idx=("turn_idx", "min"),
        last_turn_idx=("turn_idx", "max"),
    ).reset_index()
    out["session_id"] = out.groupby("conv_id").cumcount().astype(np.int64)
    out["turn_count"] = out["turn_count"].astype(np.int64)
    return out[
        [
            "conv_id",
            "session_id",
            "window_start",
            "window_end",
            "turn_count",
            "first_turn_idx",
            "last_turn_idx",
        ]
    ].reset_index(drop=True)


def tumbling_windows(df: pd.DataFrame, size_s: int = 600) -> pd.DataFrame:
    """Fixed (tumbling) event-time windows per conv: turn count and
    tool-call count per bucket."""
    d = normalize(_ordered(df))
    us = size_s * 1_000_000
    wstart = (d["ts"].astype("int64") // us) * us
    d = d.assign(window_start=pd.to_datetime(wstart, unit="us"))
    out = (
        d.groupby(["conv_id", "window_start"], sort=True)
        .agg(
            turn_count=("ts", "size"),
            tool_call_count=("is_tool_call", "sum"),
        )
        .reset_index()
    )
    out["turn_count"] = out["turn_count"].astype(np.int64)
    out["tool_call_count"] = out["tool_call_count"].astype(np.int64)
    return out


def sliding_windows(
    df: pd.DataFrame, size_s: int = 600, slide_s: int = 300
) -> pd.DataFrame:
    """Sliding event-time windows (size, slide) per conv: each row
    belongs to windows with start in (ts-size, ts], start % slide == 0."""
    d = _ordered(df)
    ts = d["ts"].astype("int64").to_numpy()
    size, slide = size_s * 1_000_000, slide_s * 1_000_000
    k_hi = ts // slide  # last window index containing the row
    k_lo = (ts - size) // slide + 1
    counts = (k_hi - k_lo + 1).astype(np.int64)
    conv = np.repeat(d["conv_id"].to_numpy(), counts)
    base = np.repeat(k_lo, counts)
    offs = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.array([], np.int64)
    wstart = (base + offs) * slide
    out = (
        pd.DataFrame({"conv_id": conv, "window_start": pd.to_datetime(wstart, unit="us")})
        .groupby(["conv_id", "window_start"], sort=True)
        .size()
        .rename("turn_count")
        .astype(np.int64)
        .reset_index()
    )
    return out


# -------------------------------------------------------------------- join
def tool_join(df: pd.DataFrame) -> pd.DataFrame:
    """Correlate tool-call turns with their response turns on
    (conv_id, call_id) — the generalization of the reference's
    same-frame multi-source correlation J3
    (projects/helmet/helmet_project.py:25-55)."""
    d = normalize(_ordered(df))
    calls = d[d["is_tool_call"] & (d["call_id"] != "")]
    resps = d[(d["role"] == "tool") & (d["call_id"] != "")]
    j = calls.merge(
        resps, on=["conv_id", "call_id"], suffixes=("_c", "_r"), how="inner"
    )
    j = j[j["turn_idx_r"] > j["turn_idx_c"]]
    # First response per call (stable by resp turn_idx).
    j = j.sort_values(["conv_id", "call_id", "turn_idx_r"], kind="stable")
    j = j.drop_duplicates(subset=["conv_id", "call_id"], keep="first")
    out = pd.DataFrame(
        {
            "conv_id": j["conv_id"],
            "call_id": j["call_id"],
            "tool": j["tool_c"],
            "call_turn_idx": j["turn_idx_c"],
            "resp_turn_idx": j["turn_idx_r"],
            "call_ts": j["ts_c"],
            "resp_ts": j["ts_r"],
        }
    )
    return out.sort_values(["conv_id", "call_turn_idx"], kind="stable").reset_index(
        drop=True
    )


def response_latency(df: pd.DataFrame) -> pd.DataFrame:
    """Per-turn gap to the previous turn of the same conversation
    (LAG(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) over
    deduped rows); first turns (no predecessor) are dropped."""
    d = _ordered(df).reset_index(drop=True)
    ts = d["ts"].astype("int64")
    same = d["conv_id"].eq(d["conv_id"].shift()).to_numpy()
    gap = (ts.to_numpy() - np.roll(ts.to_numpy(), 1))[same]
    out = d[same]
    return pd.DataFrame(
        {
            "conv_id": out["conv_id"].to_numpy(),
            "turn_idx": out["turn_idx"].to_numpy().astype(np.int32),
            "gap_us": gap.astype(np.int64),
        }
    ).reset_index(drop=True)


def rolling_tool_rate(df: pd.DataFrame, window: int = 5) -> pd.DataFrame:
    """Trailing-``window`` tool-call count per turn (SUM(is_call) OVER
    (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW) over deduped rows)."""
    d = _ordered(df).reset_index(drop=True)
    is_call = (
        (d["tool"].to_numpy() != "") & (d["role"].to_numpy() == "assistant")
    ).astype(np.int64)
    roll = (
        pd.Series(is_call)
        .groupby(d["conv_id"].to_numpy())
        .rolling(window, min_periods=1)
        .sum()
        .reset_index(drop=True)
        .to_numpy()
        .astype(np.int64)
    )
    return pd.DataFrame(
        {
            "conv_id": d["conv_id"].to_numpy(),
            "turn_idx": d["turn_idx"].to_numpy().astype(np.int32),
            "calls_last5": roll,
        }
    )


def orphan_calls(df: pd.DataFrame) -> pd.DataFrame:
    """Tool calls with no response (anti-join; FIXTURES.md F3.6)."""
    d = normalize(_ordered(df))
    calls = d[d["is_tool_call"] & (d["call_id"] != "")]
    answered = tool_join(df)[["conv_id", "call_id"]]
    m = calls.merge(answered, on=["conv_id", "call_id"], how="left", indicator=True)
    out = m.loc[m["_merge"] == "left_only", ["conv_id", "call_id", "turn_idx"]].rename(
        columns={"turn_idx": "call_turn_idx"}
    )
    return out.sort_values(["conv_id", "call_turn_idx"], kind="stable").reset_index(
        drop=True
    )


# --------------------------------------------------------------------- CEP
def cep_matches(
    df: pd.DataFrame,
    pattern: tuple[str, ...] = ("user", "assistant", "tool"),
    skip_past_last: bool = False,
    suppress_turns: int = 0,
) -> pd.DataFrame:
    """NFA role-sequence pattern over per-conv turn order (W5).

    ``skip_past_last`` is SKIP_PAST_LAST_EVENT: matches starting before
    the previous match's end are suppressed. ``suppress_turns`` is the
    reference's after-match suppression (FRAMES_SKIP_AFTER_DETECT=50,
    harvest_service.py:228): additionally suppress matches starting
    within N turns *after* the previous match's end."""
    d = _ordered(df)
    conv = d["conv_id"].to_numpy()
    role = d["role"].to_numpy()
    tidx = d["turn_idx"].to_numpy()
    n, plen = len(d), len(pattern)
    if n < plen:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=str),
                "start_turn_idx": pd.Series([], dtype=np.int32),
                "end_turn_idx": pd.Series([], dtype=np.int32),
            }
        )
    ok = np.ones(n - plen + 1, dtype=bool)
    for j, r in enumerate(pattern):
        ok &= role[j : n - plen + 1 + j] == r
    ok &= conv[: n - plen + 1] == conv[plen - 1 :]
    # contiguity: turn indices must be consecutive
    ok &= tidx[plen - 1 :] - tidx[: n - plen + 1] == plen - 1
    starts = np.nonzero(ok)[0]
    if skip_past_last or suppress_turns:
        kept = []
        last_end = -(10**9)
        last_conv = None
        for s in starts:
            if conv[s] != last_conv or tidx[s] > tidx[last_end] + suppress_turns:
                kept.append(s)
                last_end = s + plen - 1
                last_conv = conv[s]
        starts = np.asarray(kept, dtype=np.int64)
    return pd.DataFrame(
        {
            "conv_id": conv[starts],
            "start_turn_idx": tidx[starts],
            "end_turn_idx": tidx[starts + plen - 1],
        }
    ).reset_index(drop=True)


# ------------------------------------------------------- streaming semantics
def watermark_split(
    df: pd.DataFrame, delay_s: int = DEFAULT_WATERMARK_DELAY_S
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Process rows in arrival (file) order with watermark = max event ts
    seen - delay; a row is LATE (evicted to the late channel, W3/W7) if
    its ts < watermark at its arrival. Returns (on_time, late)."""
    ts = df["ts"].astype("int64").to_numpy()
    run_max = np.maximum.accumulate(ts)
    wm = np.concatenate(([np.int64(0)], run_max[:-1] - delay_s * 1_000_000))
    wm[0] = np.iinfo(np.int64).min  # nothing seen yet → nothing is late
    late = ts < wm
    return df[~late].reset_index(drop=True), df[late].reset_index(drop=True)


def watermark_split_epochs(
    epochs: list[pd.DataFrame], delay_s: int = DEFAULT_WATERMARK_DELAY_S
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Epoch-granularity watermark (matches the micro-batch engine):
    rows of epoch k are late iff ts < (max ts seen through epoch k-1)
    - delay; the watermark advances once per epoch."""
    wm = np.iinfo(np.int64).min
    max_seen = np.iinfo(np.int64).min
    on_parts, late_parts = [], []
    for df in epochs:
        ts = df["ts"].astype("int64").to_numpy()
        late = ts < wm
        on_parts.append(df[~late])
        late_parts.append(df[late])
        if len(ts):
            max_seen = max(max_seen, int(ts.max()))
            wm = max_seen - delay_s * 1_000_000
    on = pd.concat(on_parts, ignore_index=True) if on_parts else pd.DataFrame()
    late_df = pd.concat(late_parts, ignore_index=True) if late_parts else pd.DataFrame()
    return on, late_df
