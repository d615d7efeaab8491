"""Edge-case mini-tables (FIXTURES.md F3) against the oracle AND the
Ray engine — window boundaries, duplicates, orphans, interleaving."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import assert_frames_equal

BASE = pd.Timestamp("2024-01-01")


def mk(rows):
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts_s"]
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = BASE + pd.to_timedelta(df.pop("ts_s"), unit="s")
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


def to_ds(ray_session, df):
    import pyarrow as pa

    import ray.data as rd

    from data_harvesting_ray.schema import TRANSCRIPT_SCHEMA

    return rd.from_arrow(pa.Table.from_pandas(df, schema=TRANSCRIPT_SCHEMA))


def test_empty(ray_session):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.windows import session_windows

    df = mk([])
    assert len(R.session_windows(df)) == 0
    assert session_windows(to_ds(ray_session, df)).count() == 0


def test_single_turn(ray_session):
    from data_harvesting_ray.oracle import reference as R

    df = mk([("c1", 0, "user", "hi", "", 0.0)])
    sw = R.session_windows(df)
    assert len(sw) == 1 and sw.loc[0, "turn_count"] == 1


def test_gap_boundary_exclusive(ray_session):
    """Gap exactly equal to the session gap does NOT split (rule: split
    only when gap > gap_s)."""
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.windows import session_windows

    gap = 1800.0
    df = mk(
        [
            ("c1", 0, "user", "a", "", 0.0),
            ("c1", 1, "assistant", "b", "", gap),  # exactly gap → same session
            ("c1", 2, "user", "c", "", gap + gap + 0.000001),  # > gap → split
        ]
    )
    sw = R.session_windows(df)
    assert list(sw["turn_count"]) == [2, 1]
    got = session_windows(to_ds(ray_session, df)).to_pandas()
    assert_frames_equal(got, sw, ["conv_id", "session_id"])


def test_window_boundary_tumbling(ray_session):
    """ts exactly on a tumbling edge belongs to the window it starts."""
    from data_harvesting_ray.oracle import reference as R

    df = mk(
        [
            ("c1", 0, "user", "a", "", 599.999999),
            ("c1", 1, "user", "b", "", 600.0),
        ]
    )
    tw = R.tumbling_windows(df, size_s=600)
    assert len(tw) == 2 and list(tw["turn_count"]) == [1, 1]


def test_dup_storm(ray_session):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.dedup import dedup_exact

    base = [
        ("c1", 0, "user", "a", "", 0.0),
        ("c1", 1, "assistant", "b", "", 10.0),
        ("c2", 0, "user", "x", "", 5.0),
    ]
    df = mk(base * 3)
    assert len(R.dedup_keep_first(df)) == 3
    assert dedup_exact(to_ds(ray_session, df)).count() == 3


def test_orphan_calls_and_ghost_resps(ray_session):
    from data_harvesting_ray.oracle import reference as R

    df = mk(
        [
            ("c1", 0, "user", "q", "", 0.0),
            ("c1", 1, "assistant", "go [call-c1-0]", "search", 1.0),
            ("c1", 2, "tool", "res [call-c1-0]", "search", 2.0),
            ("c1", 3, "assistant", "go [call-c1-1]", "sql", 3.0),  # orphan
            ("c1", 4, "tool", "res [call-c1-ghost]", "sql", 4.0),  # ghost resp
        ]
    )
    j = R.tool_join(df)
    assert list(j["call_id"]) == ["call-c1-0"]
    o = R.orphan_calls(df)
    assert list(o["call_id"]) == ["call-c1-1"]


def test_response_before_call_not_joined(ray_session):
    """A 'response' turn earlier than its call must not pair."""
    from data_harvesting_ray.oracle import reference as R

    df = mk(
        [
            ("c1", 0, "tool", "res [call-c1-0]", "search", 0.0),
            ("c1", 1, "assistant", "go [call-c1-0]", "search", 1.0),
        ]
    )
    assert len(R.tool_join(df)) == 0
    assert list(R.orphan_calls(df)["call_id"]) == ["call-c1-0"]


def test_interleaved_convs_partition_independence(ray_session):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.cep import cep_matches

    rows = []
    for i in range(6):
        rows.append(("cA", i, ["user", "assistant", "tool"][i % 3], "t", "", i * 10.0))
        rows.append(("cB", i, ["user", "assistant", "tool"][i % 3], "t", "", i * 10.0))
    df = mk(rows)
    want = R.cep_matches(df)
    assert len(want) == 4  # 2 per conv
    got = cep_matches(to_ds(ray_session, df), num_buckets=5).to_pandas().drop(columns=["pattern"])
    assert_frames_equal(got, want, ["conv_id", "start_turn_idx"])


def test_suppression_back_to_back(ray_session):
    """Reference quirk W4: back-to-back matches closer than the skip
    distance → only the first fires."""
    from data_harvesting_ray.oracle import reference as R

    rows = []
    for k in range(3):  # three consecutive u-a-t units, no gaps
        rows += [
            ("c1", 3 * k, "user", "q", "", 3 * k * 1.0),
            ("c1", 3 * k + 1, "assistant", "a", "", (3 * k + 1) * 1.0),
            ("c1", 3 * k + 2, "tool", "r", "t", (3 * k + 2) * 1.0),
        ]
    df = mk(rows)
    assert len(R.cep_matches(df)) == 3
    m = R.cep_matches(df, skip_past_last=True, suppress_turns=50)
    assert len(m) == 1 and m.loc[0, "start_turn_idx"] == 0
    m2 = R.cep_matches(df, skip_past_last=True, suppress_turns=3)
    assert len(m2) == 2  # skips exactly one unit


def test_watermark_all_late():
    from data_harvesting_ray.oracle import reference as R

    df = mk(
        [
            ("c1", 5, "user", "late-def", "", 100000.0),  # sets watermark high
            ("c1", 0, "user", "a", "", 0.0),
            ("c1", 1, "user", "b", "", 1.0),
        ]
    )
    on, late = R.watermark_split(df, delay_s=900)
    assert len(on) == 1 and len(late) == 2


def test_sliding_membership():
    from data_harvesting_ray.oracle import reference as R

    df = mk([("c1", 0, "user", "a", "", 650.0)])
    sw = R.sliding_windows(df, size_s=600, slide_s=300)
    # ts=650 ∈ windows starting at 300 and 600
    starts = sorted((sw["window_start"] - BASE).dt.total_seconds())
    assert starts == [300.0, 600.0]
