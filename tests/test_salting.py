"""Hot-conversation salting (SURVEY §7 hard part (c)): the salted
session-window plan must be output-identical to the unsalted one —
including over a fixture with a 100k-turn conversation — while
spreading a mega-conversation across many partitions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import assert_frames_equal


def test_salted_sessions_match_unsalted_on_default_fixture(ray_session, sf_small, df_small):
    import ray.data as rd

    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.windows import session_windows_salted

    ds = rd.read_parquet(sf_small, columns=["conv_id", "turn_idx", "ts"])
    got = session_windows_salted(ds, salt_chunk=64).to_pandas()
    assert_frames_equal(got, R.session_windows(df_small), ["conv_id", "session_id"])


@pytest.fixture(scope="module")
def hot_fixture(ray_session):
    """Deterministic fixture with 100k-turn hot conversations."""
    from data_harvesting_ray.fixtures.generator import GenParams, ensure_fixture

    d = ensure_fixture(
        "sfhot-test",
        GenParams(n_convs=48, hot_frac=0.05, hot_turns=100_000, seed=11, n_epochs=2),
    )
    return f"{d}/transcripts.parquet"


def test_salting_metamorphic_with_100k_turn_conv(ray_session, hot_fixture):
    """Output invariant with salting on/off over a fixture where one
    conversation has 100k turns (split over ~25 chunks at 4096)."""
    import ray.data as rd

    from data_harvesting_ray.stages.windows import session_windows, session_windows_salted

    cols = ["conv_id", "turn_idx", "ts"]
    base = session_windows(rd.read_parquet(hot_fixture, columns=cols)).to_pandas()
    salted = session_windows_salted(
        rd.read_parquet(hot_fixture, columns=cols), salt_chunk=4096
    ).to_pandas()
    # the hot conv is real (sessions are small; the conversation is not)
    assert base.groupby("conv_id")["turn_count"].sum().max() > 50_000
    assert_frames_equal(salted, base, ["conv_id", "session_id"])


def test_join_buckets_on_composite_key_spreads_hot_conv(ray_session, hot_fixture):
    """tool_join co-locates on (conv_id, call_id), so a hot conv's
    calls spread over many buckets; results equal the pandas oracle."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.join import tool_join
    from data_harvesting_ray.stages.normalize import normalize_turns

    ds = normalize_turns(rd.read_parquet(hot_fixture))
    got = tool_join(ds).to_pandas()
    want = R.tool_join(pq.read_table(hot_fixture).to_pandas())
    assert_frames_equal(got, want, ["conv_id", "call_turn_idx"])


def test_asof_salted_metamorphic_hot_user(ray_session):
    """Salted as-of join output must equal the unsalted one on data
    where one hot user owns half the rows and matches frequently cross
    chunk boundaries (chunk_s smaller than the event span)."""
    import ray.data as rd

    from data_harvesting_ray.stages.asof import asof_join, asof_join_salted

    rng = np.random.default_rng(5)
    base = pd.Timestamp("2024-01-01")
    n = 4000
    # user 0 is hot (half the stream); 20 cold users share the rest
    users = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 21, n))
    ts = base + pd.to_timedelta(rng.integers(0, 7 * 86400, n), unit="s")
    is_left = rng.random(n) < 0.6
    left = pd.DataFrame(
        {
            "event_id": np.arange(is_left.sum(), dtype=np.int64),
            "user_id": users[is_left],
            "ts": ts[is_left],
            "value": rng.random(is_left.sum()),
        }
    )
    right = (
        pd.DataFrame({"user_id": users[~is_left], "ts": ts[~is_left]})
        .drop_duplicates(["user_id", "ts"])
        .reset_index(drop=True)
    )
    right["click_event_id"] = np.arange(10_000, 10_000 + len(right), dtype=np.int64)
    right["click_ts"] = right["ts"]
    kw = dict(by="user_id", on="ts", num_buckets=8)
    basej = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), **kw)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # chunk_s = 6h: the week-long stream splits into ~28 chunks
    salted = (
        asof_join_salted(
            rd.from_pandas(left), rd.from_pandas(right), chunk_s=6 * 3600, **kw
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        salted[sorted(salted.columns)], basej[sorted(basej.columns)], check_dtype=False
    )
    # the test is only meaningful if many matches DO cross chunks
    crossed = (
        basej["ts"].astype("datetime64[us]").astype(np.int64) // (6 * 3600 * 1_000_000)
        != basej["click_ts"].astype("datetime64[us]").astype(np.int64) // (6 * 3600 * 1_000_000)
    )
    assert crossed.sum() > 100


def test_equi_join_hot_key(ray_session):
    """A single hot join key (most of both sides) must not break
    correctness: the bucket kernel sees the whole key and the merge is
    vectorized — output equals pandas merge exactly."""
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    hot_l = pd.DataFrame(
        {"k": np.zeros(5000, np.int64), "lv": np.arange(5000, dtype=np.int64)}
    )
    cold_l = pd.DataFrame(
        {"k": np.arange(1, 50, dtype=np.int64), "lv": np.arange(5000, 5049, dtype=np.int64)}
    )
    left = pd.concat([hot_l, cold_l], ignore_index=True)
    right = pd.DataFrame(
        {"k": np.array([0, 0, 1, 2, 99], np.int64), "rv": np.arange(5, dtype=np.int64)}
    )
    got = (
        equi_join(
            rd.from_pandas(left).repartition(8),
            rd.from_pandas(right),
            on="k",
            how="inner",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="inner")
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) == 5000 * 2 + 2  # hot key matched twice per left row


def test_with_lag_salted_metamorphic_hot_conv(ray_session):
    """One 5k-turn mega-conversation + normal convs: salted LAG output
    must be identical to the unsalted plan (chunk 256 spreads the hot
    conv over ~20 buckets)."""
    import ray.data as rd

    from data_harvesting_ray.stages.window_fns import with_lag, with_lag_salted

    rng = np.random.default_rng(5)
    frames = []
    for conv, n in [("hot", 5000), ("a", 7), ("b", 1), ("c", 300)]:
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "turn_idx": np.arange(n, dtype=np.int64),
                    "ts": np.cumsum(rng.integers(1, 100, n)).astype(np.int64),
                }
            )
        )
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=0)
    ds = rd.from_pandas(df).repartition(5)
    kw = dict(key="conv_id", order="turn_idx", col="ts", n=2, out_col="prev")
    want = with_lag(ds, num_buckets=4, **kw).to_pandas()
    got = with_lag_salted(ds, salt_chunk=256, num_buckets=8, **kw).to_pandas()
    s = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got.sort_values(s).reset_index(drop=True)[want.columns],
        want.sort_values(s).reset_index(drop=True),
    )


@pytest.mark.parametrize("window", [3, 16])
def test_rolling_sum_salted_metamorphic(ray_session, window):
    """Salted bounded rolling sum == unsalted, including duplicate
    arrivals collapsed by the dedup prepare and chunk-boundary windows."""
    import ray.data as rd

    from data_harvesting_ray.stages.window_fns import rolling_sum, rolling_sum_salted

    rng = np.random.default_rng(6)
    frames = []
    for conv, n in [("hot", 3000), ("x", 40), ("y", 2)]:
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "turn_idx": np.arange(n, dtype=np.int64),
                    "v": rng.integers(0, 5, n).astype(np.int64),
                }
            )
        )
    df = pd.concat(frames, ignore_index=True)
    # duplicate arrivals: every 10th row appears twice
    df = pd.concat([df, df.iloc[::10]], ignore_index=True).sample(
        frac=1.0, random_state=1
    )

    def prep(g):
        return g.drop_duplicates(["conv_id", "turn_idx"], keep="first")

    ds = rd.from_pandas(df).repartition(4)
    kw = dict(key="conv_id", order="turn_idx", col="v", window=window, out_col="rs", prepare=prep)
    want = rolling_sum(ds, num_buckets=4, **kw).to_pandas()
    got = rolling_sum_salted(ds, salt_chunk=128, num_buckets=8, **kw).to_pandas()
    s = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got.sort_values(s).reset_index(drop=True)[want.columns],
        want.sort_values(s).reset_index(drop=True),
    )
