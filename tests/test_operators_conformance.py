"""Conformance: Ray operators == single-process oracle on the default
fixture (BASELINE.json: identical output rows for the same input)."""

from __future__ import annotations

import pytest

from .conftest import assert_frames_equal


@pytest.fixture(scope="module")
def ds(ray_session, sf_small):
    import ray.data as rd

    return rd.read_parquet(sf_small)


@pytest.fixture(scope="module")
def norm_ds(ds):
    from data_harvesting_ray.stages.normalize import normalize_turns

    return normalize_turns(ds)


def test_normalize(norm_ds, df_small):
    from data_harvesting_ray.oracle import reference as R

    assert_frames_equal(
        norm_ds.to_pandas(), R.normalize(df_small), ["conv_id", "turn_idx", "ts"]
    )


def test_dedup_exact(ds, df_small):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.dedup import dedup_exact

    assert_frames_equal(
        dedup_exact(ds).to_pandas(),
        R.dedup_keep_first(df_small),
        ["conv_id", "turn_idx"],
    )


def test_session_windows(ds, df_small):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.windows import session_windows

    assert_frames_equal(
        session_windows(ds).to_pandas(),
        R.session_windows(df_small),
        ["conv_id", "session_id"],
    )


def test_session_windows_partition_invariance(ds, df_small):
    """Doubling the bucket count must not change output (SURVEY §5.4)."""
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.windows import session_windows

    assert_frames_equal(
        session_windows(ds, num_buckets=7).to_pandas(),
        R.session_windows(df_small),
        ["conv_id", "session_id"],
    )


def test_tumbling_windows(norm_ds, df_small):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.dedup import dedup_exact
    from data_harvesting_ray.stages.windows import tumbling_windows

    assert_frames_equal(
        tumbling_windows(dedup_exact(norm_ds)).to_pandas(),
        R.tumbling_windows(df_small),
        ["conv_id", "window_start"],
    )


def test_sliding_windows(ds, df_small):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.dedup import dedup_exact
    from data_harvesting_ray.stages.windows import sliding_windows

    assert_frames_equal(
        sliding_windows(dedup_exact(ds)).to_pandas(),
        R.sliding_windows(df_small),
        ["conv_id", "window_start"],
    )


def test_tool_join(norm_ds, df_small):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.join import tool_join

    assert_frames_equal(
        tool_join(norm_ds).to_pandas(), R.tool_join(df_small), ["conv_id", "call_turn_idx"]
    )


def test_orphan_calls(norm_ds, df_small):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.join import orphan_calls

    assert_frames_equal(
        orphan_calls(norm_ds).to_pandas(),
        R.orphan_calls(df_small),
        ["conv_id", "call_turn_idx"],
    )


def test_cep_all(ds, df_small):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.cep import cep_matches

    got = cep_matches(ds).to_pandas().drop(columns=["pattern"])
    assert_frames_equal(got, R.cep_matches(df_small), ["conv_id", "start_turn_idx"])


def test_cep_after_match_skip(ds, df_small):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.cep import PatternSpec, cep_matches

    spec = PatternSpec(skip_past_last=True, suppress_turns=5)
    got = cep_matches(ds, spec).to_pandas().drop(columns=["pattern"])
    want = R.cep_matches(df_small, skip_past_last=True, suppress_turns=5)
    assert_frames_equal(got, want, ["conv_id", "start_turn_idx"])
    # suppression must actually remove overlapping/near matches
    assert len(want) < len(R.cep_matches(df_small))
