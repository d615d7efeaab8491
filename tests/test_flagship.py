"""Bounded flagship (one-shuffle fused pipeline + two-phase sink) must
equal the oracle on all three channels."""

from __future__ import annotations

import pytest

from .conftest import assert_frames_equal


def test_flagship_bounded_matches_oracle(ray_session, tmp_path, sf_small, df_small):
    import ray.data as rd

    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.flagship import commit_flagship, flagship_bounded
    from data_harvesting_ray.sinks.exactly_once import EpochSink

    out = str(tmp_path / "flag")
    sessions = flagship_bounded(rd.read_parquet(sf_small), out, num_buckets=8)
    got_sessions = sessions.to_pandas()
    commit_flagship(out, [sf_small], {})
    assert_frames_equal(got_sessions, R.session_windows(df_small), ["conv_id", "session_id"])

    sink = EpochSink(out)
    matches = rd.read_parquet(sink.committed_files("matches"), partitioning=None).to_pandas()
    pairs = rd.read_parquet(sink.committed_files("pairs"), partitioning=None).to_pandas()
    assert_frames_equal(
        matches.drop(columns=["pattern"]),
        R.cep_matches(df_small, skip_past_last=True),
        ["conv_id", "start_turn_idx"],
    )
    assert_frames_equal(pairs, R.tool_join(df_small), ["conv_id", "call_turn_idx"])
