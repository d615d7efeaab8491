"""Bounded flagship (one-shuffle fused pipeline, union channels) must
equal the oracle on all three channels."""

from __future__ import annotations

from .conftest import assert_frames_equal


def test_flagship_bounded_matches_oracle(ray_session, sf_small, df_small):
    import ray.data as rd

    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.flagship import flagship_bounded, split_channels

    union = flagship_bounded(rd.read_parquet(sf_small), num_buckets=8).to_pandas()
    ch = split_channels(union)
    assert_frames_equal(
        ch["sessions"], R.session_windows(df_small), ["conv_id", "session_id"]
    )
    assert_frames_equal(
        ch["matches"].drop(columns=["pattern"]),
        R.cep_matches(df_small, skip_past_last=True),
        ["conv_id", "start_turn_idx"],
    )
    assert_frames_equal(ch["pairs"], R.tool_join(df_small), ["conv_id", "call_turn_idx"])
