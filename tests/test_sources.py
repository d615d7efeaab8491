"""Source-format readers: jsonl/csv transcripts normalize to the same
rows as the canonical parquet read (S1–S3 source variety)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import assert_frames_equal


@pytest.fixture(scope="module")
def small_frames(df_small):
    return df_small.head(500).reset_index(drop=True)


def test_jsonl_and_csv_sources_match_parquet(ray_session, tmp_path, small_frames):
    from data_harvesting_ray.sources.formats import read_transcripts

    df = small_frames.copy()
    jp = str(tmp_path / "t.jsonl")
    cp = str(tmp_path / "t.csv")
    out = df.copy()
    out["ts"] = out["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    out.to_json(jp, orient="records", lines=True)
    out.to_csv(cp, index=False)

    want = df
    got_j = read_transcripts(jp, fmt="jsonl").to_pandas()
    got_c = read_transcripts(cp, fmt="csv").to_pandas()
    assert_frames_equal(got_j, want, ["conv_id", "turn_idx", "ts"])
    assert_frames_equal(got_c, want, ["conv_id", "turn_idx", "ts"])


def test_missing_column_is_loud(ray_session, tmp_path, small_frames):
    from data_harvesting_ray.sources.formats import read_transcripts

    bad = small_frames.drop(columns=["role"])
    p = str(tmp_path / "bad.csv")
    bad.to_csv(p, index=False)
    with pytest.raises(Exception, match="missing columns"):
        read_transcripts(p, fmt="csv").to_pandas()


def test_unknown_format_rejected():
    from data_harvesting_ray.sources.formats import read_transcripts

    with pytest.raises(ValueError, match="unknown source format"):
        read_transcripts("x", fmt="avro")
