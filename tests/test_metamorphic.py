"""Metamorphic properties (SURVEY §5.4): permuting arrival order within
watermark bounds and changing parallelism must not change committed
output."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from .conftest import assert_frames_equal


def _bounded_permutation(df: pd.DataFrame, seed: int = 11) -> pd.DataFrame:
    """A different valid arrival order: start from perfect event-time
    order (zero jitter) and shuffle within small consecutive windows —
    the disorder is the event-time span of `window` adjacent global
    rows, far below the fixture's 900 s watermark delay."""
    rng = np.random.default_rng(seed)
    df = df.sort_values("ts", kind="stable").reset_index(drop=True)
    # shuffle within 300 s event-time buckets: disorder is bounded by
    # the bucket width, strictly below the 900 s watermark delay
    bucket = df["ts"].astype("int64").to_numpy() // (300 * 1_000_000)
    idx = np.arange(len(df))
    for b in np.unique(bucket):
        seg = idx[bucket == b]
        perm = seg.copy()
        rng.shuffle(perm)
        idx[bucket == b] = perm
    return df.iloc[idx].reset_index(drop=True)


def test_bounded_ops_arrival_order_invariant(ray_session, df_small):
    import pyarrow as pa

    import ray.data as rd

    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.schema import TRANSCRIPT_SCHEMA
    from data_harvesting_ray.stages.windows import session_windows

    shuffled = _bounded_permutation(df_small)
    ds = rd.from_arrow(pa.Table.from_pandas(shuffled, schema=TRANSCRIPT_SCHEMA))
    assert_frames_equal(
        session_windows(ds).to_pandas(), R.session_windows(df_small), ["conv_id", "session_id"]
    )


def test_streaming_arrival_order_invariant(ray_session, tmp_path, df_small):
    """Re-chunk a bounded permutation into fresh epochs; the committed
    streaming output must equal the oracle on the original order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.schema import TRANSCRIPT_SCHEMA
    from data_harvesting_ray.sources.epochs import discover_epochs

    shuffled = _bounded_permutation(df_small, seed=23)
    root = str(tmp_path / "epochs")
    bounds = np.linspace(0, len(shuffled), 4).astype(int)
    for i in range(3):
        d = os.path.join(root, f"epoch={i:03d}")
        os.makedirs(d)
        part = shuffled.iloc[bounds[i] : bounds[i + 1]]
        pq.write_table(
            pa.Table.from_pandas(part, schema=TRANSCRIPT_SCHEMA),
            os.path.join(d, "part-000.parquet"),
        )
    eng = StreamingEngine(str(tmp_path / "out"), num_shards=4)
    eng.run(discover_epochs(root))
    assert len(eng.results_pandas("late")) == 0
    assert_frames_equal(
        eng.results_pandas("sessions"), R.session_windows(df_small), ["conv_id", "session_id"]
    )
    assert_frames_equal(
        eng.results_pandas("pairs"), R.tool_join(df_small), ["conv_id", "call_turn_idx"]
    )


@pytest.mark.parametrize("num_buckets", [3, 16])
def test_flagship_parallelism_invariant(ray_session, sf_small, df_small, num_buckets):
    import ray.data as rd

    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.flagship import flagship_bounded, split_channels

    union = flagship_bounded(
        rd.read_parquet(sf_small), num_buckets=num_buckets
    ).to_pandas()
    ch = split_channels(union)
    assert_frames_equal(
        ch["sessions"], R.session_windows(df_small), ["conv_id", "session_id"]
    )
