from __future__ import annotations

import warnings

import pandas as pd
import pytest

warnings.filterwarnings("ignore")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    import data_harvesting_ray  # noqa: F401 - sets Ray Data context
    # (shuffle strategy etc.) BEFORE any Dataset is created

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    data_harvesting_ray.configure_session()
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_small(ray_session):
    """Path of the default deterministic sf0.001 transcript fixture."""
    from data_harvesting_ray.fixtures.generator import transcripts_path

    return transcripts_path("sf0.001")


@pytest.fixture(scope="session")
def df_small(sf_small):
    import pyarrow.parquet as pq

    return pq.read_table(sf_small).to_pandas()


def normalize_frame(df: pd.DataFrame, sort_cols: list[str]) -> pd.DataFrame:
    """Canonical form for order/dtype-insensitive row comparison."""
    out = df.copy()
    for c in out.columns:
        if str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
        elif str(out[c].dtype).startswith("int"):
            out[c] = out[c].astype("int64")
    out = out[sorted(out.columns)]
    return out.sort_values(sort_cols, kind="stable").reset_index(drop=True)


def assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame, sort_cols: list[str]):
    g, w = normalize_frame(got, sort_cols), normalize_frame(want, sort_cols)
    assert list(g.columns) == list(w.columns), (list(g.columns), list(w.columns))
    assert len(g) == len(w), (len(g), len(w))
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
