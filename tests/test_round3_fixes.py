"""Round-3 regression tests for the ADVICE.md findings.

- gap_quantiles: a bucket with >= 2 rows but ZERO gaps (every conv
  single-turn) crashed with IndexError,
- asof_join / asof_join_salted: int64 values above 2^53 were silently
  corrupted by a float64 round-trip; match detection crashed when the
  right side had only (by, on) columns and dropped matched rows whose
  first right value column held legitimate nulls,
- csv sink format: timestamps read back as strings (no dtype
  restoration, unlike parquet/jsonl),
- connected_components: exhausting max_iter silently emitted
  partially-propagated (wrong) labels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def test_gap_quantiles_zero_gap_bucket(ray_session):
    """Single-turn-only conversations produce zero gaps: no crash,
    no rows; a conv with real gaps still aggregates."""
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import gap_quantiles

    ts0 = pd.Timestamp("2024-01-01")
    single = pd.DataFrame(
        {
            "conv_id": [f"solo-{i}" for i in range(4)],
            "turn_idx": np.zeros(4, dtype=np.int32),
            "ts": [ts0] * 4,
        }
    )
    out = gap_quantiles(rd.from_pandas(single), num_buckets=2).to_pandas()
    assert len(out) == 0

    mixed = pd.concat(
        [
            single,
            pd.DataFrame(
                {
                    "conv_id": ["talky"] * 3,
                    "turn_idx": np.arange(3, dtype=np.int32),
                    "ts": [ts0, ts0 + pd.Timedelta(seconds=10), ts0 + pd.Timedelta(seconds=40)],
                }
            ),
        ],
        ignore_index=True,
    )
    out = gap_quantiles(rd.from_pandas(mixed), num_buckets=2).to_pandas()
    assert list(out["conv_id"]) == ["talky"]
    assert int(out["n_gaps"].iloc[0]) == 2
    # quantile_disc semantics: p50 of [10s, 30s] is the first element
    assert int(out["p50_gap_us"].iloc[0]) == 10_000_000


def _ts(s: float) -> pd.Timestamp:
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)


@pytest.mark.parametrize("salted", [False, True])
def test_asof_join_preserves_int64_beyond_2_53(ray_session, salted):
    """Snowflake-style ids (> 2^53, not float64-representable) must
    survive the join exactly on BOTH sides."""
    import ray.data as rd

    from data_harvesting_ray.stages.asof import asof_join, asof_join_salted

    big = np.int64(1 << 60)
    left = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": [_ts(10), _ts(30), _ts(10)],
            "event_id": np.array([big + 1, big + 3, big + 5], dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2, 3], dtype=np.int64),
            "ts": [_ts(5), _ts(20), _ts(99), _ts(1)],
            "click_id": np.array([big + 11, big + 13, big + 15, big + 17], dtype=np.int64),
        }
    )
    fn = asof_join_salted if salted else asof_join
    kwargs = {"chunk_s": 15} if salted else {}
    got = (
        fn(rd.from_pandas(left), rd.from_pandas(right), by="user_id", on="ts", num_buckets=4, **kwargs)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].dtype == np.int64 and got["click_id"].dtype == np.int64
    assert list(got["event_id"]) == [big + 1, big + 3]
    # big+1 matched click at ts=5 (click_id big+11); big+3 the ts=20 one
    assert list(got["click_id"]) == [big + 11, big + 13]


def test_asof_join_right_side_without_value_columns(ray_session):
    """A right side with only (by, on) is a pure existence as-of
    (semi-join): crashed before (IndexError on r_value_names[0])."""
    import ray.data as rd

    from data_harvesting_ray.stages.asof import asof_join

    left = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": [_ts(10), _ts(1), _ts(10)],
            "v": np.array([100, 200, 300], dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {"user_id": np.array([1], dtype=np.int64), "ts": [_ts(5)]}
    )
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), by="user_id", on="ts", num_buckets=2)
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    # only the user-1 row at ts=10 has a prior right row
    assert list(got["v"]) == [100]
    assert got["v"].dtype == np.int64


def test_asof_join_keeps_matches_with_null_right_values(ray_session):
    """A matched row whose first right value column is null must be
    KEPT (the old dropna-based detection silently dropped it)."""
    import ray.data as rd

    from data_harvesting_ray.stages.asof import asof_join

    left = pd.DataFrame(
        {
            "user_id": np.array([1, 2], dtype=np.int64),
            "ts": [_ts(10), _ts(10)],
        }
    )
    right = pd.DataFrame(
        {
            "user_id": np.array([1, 2], dtype=np.int64),
            "ts": [_ts(5), _ts(5)],
            "label": [None, "ok"],
        }
    )
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), by="user_id", on="ts", num_buckets=2)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(got["user_id"]) == [1, 2]
    assert got["label"].iloc[0] is None or pd.isna(got["label"].iloc[0])
    assert got["label"].iloc[1] == "ok"


def test_sink_format_registry_csv_roundtrip(ray_session, tmp_path, df_small):
    """X2 csv format: committed channels read back with restored
    datetime64[us] dtypes, matching the oracle rows exactly (the old
    reader returned string timestamps)."""
    from .conftest import assert_frames_equal
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    eng = StreamingEngine(
        str(tmp_path / "csv"), num_shards=4, config=EngineConfig(sink_format="csv")
    )
    eng.run(discover_epochs(epochs_root("sf0.001")))
    files = eng.sink.committed_files("sessions")
    assert files and all(f.endswith(".csv") for f in files)
    got = eng.results_pandas("sessions")
    ts_cols = [c for c in got.columns if "ts" in c or "start" in c or "end" in c]
    assert ts_cols and all(str(got[c].dtype) == "datetime64[us]" for c in ts_cols)
    assert_frames_equal(got, R.session_windows(df_small), ["conv_id", "session_id"])


def test_connected_components_raises_when_not_converged(ray_session):
    """A path graph with diameter > max_iter must raise, not emit
    partially-propagated labels."""
    import ray.data as rd

    from data_harvesting_ray.stages.components import connected_components

    n = 12
    chain = pd.DataFrame(
        {
            "doc_a": np.arange(n - 1, dtype=np.int64)[::-1] + 1,
            "doc_b": np.arange(1, n, dtype=np.int64)[::-1] + 1,
        }
    )
    # edges i -> i+1 reversed so min-label needs ~n iterations
    chain = pd.DataFrame(
        {
            "doc_a": np.arange(1, n, dtype=np.int64),
            "doc_b": np.arange(0, n - 1, dtype=np.int64),
        }
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            rd.from_pandas(chain), num_buckets=2, max_iter=2
        ).to_pandas()
    # and with enough iterations the same graph converges to one group
    out = connected_components(rd.from_pandas(chain), num_buckets=2, max_iter=30).to_pandas()
    assert set(out["group_id"]) == {0} and len(out) == n


# ------------------------------------------------- dedup scale-path items
def _near_dup_docs() -> pd.DataFrame:
    base = " ".join(f"token{i} alpha{i % 7}" for i in range(120))
    rows = []
    for d in range(30):
        rows.append((d, base + f" suffix{d % 3}"))
    rows.append((100, "completely different text about other things entirely"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_candidate_pairs_are_distinct(ray_session):
    """A true near-dup matches in many bands; the candidate table must
    still hold each pair exactly once (verification runs once/pair)."""
    import ray.data as rd

    from data_harvesting_ray.stages.dedup_approx import minhash_candidates

    cand = minhash_candidates(
        rd.from_pandas(_near_dup_docs()), num_buckets=8
    ).to_pandas()
    assert len(cand) > 0
    assert not cand.duplicated(["doc_a", "doc_b"]).any()


def test_verify_each_pair_once(ray_session, monkeypatch):
    """End-to-end: count exact-Jaccard evaluations — one per distinct
    candidate pair (the old plan verified up to #bands times/pair)."""
    import ray.data as rd

    import data_harvesting_ray.stages.dedup_approx as da

    calls = []
    real = da.jaccard_milli

    def counting(a, b):
        calls.append(1)
        return real(a, b)

    monkeypatch.setattr(da, "jaccard_milli", counting)
    docs = rd.from_pandas(_near_dup_docs())
    cand = da.minhash_candidates(docs, num_buckets=4)
    n_cand = cand.count()
    # run verification in-process (map_batches would not see the patch
    # in workers): pull the pair table and score with the same kernel
    pairs = cand.to_pandas()
    texts = dict(zip(_near_dup_docs()["doc_id"], _near_dup_docs()["text"]))
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        counting(da.char_shingles(texts[a]), da.char_shingles(texts[b]))
    assert len(calls) == n_cand == len(pairs)


def test_minhash_distributed_fallback_matches_broadcast(ray_session):
    """involved_cap=0 forces the exploded hash-join verify (no driver
    payload staging); output must equal the broadcast path exactly."""
    import ray.data as rd

    from data_harvesting_ray.stages.dedup_approx import minhash_near_dups

    docs = rd.from_pandas(_near_dup_docs())
    broad = minhash_near_dups(docs, threshold_milli=700, num_buckets=4)
    dist = minhash_near_dups(
        docs, threshold_milli=700, num_buckets=4, involved_cap=0
    )
    pd.testing.assert_frame_equal(broad, dist)
    assert len(broad) > 0


def test_embedding_near_dup_fallback_matches_broadcast(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.similarity import embedding_near_dups

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16))
    dups = base[:10] + 0.02 * rng.normal(size=(10, 16))
    vecs = np.vstack([base, dups])
    ids = np.concatenate([np.arange(40), np.arange(1000, 1010)])
    ds = rd.from_pandas(
        pd.DataFrame({"vec_id": ids.astype(np.int64), "embedding": list(vecs)})
    )
    broad = embedding_near_dups(ds, threshold=0.9, n_bands=16)
    dist = embedding_near_dups(ds, threshold=0.9, n_bands=16, involved_cap=0)
    pd.testing.assert_frame_equal(broad, dist)
    assert len(broad) >= 8  # planted dups recovered


def test_debug_render_sampled_transcripts(ray_session, sf_small, df_small):
    """M12 analogue: bounded sample, deterministic, session boundaries
    agree with the session-window oracle."""
    import ray.data as rd

    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.stages.render import debug_render

    ds = rd.read_parquet(sf_small)
    out = debug_render(ds, n=3)
    assert list(out["conv_id"]) == sorted(df_small["conv_id"].unique())[:3]
    # n_sessions must match the oracle's session windows per conv
    sessions = R.session_windows(R.dedup_keep_first(df_small))
    for _, r in out.iterrows():
        want = (sessions["conv_id"] == r["conv_id"]).sum()
        assert r["n_sessions"] == want
        assert f"=== conversation {r['conv_id']} ===" in r["rendered"]
        assert "-- session 0 --" in r["rendered"]
    # deterministic across calls
    again = debug_render(ds, n=3)
    assert list(out["rendered"]) == list(again["rendered"])
