"""Streaming engine conformance + exactly-once + resume + late data
(SURVEY §5.2-5.4; BASELINE.json: identical rows for same input stream
and watermark, resumable from checkpoint, no dupes on re-run)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from .conftest import assert_frames_equal

GAP = 1800


@pytest.fixture(scope="module")
def engine_run(ray_session, tmp_path_factory):
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    out = str(tmp_path_factory.mktemp("stream"))
    eng = StreamingEngine(out, num_shards=4)
    epochs = discover_epochs(epochs_root("sf0.001"))
    summary = eng.run(epochs)
    return eng, epochs, summary


def test_streaming_sessions_match_oracle(engine_run, df_small):
    from data_harvesting_ray.oracle import reference as R

    eng, _, _ = engine_run
    assert_frames_equal(
        eng.results_pandas("sessions"), R.session_windows(df_small), ["conv_id", "session_id"]
    )


def test_streaming_cep_and_join_match_oracle(engine_run, df_small):
    from data_harvesting_ray.oracle import reference as R

    eng, _, _ = engine_run
    assert_frames_equal(
        eng.results_pandas("matches").drop(columns=["pattern"]),
        R.cep_matches(df_small, skip_past_last=True),
        ["conv_id", "start_turn_idx"],
    )
    assert_frames_equal(
        eng.results_pandas("pairs"), R.tool_join(df_small), ["conv_id", "call_turn_idx"]
    )
    assert_frames_equal(
        eng.results_pandas("orphans"), R.orphan_calls(df_small), ["conv_id", "call_turn_idx"]
    )
    assert len(eng.results_pandas("late")) == 0


def test_streaming_windowed_counts_match_oracle(engine_run, df_small):
    """Tumbling/sliding count channels: per-epoch partials merged in
    shard state and emitted on watermark close must equal the bounded
    oracle over the same input."""
    from data_harvesting_ray.oracle import reference as R

    eng, _, _ = engine_run
    assert_frames_equal(
        eng.results_pandas("tumbling"),
        R.tumbling_windows(df_small),
        ["conv_id", "window_start"],
    )
    assert_frames_equal(
        eng.results_pandas("sliding"),
        R.sliding_windows(df_small),
        ["conv_id", "window_start"],
    )


def test_epoch_metrics_report_window_close_latency(engine_run):
    """ST5/metrics: metrics.jsonl has one line per committed epoch with
    the end-to-end window-close latency (watermark advance -> commit)
    and a monotone watermark."""
    import json

    eng, epochs, summary = engine_run
    with open(os.path.join(eng.sink.root, "metrics.jsonl")) as f:
        lines = [json.loads(ln) for ln in f]
    assert len(lines) == summary["epochs"] == len(epochs)
    wms = [m["watermark_us"] for m in lines]
    assert wms == sorted(wms)
    for m in lines:
        assert 0.0 <= m["close_commit_latency_s"] <= m["wall_s"] + 1.0


def test_rerun_is_noop_no_duplicates(engine_run):
    """Exactly-once: re-running all epochs on the same sink commits
    nothing new and leaves outputs byte-identical."""
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    eng, epochs, _ = engine_run
    before = eng.results_pandas("sessions")
    eng2 = StreamingEngine(eng.sink.root, num_shards=4)
    summary = eng2.run(epochs)
    assert summary["epochs"] == 0 and summary["skipped"] == len(epochs)
    after = eng2.results_pandas("sessions")
    assert_frames_equal(after, before, ["conv_id", "session_id"])


def test_resume_from_checkpoint(ray_session, tmp_path, df_small):
    """Kill after 2 of 4 epochs; a fresh engine resumes from the
    checkpoint and the final output equals the uninterrupted run."""
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    epochs = discover_epochs(epochs_root("sf0.001"))
    out = str(tmp_path / "resume")
    eng1 = StreamingEngine(out, num_shards=4)
    s1 = eng1.run(epochs[:2], flush_at_end=False)  # "crash" after epoch 1 commit
    assert s1["epochs"] == 2
    eng2 = StreamingEngine(out, num_shards=4)  # fresh driver + actors
    s2 = eng2.run(epochs)
    assert s2["skipped"] == 2 and s2["epochs"] == 2
    assert_frames_equal(
        eng2.results_pandas("sessions"), R.session_windows(df_small), ["conv_id", "session_id"]
    )
    assert_frames_equal(
        eng2.results_pandas("pairs"), R.tool_join(df_small), ["conv_id", "call_turn_idx"]
    )


def test_resume_with_different_shard_count(ray_session, tmp_path, df_small):
    """Resume on a '4N-node cluster': checkpoint written with 4 shards,
    restored into 8 — state is redistributed by the same stable hash
    and the final output is unchanged."""
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    epochs = discover_epochs(epochs_root("sf0.001"))
    out = str(tmp_path / "reshard")
    StreamingEngine(out, num_shards=4).run(epochs[:2], flush_at_end=False)
    eng = StreamingEngine(out, num_shards=8)
    s = eng.run(epochs)
    assert s["skipped"] == 2 and s["epochs"] == 2
    assert_frames_equal(
        eng.results_pandas("sessions"), R.session_windows(df_small), ["conv_id", "session_id"]
    )


def test_crash_before_commit_is_idempotent(ray_session, tmp_path, df_small):
    """Simulate a crash between staging and manifest commit of the last
    epoch: drop its manifest + published data, re-run → same rows."""
    import shutil

    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    epochs = discover_epochs(epochs_root("sf0.001"))
    out = str(tmp_path / "crash")
    eng1 = StreamingEngine(out, num_shards=4)
    eng1.run(epochs)
    last = epochs[-1][0]
    os.remove(eng1.sink.manifest_path(last))
    shutil.rmtree(os.path.join(eng1.sink.data, f"epoch={last:06d}"))
    eng2 = StreamingEngine(out, num_shards=4)
    s = eng2.run(epochs)
    assert s["epochs"] == 1 and s["skipped"] == len(epochs) - 1
    assert_frames_equal(
        eng2.results_pandas("sessions"), R.session_windows(df_small), ["conv_id", "session_id"]
    )


def test_shard_actor_death_then_resume_is_exactly_once(
    ray_session, tmp_path, df_small
):
    """Worker-death chaos: a shard actor is killed mid-run (after the
    third epoch's ingest fence, before its close). The run must fail
    LOUDLY — no partial epoch may commit silently — and a fresh run on
    the same sink must resume from the last committed checkpoint and
    produce byte-identical channels to an uninterrupted run."""
    import ray

    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    epochs = discover_epochs(epochs_root("sf0.001"))
    assert len(epochs) >= 3

    class ChaosEngine(StreamingEngine):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._fences = 0

        def _fence_ingests(self, expected, timeout_s=300.0):
            super()._fence_ingests(expected, timeout_s)
            self._fences += 1
            if self._fences == 3:
                ray.kill(self.actors[1], no_restart=True)

    out = str(tmp_path / "chaos")
    eng1 = ChaosEngine(out, num_shards=4)
    with pytest.raises(Exception):
        eng1.run(epochs)
    committed = set(eng1.sink.committed_epochs())
    all_epochs = {e for e, _ in epochs}
    assert committed < all_epochs  # strict subset: the tail never committed

    eng2 = StreamingEngine(out, num_shards=4)
    summary = eng2.run(epochs)
    assert summary["skipped"] == len(committed)
    assert len(eng2.results_pandas("late")) == 0
    assert_frames_equal(
        eng2.results_pandas("sessions"),
        R.session_windows(df_small),
        ["conv_id", "session_id"],
    )
    assert_frames_equal(
        eng2.results_pandas("matches").drop(columns=["pattern"]),
        R.cep_matches(df_small, skip_past_last=True),
        ["conv_id", "start_turn_idx"],
    )
    assert_frames_equal(
        eng2.results_pandas("pairs"),
        R.tool_join(df_small),
        ["conv_id", "call_turn_idx"],
    )
    assert_frames_equal(
        eng2.results_pandas("tumbling"),
        R.tumbling_windows(df_small),
        ["conv_id", "window_start"],
    )
    # carry-based channels: the per-conv LAG / trailing-window carries
    # must survive the crash via the checkpoint (a lost carry would
    # split a gap or a window across the resume boundary)
    assert_frames_equal(
        eng2.results_pandas("latency"),
        R.response_latency(df_small),
        ["conv_id", "turn_idx"],
    )
    assert_frames_equal(
        eng2.results_pandas("rolling"),
        R.rolling_tool_rate(df_small),
        ["conv_id", "turn_idx"],
    )


def test_manifest_gates_visibility(tmp_path):
    """Staged-but-uncommitted epochs are invisible to readers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_harvesting_ray.sinks.exactly_once import EpochSink

    sink = EpochSink(str(tmp_path / "sink"))
    d = sink.staging_dir(0)
    pq.write_table(pa.table({"x": [1]}), EpochSink.staged_file(d, "sessions", 0))
    assert sink.committed_files("sessions") == []
    sink.commit(0, ["in.parquet"], {})
    assert len(sink.committed_files("sessions")) == 1
    # double commit is a no-op
    entry = sink.commit(0, ["other.parquet"], {})
    assert entry["inputs"] == ["in.parquet"]


def test_rerun_of_finished_job_without_checkpoint_is_noop(ray_session, tmp_path):
    """A finished job re-run with checkpoint=False (or after checkpoint
    pruning) must be a no-op, not a 'checkpoint missing' error — there
    is nothing left to process, so no state needs restoring."""
    import shutil

    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    epochs = discover_epochs(epochs_root("sf0.001"))
    out = str(tmp_path / "nockpt")
    eng1 = StreamingEngine(out, num_shards=4, checkpoint=False)
    eng1.run(epochs)
    shutil.rmtree(eng1.ckpt_dir, ignore_errors=True)  # prune checkpoints
    eng2 = StreamingEngine(out, num_shards=4, checkpoint=False)
    s = eng2.run(epochs)
    assert s["epochs"] == 0 and s["skipped"] == len(epochs)


def test_partial_checkpoint_is_detected(ray_session, tmp_path):
    """A checkpoint directory without its manifest (partial/corrupt
    write) must refuse to resume rather than silently starting with
    fresh or truncated state."""
    import glob

    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    epochs = discover_epochs(epochs_root("sf0.001"))
    out = str(tmp_path / "corrupt")
    eng1 = StreamingEngine(out, num_shards=4)
    eng1.run(epochs[:2], flush_at_end=False)
    last_ckpt = sorted(glob.glob(os.path.join(eng1.ckpt_dir, "epoch=*")))[-1]
    os.remove(os.path.join(last_ckpt, "manifest.json"))
    eng2 = StreamingEngine(out, num_shards=4)
    with pytest.raises(RuntimeError, match="manifest"):
        eng2.run(epochs)


def _late_fixture(tmp_path) -> tuple[str, list[pd.DataFrame]]:
    """Two epochs where epoch 1 contains a beyond-watermark late turn."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_harvesting_ray.schema import TRANSCRIPT_SCHEMA

    base = np.datetime64("2024-01-01T00:00:00", "us")

    def rows(items):
        df = pd.DataFrame(
            items, columns=["conv_id", "turn_idx", "role", "text", "tool", "off_s"]
        )
        df["turn_idx"] = df["turn_idx"].astype(np.int32)
        df["ts"] = (base + (df.pop("off_s") * 1_000_000).astype("timedelta64[us]")).astype(
            "datetime64[us]"
        )
        return df

    e0 = rows(
        [
            ("c1", 0, "user", "a", "", 0),
            ("c1", 1, "assistant", "b", "", 10),
            ("c1", 2, "user", "c", "", 20),
            ("c2", 0, "user", "fresh", "", 100000),  # advances the watermark
        ]
    )
    e1 = rows(
        [
            ("c1", 3, "assistant", "late-turn", "", 30),  # 30 << 100000-900 → late
            ("c2", 1, "assistant", "ok", "", 100010),
        ]
    )
    root = str(tmp_path / "epochs")
    for i, df in enumerate([e0, e1]):
        d = os.path.join(root, f"epoch={i:03d}")
        os.makedirs(d)
        pq.write_table(pa.Table.from_pandas(df, schema=TRANSCRIPT_SCHEMA), os.path.join(d, "part-000.parquet"))
    return root, [e0, e1]


def test_late_rows_evicted_to_late_channel(ray_session, tmp_path):
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    root, frames = _late_fixture(tmp_path)
    on, late = R.watermark_split_epochs(frames)
    assert list(late["text"]) == ["late-turn"]

    eng = StreamingEngine(str(tmp_path / "out"), num_shards=2)
    eng.run(discover_epochs(root))
    got_late = eng.results_pandas("late")
    assert_frames_equal(got_late, late, ["conv_id", "turn_idx"])
    # sessions must be built from on-time rows only
    assert_frames_equal(
        eng.results_pandas("sessions"), R.session_windows(on), ["conv_id", "session_id"]
    )


# ------------------------------------------------- randomized differential
def _random_stream(seed: int) -> pd.DataFrame:
    """Random transcript corpus: skewed conv sizes, session-gap-sized
    ts jumps, tool calls with (un)answered responses, single-turn
    convs — the shapes that broke windowing/joins historically."""
    rng = np.random.default_rng(seed)
    base = np.datetime64("2030-01-01T00:00:00", "us").astype("int64")
    rows = []
    for c in range(int(rng.integers(4, 10))):
        conv = f"rc{seed}-{c:02d}"
        n_turns = int(rng.integers(1, 60))
        t = base + int(rng.integers(0, 7200)) * 1_000_000
        for i in range(n_turns):
            t += int(
                rng.choice([5, 45, 200, 1800, 2200, 5000], p=[0.3, 0.3, 0.2, 0.05, 0.1, 0.05])
            ) * 1_000_000
            role = str(rng.choice(["user", "assistant", "tool"], p=[0.4, 0.4, 0.2]))
            tool, text = "", f"turn {i} of {conv}"
            if role == "assistant" and rng.random() < 0.4:
                tool = str(rng.choice(["search", "python"]))
                text += f" [call-{conv}-{i}]"
            elif role == "tool" and i > 0 and rng.random() < 0.7:
                text += f" [call-{conv}-{int(rng.integers(0, i))}]"
            rows.append((conv, i, role, text, tool, t))
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts_us"]
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = df.pop("ts_us").astype("datetime64[us]")
    return df


def _write_random_epochs(
    df: pd.DataFrame, root: str, rng, shuffle_within_epoch: bool
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_harvesting_ray.schema import TRANSCRIPT_SCHEMA

    order = df.sort_values("ts", kind="stable").reset_index(drop=True)
    bounds = np.linspace(0, len(order), int(rng.integers(2, 5)) + 1).astype(int)
    for e in range(len(bounds) - 1):
        part = order.iloc[bounds[e] : bounds[e + 1]]
        # byte-identical duplicate re-arrivals WITHIN the epoch (the
        # watermark guarantees nothing about dups older than eviction)
        n_dup = max(1, len(part) // 8)
        part = pd.concat(
            [part, part.sample(n=min(n_dup, len(part)), random_state=seed_of(rng))]
        )
        if shuffle_within_epoch:
            part = part.sample(frac=1.0, random_state=seed_of(rng))
        d = os.path.join(root, f"epoch={e:03d}")
        os.makedirs(d)
        pq.write_table(
            pa.Table.from_pandas(part.reset_index(drop=True), schema=TRANSCRIPT_SCHEMA),
            os.path.join(d, "part-000.parquet"),
        )


def seed_of(rng) -> int:
    return int(rng.integers(0, 2**31 - 1))


@pytest.mark.parametrize(
    "seed,shuffled",
    [(11, True), (12, True), (13, False), (14, False)],
)
def test_streaming_randomized_differential_vs_reference(
    ray_session, tmp_path, seed, shuffled
):
    """Randomized conformance on EVERY output channel: the distributed
    engine's committed rows must equal the single-process reference for
    the same input stream + watermark (the north-rule invariant).

    Two regimes: shuffled-within-epoch arrival under an effectively
    unbounded watermark (all windows close at final flush; exercises
    cross-epoch state merge under disorder), and ts-ordered arrival
    under a tight watermark (windows close mid-stream; exercises
    incremental emission). Both must be byte-equal to the oracle."""
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    rng = np.random.default_rng(seed * 1000 + 1)
    df = _random_stream(seed)
    root = str(tmp_path / "epochs")
    _write_random_epochs(df, root, rng, shuffle_within_epoch=shuffled)

    delay_s = 10**9 if shuffled else 600
    eng = StreamingEngine(
        str(tmp_path / "out"), num_shards=3, watermark_delay_s=delay_s
    )
    eng.run(discover_epochs(root))

    assert len(eng.results_pandas("late")) == 0
    assert_frames_equal(
        eng.results_pandas("sessions"),
        R.session_windows(df),
        ["conv_id", "session_id"],
    )
    assert_frames_equal(
        eng.results_pandas("matches").drop(columns=["pattern"]),
        R.cep_matches(df, skip_past_last=True),
        ["conv_id", "start_turn_idx"],
    )
    assert_frames_equal(
        eng.results_pandas("pairs"), R.tool_join(df), ["conv_id", "call_turn_idx"]
    )
    assert_frames_equal(
        eng.results_pandas("orphans"),
        R.orphan_calls(df),
        ["conv_id", "call_turn_idx"],
    )
    assert_frames_equal(
        eng.results_pandas("tumbling"),
        R.tumbling_windows(df),
        ["conv_id", "window_start"],
    )
    assert_frames_equal(
        eng.results_pandas("sliding"),
        R.sliding_windows(df),
        ["conv_id", "window_start"],
    )
    assert_frames_equal(
        eng.results_pandas("latency"),
        R.response_latency(df),
        ["conv_id", "turn_idx"],
    )
    assert_frames_equal(
        eng.results_pandas("rolling"),
        R.rolling_tool_rate(df),
        ["conv_id", "turn_idx"],
    )


@pytest.mark.parametrize("seed", [21, 22])
def test_late_repair_randomized_differential(ray_session, tmp_path, seed):
    """Random corpus + random epoch disorder + TIGHT watermark (many
    late rows) — repair must restore the bounded truth on EVERY
    committed channel: the four core ones (sessions, pairs, matches,
    orphans) and the four derived ones (latency, rolling, tumbling,
    sliding)."""
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.repair import (
        repair_latency,
        repair_matches,
        repair_orphans,
        repair_pairs,
        repair_rolling,
        repair_sessions,
        repair_sliding,
        repair_tumbling,
    )
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_harvesting_ray.schema import TRANSCRIPT_SCHEMA

    rng = np.random.default_rng(seed * 77 + 5)
    df = _random_stream(seed)
    root = str(tmp_path / "epochs")
    # cross-epoch displacement: ~10% of rows arrive one epoch AFTER
    # their event time says (within-epoch shuffle alone never produces
    # late rows — the watermark only advances at epoch boundaries)
    order = df.sort_values("ts", kind="stable").reset_index(drop=True)
    n_ep = 4
    bounds = np.linspace(0, len(order), n_ep + 1).astype(int)
    base = np.searchsorted(bounds[1:], np.arange(len(order)), side="right")
    displaced = (rng.random(len(order)) < 0.1) & (base < n_ep - 1)
    epoch = base + displaced.astype(int)
    for e in range(n_ep):
        part = order[epoch == e]
        edir = os.path.join(root, f"epoch={e:03d}")
        os.makedirs(edir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(part, schema=TRANSCRIPT_SCHEMA, preserve_index=False),
            os.path.join(edir, "part-000.parquet"),
        )

    out = str(tmp_path / "out")
    eng = StreamingEngine(
        out,
        num_shards=3,
        config=EngineConfig(
            channels=("latency", "rolling", "tumbling", "sliding"),
            watermark_delay_s=60,
        ),
    )
    eng.run(discover_epochs(root))
    assert len(eng.results_pandas("late")) > 0  # tight watermark bites
    assert_frames_equal(
        repair_sessions(out, root).to_pandas(),
        R.session_windows(df),
        ["conv_id", "session_id"],
    )
    assert_frames_equal(
        repair_pairs(out, root).to_pandas(),
        R.tool_join(df),
        ["conv_id", "call_turn_idx"],
    )
    assert_frames_equal(
        # the oracle omits the constant pattern-name column
        repair_matches(out, root).to_pandas().drop(columns=["pattern"]),
        R.cep_matches(df),
        ["conv_id", "start_turn_idx"],
    )
    assert_frames_equal(
        repair_orphans(out, root).to_pandas(),
        R.orphan_calls(df),
        ["conv_id", "call_turn_idx"],
    )
    assert_frames_equal(
        repair_latency(out, root).to_pandas(),
        R.response_latency(df),
        ["conv_id", "turn_idx"],
    )
    assert_frames_equal(
        repair_rolling(out, root).to_pandas(),
        R.rolling_tool_rate(df),
        ["conv_id", "turn_idx"],
    )
    assert_frames_equal(
        repair_tumbling(out, root).to_pandas(),
        R.tumbling_windows(df),
        ["conv_id", "window_start"],
    )
    assert_frames_equal(
        repair_sliding(out, root).to_pandas(),
        R.sliding_windows(df),
        ["conv_id", "window_start"],
    )


def test_tool_counts_channel_sums_to_bounded_topk(ray_session, tmp_path):
    """tool_counts partials summed across closes equal the bounded
    per-tool call counts regardless of epoch decomposition."""
    import duckdb

    from data_harvesting_ray.fixtures.generator import (
        epochs_root,
        transcripts_path,
    )
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    sf = "/root/testdata/sf0.001"
    eng = StreamingEngine(str(tmp_path / "out"))
    eng.run(epochs_root=epochs_root(sf))
    parts = eng.results_pandas("tool_counts")
    got = (
        parts.groupby("tool", as_index=False)["n"].sum().sort_values("tool")
    )
    want = duckdb.sql(
        f"""SELECT tool, count(*) AS n FROM (SELECT DISTINCT * FROM
            read_parquet('{transcripts_path(sf)}'))
            WHERE tool <> '' AND role = 'assistant' GROUP BY 1 ORDER BY 1"""
    ).df()
    assert dict(zip(got["tool"], got["n"])) == dict(zip(want["tool"], want["n"]))


def test_checkpoint_gc_prunes_old_epochs_and_resume_survives(
    ray_session, tmp_path
):
    """Only the newest checkpoint_keep committed-epoch checkpoints
    remain after a run, and a rerun (exactly-once no-op) still resumes
    cleanly from the newest one."""
    import glob

    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "out")
    eng = StreamingEngine(out, checkpoint=True)
    s1 = eng.run(epochs_root=epochs_root(sf))
    assert s1["epochs"] == 4
    dirs = sorted(glob.glob(os.path.join(out, "checkpoints", "epoch=*")))
    assert len(dirs) == 2  # default checkpoint_keep
    assert dirs[-1].endswith("epoch=000003")

    eng2 = StreamingEngine(out, checkpoint=True)
    s2 = eng2.run(epochs_root=epochs_root(sf))
    assert s2["skipped"] == 4 and s2["epochs"] == 0  # exactly-once no-op


def test_state_rows_metric_reported_and_bounded(ray_session, tmp_path):
    """Every committed epoch's shard metrics report state_rows, and a
    fully flushed run ends with little retained state (only the dedup
    horizon's processed keys and TTL bookkeeping may remain)."""
    import json

    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    out = str(tmp_path / "out")
    eng = StreamingEngine(out, num_shards=2)
    eng.run(epochs_root=epochs_root("sf0.001"))
    manifests = sorted(
        f for f in os.listdir(os.path.join(out, "manifest"))
    )
    assert manifests
    last = json.load(
        open(os.path.join(out, "manifest", manifests[-1]))
    )
    shards = last["metrics"]["shards"]
    assert all("state_rows" in m for m in shards)
    # flushed: no open windows/pending buffers remain; the retained
    # rows are the dedup-horizon key set + per-conv TTL bookkeeping
    assert all(m["state_rows"] >= 0 for m in shards)
