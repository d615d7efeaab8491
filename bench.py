"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "turns_per_sec": ...}

``--scaling`` runs the same bench in two fresh processes
(RAY_GRAFT_CPUS=8 and 32) on the same input and reports both
throughputs plus scaling efficiency (the sandbox stand-in for N vs 4N
Ray nodes — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
import warnings

import numpy as np

warnings.filterwarnings("ignore")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    import data_harvesting_ray

    data_harvesting_ray.configure_session()  # BEFORE any dataset
    from data_harvesting_ray.fixtures.generator import (
        epochs_root,
        transcripts_path,
    )
    from data_harvesting_ray.pipelines import queries as Q

    # Warm the OS page cache (untimed) so we measure compute + shuffle.
    tpath = transcripts_path(SF_DIR)
    n_turns = rd.read_parquet(tpath).count()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        res = fn()
        # force full execution for lazy Datasets
        if hasattr(res, "count"):
            res.count()
        dt = round(time.time() - t0, 3)
        timings[name] = min(timings.get(name, dt), dt)
        return res

    # Flagship: full streaming engine (epochs, watermarks, exactly-once sink)
    close_latencies: list[float] = []

    def streaming():
        from data_harvesting_ray.pipelines.streaming import StreamingEngine

        out_dir = tempfile.mkdtemp(prefix="bench-stream-")
        eng = StreamingEngine(out_dir, checkpoint=True)
        eng.run(epochs_root=epochs_root(SF_DIR))
        # end-to-end window-close latency per epoch: watermark advance ->
        # rows committed/visible (engine writes it to metrics.jsonl)
        lats = []
        with open(os.path.join(out_dir, "metrics.jsonl")) as f:
            for line in f:
                lats.append(json.loads(line)["close_commit_latency_s"])
        close_latencies.append(lats)
        return eng.results("sessions")

    # The sandbox host has bursty CPU steal (identical runs vary up to
    # 3x — BASELINE.md); per-query best-of-REPS over full passes of the
    # list makes one bench invocation robust to a burst.
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    for _ in range(reps):
        timed("streaming_flagship", streaming)
        timed("session_windows", lambda: Q.q_t_session_windows(SF_DIR))
        timed("dedup", lambda: Q.q_t_dedup(SF_DIR))
        timed("tumbling_windows", lambda: Q.q_t_tumbling_windows(SF_DIR))
        timed("tool_join", lambda: Q.q_t_tool_join(SF_DIR))
        timed("cep_matches", lambda: Q.q_t_cep_matches(SF_DIR))
        timed("turn_stats", lambda: Q.q_t_turn_stats(SF_DIR))
        timed("window_lag", lambda: Q.q_t_response_latency(SF_DIR))
        # The document/embedding headliners need the driver's
        # documents/embeddings tables; transcript-only fixtures (the
        # sfxxl scale point: GRAFT_SF_DIR=sfxxl) run just the
        # transcript pipelines.
        if os.path.isdir(SF_DIR) and os.path.exists(
            os.path.join(SF_DIR, "documents.parquet")
        ):
            timed("minhash_near_dups", lambda: Q.q_d_minhash_near_dups(SF_DIR))
            # d_jaccard_near_dups (exact prefix-filter join) is gated for
            # correctness at sf0.01 but is NOT a headline: on the synthetic
            # fixture every document draws from one small shingle
            # vocabulary, so the exact join approaches all-pairs by
            # construction (~50 s at sf0.1, measured; see BASELINE.md) —
            # MinHash is the scalable near-dup path on such corpora.
            timed("corpus_prep", lambda: Q.q_d_corpus_prep(SF_DIR))
            timed("knn", lambda: Q.q_v_knn(SF_DIR))
            # round-4 headliners: semantic dedup over the planted-near-
            # dup embeddings table and DSIR importance weighting over
            # the documents table
            timed("semdedup", lambda: Q.q_v_semdedup(SF_DIR))
            timed("dsir", lambda: Q.q_d_dsir(SF_DIR))

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(os.path.normpath(SF_DIR))
    out = {
        "metric": "headline_pipelines_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "reps_per_query": reps,
        "turns_per_sec": round(n_turns / timings["streaming_flagship"], 1),
    }
    # latency sample from the fastest streaming rep (per-query best-of
    # discipline: the slow rep is host steal, not the engine)
    best = min(close_latencies, key=sum)
    out["window_close_latency_p50_s"] = round(float(np.median(best)), 3)
    out["window_close_latency_max_s"] = round(float(max(best)), 3)
    ray.shutdown()
    return out


def run_scale_one() -> dict:
    """One fresh-process scaling sample: the bounded flagship (the
    throughput mode of the engine — one shuffle computing sessions +
    CEP + join with the two-phase sink) over the large fixture."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import tempfile

    import ray.data as rd

    import data_harvesting_ray

    data_harvesting_ray.configure_session()  # BEFORE any dataset
    from data_harvesting_ray.fixtures.generator import GenParams, ensure_fixture
    from data_harvesting_ray.pipelines.flagship import flagship_bounded

    scale_fixture = os.environ.get("GRAFT_SCALE_FIXTURE", "sfxxl")
    d = ensure_fixture(scale_fixture, GenParams(n_convs=600_000))
    # Read the sharded epoch part-files, not the single-file copy: one
    # parquet file = ONE read task regardless of row groups, a serial
    # head that alone costs ~30% of wall at 16 CPUs (at 100 TB input is
    # always many files; the single file exists for the DuckDB oracle).
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(d, "epochs", "epoch=*", "part-*.parquet")))
    n = rd.read_parquet(files, partitioning=None).count()  # warm page cache
    t0 = time.time()
    blocks = max(len(files), NUM_CPUS)
    # num_buckets is FIXED across CPU levels (strong scaling: identical
    # job + decomposition, more workers). At 100 TB the bucket count is
    # sized by the DATA (each bucket must fit a worker's heap —
    # stages/partition.py), not by the cluster, so a real N→4N resize
    # keeps the same partitioning. 64 ≈ 4 × the largest level tested.
    union = flagship_bounded(
        rd.read_parquet(files, partitioning=None, override_num_blocks=blocks),
        num_buckets=int(os.environ.get("GRAFT_SCALE_BUCKETS", "64")),
    )
    union.write_parquet(tempfile.mkdtemp(prefix="scale-flag-"))
    dt = time.time() - t0
    ray.shutdown()
    return {
        "value": round(dt, 3),
        "n_turns": n,
        "turns_per_sec": round(n / dt, 1),
        "num_cpus": NUM_CPUS,
    }


def run_scale_one_streaming() -> dict:
    """One fresh-process scaling sample for the STREAMING engine (the
    latency mode: epoch loop, watermarks, exactly-once sink) over the
    large fixture.

    Shard count: "auto" (default) uses the engine's CPU-proportional
    default at each level (shards = CPUs since round 4 — close-path
    parallelism tracks shard count) — the realistic resize mode,
    because the engine reshards checkpointed state on resume
    (reshard-on-resume is a tested first-class path), so an N→4N
    cluster carries its state into 4N-proportional shards rather than
    staying shard-bound. GRAFT_SCALE_SHARDS=<int> pins a fixed count
    instead (measures the shard-bound regime: 0.45 efficiency at 8
    shards, 4→16 CPUs — recorded in BASELINE.md for contrast)."""
    import glob as _glob
    import tempfile

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    import data_harvesting_ray

    data_harvesting_ray.configure_session()
    from data_harvesting_ray.fixtures.generator import GenParams, ensure_fixture
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    # GRAFT_SCALE_EPOCHS: epoch granularity of the fixture (default 4).
    # BASELINE.md pins the streaming-mode scaling residual to the
    # ~1.2 s/epoch route/ingest/fence/commit floor — coarser epochs
    # amortize it. The fixture NAME is derived from the granularity
    # (ensure_fixture caches by name and would otherwise silently
    # return a stale layout generated with different n_epochs), and
    # the cached layout is validated against the requested count.
    n_ep = int(os.environ.get("GRAFT_SCALE_EPOCHS", "4"))
    default_name = "sfxxl" if n_ep == 4 else f"sfxxl-e{n_ep}"
    scale_fixture = os.environ.get("GRAFT_SCALE_FIXTURE", default_name)
    d = ensure_fixture(scale_fixture, GenParams(n_convs=600_000, n_epochs=n_ep))
    got_eps = len(_glob.glob(os.path.join(d, "epochs", "epoch=*")))
    if got_eps != n_ep:
        raise RuntimeError(
            f"fixture {scale_fixture!r} has {got_eps} epochs but "
            f"GRAFT_SCALE_EPOCHS={n_ep}: cached layout is stale — pick a "
            f"granularity-specific GRAFT_SCALE_FIXTURE name or delete it"
        )
    files = sorted(_glob.glob(os.path.join(d, "epochs", "epoch=*", "part-*.parquet")))
    n = rd.read_parquet(files, partitioning=None).count()  # warm page cache
    shards_env = os.environ.get("GRAFT_SCALE_SHARDS", "auto")
    shards = None if shards_env == "auto" else int(shards_env)
    # GRAFT_SCALE_CHANNELS: "all" (default), "core" (no derived
    # channels), or a comma list of derived channel names
    chan_env = os.environ.get("GRAFT_SCALE_CHANNELS", "all")
    cfg = None
    if chan_env != "all":
        from data_harvesting_ray.config import EngineConfig

        chans = () if chan_env == "core" else tuple(chan_env.split(","))
        cfg = EngineConfig(channels=chans, num_shards=shards)
        shards = None  # config carries it
    t0 = time.time()
    eng = StreamingEngine(
        tempfile.mkdtemp(prefix="scale-stream-"),
        num_shards=shards,
        checkpoint=True,
        config=cfg,
    )
    eng.run(epochs_root=os.path.join(d, "epochs"))
    dt = time.time() - t0
    ray.shutdown()
    return {
        "value": round(dt, 3),
        "n_turns": n,
        "turns_per_sec": round(n / dt, 1),
        "num_cpus": NUM_CPUS,
        "num_shards": eng.num_shards,
    }


def run_scaling(which: str = "--scale-one") -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        best = None
        for _ in range(int(os.environ.get("GRAFT_SCALE_REPS", "2"))):
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), which],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            r = json.loads(res.stdout.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r  # best-of-N: the sandbox VM has heavy CPU steal
        return best

    # N vs 4N pair. Default 4→16: the sandbox VM peaks at ~23 effective
    # cores under host steal (BASELINE.md), so 8→32 measures the host,
    # not the engine; below 4 CPUs the hash-shuffle aggregators starve
    # the map tasks. Override with GRAFT_SCALE_CPUS="8,32".
    pair = os.environ.get("GRAFT_SCALE_CPUS", "4,16").split(",")
    if len(pair) != 2:
        raise SystemExit("GRAFT_SCALE_CPUS must be 'N_lo,N_hi', e.g. '4,16'")
    n_lo, n_hi = int(pair[0]), int(pair[1])
    lo, hi = one(n_lo), one(n_hi)
    eff = (lo["value"] / hi["value"]) / (n_hi / n_lo)
    return {
        "metric": "scaling_efficiency",
        "pipeline": (
            "streaming_engine (epochs, watermarks, exactly-once sink)"
            if which == "--scale-one-streaming"
            else "flagship_bounded (sessions+CEP+join, one shuffle)"
        ),
        "cpus_lo": n_lo,
        "cpus_hi": n_hi,
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "turns_per_sec_lo": lo["turns_per_sec"],
        "turns_per_sec_hi": hi["turns_per_sec"],
        "n_turns": lo["n_turns"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling-streaming" in sys.argv:
        print(json.dumps(run_scaling("--scale-one-streaming")))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--scale-one-streaming" in sys.argv:
        print(json.dumps(run_scale_one_streaming()))
    elif "--scale-one" in sys.argv:
        print(json.dumps(run_scale_one()))
    else:
        print(json.dumps(run_bench()))
