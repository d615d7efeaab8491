"""CLI entry point: run the streaming engine over an epoched Parquet
log — the analogue of the reference's service main
(``queue_harvesting.py``: consume → process → export loop), minus the
broker: epochs arrive as ``epoch=NNNNNN/`` directories of parquet
part-files (see sources/epochs.py).

    python -m data_harvesting_ray --epochs-root DIR --out DIR \
        [--config engine.yaml] [--num-shards N] [--no-flush] \
        [--no-checkpoint]

Re-running over the same output directory is an exactly-once resume:
committed epochs are skipped, shard state restores from the last
committed checkpoint. ``--no-flush`` keeps windows open for a later
run (a continuously-fed log).

The ``prep`` subcommand runs the corpus-prep composite over a
documents table and writes the curated manifest as parquet
partitioned by split (one directory per split — the resumable-output
layout; a downstream trainer reads ``split=train/`` directly):

    python -m data_harvesting_ray prep --docs documents.parquet \
        --out DIR [--lang en] [--min-tokens 20] [--min-stop-milli 30] \
        [--neardup-threshold-milli 700] [--keep min_id|best_tokens]

The ``repair`` subcommand runs the late-data correction over a
finished engine output: conversations with late rows are recomputed
from the source log and the merged channel written as parquet:

    python -m data_harvesting_ray repair --out ENGINE_OUT \
        --epochs-root DIR --dest DIR \
        [--channel sessions|pairs|matches|orphans]

The ``compact`` subcommand rewrites a channel's committed per-epoch
shard files into ~target-rows parquet files, published atomically to
a separate dir (the upstream epochs/manifests are untouched; a rerun
with unchanged inputs is a no-op):

    python -m data_harvesting_ray compact --out ENGINE_OUT \
        --channel sessions --dest DIR [--target-rows N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def prep_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="data_harvesting_ray prep")
    p.add_argument("--docs", required=True, help="documents parquet path/dir")
    p.add_argument("--out", required=True, help="output dir (parquet, partitioned by split)")
    p.add_argument("--lang", default="en")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--min-stop-milli", type=int, default=30)
    p.add_argument("--neardup-threshold-milli", type=int, default=700)
    p.add_argument(
        "--keep",
        choices=("min_id", "best_tokens"),
        default="min_id",
        help="near-dup group survivor: smallest id or highest BPE-token count",
    )
    args = p.parse_args(argv)

    import os

    # exactly-once at the job level: a completed run leaves a manifest;
    # rerunning over the same --out is a no-op (same contract as the
    # streaming engine's committed epochs)
    manifest = os.path.join(args.out, "_prep_manifest.json")
    if os.path.exists(manifest):
        with open(manifest) as f:
            prior = json.load(f)
        print(json.dumps({**prior, "skipped": True}))
        return 0

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from . import configure_session
    from .pipelines.corpus_prep import corpus_prep

    configure_session()
    out = corpus_prep(
        rd.read_parquet(args.docs, columns=["doc_id", "text"]),
        lang=args.lang,
        min_tokens=args.min_tokens,
        min_stop_milli=args.min_stop_milli,
        neardup_threshold_milli=args.neardup_threshold_milli,
        keep=args.keep,
    )
    out.write_parquet(args.out, partition_cols=["split"])
    n = rd.read_parquet(args.out).count()
    summary = {"rows": n, "out": args.out}
    with open(manifest, "w") as f:
        json.dump(summary, f)  # written LAST: partial runs leave no manifest
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


def repair_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="data_harvesting_ray repair")
    p.add_argument("--out", required=True, help="finished engine output dir")
    p.add_argument("--epochs-root", required=True, help="source epoch log")
    p.add_argument("--dest", required=True, help="where to write the repaired channel")
    p.add_argument(
        "--channel",
        choices=(
            "sessions",
            "pairs",
            "matches",
            "orphans",
            "latency",
            "rolling",
            "tumbling",
            "sliding",
        ),
        default="sessions",
    )
    args = p.parse_args(argv)

    # a rerun into a non-empty dest would append parquet files beside
    # the old ones and double-count the re-read row count below
    if os.path.isdir(args.dest) and os.listdir(args.dest):
        p.error(f"--dest {args.dest!r} is not empty; refusing to append")

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from . import configure_session
    from .pipelines.repair import (
        repair_latency,
        repair_matches,
        repair_orphans,
        repair_pairs,
        repair_rolling,
        repair_sessions,
        repair_sliding,
        repair_tumbling,
    )

    configure_session()
    fn = {
        "sessions": repair_sessions,
        "pairs": repair_pairs,
        "matches": repair_matches,
        "orphans": repair_orphans,
        "latency": repair_latency,
        "rolling": repair_rolling,
        "tumbling": repair_tumbling,
        "sliding": repair_sliding,
    }[args.channel]
    ds = fn(args.out, args.epochs_root)
    ds.write_parquet(args.dest)
    import ray.data as rd

    print(json.dumps({"channel": args.channel, "rows": rd.read_parquet(args.dest).count(), "dest": args.dest}))
    if owns_session:
        ray.shutdown()
    return 0


def compact_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="data_harvesting_ray compact")
    p.add_argument("--out", required=True, help="finished engine output dir")
    p.add_argument("--channel", required=True)
    p.add_argument("--dest", required=True, help="compacted materialization dir")
    p.add_argument("--target-rows", type=int, default=1_000_000)
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from . import configure_session
    from .sinks.compact import compact_channel
    from .sinks.exactly_once import EpochSink

    configure_session()
    entry = compact_channel(
        EpochSink(args.out), args.channel, args.dest, target_rows=args.target_rows
    )
    print(json.dumps(entry))
    if owns_session:
        ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "prep":
        return prep_main(argv[1:])
    if argv and argv[0] == "repair":
        return repair_main(argv[1:])
    if argv and argv[0] == "compact":
        return compact_main(argv[1:])
    p = argparse.ArgumentParser(prog="data_harvesting_ray", description=__doc__)
    p.add_argument("--epochs-root", required=True, help="directory of epoch=*/ dirs")
    p.add_argument("--out", required=True, help="output directory (channels + manifests)")
    p.add_argument("--config", default=None, help="EngineConfig YAML path")
    p.add_argument("--num-shards", type=int, default=None)
    p.add_argument("--no-flush", action="store_true", help="keep windows open for a later run")
    p.add_argument("--no-checkpoint", action="store_true")
    p.add_argument(
        "--channels",
        default=None,
        help=(
            "comma-separated optional derived channels to compute "
            "(tumbling,sliding,latency,rolling,tool_counts); empty "
            "string = core channels only; default = all (output-side "
            "pruning — unconsumed full-volume channels dominate "
            "close/commit cost at scale)"
        ),
    )
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")

    from .config import EngineConfig
    from .pipelines.streaming import StreamingEngine

    cfg = EngineConfig.from_yaml(args.config) if args.config else EngineConfig()
    if args.no_checkpoint:
        import dataclasses

        cfg = dataclasses.replace(cfg, checkpoint=False)
    if args.channels is not None:
        import dataclasses

        chans = tuple(c for c in args.channels.split(",") if c)
        cfg = dataclasses.replace(cfg, channels=chans)
    eng = StreamingEngine(args.out, num_shards=args.num_shards, config=cfg)
    summary = eng.run(epochs_root=args.epochs_root, flush_at_end=not args.no_flush)
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
