"""Small-file compaction for committed channel outputs.

A long-running streaming job accumulates one parquet file per
(epoch, shard) — after thousands of epochs a channel is millions of
KB-sized files, and at 100 TB the *file count* (not the bytes) starts
dominating list/open costs for every downstream read. Compaction
rewrites a channel's committed files into ~``target_rows``-row files
in a separate, atomically-published materialization — the upstream
sink's epochs, manifests, and exactly-once/repair invariants are
never touched, so compaction can run (and re-run) at any time.

Idempotence contract (same shape as ``EpochSink``): the output dir
gets a ``_MANIFEST.json`` recording the exact input file list and row
count; a re-run with the SAME inputs is a no-op (returns the cached
manifest), a re-run after MORE epochs committed rewrites and
re-publishes atomically (tmp dir + rename). Readers only ever see a
fully-published compaction.

Reference analogue: the reference's sink writes one flat dir of
``int(time.time())``-named files with no compaction story at all
(``exports/yolov8/yolov8_export.py:72``).
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data

from .exactly_once import EpochSink


def compact_channel(
    sink: EpochSink,
    channel: str,
    dest: str,
    target_rows: int = 1_000_000,
) -> dict:
    """Rewrite ``channel``'s committed files into ``dest`` as
    ~``target_rows``-row parquet files. Returns the manifest dict."""
    files = sink.committed_files(channel)
    manifest_path = os.path.join(dest, "_MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if prev.get("inputs") == files:
            return prev  # same inputs: no-op re-run
    if not files:
        raise ValueError(f"no committed files for channel {channel!r}")
    # partitioning=None: the epoch=NNNNNN path component is sink
    # layout, not data — hive inference would bake a spurious
    # categorical `epoch` column into the compacted files
    ds = ray.data.read_parquet(files, partitioning=None)
    total = ds.count()
    n_files = max(1, -(-total // target_rows))
    out_tmp = dest + f".tmp-{os.getpid()}"
    if os.path.isdir(out_tmp):
        shutil.rmtree(out_tmp)
    os.makedirs(out_tmp, exist_ok=True)
    ds.repartition(n_files).write_parquet(out_tmp)
    entry = {
        "channel": channel,
        "inputs": files,
        "rows": int(total),
        "n_files": int(n_files),
        "target_rows": int(target_rows),
    }
    with open(os.path.join(out_tmp, "_MANIFEST.json"), "w") as f:
        json.dump(entry, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    if os.path.isdir(dest):
        shutil.rmtree(dest)  # superseded compaction (or crashed publish)
    os.rename(out_tmp, dest)
    return entry


def compacted_files(dest: str) -> list[str]:
    """Parquet files of a published compaction (manifest-gated)."""
    manifest_path = os.path.join(dest, "_MANIFEST.json")
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(f"no published compaction at {dest}")
    return sorted(
        os.path.join(dest, n)
        for n in os.listdir(dest)
        if n.endswith(".parquet")
    )
