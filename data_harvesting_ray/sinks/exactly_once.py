"""Exactly-once two-phase Parquet sink with per-epoch manifests.

The reference's sinks are at-most-once and lossy: filenames are
``int(time.time())`` so same-second writes silently overwrite
(``exports/yolov8/yolov8_export.py:72``), uploads delete local files
before durability is known and failures are printed, not raised
(``integrations/s3/s3_integration.py:46,81-83``). This sink removes
both hazards (W8):

1. STAGE: writers emit parquet under ``staging/epoch=E/`` with
   deterministic names ``<channel>-shard<K>.parquet`` (unique keys —
   no wall-clock naming).
2. COMMIT: the driver atomically renames the staged dir to
   ``data/epoch=E/`` and then writes ``manifest/epoch-E.json``
   (tmp + rename → atomic). Readers only see manifested epochs.

Idempotence: a retried epoch whose manifest exists is a no-op; a crash
between stage and commit leaves only invisible staged files which are
re-staged (overwritten by the same deterministic keys) on retry. The
manifest also records input files (lineage) and per-shard metrics.
"""

from __future__ import annotations

import json
import os
import shutil


class EpochSink:
    def __init__(self, root: str):
        self.root = root
        self.staging = os.path.join(root, "staging")
        self.data = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "manifest")
        for d in (self.staging, self.data, self.manifest_dir):
            os.makedirs(d, exist_ok=True)

    # ---- phase 1: staging ------------------------------------------------
    def staging_dir(self, epoch: int) -> str:
        d = os.path.join(self.staging, f"epoch={epoch:06d}")
        os.makedirs(d, exist_ok=True)
        return d

    @staticmethod
    def staged_file(staging_dir: str, channel: str, shard: int, ext: str = "parquet") -> str:
        return os.path.join(staging_dir, f"{channel}-shard{shard:04d}.{ext}")

    # ---- phase 2: commit -------------------------------------------------
    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch-{epoch:06d}.json")

    def is_committed(self, epoch: int) -> bool:
        return os.path.exists(self.manifest_path(epoch))

    def commit(self, epoch: int, input_files: list[str], metrics: dict) -> dict:
        """Publish a staged epoch. Returns the manifest entry. No-op if
        already committed (idempotent under task/driver retry)."""
        if self.is_committed(epoch):
            with open(self.manifest_path(epoch)) as f:
                return json.load(f)
        staged = os.path.join(self.staging, f"epoch={epoch:06d}")
        final = os.path.join(self.data, f"epoch={epoch:06d}")
        files = sorted(os.listdir(staged)) if os.path.isdir(staged) else []
        if os.path.isdir(final):
            shutil.rmtree(final)  # uncommitted leftovers from a crashed run
        if os.path.isdir(staged):
            os.rename(staged, final)
        entry = {
            "epoch": epoch,
            "files": files,
            "inputs": input_files,
            "metrics": metrics,
        }
        tmp = self.manifest_path(epoch) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.manifest_path(epoch))
        return entry

    # ---- readers ---------------------------------------------------------
    def committed_epochs(self) -> list[int]:
        out = []
        for name in os.listdir(self.manifest_dir):
            if name.startswith("epoch-") and name.endswith(".json"):
                out.append(int(name[len("epoch-") : -len(".json")]))
        return sorted(out)

    def committed_files(self, channel: str) -> list[str]:
        """All committed parquet files for a channel, manifest-gated —
        uncommitted data/ dirs are invisible."""
        files: list[str] = []
        for e in self.committed_epochs():
            with open(self.manifest_path(e)) as f:
                entry = json.load(f)
            d = os.path.join(self.data, f"epoch={e:06d}")
            for name in entry["files"]:
                if name.startswith(channel + "-"):
                    files.append(os.path.join(d, name))
        return files
