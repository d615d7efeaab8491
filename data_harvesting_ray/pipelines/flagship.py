"""Bounded (throughput-mode) flagship: the streaming engine's exact
semantics — normalize → dedup → session windows + CEP + tool join —
executed as ONE Ray Data pipeline with a single hash(conv_id) shuffle.

The streaming epoch loop (streaming.py) optimizes window-close
latency; this path optimizes throughput for backfills/batch reruns:
the per-bucket kernel computes all three channels in one pass, stages
the side channels (matches, pairs) as per-bucket parquet with
deterministic names, and the driver commits them via the same
manifest-gated two-phase sink — identical exactly-once discipline,
no per-epoch barriers. Scaling efficiency (N vs 4N) is measured on
this path (see BASELINE.md).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from ..sinks.exactly_once import EpochSink
from ..stages.cep import PatternSpec, cep_kernel
from ..stages.dedup import dedup_kernel
from ..stages.join import join_kernel
from ..stages.normalize import normalize_turns
from ..stages.partition import add_bucket
from ..stages.windows import session_kernel


def flagship_bounded(
    ds: rd.Dataset,
    output_dir: str,
    gap_s: int = 1800,
    pattern: PatternSpec | None = None,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Returns the sessions Dataset; matches + pairs are committed to
    ``output_dir`` under epoch 0 of the two-phase sink."""
    pattern = pattern or PatternSpec(skip_past_last=True, suppress_turns=0)
    sink = EpochSink(output_dir)
    staging = sink.staging_dir(0)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.parquet as pq

        bucket = int(g["bucket"].iloc[0])
        g = g.drop(columns=["bucket"])
        g = dedup_kernel(g).sort_values(["conv_id", "turn_idx"], kind="stable")
        matches = cep_kernel(g, pattern)
        pairs = join_kernel(g)
        # side channels: deterministic per-bucket keys → idempotent
        pq.write_table(
            pa.Table.from_pandas(matches, preserve_index=False),
            EpochSink.staged_file(staging, "matches", bucket),
        )
        pq.write_table(
            pa.Table.from_pandas(pairs, preserve_index=False),
            EpochSink.staged_file(staging, "pairs", bucket),
        )
        return session_kernel(g, gap_s)

    sessions = (
        add_bucket(normalize_turns(ds), num_buckets=num_buckets)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return sessions


def commit_flagship(output_dir: str, input_files: list[str], metrics: dict) -> dict:
    """Phase 2: publish the staged side channels (idempotent)."""
    return EpochSink(output_dir).commit(0, input_files, metrics)
