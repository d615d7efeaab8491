"""Line-delimited JSON source (S2/S3 source-format breadth).

The reference ingests RabbitMQ messages pointing at blobs
(``queue_harvesting.py:40-57``); the corpus-side analogue is sharded
JSONL drops — the interchange format most LLM-data pipelines exchange.
``ray.data.read_json`` streams each shard as Arrow blocks, so every
downstream stage is identical to the parquet path; JSONL reads cannot
column-prune at the source (the format is row-major text), so convert
to parquet at the first persisted checkpoint for anything re-read.
"""

from __future__ import annotations

import ray.data


def read_documents_jsonl(path: str) -> ray.data.Dataset:
    """Read sharded .jsonl document drops under ``path``. Files are
    split per shard across readers; a ``_DONE`` sentinel (written by
    the fixture generator / any atomic producer) is ignored."""
    return ray.data.read_json(
        path, file_extensions=["jsonl"], ignore_missing_paths=False
    )
