"""Epoch discovery over an append-only Parquet log.

Replaces the reference's unbounded RabbitMQ consume loop
(``queue_harvesting.py:30-37``, S1): the input is a directory of
``epoch=E/part-P.parquet`` micro-batches; consumption is resumable
because the sink's manifest records which epochs are committed —
unlike the reference's at-most-once delete-after-process (D3).
"""

from __future__ import annotations

import glob
import os
import re

_EPOCH_RE = re.compile(r"epoch=(\d+)$")


def discover_epochs(root: str) -> list[tuple[int, list[str]]]:
    """Sorted (epoch_id, [parquet files]) under an epochs root."""
    out = []
    for d in sorted(glob.glob(os.path.join(root, "epoch=*"))):
        m = _EPOCH_RE.search(d)
        if not m or not os.path.isdir(d):
            continue
        files = sorted(glob.glob(os.path.join(d, "*.parquet")))
        if files:
            out.append((int(m.group(1)), files))
    return sorted(out)
