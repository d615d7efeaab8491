"""Source format readers with schema validation (S1–S3).

The reference consumes one hard-coded source shape (RabbitMQ message →
`cv2.VideoCapture`, ``queue_harvesting.py:30-57``) and assumes the
dict layout. The engine's sources are declared-schema reads: any of
parquet (native), jsonl, or csv is read into a Dataset and CAST to the
canonical transcript schema, with a loud error naming missing columns
— the analogue of the reference's only validation (config arity,
``projects/base_project.py:77-82``) done where it belongs, at the
source.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..schema import TRANSCRIPT_SCHEMA

_REQUIRED = [f.name for f in TRANSCRIPT_SCHEMA]


def _validate_and_cast(t: pa.Table) -> pa.Table:
    missing = [c for c in _REQUIRED if c not in t.column_names]
    if missing:
        raise ValueError(
            f"transcript source missing columns {missing}; need {_REQUIRED}"
        )
    t = t.select(_REQUIRED)
    # ts may arrive as ISO strings (jsonl/csv) or int64 µs
    ts = t["ts"]
    if pa.types.is_string(ts.type) or pa.types.is_large_string(ts.type):
        parsed = pd.to_datetime(ts.to_pandas(), format="ISO8601").astype(
            "datetime64[us]"
        )
        t = t.set_column(
            t.schema.get_field_index("ts"), "ts", pa.array(parsed.to_numpy())
        )
    elif pa.types.is_integer(ts.type):
        t = t.set_column(
            t.schema.get_field_index("ts"),
            "ts",
            ts.combine_chunks().cast(pa.timestamp("us")),
        )
    # tool/text may be null-typed or have NaNs in csv for empty strings
    for col in ("text", "tool", "role", "conv_id"):
        c = t[col]
        if not (pa.types.is_string(c.type) or pa.types.is_large_string(c.type)):
            vals = c.to_pandas().fillna("").astype(str).to_numpy(dtype=object)
            t = t.set_column(
                t.schema.get_field_index(col), col, pa.array(vals, pa.string())
            )
        elif c.null_count:
            t = t.set_column(
                t.schema.get_field_index(col),
                col,
                pa.compute.fill_null(c.combine_chunks(), ""),
            )
    return t.cast(TRANSCRIPT_SCHEMA)


def read_transcripts(
    paths: str | list[str], fmt: str = "parquet", **read_kwargs
) -> rd.Dataset:
    """Read a transcript table from any supported source format and
    normalize it to ``TRANSCRIPT_SCHEMA``."""
    import data_harvesting_ray

    data_harvesting_ray.configure_session()
    if fmt == "parquet":
        ds = rd.read_parquet(paths, **read_kwargs)
    elif fmt == "jsonl":
        ds = rd.read_json(paths, **read_kwargs)
    elif fmt == "csv":
        ds = rd.read_csv(paths, **read_kwargs)
    else:
        raise ValueError(f"unknown source format {fmt!r}; use parquet|jsonl|csv")
    return ds.map_batches(_validate_and_cast, batch_format="pyarrow")
