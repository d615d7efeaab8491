"""Pluggable sink format registry (X2).

The reference exposes a by-name export factory
(``exports/export_factory.py:15-27``: 'yolov8' | 'base' → export
class); the engine's analogue maps a format name to a (writer, reader,
extension) triple used by the exactly-once sink's staged files. Ships
parquet (default), jsonl and csv; ``register_format`` is the user
extension point, mirroring how a reference user would add an export
plugin.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd


@dataclass(frozen=True)
class SinkFormat:
    name: str
    ext: str
    write: Callable[[pd.DataFrame, str], None]
    read: Callable[[str], pd.DataFrame]


def _write_parquet(df: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def _read_parquet(path: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    return pq.read_table(path).to_pandas()


def _restore_us(df: pd.DataFrame) -> pd.DataFrame:
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def _parse_iso_datetimes(df: pd.DataFrame) -> pd.DataFrame:
    """Detect ISO-formatted datetime string columns (as written by the
    jsonl/csv writers) and restore datetime64[us] dtype, so
    ``StreamingEngine.results()`` returns identical dtypes regardless
    of the configured sink format."""
    import re

    iso = re.compile(r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}")
    for c in df.columns:
        if df[c].dtype == object and len(df):
            head = df[c].dropna()
            if len(head) and isinstance(head.iloc[0], str) and iso.match(head.iloc[0]):
                try:
                    df[c] = pd.to_datetime(df[c], format="ISO8601")
                except (ValueError, TypeError):
                    pass
    return _restore_us(df)


def _write_jsonl(df: pd.DataFrame, path: str) -> None:
    df.to_json(path, orient="records", lines=True, date_format="iso", date_unit="us")


def _read_jsonl(path: str) -> pd.DataFrame:
    return _parse_iso_datetimes(pd.read_json(path, lines=True, convert_dates=True))


def _write_csv(df: pd.DataFrame, path: str) -> None:
    df.to_csv(path, index=False)


def _read_csv(path: str) -> pd.DataFrame:
    return _parse_iso_datetimes(pd.read_csv(path))


_FORMATS: dict[str, SinkFormat] = {}


def register_format(
    name: str, write: Callable, read: Callable, ext: str | None = None
) -> None:
    _FORMATS[name] = SinkFormat(name=name, ext=ext or name, write=write, read=read)


def get_format(name: str) -> SinkFormat:
    try:
        return _FORMATS[name]
    except KeyError:
        raise ValueError(
            f"unknown sink format {name!r}; registered: {sorted(_FORMATS)}"
        ) from None


def format_for_file(path: str) -> SinkFormat:
    ext = path.rsplit(".", 1)[-1]
    for f in _FORMATS.values():
        if f.ext == ext:
            return f
    raise ValueError(f"no registered sink format for extension .{ext}")


register_format("parquet", _write_parquet, _read_parquet)
register_format("jsonl", _write_jsonl, _read_jsonl)
register_format("csv", _write_csv, _read_csv)
