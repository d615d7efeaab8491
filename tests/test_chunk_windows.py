"""Context-window chunking (``stages.packing.chunk_windows``):
overlap semantics, unicode code-point slicing parity with DuckDB
``substr``/``length``, and null/empty-text edges."""

from __future__ import annotations

import pandas as pd
import pytest


def _run(ray, rows, **kw):
    import ray.data as rd

    from data_harvesting_ray.stages.packing import chunk_windows

    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(2)
    return (
        chunk_windows(ds, **kw)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def test_overlap_and_tail(ray_session):
    out = _run(
        ray_session,
        [{"doc_id": 1, "text": "abcdefghij"}],  # 10 chars
        size=4,
        stride=3,
    )
    # offsets 0,3,6,9 (< 10) -> abcd, defg, ghij, j
    assert out["chunk"].tolist() == ["abcd", "defg", "ghij", "j"]
    assert out["chunk_idx"].tolist() == [0, 1, 2, 3]
    assert out["n_chunk_chars"].tolist() == [4, 4, 4, 1]


def test_null_and_empty_emit_nothing(ray_session):
    out = _run(
        ray_session,
        [
            {"doc_id": 1, "text": None},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "xy"},
        ],
        size=5,
        stride=5,
    )
    assert out["doc_id"].tolist() == [3]
    assert out["chunk"].tolist() == ["xy"]


def test_unicode_codepoint_parity_with_duckdb(ray_session):
    import duckdb

    rows = [
        {"doc_id": 1, "text": "héllo wörld ééé abc"},
        {"doc_id": 2, "text": "日本語のテキストです、チャンク分割のテスト"},
        {"doc_id": 3, "text": "plain ascii " * 10},
    ]
    got = _run(ray_session, rows, size=7, stride=5)
    df = pd.DataFrame(rows)
    want = (
        duckdb.sql(
            """
        WITH n AS (
          SELECT doc_id, text, length(text) AS L FROM df
          WHERE text IS NOT NULL AND length(text) > 0
        ),
        idx AS (
          SELECT doc_id, text, L,
                 unnest(generate_series(0, CAST(ceil(L / 5.0) AS BIGINT) - 1)) AS c
          FROM n
        )
        SELECT doc_id, c AS chunk_idx,
               substr(text, CAST(c * 5 + 1 AS BIGINT), 7) AS chunk,
               CAST(length(substr(text, CAST(c * 5 + 1 AS BIGINT), 7)) AS BIGINT)
                   AS n_chunk_chars
        FROM idx WHERE c * 5 < L
        ORDER BY doc_id, chunk_idx
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_bad_params_raise(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.packing import chunk_windows

    ds = rd.from_pandas(pd.DataFrame([{"doc_id": 1, "text": "x"}]))
    with pytest.raises(ValueError):
        chunk_windows(ds, size=0)
    with pytest.raises(ValueError):
        chunk_windows(ds, size=4, stride=-1)
