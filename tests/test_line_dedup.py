"""Corpus-wide line-level exact dedup (``stages.dedup.dedup_lines``)
— the CCNet paragraph-hash step. Covers: first-occurrence semantics,
all-duplicate docs vanishing, null/empty text, the broadcast fast
path vs the hash(doc_id) co-shuffle fallback (forced via
``loser_cap=0``), and a DuckDB differential on the planted
multi-line fixture."""

from __future__ import annotations

import pandas as pd
import pytest


def _run(ray, rows, **kw):
    import ray.data as rd

    from data_harvesting_ray.stages.dedup import dedup_lines

    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = dedup_lines(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


BASIC = [
    {"doc_id": 1, "text": "header\nalpha\nbeta\nfooter"},
    {"doc_id": 2, "text": "header\ngamma\nfooter"},  # loses header+footer
    {"doc_id": 3, "text": "header\nfooter"},  # all lines dup -> vanishes
    {"doc_id": 4, "text": None},  # null text -> no lines -> vanishes
    {"doc_id": 5, "text": "alpha\ndelta\nalpha"},  # in-doc repeat too
]


def test_first_occurrence_semantics(ray_session):
    out = _run(ray_session, BASIC)
    assert out["doc_id"].tolist() == [1, 2, 5]
    by = out.set_index("doc_id")
    assert by.loc[1, "text_dedup"] == "header\nalpha\nbeta\nfooter"
    assert by.loc[1, "n_kept"] == 4 and by.loc[1, "n_dropped"] == 0
    assert by.loc[2, "text_dedup"] == "gamma"
    assert by.loc[2, "n_kept"] == 1 and by.loc[2, "n_dropped"] == 2
    # doc 5: "alpha" lost to doc 1; its second "alpha" also lost
    assert by.loc[5, "text_dedup"] == "delta"
    assert by.loc[5, "n_dropped"] == 2


def test_coshuffle_fallback_matches_broadcast(ray_session):
    fast = _run(ray_session, BASIC)
    slow = _run(ray_session, BASIC, loser_cap=0)  # force the fallback
    pd.testing.assert_frame_equal(
        fast, slow[fast.columns], check_dtype=False
    )


def test_empty_string_doc(ray_session):
    rows = [
        {"doc_id": 1, "text": ""},  # one empty line, wins
        {"doc_id": 2, "text": ""},  # loses its only line -> vanishes
        {"doc_id": 3, "text": "x\n\ny"},  # middle empty line loses
    ]
    out = _run(ray_session, rows)
    assert out["doc_id"].tolist() == [1, 3]
    by = out.set_index("doc_id")
    assert by.loc[1, "text_dedup"] == "" and by.loc[1, "n_kept"] == 1
    assert by.loc[3, "text_dedup"] == "x\ny" and by.loc[3, "n_dropped"] == 1


def test_duckdb_differential_on_fixture(ray_session):
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import multiline_docs_path
    from data_harvesting_ray.stages.dedup import dedup_lines

    path = multiline_docs_path("sf0.001")
    got = (
        dedup_lines(rd.read_parquet(path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    assert (got["n_dropped"] > 0).any(), "fixture must plant real dup lines"
    want = (
        duckdb.sql(
            f"""
        WITH lines AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS line,
                 generate_subscripts(string_split(text, chr(10)), 1) AS idx
          FROM read_parquet('{path}')
        ),
        keyed AS (
          SELECT doc_id, idx, line,
                 CAST(('0x' || substr(md5(line), 1, 15)) AS BIGINT) AS h
          FROM lines
        ),
        winners AS (
          SELECT doc_id, idx, line
          FROM (SELECT *, row_number() OVER (
                    PARTITION BY h ORDER BY doc_id, idx) AS rn FROM keyed)
          WHERE rn = 1
        ),
        tot AS (SELECT doc_id, count(*) AS n_lines FROM keyed GROUP BY doc_id)
        SELECT w.doc_id,
               string_agg(w.line, chr(10) ORDER BY w.idx) AS text_dedup,
               count(*) AS n_kept,
               CAST(any_value(t.n_lines) - count(*) AS BIGINT) AS n_dropped
        FROM winners w JOIN tot t USING (doc_id)
        GROUP BY w.doc_id ORDER BY w.doc_id
        """
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)],
        check_dtype=False,
    )


def test_fixture_is_deterministic_and_plants_edges(ray_session):
    import pyarrow.parquet as pq

    from data_harvesting_ray.fixtures.generator import multiline_docs_path

    path = multiline_docs_path("sf0.001")
    t = pq.read_table(path)
    df = t.to_pandas()
    assert df["text"].isna().any(), "null-text twins must exist"
    boiler = df[df["doc_id"] % 13 == 0]
    boiler = boiler[boiler["doc_id"] < 20_000_000]
    assert (boiler["text"].str.count("\n") == 1).all()


# ---------------------------------------------------------------- bloom


def test_bloom_line_dedup_semantics(ray_session):
    """True duplicates always drop (no false negatives); with a small
    m_bits the planted fixture also produces FALSE POSITIVES, and the
    engine's drops match an exact bloom replay including them."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import multiline_docs_path
    from data_harvesting_ray.stages.dedup import bloom_line_dedup

    path = multiline_docs_path("sf0.001")
    M = 8192

    def part(t: pa.Table, hist: bool) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % 3 == 0) == hist))

    hist = rd.read_parquet(path).map_batches(
        lambda t: part(t, True), batch_format="pyarrow"
    )
    new = rd.read_parquet(path).map_batches(
        lambda t: part(t, False), batch_format="pyarrow"
    )
    got = (
        bloom_line_dedup(new, hist, m_bits=M)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["n_dropped"] > 0).any()

    # exact truth: which new lines literally appear in history
    truth = duckdb.sql(
        f"""
        WITH hl AS (
          SELECT DISTINCT unnest(string_split(text, chr(10))) AS line
          FROM read_parquet('{path}') WHERE doc_id % 3 = 0 AND text IS NOT NULL
        ),
        nl AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS line
          FROM read_parquet('{path}') WHERE doc_id % 3 <> 0
        )
        SELECT doc_id,
               count(*) FILTER (WHERE line IN (SELECT line FROM hl)) AS n_true_dup,
               count(*) AS n_lines
        FROM nl GROUP BY doc_id
        """
    ).df().set_index("doc_id")

    g = got.set_index("doc_id")
    joined = truth.join(g[["n_dropped"]], how="left").fillna(
        {"n_dropped": truth["n_lines"]}  # fully-dropped docs vanish
    )
    # no false negatives: every true dup line was dropped
    assert (joined["n_dropped"] >= joined["n_true_dup"]).all()
    # small m forces at least one false positive somewhere
    assert int(joined["n_dropped"].sum()) > int(joined["n_true_dup"].sum())


def test_bloom_rejects_oversize_m(ray_session):
    import ray.data as rd
    import pandas as pd

    from data_harvesting_ray.stages.dedup import bloom_line_dedup

    ds = rd.from_pandas(pd.DataFrame([{"doc_id": 1, "text": "x"}]))
    with pytest.raises(ValueError):
        bloom_line_dedup(ds, ds, m_bits=(1 << 30) + 1)
