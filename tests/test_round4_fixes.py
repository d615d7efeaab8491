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


# ------------------------------------------------- corpus_prep losers_cap
def _dup_heavy_docs():
    """Pathological dup-rate corpus: every doc passes the en/quality
    gates and sits in a near-dup group (losers >> any tiny cap)."""
    base = (
        "the quick brown fox jumps over the lazy dog and the cat sat on "
        "the mat with a friend of the family in the house for the day"
    )
    rows = []
    for g in range(6):
        for v in range(4):  # 4-member groups → 3 losers each
            rows.append(
                {
                    "doc_id": np.int64(g * 10 + v),
                    "text": base + f" group {g}" + (" extra" * v),
                }
            )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("keep", ["min_id", "best_tokens"])
def test_corpus_prep_anti_join_path_matches_broadcast(ray_session, keep):
    """VERDICT r3 item 1: past losers_cap the loser filter must run as
    the distributed anti-join and produce exactly the broadcast path's
    output."""
    import ray.data as rd

    from data_harvesting_ray.pipelines.corpus_prep import corpus_prep

    df = _dup_heavy_docs()

    def run(cap):
        out = corpus_prep(
            rd.from_pandas(df), keep=keep, losers_cap=cap
        ).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    broadcast = run(10**9)
    anti = run(0)  # every grouped id exceeds the cap → anti-join path
    assert len(broadcast) > 0
    # the fixture really exercises the dedup: losers were dropped
    assert len(broadcast) < len(df)
    pd.testing.assert_frame_equal(
        anti[sorted(anti.columns)], broadcast[sorted(broadcast.columns)]
    )


# -------------------------------------------- LSH banding margin assertion
def test_fixture_true_pairs_sit_above_banding_midpoint():
    """ADVICE r3: the 16x8 MinHash banding has capture probability
    ~0.61 AT the 0.70 verify threshold — correctness rests on true
    pairs sitting well above the S-curve midpoint (1/b)^(1/r)=0.707.
    Pin that corpus-margin assumption on the driver fixture: every
    true pair (exact 5-gram Jaccard >= 700) must be >= 850."""
    import pyarrow.parquet as pq

    from data_harvesting_ray.stages.dedup_approx import char_shingles

    df = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    sh = {r.doc_id: set(char_shingles(r.text).tolist()) for r in df.itertuples()}
    ids = sorted(sh)
    true_pairs = []
    for i, a in enumerate(ids):
        sa = sh[a]
        for b in ids[i + 1 :]:
            inter = len(sa & sh[b])
            if inter and inter * 1000 // max(len(sa | sh[b]), 1) >= 700:
                true_pairs.append(inter * 1000 // len(sa | sh[b]))
    assert true_pairs, "fixture has no true near-dup pairs — gate is vacuous"
    assert min(true_pairs) >= 850, (
        f"true pair at Jaccard {min(true_pairs)} milli sits near the "
        "16x8 banding midpoint (707): capture probability is no longer "
        "safely ~1; retune bands or the fixture"
    )


# ------------------------------------------------------- vectorized LangId
def test_langid_vectorized_matches_row_loop():
    """VERDICT r3 item 6: the Arrow/bincount LangId must reproduce the
    original per-row loop bit-for-bit, including ties (first profile in
    LANG_PROFILES order wins) and zero-hit -> unknown."""
    from data_harvesting_ray.stages.text import LANG_PROFILES, LangId

    profiles = {k: frozenset(v) for k, v in LANG_PROFILES.items()}

    def row_guess(text):
        ws = text.lower().split()
        best, best_n = "unknown", 0
        for lang, prof in profiles.items():
            n = sum(1 for w in ws if w in prof)
            if n > best_n:
                best, best_n = lang, n
        return best

    vocab = sorted({w for p in LANG_PROFILES.values() for w in p}) + [
        "zz", "qqq", "x1",
    ]
    rng = np.random.default_rng(17)
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(500)
    ] + ["", "   ", "the the der der", "le le la la", "ZZ qqq"]
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    got = LangId()(df)["lang_pred"].tolist()
    want = [row_guess(t) for t in texts]
    assert got == want


# ----------------------------------------------- schema-metadata guard
def test_no_bare_from_pandas_in_stages_or_pipelines():
    """VERDICT r3 item 8: every pandas->Arrow conversion in engine
    stages/pipelines must go through to_clean_arrow (pandas schema
    metadata is unhashable and breaks the shuffle fast path)."""
    import pathlib

    root = pathlib.Path("data_harvesting_ray")
    offenders = []
    for sub in ("stages", "pipelines", "sinks", "state", "sources"):
        for f in (root / sub).glob("*.py"):
            src = f.read_text()
            if "pa.Table.from_pandas" in src and f.name != "partition.py":
                # writer-only call sites (pq.write_table) never feed a
                # shuffle; flag anything else
                for line in src.splitlines():
                    if "pa.Table.from_pandas" in line and "pq.write_table" not in line:
                        offenders.append((str(f), line.strip()))
    assert not offenders, offenders


def test_to_clean_arrow_strips_metadata_and_hashable():
    from data_harvesting_ray.stages.partition import to_clean_arrow

    t = to_clean_arrow(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
    assert t.schema.metadata is None
    hash(t.schema)  # must not raise


# ------------------------------------------------------ repair dest guard
def test_repair_cli_refuses_nonempty_dest(tmp_path):
    """ADVICE r3: a rerun into a non-empty --dest must be refused, not
    silently appended + double-counted."""
    from data_harvesting_ray.__main__ import repair_main

    dest = tmp_path / "dest"
    dest.mkdir()
    (dest / "stale.parquet").write_bytes(b"x")
    with pytest.raises(SystemExit) as e:
        repair_main(
            [
                "--out", str(tmp_path / "out"),
                "--epochs-root", str(tmp_path / "epochs"),
                "--dest", str(dest),
            ]
        )
    assert e.value.code == 2
    assert (dest / "stale.parquet").read_bytes() == b"x"


# ------------------------------------------- incremental _distinct_keys
def test_distinct_keys_incremental(ray_session):
    """ADVICE r3: amortized dedup — same result set, cap still aborts."""
    import ray.data as rd

    from data_harvesting_ray.stages.join import _distinct_keys

    df = pd.DataFrame({"k": [f"k{i % 57}" for i in range(5_000)], "v": 0})
    ds = rd.from_pandas(df).repartition(8)
    keys = _distinct_keys(ds, ["k"], cap=1_000)
    assert keys is not None
    assert sorted(keys["k"]) == sorted(f"k{i}" for i in range(57))
    with pytest.warns(UserWarning, match="prefilter skipped"):
        assert _distinct_keys(ds, ["k"], cap=10) is None


# ---------------------------------------------- dedup_exact dup_fp fallback
def test_dedup_exact_fallback_matches_fast_path(ray_session):
    """VERDICT r3 item 3: past dup_fp_cap the full keyed shuffle must
    run (with a warning naming the cap) and produce the fast path's
    exact output, on a high-dup fixture."""
    import warnings

    import ray.data as rd

    from data_harvesting_ray.stages.dedup import dedup_exact

    rng = np.random.default_rng(3)
    n = 2_000
    df = pd.DataFrame(
        {
            "conv_id": [f"c{i % 37}" for i in range(n)],
            "turn_idx": (np.arange(n, dtype=np.int64) % 13),
            "role": rng.choice(["user", "assistant", "tool"], size=n),
            "text": [f"t{i % 11}" for i in range(n)],
        }
    )
    # byte-identical duplicate rows only (the dedup contract): keep the
    # FIRST row of each (conv_id, turn_idx) key, so make all rows of a
    # key identical
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    df = df.groupby(["conv_id", "turn_idx"], sort=False).transform("first").join(
        df[["conv_id", "turn_idx"]]
    )[["conv_id", "turn_idx", "role", "text"]].reset_index(drop=True)

    def run(cap):
        out = dedup_exact(rd.from_pandas(df), dup_fp_cap=cap).to_pandas()
        return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    fast = run(10**9)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        slow = run(0)
    assert any("dup_fp_cap=0" in str(x.message) for x in w)
    assert len(fast) == 37 * 13
    pd.testing.assert_frame_equal(fast, slow)


# --------------------------------------------- count-bounded IVF sampling
def test_ivf_sample_size_flat_across_fixture_sizes(ray_session):
    """VERDICT r3 item 2: the centroid-training driver sample must stay
    ~sample_budget rows as the corpus grows (count-bounded threshold,
    not a corpus fraction)."""
    from data_harvesting_ray.stages.similarity import (
        ivf_sample_mask,
        ivf_sample_threshold_micro,
    )

    budget = 2_000
    sizes = (20_000, 160_000)
    got = []
    for n in sizes:
        ids = np.arange(n, dtype=np.int64)
        thr = ivf_sample_threshold_micro(n, sample_frac=0.5, sample_budget=budget)
        got.append(int(ivf_sample_mask(ids, threshold_micro=thr).sum()))
    # both sample sizes within 25% of the budget despite an 8x corpus
    for n, s in zip(sizes, got):
        assert abs(s - budget) < budget * 0.25, (n, s)
    # small corpora keep the plain fractional sample
    thr_small = ivf_sample_threshold_micro(1_000, 0.5, budget)
    assert thr_small == 500_000


def test_knn_ivf_matches_driver_side_recompute(ray_session):
    """Engine centroids (count-bounded sample over Ray) must equal the
    side-table oracle's independent numpy recompute."""
    import ray.data as rd

    from data_harvesting_ray.stages.similarity import (
        _normalize_rows,
        _stack,
        ivf_sample_mask,
        ivf_sample_threshold_micro,
        kmeans_lloyd,
        train_centroids,
    )

    rng = np.random.default_rng(7)
    n = 3_000
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(rng.normal(size=(n, 8)).astype(np.float64)),
        }
    )
    cents = train_centroids(rd.from_pandas(emb), n_centroids=4, sample_budget=512)
    thr = ivf_sample_threshold_micro(n, 0.5, 512)
    mask = ivf_sample_mask(emb["vec_id"].to_numpy(), threshold_micro=thr)
    want = kmeans_lloyd(_stack(emb["embedding"][mask]), 4)
    assert np.array_equal(cents, want)


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
