"""Tests for the training-data prep operators added in round 3:
scrub_text (PII redaction), contamination_flags, pack_sequences, and
with_rank."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from .conftest import assert_frames_equal


# --------------------------------------------------------------- scrub_text
def test_scrub_pii_preset(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.scrub import PII_RULES, scrub_text

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "contact alice.smith+test@example.co.uk or bob@x.io today",
                "server at 10.0.255.3 answered; backup 192.168.1.1 did not",
                "call +1 415 555 0100 or 0800-123456 now",
                "nothing sensitive here",
            ],
        }
    )
    out = (
        scrub_text(rd.from_pandas(docs), rules=PII_RULES)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "text_clean"] == "contact <EMAIL> or <EMAIL> today"
    assert out.loc[0, "n_redactions"] == 2
    assert out.loc[1, "text_clean"] == "server at <IP> answered; backup <IP> did not"
    assert out.loc[1, "n_redactions"] == 2
    assert "<PHONE>" in out.loc[2, "text_clean"]
    assert "555" not in out.loc[2, "text_clean"]
    assert out.loc[3, "text_clean"] == "nothing sensitive here"
    assert out.loc[3, "n_redactions"] == 0


def test_scrub_sequential_counts(ray_session):
    """Counts are measured on the text AFTER earlier rules ran: a rule
    whose matches were consumed by an earlier rule counts zero."""
    import ray.data as rd

    from data_harvesting_ray.stages.scrub import scrub_text

    docs = pd.DataFrame({"doc_id": [0], "text": ["abc abc"]})
    out = scrub_text(
        rd.from_pandas(docs), rules=[(r"abc", "x"), (r"abc", "y")]
    ).to_pandas()
    assert out.loc[0, "text_clean"] == "x x"
    assert out.loc[0, "n_redactions"] == 2  # rule 2 found nothing left


# ------------------------------------------------------ contamination_flags
def test_contamination_flags(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.scrub import contamination_flags

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "a quick brown fox appears in this document too",
                "completely unrelated content",
                "quick brown fox AND lazy dog both appear here",
            ],
        }
    )
    out = (
        contamination_flags(
            rd.from_pandas(docs), snippets=["quick brown fox", "lazy dog"]
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_hits"].tolist() == [2, 1, 0, 2]
    assert out["contaminated"].tolist() == [True, True, False, True]


def test_contamination_duplicate_snippets_count_once(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.scrub import contamination_flags

    docs = pd.DataFrame({"doc_id": [0], "text": ["hello world"]})
    out = contamination_flags(
        rd.from_pandas(docs), snippets=["hello", "hello", "hello"]
    ).to_pandas()
    assert out.loc[0, "n_hits"] == 1  # deduplicated snippet list


# ------------------------------------------------------------ pack_sequences
def _pack_oracle(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    d = df.sort_values("doc_id").reset_index(drop=True)
    off = np.concatenate(([0], np.cumsum(d["n_tokens"].to_numpy())[:-1]))
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"],
            "n_tokens": d["n_tokens"].astype(np.int64),
            "seq_id": off // budget,
            "seq_off": off % budget,
        }
    )


@pytest.mark.parametrize("range_size", [7, 64, 10_000])
def test_pack_sequences_matches_serial_oracle(ray_session, range_size):
    """Output is identical for any range decomposition (partitioning
    invariance) and equals the serial cumsum oracle, including docs
    straddling budget boundaries and non-dense ids."""
    import ray.data as rd

    from data_harvesting_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(0, 10_000, size=400))  # non-dense
    df = pd.DataFrame(
        {
            "doc_id": ids,
            "n_tokens": rng.integers(0, 900, size=len(ids)),  # some > budget
        }
    )
    out = pack_sequences(
        rd.from_pandas(df.sample(frac=1, random_state=3)),  # arrival-shuffled
        budget=512,
        range_size=range_size,
        num_buckets=4,
    ).to_pandas()
    assert_frames_equal(out, _pack_oracle(df, 512), ["doc_id"])


def test_pack_sequences_rejects_negative_ids(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.packing import pack_sequences

    df = pd.DataFrame({"doc_id": [-1, 0], "n_tokens": [5, 5]})
    with pytest.raises(Exception):
        pack_sequences(rd.from_pandas(df), budget=16, num_buckets=2).to_pandas()


# ------------------------------------------------------------------ with_rank
def _rank_oracle(df: pd.DataFrame, method: str, ascending: bool) -> pd.Series:
    m = {"rank": "min", "dense_rank": "dense", "row_number": "first"}[method]
    return (
        df.groupby("k")["v"].rank(method=m, ascending=ascending).astype(np.int64)
    )


@pytest.mark.parametrize("method", ["rank", "dense_rank", "row_number"])
@pytest.mark.parametrize("descending", [False, True])
def test_with_rank_randomized_vs_pandas(ray_session, method, descending):
    import ray.data as rd

    from data_harvesting_ray.stages.window_fns import with_rank

    rng = np.random.default_rng(23)
    n = 600
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 17, size=n).astype(str),
            "v": rng.integers(0, 9, size=n),  # heavy ties
            "rid": np.arange(n),
        }
    )
    if method == "row_number":
        # row_number is only deterministic under a tie-free order
        df["v"] = rng.permutation(n)
    out = with_rank(
        rd.from_pandas(df),
        key="k",
        order="v",
        method=method,
        descending=descending,
        out_col="r",
        num_buckets=4,
    ).to_pandas()
    want = df.assign(r=_rank_oracle(df, method, ascending=not descending))
    assert_frames_equal(out, want, ["rid"])


def test_with_rank_string_order_column(ray_session):
    """Factorized order codes must sort strings lexicographically
    (matching ORDER BY on a varchar)."""
    import ray.data as rd

    from data_harvesting_ray.stages.window_fns import with_rank

    df = pd.DataFrame(
        {"k": ["a"] * 4, "v": ["banana", "apple", "cherry", "apple"]}
    )
    out = (
        with_rank(rd.from_pandas(df), key="k", order="v", out_col="r", num_buckets=2)
        .to_pandas()
        .sort_values("v", kind="stable")
        .reset_index(drop=True)
    )
    assert out["v"].tolist() == ["apple", "apple", "banana", "cherry"]
    assert out["r"].tolist() == [1, 1, 3, 4]


# -------------------------------------------------------------- explode_tokens
def test_explode_tokens_matches_split(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.text import explode_tokens

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b  c", "", "  x  ", "one"],
        }
    )
    out = explode_tokens(rd.from_pandas(docs)).to_pandas()
    want = pd.DataFrame(
        {
            "doc_id": [0, 0, 0, 1, 2, 3],
            "pos": [0, 1, 2, 0, 0, 0],
            # empty doc yields one empty token — the regexp_split SQL
            # convention the oracle pins
            "token": ["a", "b", "c", "", "x", "one"],
        }
    )
    assert_frames_equal(out, want, ["doc_id", "pos"])


# --------------------------------------------------------------- rollup_counts
def test_rollup_counts_matches_pandas(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import rollup_counts

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], size=300),
            "b": rng.choice(["p", "q"], size=300),
        }
    )
    out = rollup_counts(rd.from_pandas(df), keys=["a", "b"]).to_pandas()
    fine = df.groupby(["a", "b"], as_index=False).size().rename(columns={"size": "n"})
    lvl1 = df.groupby(["a"], as_index=False).size().rename(columns={"size": "n"})
    lvl1["b"] = None
    grand = pd.DataFrame({"a": [None], "b": [None], "n": [len(df)]})
    want = pd.concat([fine, lvl1, grand], ignore_index=True)[["a", "b", "n"]]
    g = out.fillna("∅").sort_values(["a", "b"]).reset_index(drop=True)
    w = want.fillna("∅").sort_values(["a", "b"]).reset_index(drop=True)
    w["n"] = w["n"].astype("int64")
    g["n"] = g["n"].astype("int64")
    pd.testing.assert_frame_equal(g[["a", "b", "n"]], w, check_dtype=False)


# --------------------------------------------------- equi_join key prefilter
def _join_fixture():
    rng = np.random.default_rng(31)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 40, size=300),
            "lv": rng.integers(0, 1000, size=300),
        }
    )
    right = pd.DataFrame(
        {
            # only half the key space overlaps: the prefilter has
            # something real to drop in both directions
            "k": rng.integers(20, 60, size=250),
            "rv": rng.integers(0, 1000, size=250),
        }
    )
    return left, right


@pytest.mark.parametrize(
    "how,side",
    [
        ("inner", "left"),
        ("inner", "right"),
        ("semi", "left"),
        ("semi", "right"),
        ("left", "left"),
        ("anti", "left"),
    ],
)
def test_equi_join_prefilter_output_identical(ray_session, how, side):
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    left, right = _join_fixture()
    base = equi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how=how, num_buckets=4
    ).to_pandas()
    pre = equi_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        how=how,
        num_buckets=4,
        prefilter=side,
    ).to_pandas()
    sort_cols = [c for c in ["k", "lv", "rv"] if c in base.columns]
    assert_frames_equal(pre, base, sort_cols)


@pytest.mark.parametrize("how", ["left", "anti"])
def test_equi_join_prefilter_right_invalid_for_outer(ray_session, how):
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    left, right = _join_fixture()
    with pytest.raises(ValueError):
        equi_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            how=how,
            prefilter="right",
        )


def test_equi_join_prefilter_cap_skips_but_stays_correct(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    left, right = _join_fixture()
    with pytest.warns(UserWarning, match="prefilter skipped"):
        out = equi_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            how="inner",
            num_buckets=4,
            prefilter="left",
            prefilter_cap=3,  # force the skip path
        ).to_pandas()
    base = equi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how="inner", num_buckets=4
    ).to_pandas()
    assert_frames_equal(out, base, ["k", "lv", "rv"])


# --------------------------------------------- connected components (paths)
def test_components_local_and_distributed_paths_identical(ray_session):
    """The measured-small driver path and the distributed label
    propagation are the same min-label fixpoint: identical outputs on
    a random graph with chains, cliques, and singleton-free nodes."""
    import ray.data as rd

    from data_harvesting_ray.stages.components import connected_components

    rng = np.random.default_rng(41)
    # chain 0-1-2-...-9 (diameter), a clique on 100..104, random pairs
    chain = [(i, i + 1) for i in range(9)]
    clique = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    rand = [
        (int(a), int(b))
        for a, b in rng.integers(200, 260, size=(40, 2))
        if a != b
    ]
    pairs = pd.DataFrame(chain + clique + rand, columns=["doc_a", "doc_b"])
    ds = rd.from_pandas(pairs)
    local = connected_components(ds, num_buckets=4).to_pandas()
    dist = connected_components(
        rd.from_pandas(pairs), num_buckets=4, small_cap=0
    ).to_pandas()
    assert_frames_equal(local, dist, ["doc_id"])
    # chain collapses to min label 0
    g = local.set_index("doc_id")["group_id"]
    assert all(g[i] == 0 for i in range(10))
    assert all(g[100 + i] == 100 for i in range(5))


# ------------------------------------------------------------- asof LEFT join
def test_asof_left_join_keeps_unmatched_and_big_ints(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.asof import asof_join

    big = 2**61 + 12345  # would be corrupted by any float64 round-trip
    left = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 3],
            "ts": pd.to_datetime([10, 20, 5, 7], unit="s").astype("datetime64[us]"),
            "lv": [100, 200, 300, 400],
        }
    )
    right = pd.DataFrame(
        {
            "user_id": [1, 2],
            "ts": pd.to_datetime([15, 50], unit="s").astype("datetime64[us]"),
            "rid": [big, big + 1],
        }
    )
    out = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            by="user_id", on="ts", num_buckets=2, how="left",
        )
        .to_pandas()
        .sort_values(["user_id", "ts"])
        .reset_index(drop=True)
    )
    assert len(out) == 4  # every left row kept
    assert str(out["rid"].dtype) == "Int64"
    # user 1 @20s matches the click @15s with the exact big id
    matched = out[(out["user_id"] == 1) & (out["lv"] == 200)]["rid"].iloc[0]
    assert int(matched) == big
    # the other three rows have no at-or-before right row
    assert out["rid"].isna().sum() == 3
    # conformance vs pandas merge_asof on the same frames
    want = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="user_id", direction="backward",
    )
    assert int(want["rid"].notna().sum()) == 1


def test_asof_left_empty_right_bucket_typed(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.asof import asof_join

    left = pd.DataFrame(
        {
            "user_id": [7],
            "ts": pd.to_datetime([3], unit="s").astype("datetime64[us]"),
            "lv": [1],
        }
    )
    right = pd.DataFrame(
        {
            "user_id": pd.Series(dtype=np.int64),
            "ts": pd.Series(dtype="datetime64[us]"),
            "rv": pd.Series(dtype=np.int64),
        }
    )
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by="user_id", on="ts", num_buckets=2, how="left",
    ).to_pandas()
    assert len(out) == 1 and out["rv"].isna().all()
    assert str(out["rv"].dtype) == "Int64"


# --------------------------------------------------------- keep_best_per_group
def test_keep_best_per_group_argmax_and_ties(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.components import keep_best_per_group

    groups = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 10, 11],
            "group_id": [0, 0, 0, 10, 10],
        }
    )
    metrics = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 10, 11, 99],
            "n_tokens": [5, 9, 9, 4, 4, 1000],  # ties in both groups
        }
    )
    out = (
        keep_best_per_group(
            rd.from_pandas(groups), rd.from_pandas(metrics),
            score="n_tokens", num_buckets=2,
        )
        .to_pandas()
        .sort_values("group_id")
        .reset_index(drop=True)
    )
    # group 0: 1 and 2 tie at 9 -> smallest id 1; group 10: tie -> 10
    assert out["keep_doc_id"].tolist() == [1, 10]
    assert out["n_tokens"].tolist() == [9, 4]


def test_keep_best_per_group_missing_score_raises(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.components import keep_best_per_group

    groups = pd.DataFrame({"doc_id": [0, 1], "group_id": [0, 0]})
    metrics = pd.DataFrame({"doc_id": [0], "n_tokens": [5]})
    with pytest.raises(ValueError, match="lacks"):
        keep_best_per_group(
            rd.from_pandas(groups), rd.from_pandas(metrics), score="n_tokens"
        )


# ---------------------------------------------------------------- overlap_join
def _overlap_oracle(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
    m = a.merge(b, on="k")
    keep = (m["a_s"] <= m["b_e"]) & (m["b_s"] <= m["a_e"])
    return m[keep].reset_index(drop=True)


@pytest.mark.parametrize("chunk_s", [1, 7, 1000])
def test_overlap_join_randomized_vs_allpairs(ray_session, chunk_s):
    """Exactly-once pair emission for any chunk size (partitioning
    invariance), including boundary-touching intervals (closed
    semantics) and intervals spanning many chunks."""
    import ray.data as rd

    from data_harvesting_ray.stages.asof import overlap_join

    rng = np.random.default_rng(53)
    n = 150

    def mk(prefix: str, ids):
        s = rng.integers(0, 500, size=len(ids))
        ln = rng.integers(0, 40, size=len(ids))  # zero-length allowed
        return pd.DataFrame(
            {
                "k": rng.integers(0, 6, size=len(ids)),
                f"{prefix}_id": ids,
                f"{prefix}_s": pd.to_datetime(s, unit="s").astype("datetime64[us]"),
                f"{prefix}_e": pd.to_datetime(s + ln, unit="s").astype(
                    "datetime64[us]"
                ),
            }
        )

    a, b = mk("a", np.arange(n)), mk("b", np.arange(n) + 1000)
    out = (
        overlap_join(
            rd.from_pandas(a), rd.from_pandas(b),
            by="k", l_span=("a_s", "a_e"), r_span=("b_s", "b_e"),
            chunk_s=chunk_s, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "a_id", "b_id"])
        .reset_index(drop=True)
    )
    want = _overlap_oracle(a, b).sort_values(["k", "a_id", "b_id"]).reset_index(drop=True)
    assert_frames_equal(out, want, ["k", "a_id", "b_id"])


def test_overlap_join_chunk_explosion_raises(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.asof import overlap_join

    a = pd.DataFrame(
        {
            "k": [1],
            "a_id": [1],
            "a_s": pd.to_datetime([0], unit="s").astype("datetime64[us]"),
            "a_e": pd.to_datetime([10_000], unit="s").astype("datetime64[us]"),
        }
    )
    b = a.rename(columns={"a_id": "b_id", "a_s": "b_s", "a_e": "b_e"})
    with pytest.raises(Exception, match="max_chunks_per_row"):
        overlap_join(
            rd.from_pandas(a), rd.from_pandas(b),
            by="k", l_span=("a_s", "a_e"), r_span=("b_s", "b_e"),
            chunk_s=1, num_buckets=2, max_chunks_per_row=100,
        ).to_pandas()


# -------------------------------------------------------------- explode_ngrams
def test_explode_ngrams_boundaries(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.text import explode_ngrams

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["a b c d", "x y", "lonely", "p q r"],
        }
    )
    out = (
        explode_ngrams(rd.from_pandas(docs), n=3)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    # doc 1 (2 tokens) and doc 2 (1 token) emit nothing; windows never
    # cross document boundaries
    want = pd.DataFrame(
        {
            "doc_id": [0, 0, 3],
            "pos": [0, 1, 0],
            "ngram": ["a b c", "b c d", "p q r"],
        }
    )
    assert_frames_equal(out, want, ["doc_id", "pos"])


# --------------------------------------------------- channel selection (sink pruning)
def test_streaming_channel_selection(ray_session, tmp_path, df_small):
    """channels=("latency",) computes/commits only that derived channel
    — the others are absent from the sink (output-side pruning); the
    selected channel still equals the single-process reference."""
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    eng = StreamingEngine(
        str(tmp_path / "chan"),
        num_shards=2,
        config=EngineConfig(channels=("latency",)),
    )
    eng.run(epochs_root=epochs_root("sf0.001"))
    assert len(eng.results_pandas("rolling")) == 0
    assert len(eng.results_pandas("tumbling")) == 0
    assert_frames_equal(
        eng.results_pandas("latency"),
        R.response_latency(df_small),
        ["conv_id", "turn_idx"],
    )
    # core channels always emit
    assert len(eng.results_pandas("sessions")) > 0


def test_engine_config_rejects_unknown_channel(ray_session):
    from data_harvesting_ray.config import EngineConfig

    with pytest.raises(ValueError, match="unknown channels"):
        EngineConfig(channels=("bogus",)).validate()


# ---------------------------------------------------------------- late repair
def test_late_repair_restores_bounded_truth(ray_session, tmp_path, df_small):
    """Tight-watermark streaming over a disordered epoch layout
    quarantines late rows; the repair pass recomputes affected convs
    and the merged channel equals the single-process reference."""
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import late_epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.repair import repair_sessions
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    root = late_epochs_root("sf0.001")
    out = str(tmp_path / "repair")
    eng = StreamingEngine(
        out, num_shards=2, config=EngineConfig(channels=(), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    n_late = len(eng.results_pandas("late"))
    assert n_late > 0  # the disordered layout must actually produce lates
    # before repair the committed sessions DIVERGE from the truth
    committed = eng.results_pandas("sessions")
    want = R.session_windows(df_small)
    assert not committed.sort_values(["conv_id", "session_id"]).reset_index(
        drop=True
    ).equals(want.sort_values(["conv_id", "session_id"]).reset_index(drop=True))
    repaired = repair_sessions(out, root).to_pandas()
    assert_frames_equal(repaired, want, ["conv_id", "session_id"])


def test_late_repair_is_noop_without_late_rows(ray_session, tmp_path, df_small):
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.repair import repair_sessions
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    root = epochs_root("sf0.001")  # ordered epochs: zero late rows
    out = str(tmp_path / "norepair")
    eng = StreamingEngine(out, num_shards=2)
    eng.run(epochs_root=root)
    assert len(eng.results_pandas("late")) == 0
    repaired = repair_sessions(out, root).to_pandas()
    assert_frames_equal(
        repaired, R.session_windows(df_small), ["conv_id", "session_id"]
    )


def test_late_repair_pairs(ray_session, tmp_path, df_small):
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import late_epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.repair import repair_pairs
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    root = late_epochs_root("sf0.001")
    out = str(tmp_path / "repair-pairs")
    eng = StreamingEngine(
        out, num_shards=2, config=EngineConfig(channels=(), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    assert len(eng.results_pandas("late")) > 0
    repaired = repair_pairs(out, root).to_pandas()
    assert_frames_equal(repaired, R.tool_join(df_small), ["conv_id", "call_turn_idx"])


# --------------------------------------------------- review-fix regressions
def test_prefilter_null_keys_output_identical(ray_session):
    """Null join keys must not change prefiltered output (they pass the
    filter unconditionally; the bucket kernel decides) nor crash
    np.isin on object arrays containing None."""
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    left = pd.DataFrame({"k": ["a", None, "b", None], "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": ["a", None, "c"], "rv": [10, 20, 30]})
    base = equi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how="inner", num_buckets=2
    ).to_pandas()
    pre = equi_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", how="inner", num_buckets=2, prefilter="right",
    ).to_pandas()
    assert_frames_equal(pre.fillna("∅"), base.fillna("∅"), ["lv", "rv"])


def test_with_rank_nulls_last_both_directions(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.window_fns import with_rank

    df = pd.DataFrame({"k": ["a"] * 4, "v": [5.0, np.nan, 3.0, np.nan]})
    for desc, want in [(False, [2, 3, 1, 3]), (True, [1, 3, 2, 3])]:
        out = with_rank(
            rd.from_pandas(df.assign(rid=np.arange(4))),
            key="k", order="v", descending=desc, out_col="r", num_buckets=2,
        ).to_pandas().sort_values("rid")
        assert out["r"].tolist() == want, (desc, out["r"].tolist())


def test_scrub_and_contamination_null_text(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.scrub import contamination_flags, scrub_text

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["a@b.io", None]})
    s = scrub_text(rd.from_pandas(docs)).to_pandas().sort_values("doc_id")
    assert s["n_redactions"].tolist() == [1, 0]
    assert s["text_clean"].iloc[1] is None or pd.isna(s["text_clean"].iloc[1])
    c = contamination_flags(
        rd.from_pandas(docs), snippets=["a@b", ""]
    ).to_pandas().sort_values("doc_id")
    assert c["n_hits"].tolist() == [1, 0]  # empty snippet dropped, null text clean


def test_repair_cli_roundtrip(ray_session, tmp_path, df_small):
    """User story: finished engine output + `repair` subcommand in a
    fresh process -> merged corrected channel on disk equals the
    reference."""
    import subprocess
    import sys

    import pyarrow.parquet as pq

    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import late_epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine

    root = late_epochs_root("sf0.001")
    out = str(tmp_path / "eng")
    eng = StreamingEngine(
        out, num_shards=2, config=EngineConfig(channels=(), watermark_delay_s=600)
    )
    eng.run(epochs_root=root)
    dest = str(tmp_path / "repaired")
    r = subprocess.run(
        [sys.executable, "-m", "data_harvesting_ray", "repair",
         "--out", out, "--epochs-root", root, "--dest", dest],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    got = pq.read_table(dest).to_pandas()
    assert_frames_equal(got, R.session_windows(df_small), ["conv_id", "session_id"])
