"""Round-4 operator additions: NTILE window function, TF-IDF query
scoring, exact substring-window dedup — randomized differentials
against DuckDB / brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


# ------------------------------------------------------------- with_ntile
@pytest.mark.parametrize("n_tiles", [1, 3, 4, 7])
def test_with_ntile_randomized_vs_duckdb(ray_session, n_tiles):
    """NTILE over a tie-free order column must equal DuckDB's NTILE
    for every tile count, including tiles > group size."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.window_fns import with_ntile

    rng = np.random.default_rng(41 + n_tiles)
    n = 500
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 37, n).astype(str),
            "v": rng.permutation(n).astype(np.int64),  # tie-free order
        }
    )
    got = (
        with_ntile(
            rd.from_pandas(df), key="k", order="v", n_tiles=n_tiles, num_buckets=4
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        f"SELECT k, v, CAST(NTILE({n_tiles}) OVER "
        "(PARTITION BY k ORDER BY v) AS BIGINT) AS tile "
        "FROM t ORDER BY k, v"
    ).df()
    con.close()
    pd.testing.assert_frame_equal(
        got[["k", "v", "tile"]], want, check_dtype=False
    )


def test_with_ntile_descending_and_small_groups(ray_session):
    """DESC ordering and groups smaller than n_tiles (one row per
    tile, trailing tiles empty — SQL semantics: tile = row number)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.window_fns import with_ntile

    df = pd.DataFrame(
        {"k": ["a", "a", "b", "c", "c", "c"], "v": [1, 2, 5, 9, 8, 7]}
    )
    got = (
        with_ntile(
            rd.from_pandas(df),
            key="k",
            order="v",
            n_tiles=4,
            descending=True,
            num_buckets=2,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT k, v, CAST(NTILE(4) OVER "
        "(PARTITION BY k ORDER BY v DESC) AS BIGINT) AS tile "
        "FROM t ORDER BY k, v"
    ).df()
    con.close()
    pd.testing.assert_frame_equal(got[["k", "v", "tile"]], want, check_dtype=False)


def test_with_ntile_rejects_bad_tile_count(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.window_fns import with_ntile

    with pytest.raises(ValueError, match="n_tiles"):
        with_ntile(
            rd.from_pandas(pd.DataFrame({"k": ["a"], "v": [1]})),
            key="k",
            order="v",
            n_tiles=0,
        )


# ----------------------------------------------------------------- tf-idf
def test_tfidf_scores_randomized_vs_duckdb(ray_session):
    """tfidf_scores must equal its generated SQL oracle on a random
    corpus that includes an empty document and a term absent from the
    corpus (df=0 — the smoothed IDF keeps both sides total)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.relevance import (
        tfidf_oracle_sql,
        tfidf_scores,
    )

    rng = np.random.default_rng(7)
    vocab = np.array(["join", "scan", "hash", "sort", "merge", "window"])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 30))) for _ in range(200)
    ]
    texts[13] = ""  # empty doc: one empty token, matches nothing
    texts[77] = "   join   join \t hash  "  # irregular whitespace
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    terms = ("join", "window", "nosuchterm")

    got = (
        tfidf_scores(rd.from_pandas(df), terms=terms)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", df)
    want = (
        con.execute(tfidf_oracle_sql("docs", terms))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con.close()
    assert (got["doc_id"] == want["doc_id"]).all()
    np.testing.assert_allclose(got["score"], want["score"], rtol=0, atol=1e-12)
    # empty doc and df=0 term contribute nothing
    assert got.loc[got["doc_id"] == 13, "score"].iloc[0] == 0.0


def test_tfidf_df_pass_is_bounded(ray_session):
    """term_doc_frequencies returns |terms| dfs + N regardless of
    corpus size (the driver hop is bounded by the QUERY)."""
    import ray.data as rd

    from data_harvesting_ray.stages.relevance import term_doc_frequencies

    df = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64),
            "text": ["join scan"] * 25 + ["sort"] * 25,
        }
    )
    dfs, n = term_doc_frequencies(rd.from_pandas(df), ["join", "sort", "zz"])
    assert n == 50
    assert dfs.tolist() == [25, 25, 0]


def test_tfidf_oracle_sql_rejects_unsafe_terms():
    from data_harvesting_ray.stages.relevance import tfidf_oracle_sql

    with pytest.raises(ValueError, match="SQL-literal-safe"):
        tfidf_oracle_sql("docs", ["fine", "bad'term"])


# ------------------------------------------------------- window_dup_pairs
def _brute_window_pairs(df: pd.DataFrame, n: int) -> set[tuple[int, int]]:
    grams: dict[int, set] = {}
    for _, r in df.iterrows():
        toks = r["text"].strip().split()
        grams[r["doc_id"]] = {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        }
    ids = sorted(grams)
    return {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if grams[a] & grams[b]
    }


def test_window_dup_pairs_randomized_vs_brute_force(ray_session):
    """Distinct pairs sharing any verbatim n-token window — exact, so
    brute force over token-set intersections is the oracle."""
    import ray.data as rd

    from data_harvesting_ray.stages.dedup_approx import window_dup_pairs

    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(300)])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 40))) for _ in range(80)
    ]
    # plant shared spans: doc 80/81 copy spans from docs 0/1
    texts.append(texts[0][:60] + " unique tail here")
    texts.append("prefix differs " + texts[1])
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )

    got = (
        window_dup_pairs(rd.from_pandas(df), n=4, num_buckets=4)
        .to_pandas()
        .itertuples(index=False)
    )
    assert set(map(tuple, got)) == _brute_window_pairs(df, 4)


def test_window_dup_pairs_df_cap_raises(ray_session):
    """A window shared by more documents than df_cap must RAISE (the
    certified-exactness contract), not silently skip."""
    import ray.data as rd

    from data_harvesting_ray.stages.dedup_approx import window_dup_pairs

    df = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "text": ["same exact boilerplate window here"] * 10,
        }
    )
    with pytest.raises(Exception, match="df_cap"):
        window_dup_pairs(rd.from_pandas(df), n=5, df_cap=4, num_buckets=1).to_pandas()
    # and passes when the cap admits the group
    out = window_dup_pairs(
        rd.from_pandas(df), n=5, df_cap=16, num_buckets=1
    ).to_pandas()
    assert len(out) == 45  # C(10,2): all pairs share the window


# -------------------------------------------------------- ngram_repetition
def test_ngram_repetition_randomized_vs_duckdb(ray_session):
    """Gopher-style within-doc repetition vs a DuckDB explode+GROUP BY
    oracle, incl. short docs (< n tokens: no output row) and a fully
    repetitive doc (ratio -> 1000-ish)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.text import ngram_repetition

    rng = np.random.default_rng(5)
    vocab = np.array(["a", "b", "c", "d", "e"])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 25))) for _ in range(150)
    ]
    texts[3] = "x y"  # < 3 tokens: no window, no row
    texts[7] = "r s t " * 40  # highly repetitive
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64), "text": texts})

    got = (
        ngram_repetition(rd.from_pandas(df), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        ),
        g AS (
          SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS ngram
          FROM t, LATERAL (SELECT unnest(generate_series(
              1, greatest(len(toks) - 2, 0))) AS i)
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
               CAST(count(DISTINCT ngram) AS BIGINT) AS n_distinct,
               CAST((count(*) - count(DISTINCT ngram)) * 1000
                    // count(*) AS BIGINT) AS dup_ratio_milli
        FROM g GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    con.close()
    assert 3 not in got["doc_id"].to_numpy()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ------------------------------------------------- cube / grouping sets
def test_cube_counts_with_null_keys_vs_duckdb(ray_session):
    """CUBE over keys INCLUDING nulls must match DuckDB GROUP BY CUBE
    as a multiset (rolled-up NULL and genuine NULL collide in the flat
    output on both sides — the documented rollup convention)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import cube_counts

    df = pd.DataFrame(
        {
            "a": ["x", None, "x", None, "y", "x", "y"],
            "b": ["p", "p", None, None, "q", "p", "q"],
        }
    )
    got = cube_counts(rd.from_pandas(df), keys=["a", "b"]).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT a, b, count(*) AS n FROM t GROUP BY CUBE (a, b)"
    ).df()
    con.close()

    def canon(d):
        return sorted(
            (
                "" if pd.isna(r.a) else r.a,
                "" if pd.isna(r.b) else r.b,
                int(r.n),
            )
            for r in d.itertuples()
        )

    assert canon(got) == canon(want)


def test_cube_counts_caps_key_width(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import cube_counts

    df = pd.DataFrame({k: ["v"] for k in "abcde"})
    with pytest.raises(ValueError, match="capped at 4"):
        cube_counts(rd.from_pandas(df), keys=list("abcde"))


def test_grouping_sets_explicit_subset(ray_session):
    """Explicit GROUPING SETS: only the requested sets appear."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import grouping_sets_counts

    df = pd.DataFrame(
        {"a": ["x", "x", "y"], "b": ["p", "q", "p"]}
    )
    got = grouping_sets_counts(
        rd.from_pandas(df), keys=["a", "b"], sets=[("b",), ()]
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        # `a` is in no requested set, so it cannot be selected bare —
        # project the NULL it would widen to
        "SELECT CAST(NULL AS VARCHAR) AS a, b, count(*) AS n "
        "FROM t GROUP BY GROUPING SETS ((b), ())"
    ).df()
    con.close()
    k = lambda d: sorted(
        ("" if pd.isna(r.a) else r.a, "" if pd.isna(r.b) else r.b, int(r.n))
        for r in d.itertuples()
    )
    assert k(got) == k(want)

    with pytest.raises(ValueError, match="not a subset"):
        grouping_sets_counts(rd.from_pandas(df), keys=["a"], sets=[("z",)])


# ------------------------------------------------ cross-split contamination
def test_cross_split_contamination_vs_brute_force(ray_session):
    """Planted leakage: an eval doc quoting a train doc's 8-token span
    must be flagged; clean eval docs must not. Brute force over window
    sets is the oracle."""
    import ray.data as rd

    from data_harvesting_ray.stages.scrub import cross_split_contamination

    rng = np.random.default_rng(23)
    vocab = np.array([f"w{i}" for i in range(400)])
    n_docs = 120
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(12, 40)))
        for _ in range(n_docs)
    ]
    # the engine's split hash: (id * 2654435761) % 1000
    split = lambda i: (
        "train"
        if (i * 2654435761) % 1000 < 900
        else ("val" if (i * 2654435761) % 1000 < 950 else "test")
    )
    train_ids = [i for i in range(n_docs) if split(i) == "train"]
    eval_ids = [i for i in range(n_docs) if split(i) != "train"]
    # plant: first eval doc quotes an 8-token span of a train doc
    leak_src, leak_dst = train_ids[0], eval_ids[0]
    texts[leak_dst] = (
        "unrelated prefix "
        + " ".join(texts[leak_src].split()[2:10])
        + " unrelated suffix tokens"
    )
    df = pd.DataFrame(
        {"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts}
    )

    got = (
        cross_split_contamination(rd.from_pandas(df), n=8, num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # brute force
    def windows(text, n=8):
        toks = text.strip().split()
        return {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        }

    train_windows = set().union(*(windows(texts[i]) for i in train_ids))
    want = sorted(
        (i, split(i)) for i in eval_ids if windows(texts[i]) & train_windows
    )
    assert list(map(tuple, got.itertuples(index=False))) == want
    assert (leak_dst, split(leak_dst)) in want  # the plant was caught


# ----------------------------------------------------------- echo rate
def test_assistant_echo_rate_randomized_vs_duckdb(ray_session):
    """Echo rate vs a DuckDB lag + list_intersect oracle on a random
    transcript with duplicate rows (dedup first), role gaps, and empty
    texts."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.text import assistant_echo_rate

    rng = np.random.default_rng(31)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    rows = []
    for c in range(40):
        for t in range(rng.integers(2, 9)):
            role = rng.choice(["user", "assistant", "system"], p=[0.45, 0.45, 0.1])
            text = " ".join(rng.choice(vocab, size=rng.integers(0, 8))) or ""
            rows.append((f"conv-{c}", t, role, text))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    df = pd.concat([df, df.head(30)], ignore_index=True)  # dup arrivals

    got = (
        assistant_echo_rate(rd.from_pandas(df), num_buckets=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("raw", df)
    want = con.execute(
        r"""
        WITH t AS (SELECT DISTINCT conv_id, turn_idx, role, text FROM raw),
        p AS (
          SELECT conv_id, turn_idx, role, text,
                 lag(role) OVER w AS prev_role,
                 lag(text) OVER w AS prev_text
          FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        ),
        a AS (
          SELECT conv_id, turn_idx,
                 list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks,
                 list_distinct(regexp_split_to_array(trim(prev_text), '\s+')) AS ptoks
          FROM p WHERE role = 'assistant' AND prev_role = 'user'
        )
        SELECT conv_id, turn_idx,
               CAST(len(list_intersect(toks, ptoks)) * 1000
                    // greatest(len(toks), 1) AS BIGINT) AS echo_milli
        FROM a ORDER BY conv_id, turn_idx
        """
    ).df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_assistant_echo_rate_full_and_zero_echo(ray_session):
    """A verbatim parrot scores 1000; a disjoint reply scores 0; an
    assistant turn after another assistant turn emits nothing."""
    import ray.data as rd

    from data_harvesting_ray.stages.text import assistant_echo_rate

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 5,
            "turn_idx": [0, 1, 2, 3, 4],
            "role": ["user", "assistant", "user", "assistant", "assistant"],
            "text": [
                "repeat after me",
                "repeat after me",
                "say something new",
                "totally different words",
                "chained assistant turn",
            ],
        }
    )
    got = (
        assistant_echo_rate(rd.from_pandas(df), num_buckets=1)
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert got["turn_idx"].tolist() == [1, 3]  # turn 4 follows assistant
    assert got["echo_milli"].tolist() == [1000, 0]


# ------------------------------------------------------ unigram surprisal
def test_unigram_surprisal_randomized_vs_duckdb(ray_session):
    """Corpus-unigram surprisal vs the DuckDB explode+join oracle on a
    skewed random corpus (rare tokens score high, stop-ish tokens low);
    per-token integer quantization makes both sides exactly equal."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.relevance import unigram_surprisal

    rng = np.random.default_rng(17)
    # zipf-ish: token w0 very common, tail rare
    vocab = np.array([f"w{i}" for i in range(50)])
    probs = 1.0 / np.arange(1, 51)
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30), p=probs))
        for _ in range(120)
    ]
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64), "text": texts})

    got = (
        unigram_surprisal(rd.from_pandas(df), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        r"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents
        ),
        cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
        tot AS (SELECT count(*) AS n FROM tok),
        s AS (
          SELECT t.doc_id,
                 CAST(floor(ln(CAST(n AS DOUBLE) / c) * 1e6) AS BIGINT) AS surp
          FROM tok t JOIN cnt USING (token), tot
        )
        SELECT doc_id,
               CAST(sum(surp) // count(*) AS BIGINT) AS mean_surprisal_micro
        FROM s GROUP BY doc_id ORDER BY doc_id
        """
    ).df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: a doc of only the most common token scores lower than a
    # doc of only the rarest observed token
    common = got["mean_surprisal_micro"].min()
    assert common >= 0 and got["mean_surprisal_micro"].max() > common


# ---------------------------------------------------------- doc keywords
def test_doc_keywords_randomized_vs_duckdb(ray_session):
    """Top-k TF-IDF keywords per doc vs the DuckDB window oracle —
    ranks, tokens, and integer-micro scores all exact, incl. ties
    (same score -> token asc) and docs with < k distinct tokens."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.relevance import doc_keywords

    rng = np.random.default_rng(29)
    vocab = np.array([f"w{i}" for i in range(40)])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 20))) for _ in range(100)
    ]
    texts[5] = "solo"  # 1 distinct token: fewer than k rows
    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64), "text": texts})

    got = (
        doc_keywords(rd.from_pandas(df), k=3, num_buckets=4)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        r"""
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
          FROM documents
        ),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfq AS (SELECT token, count(*) AS dfc FROM tf GROUP BY token),
        nd AS (SELECT count(*) AS n FROM documents),
        s AS (
          SELECT doc_id, token,
                 CAST(floor(CAST(tf AS DOUBLE)
                      * ln(CAST(n AS DOUBLE) / dfc) * 1e6) AS BIGINT)
                     AS score_micro
          FROM tf JOIN dfq USING (token), nd
        ),
        r AS (
          SELECT doc_id, token, score_micro,
                 row_number() OVER (
                     PARTITION BY doc_id
                     ORDER BY score_micro DESC, token) AS rnk
          FROM s
        )
        SELECT doc_id, token, score_micro, CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= 3 ORDER BY doc_id, rank
        """
    ).df()
    con.close()
    assert (got[got["doc_id"] == 5]["rank"].tolist()) == [1]
    pd.testing.assert_frame_equal(
        got[["doc_id", "token", "score_micro", "rank"]],
        want,
        check_dtype=False,
    )


# ------------------------------------------------------- props extraction
def test_props_extract_agg_vs_duckdb_and_non_matches(ray_session):
    """Vectorized RE2 extraction from a JSON-ish column + per-key
    (count, sum): matches DuckDB regexp_extract; non-matching rows
    count toward n but not the sum."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.events import props_extract_agg

    rng = np.random.default_rng(43)
    types = rng.choice(["click", "view", "buy"], size=200)
    props = [f'{{"k": {int(v)}}}' for v in rng.integers(-50, 500, size=200)]
    props[7] = '{"other": 1}'  # no k field: null contribution
    props[11] = "not json at all"
    df = pd.DataFrame({"event_type": types, "props": props})

    got = (
        props_extract_agg(rd.from_pandas(df))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(
        r"""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(NULLIF(regexp_extract(props, '"k":\s*(-?\d+)', 1),
                                  '') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type ORDER BY event_type
        """
    ).df()
    con.close()
    pd.testing.assert_frame_equal(
        got[["event_type", "n", "sum_k"]], want, check_dtype=False
    )
    assert got["n"].sum() == 200  # non-matches still counted


# -------------------------------------------------- 3-table revenue top-k
def test_segment_revenue_topk_vs_duckdb(ray_session):
    """TPC-H-Q3-shaped composition on random tables: integer-micro
    revenue, semi-join segment filter, global top-k — exact vs DuckDB
    incl. ties and orders with no line items."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import segment_revenue_topk

    rng = np.random.default_rng(47)
    cust = pd.DataFrame(
        {
            "c_custkey": np.arange(30, dtype=np.int64),
            "c_mktsegment": rng.choice(["A", "B"], 30),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(100, dtype=np.int64),
            "o_custkey": rng.integers(0, 30, 100),
            "o_orderdate": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 90, 100), unit="D"),
        }
    )
    li = pd.DataFrame(
        {
            "l_orderkey": rng.integers(0, 95, 400),  # orders 95-99: no items
            "l_extendedprice": rng.uniform(10, 5000, 400).round(2),
            "l_discount": rng.choice([0.0, 0.05, 0.1], 400),
        }
    )
    got = segment_revenue_topk(
        rd.from_pandas(li),
        rd.from_pandas(orders),
        rd.from_pandas(cust),
        segment="A",
        k=5,
        num_buckets=4,
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    con.register("orders", orders)
    con.register("customer", cust)
    want = con.execute(
        """
        WITH rev AS (
          SELECT l_orderkey AS o_orderkey,
                 CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6)
                          AS BIGINT)) AS BIGINT) AS revenue_micro
          FROM lineitem GROUP BY 1
        ),
        seg AS (
          SELECT o_orderkey, o_orderdate
          FROM orders JOIN customer ON c_custkey = o_custkey
          WHERE c_mktsegment = 'A'
        )
        SELECT s.o_orderkey, s.o_orderdate, r.revenue_micro
        FROM rev r JOIN seg s USING (o_orderkey)
        ORDER BY revenue_micro DESC, o_orderkey LIMIT 5
        """
    ).df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ----------------------------------------------------------- collocations
def test_top_collocations_randomized_vs_duckdb(ray_session):
    """PMI collocations vs the DuckDB oracle on a corpus with one
    planted collocation (two rare tokens that only occur together)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.relevance import top_collocations

    rng = np.random.default_rng(53)
    vocab = np.array(["a", "b", "c", "d", "e", "f"])
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 25))) for _ in range(150)
    ]
    for i in range(0, 150, 10):  # plant "neo tokyo" 15 times
        texts[i] = texts[i] + " neo tokyo"
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64), "text": texts})

    got = top_collocations(rd.from_pandas(df), k=5, min_count=5, num_buckets=4)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        r"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        ),
        tok AS (SELECT unnest(toks) AS token FROM t),
        uni AS (SELECT token, count(*) AS c1 FROM tok GROUP BY token),
        t1 AS (SELECT count(*) AS n1 FROM tok),
        bg AS (
          SELECT toks[i] AS w1, toks[i+1] AS w2
          FROM t, LATERAL (SELECT unnest(generate_series(
              1, greatest(len(toks) - 1, 0))) AS i)
        ),
        big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        t2 AS (SELECT count(*) AS n2 FROM bg),
        s AS (
          SELECT w1, w2, c2,
                 CAST(floor(ln((CAST(c2 AS DOUBLE) * n1 * n1)
                      / (CAST(n2 AS DOUBLE) * a.c1 * b.c1)) * 1e6) AS BIGINT)
                     AS pmi_micro
          FROM big JOIN uni a ON a.token = w1 JOIN uni b ON b.token = w2,
               t1, t2
          WHERE c2 >= 5
        )
        SELECT w1, w2, CAST(c2 AS BIGINT) AS n, pmi_micro
        FROM s ORDER BY pmi_micro DESC, w1, w2 LIMIT 5
        """
    ).df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the planted phrase is the top collocation
    assert (got.iloc[0]["w1"], got.iloc[0]["w2"]) == ("neo", "tokyo")


# ------------------------------------------------- distributed k-means
def test_train_centroids_distributed_matches_reference(ray_session):
    """The distributed Lloyd trainer must equal a single-process
    reference of the SAME quantized algorithm exactly, and be
    invariant to partitioning (integer-micro partials are associative)."""
    import ray.data as rd

    from data_harvesting_ray.stages.similarity import (
        _normalize_rows,
        ivf_sample_mask,
        ivf_sample_threshold_micro,
        train_centroids_distributed,
    )

    rng = np.random.default_rng(61)
    n, d, k = 600, 16, 4
    vecs = rng.normal(size=(n, d))
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.astype(np.float32) for v in vecs],
        }
    )

    got2 = train_centroids_distributed(
        rd.from_pandas(df).repartition(2), n_centroids=k, iters=5
    )
    got7 = train_centroids_distributed(
        rd.from_pandas(df).repartition(7), n_centroids=k, iters=5
    )
    np.testing.assert_array_equal(got2, got7)  # layout-invariant

    # single-process reference of the same quantized Lloyd
    m = _normalize_rows(np.stack([np.asarray(v, np.float64) for v in df["embedding"]]))
    thr = ivf_sample_threshold_micro(n, 1.0, 4096)
    pool = m[ivf_sample_mask(df["vec_id"].to_numpy(), threshold_micro=thr)]
    r = np.random.default_rng(13)
    cents = pool[r.choice(len(pool), size=k, replace=False)].copy()
    for _ in range(5):
        assign = np.argmax(m @ cents.T, axis=1)
        micro = np.floor(m * 1e6).astype(np.int64)
        new = cents.copy()
        for c in range(k):
            mask = assign == c
            if mask.any():
                new[c] = (micro[mask].sum(axis=0) / 1e6) / mask.sum()
        cents = _normalize_rows(new)
    np.testing.assert_array_equal(got2, cents)


# --------------------------------------------------------- weighted sample
def test_weighted_sample_deterministic_and_proportional(ray_session):
    """Membership is a pure row predicate (identical across
    partitionings); zero-weight rows never survive, weight-1000 rows
    always do; keep rate tracks the weight."""
    import ray.data as rd

    from data_harvesting_ray.stages.projection import weighted_sample

    n = 3000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["x"] * 1000 + ["a b c d e f g h i j " * 5] * 1000 + [""] * 1000,
        }
    )

    def w(d):
        # 0 for empty, 20 for one token, 1000 for 50 tokens
        toks = d["text"].str.strip().str.split().map(len).to_numpy(np.int64)
        toks[d["text"].to_numpy(object) == ""] = 0
        return np.minimum(toks * 20, 1000)

    a = weighted_sample(rd.from_pandas(df).repartition(3), weight_expr=w).to_pandas()
    b = weighted_sample(rd.from_pandas(df).repartition(8), weight_expr=w).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # layout-invariant
    kept = set(a["doc_id"])
    empty_ids = set(range(2000, 3000))
    long_ids = set(range(1000, 2000))
    assert not (kept & empty_ids)  # weight 0: never kept
    assert long_ids <= kept  # weight 1000: always kept
    one_tok_kept = len(kept & set(range(1000)))
    assert 0 < one_tok_kept < 100  # ~2% of 1000 at weight 20


def test_self_echo_over_assistant_subsequence(ray_session):
    """within_role='assistant' compares each assistant turn to the
    assistant's PREVIOUS RESPONSE (intervening user turns ignored);
    a verbatim self-repeat scores 1000."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.text import assistant_echo_rate

    df = pd.DataFrame(
        {
            "conv_id": ["c"] * 6,
            "turn_idx": [0, 1, 2, 3, 4, 5],
            "role": ["user", "assistant", "user", "assistant", "user", "assistant"],
            "text": [
                "q one",
                "alpha beta gamma",
                "q two",
                "alpha beta gamma",  # verbatim self-repeat
                "q three",
                "delta epsilon",
            ],
        }
    )
    got = (
        assistant_echo_rate(
            rd.from_pandas(df), prev_role=None, within_role="assistant", num_buckets=1
        )
        .to_pandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    assert got["turn_idx"].tolist() == [3, 5]
    assert got["echo_milli"].tolist() == [1000, 0]

    con = duckdb.connect()
    con.register("raw", df)
    want = con.execute(
        r"""
        WITH a0 AS (
          SELECT conv_id, turn_idx, text FROM raw WHERE role = 'assistant'
        ),
        p AS (
          SELECT conv_id, turn_idx, text,
                 lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                     AS prev_text
          FROM a0
        )
        SELECT conv_id, turn_idx,
               CAST(len(list_intersect(
                        list_distinct(regexp_split_to_array(trim(text), '\s+')),
                        list_distinct(regexp_split_to_array(trim(prev_text), '\s+'))
                    )) * 1000
                    // greatest(len(list_distinct(
                        regexp_split_to_array(trim(text), '\s+'))), 1) AS BIGINT)
                   AS echo_milli
        FROM p WHERE prev_text IS NOT NULL ORDER BY turn_idx
        """
    ).df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# --------------------------------------------------------- role transitions
def test_role_transitions_randomized_vs_duckdb(ray_session):
    """Adjacent-role transition counts vs the DuckDB lag oracle on a
    random transcript with duplicates (dedup first) and single-turn
    conversations (no transitions)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import role_transitions

    rng = np.random.default_rng(67)
    rows = []
    for c in range(60):
        for t in range(rng.integers(1, 8)):  # some convs single-turn
            rows.append(
                (f"conv-{c}", t, rng.choice(["user", "assistant", "system"]))
            )
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role"])
    df = pd.concat([df, df.head(25)], ignore_index=True)  # dup arrivals

    got = (
        role_transitions(rd.from_pandas(df), num_buckets=4)
        .to_pandas()
        .sort_values(["prev_role", "role"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("raw", df)
    want = con.execute(
        """
        WITH t AS (SELECT DISTINCT conv_id, turn_idx, role FROM raw),
        p AS (
          SELECT role, lag(role) OVER (
              PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
          FROM t
        )
        SELECT prev_role, role, CAST(count(*) AS BIGINT) AS n
        FROM p WHERE prev_role IS NOT NULL
        GROUP BY prev_role, role ORDER BY prev_role, role
        """
    ).df()
    con.close()
    got["n"] = got["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -------------------------------------------------------- cohort retention
def test_user_retention_vs_duckdb(ray_session):
    """Week-over-week retention vs the DuckDB self-join oracle on a
    random event log (incl. users active in non-adjacent weeks)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.events import user_retention

    rng = np.random.default_rng(71)
    n = 800
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 35 * 86400, n), unit="s"),
        }
    )
    got = (
        user_retention(rd.from_pandas(df), num_buckets=4)
        .to_pandas()
        .sort_values("week")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(
        """
        WITH uw AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
          FROM events
        )
        SELECT a.week, CAST(count(*) AS BIGINT) AS n_active,
               CAST(count(b.user_id) AS BIGINT) AS n_retained
        FROM uw a LEFT JOIN uw b
          ON b.user_id = a.user_id AND b.week = a.week + 1
        GROUP BY a.week ORDER BY a.week
        """
    ).df()
    con.close()
    got["week"] = got["week"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lang_confusion_diagonal(ray_session):
    """Confusion counts sum to the corpus size and the matrix equals a
    direct lang_id + pandas crosstab."""
    import ray.data as rd

    from data_harvesting_ray.stages.text import LangId, lang_confusion

    rng = np.random.default_rng(73)
    texts = {
        "en": "the cat and the dog is a pet to all",
        "de": "der hund und die katze ist ein tier",
        "fr": "le chien et la mer est les des",
        "es": "el perro la casa los gatos es una",
    }
    langs = rng.choice(list(texts), size=120)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "lang": langs,
            "text": [texts[l] for l in langs],
        }
    )
    got = lang_confusion(rd.from_pandas(df)).to_pandas()
    assert got["n"].sum() == 120
    pred = LangId()(df)
    want = (
        pd.DataFrame({"lang": df["lang"], "lang_pred": pred["lang_pred"]})
        .value_counts()
        .reset_index(name="n")
    )
    k = lambda d: sorted(map(tuple, d[["lang", "lang_pred", "n"]].itertuples(index=False)))
    assert k(got) == k(want)


def test_fuzzy_split_contamination_vs_brute_force(ray_session):
    """Planted near-dup leakage: an eval doc that is a lightly-edited
    copy of a train doc (exact 5-gram Jaccard well above 0.7, so the
    LSH S-curve margin holds) must surface as a (eval_id, train_id)
    pair with the brute-force jaccard_milli; clean eval docs must not.
    Brute force over all train x eval pairs is the oracle."""
    import ray.data as rd

    from data_harvesting_ray.stages.dedup_approx import (
        char_shingles,
        jaccard_milli,
    )
    from data_harvesting_ray.stages.scrub import fuzzy_split_contamination

    rng = np.random.default_rng(37)
    vocab = np.array([f"tok{i}" for i in range(500)])
    n_docs = 110
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(40, 70)))
        for _ in range(n_docs)
    ]
    split = lambda i: (
        "train"
        if (i * 2654435761) % 1000 < 900
        else ("val" if (i * 2654435761) % 1000 < 950 else "test")
    )
    train_ids = [i for i in range(n_docs) if split(i) == "train"]
    eval_ids = [i for i in range(n_docs) if split(i) != "train"]
    # plant two edited copies: eval doc = train doc text + a tiny edit
    for src, dst in [(train_ids[0], eval_ids[0]), (train_ids[3], eval_ids[2])]:
        texts[dst] = texts[src] + " extra"
    df = pd.DataFrame(
        {"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts}
    )

    got = fuzzy_split_contamination(
        rd.from_pandas(df), threshold_milli=700, num_buckets=4
    )

    sh = {i: char_shingles(t, 5) for i, t in enumerate(texts)}
    expected = sorted(
        (e, t, split(e), jaccard_milli(sh[t], sh[e]))
        for t in train_ids
        for e in eval_ids
        if jaccard_milli(sh[t], sh[e]) >= 700
    )
    assert len(expected) == 2  # exactly the planted pairs
    assert (
        list(map(tuple, got[["eval_id", "train_id", "split", "jaccard_milli"]].itertuples(index=False)))
        == expected
    )


def test_window_distinct_users_vs_brute_force(ray_session):
    """Randomized differential: distinct users + counts per tumbling
    window must equal the single-pass pandas truth, including users
    whose activity spans many batches (nunique must not double-count
    cross-batch repeats of a (window, user) pair)."""
    import ray.data as rd

    from data_harvesting_ray.stages.events import window_distinct_users

    rng = np.random.default_rng(41)
    n = 5000
    base = np.datetime64("2024-01-01", "us")
    ts = base + rng.integers(0, 10 * 86400, n) * np.timedelta64(1_000_000, "us")
    df = pd.DataFrame(
        {"user_id": rng.integers(0, 40, n).astype(np.int64), "ts": ts}
    )

    got = (
        window_distinct_users(
            rd.from_pandas(df).repartition(7), size_s=86400, num_buckets=4
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )

    w = df["ts"].to_numpy().astype("datetime64[D]").astype("datetime64[us]")
    exp = (
        df.assign(window_start=w)
        .groupby("window_start")
        .agg(n_users=("user_id", "nunique"), n_events=("user_id", "size"))
        .reset_index()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    exp["n_users"] = exp["n_users"].astype(np.int64)
    exp["n_events"] = exp["n_events"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_daily_spikes_randomized_vs_duckdb(ray_session):
    """Integer-exact z-score spike days must equal the SQL window-form
    on random per-day volumes, including all-equal (std 0) types."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.events import daily_spikes

    rng = np.random.default_rng(47)
    days = np.arange(40)
    rows = []
    for et, lam in [("a", 50), ("b", 5)]:
        for d in days:
            cnt = int(rng.poisson(lam)) + (200 if (et == "a" and d == 7) else 0)
            for _ in range(cnt):
                rows.append((et, np.datetime64("2024-01-01", "us") + d * 86400_000_000))
    rows.extend(("flat", np.datetime64("2024-01-01", "us") + d * 86400_000_000)
                for d in days)  # zero variance: no spikes
    df = pd.DataFrame(rows, columns=["event_type", "ts"])
    got = (
        daily_spikes(rd.from_pandas(df), sigma=2, num_buckets=4)
        .to_pandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        WITH d AS (
          SELECT event_type,
                 make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS day,
                 count(*) AS cnt
          FROM events GROUP BY 1, 2
        ), s AS (
          SELECT *, count(*) OVER w AS n, sum(cnt) OVER w AS s1,
                 sum(cnt * cnt) OVER w AS s2
          FROM d WINDOW w AS (PARTITION BY event_type)
        )
        SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt FROM s
        WHERE (n*cnt - s1) > 0 AND (n*cnt - s1)*(n*cnt - s1) > 4*(n*s2 - s1*s1)
        ORDER BY event_type, day
    """).df()
    con.close()
    planted = np.datetime64("2024-01-01", "us") + 7 * 86400_000_000
    assert ((got["event_type"] == "a") & (got["day"] == planted)).any()
    want["day"] = want["day"].astype("datetime64[us]")
    got["day"] = got["day"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert not (got["event_type"] == "flat").any()


def test_local_supplier_volume_vs_duckdb(ray_session):
    """TPC-H Q5 shape over the sf0.001 testdata tables, both supplier
    paths (broadcast and distributed equi-join) identical."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import local_supplier_volume

    sf = "/root/testdata/sf0.001"
    args = lambda: (
        rd.read_parquet(f"{sf}/lineitem.parquet",
                        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
        rd.read_parquet(f"{sf}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"]),
        rd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"]),
        rd.read_parquet(f"{sf}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]),
        pd.read_parquet(f"{sf}/nation.parquet"),
        pd.read_parquet(f"{sf}/region.parquet"),
    )
    got_b = local_supplier_volume(*args(), region_name="ASIA")
    got_d = local_supplier_volume(*args(), region_name="ASIA",
                                  supplier_broadcast_cap=0)  # force equi_join
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "supplier", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute("""
        SELECT n_name,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6)
                        AS BIGINT)) AS BIGINT) AS revenue_micro
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue_micro DESC, n_name
    """).df()
    con.close()
    pd.testing.assert_frame_equal(got_b, want, check_dtype=False)
    pd.testing.assert_frame_equal(got_d, want, check_dtype=False)


def test_incremental_dedup_vs_brute_force(ray_session):
    """Anti-join survivors == set difference of text values; dups
    planted across AND within the new epoch (within-epoch dups both
    survive — the op dedups against history only)."""
    import ray.data as rd

    from data_harvesting_ray.stages.dedup import incremental_dedup

    rng = np.random.default_rng(11)
    hist_texts = [f"hist doc {i}" for i in range(60)]
    new_texts = [f"new doc {i}" for i in range(40)]
    # plant 15 new docs that repeat history verbatim
    for i in rng.choice(40, 15, replace=False):
        new_texts[i] = hist_texts[int(rng.integers(0, 60))]
    hist = pd.DataFrame({"doc_id": np.arange(60), "text": hist_texts})
    new = pd.DataFrame(
        {
            "doc_id": np.arange(100, 140),
            "text": new_texts,
            "lang": ["en"] * 40,
            "n_chars": [len(t) for t in new_texts],
        }
    )
    got = (
        incremental_dedup(rd.from_pandas(new), rd.from_pandas(hist), num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    hist_set = set(hist_texts)
    want = new[~new["text"].isin(hist_set)][["doc_id", "lang", "n_chars"]].reset_index(
        drop=True
    )
    assert len(want) == 25
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_length_percentile_gate_vs_duckdb(ray_session):
    """Strict-rank percentile gate == SQL rank() form, randomized with
    heavy ties and a singleton language (dropped: 0 >= 3 is false —
    a lone doc is never strictly above its own percentile)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.text import length_percentile_gate

    rng = np.random.default_rng(13)
    n = 400
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], n),
            "n_chars": rng.integers(0, 25, n).astype(np.int64),  # heavy ties
        }
    )
    df.loc[n - 1, "lang"] = "zz"  # singleton group
    got = (
        length_percentile_gate(rd.from_pandas(df), q_num=3, q_den=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute("""
        WITH r AS (
          SELECT doc_id, lang, n_chars,
                 rank() OVER (PARTITION BY lang ORDER BY n_chars) - 1 AS cum_less,
                 count(*) OVER (PARTITION BY lang) AS n_lang
          FROM documents
        )
        SELECT doc_id, lang, n_chars FROM r
        WHERE 4 * cum_less >= 3 * n_lang ORDER BY doc_id
    """).df()
    con.close()
    assert (got["lang"] == "zz").sum() == 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dim_stats_matches_numpy(ray_session):
    """Per-dim integer-micro sums equal a single-process numpy
    reduction regardless of batching/shuffle layout."""
    import ray.data as rd

    from data_harvesting_ray.stages.similarity import dim_stats

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    df = pd.DataFrame({"embedding": [v for v in vecs]})
    got = (
        dim_stats(rd.from_pandas(df))
        .to_pandas()
        .sort_values("dim")
        .reset_index(drop=True)
    )
    micro = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64)
    assert (got["dim"].to_numpy() == np.arange(1, 17)).all()
    assert (got["n"].to_numpy() == 300).all()
    np.testing.assert_array_equal(got["sum_micro"].to_numpy(), micro.sum(axis=0))
    np.testing.assert_array_equal(
        got["sumsq_micro"].to_numpy(), (micro * micro).sum(axis=0)
    )


def test_promo_revenue_share_vs_duckdb(ray_session):
    """Q14-shaped promo/total revenue mix per ship month, both part
    paths (broadcast and distributed equi-join) identical to SQL."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import promo_revenue_share

    sf = "/root/testdata/sf0.001"
    args = lambda: (
        rd.read_parquet(f"{sf}/lineitem.parquet",
                        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]),
        rd.read_parquet(f"{sf}/part.parquet", columns=["p_partkey", "p_type"]),
    )
    got_b = (promo_revenue_share(*args()).to_pandas()
             .sort_values("month").reset_index(drop=True))
    got_d = (promo_revenue_share(*args(), part_broadcast_cap=0).to_pandas()
             .sort_values("month").reset_index(drop=True))
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute("""
        SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
               CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(floor(l_extendedprice * (1 - l_discount) * 1e6)
                                  AS BIGINT) ELSE 0 END) AS BIGINT) AS promo_micro,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6)
                        AS BIGINT)) AS BIGINT) AS total_micro
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY 1 ORDER BY 1
    """).df()
    con.close()
    want["month"] = want["month"].astype("datetime64[us]")
    for got in (got_b, got_d):
        got["month"] = got["month"].astype("datetime64[us]")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got_b["promo_micro"] <= got_b["total_micro"]).all()


def test_label_centroid_dist_matches_numpy(ray_session):
    """Integer-micro squared distances equal a single-process numpy
    reference (floor-division centroids), batch-layout independent."""
    import ray.data as rd

    from data_harvesting_ray.stages.similarity import label_centroid_dist

    rng = np.random.default_rng(3)
    n, d = 240, 8
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    labels = rng.integers(0, 5, n).astype(np.int32)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "label": labels,
            "embedding": [v for v in vecs],
        }
    )
    got = (
        label_centroid_dist(rd.from_pandas(df))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    micro = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64)
    want = np.empty(n, dtype=np.int64)
    for lab in np.unique(labels):
        m = labels == lab
        c = micro[m].sum(axis=0) // m.sum()
        want[m] = ((micro[m] - c) ** 2).sum(axis=1)
    np.testing.assert_array_equal(got["dist2"].to_numpy(), want)
    assert got["label"].dtype == np.int64


def test_jsonl_source_roundtrip(ray_session, tmp_path):
    """read_documents_jsonl over generator-written shards yields the
    exact rows of the source documents table (schema + values)."""
    import os

    import ray.data as rd

    from data_harvesting_ray.fixtures.generator import documents_jsonl_path
    from data_harvesting_ray.sources.jsonl import read_documents_jsonl

    path = documents_jsonl_path("/root/testdata/sf0.001")
    assert os.path.exists(os.path.join(path, "_DONE"))
    got = (
        read_documents_jsonl(path)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_freq_spectrum_vs_brute_force(ray_session):
    """Frequency-of-frequencies equals a Counter-of-Counter reference,
    including whitespace irregularities and a repeated-token flood."""
    from collections import Counter

    import ray.data as rd

    from data_harvesting_ray.stages.text import freq_spectrum

    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(50)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 20))) for _ in range(120)
    ]
    texts[7] = "  flood flood   flood flood  "  # irregular whitespace
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got = (
        freq_spectrum(rd.from_pandas(df))
        .to_pandas()
        .sort_values("freq")
        .reset_index(drop=True)
    )
    tok_counts = Counter(w for t in texts for w in t.strip().split())
    spec = Counter(tok_counts.values())
    want = (
        pd.DataFrame(sorted(spec.items()), columns=["freq", "n_tokens"])
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # sanity: spectrum mass equals vocabulary size
    assert got["n_tokens"].sum() == len(tok_counts)


def test_late_order_counts_vs_duckdb(ray_session):
    """Q4-shaped EXISTS: per-priority count of orders with >=1 late
    line item equals the SQL EXISTS form on real testdata."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.aggregates import late_order_counts

    sf = "/root/testdata/sf0.001"
    got = (
        late_order_counts(
            rd.read_parquet(f"{sf}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"]),
            rd.read_parquet(f"{sf}/orders.parquet",
                            columns=["o_orderkey", "o_orderdate", "o_orderpriority"]),
            late_days=90,
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ["lineitem", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY 1 ORDER BY 1
    """).df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_source_dup_stats_with_planted_dups(ray_session):
    """Doc and distinct counts per source with cross-batch duplicate
    texts; a source whose docs are all identical shows n_distinct=1."""
    import ray.data as rd

    from data_harvesting_ray.stages.text import source_dup_stats

    rng = np.random.default_rng(17)
    texts = [f"unique text {i}" for i in range(90)]
    srcs = list(rng.choice(["web", "books"], 90))
    # source 'spam': 30 identical docs; 'web' gets 10 repeats of one text
    texts += ["same boilerplate"] * 30 + ["repeated web doc"] * 10
    srcs += ["spam"] * 30 + ["web"] * 10
    df = pd.DataFrame({"source": srcs, "text": texts})
    got = source_dup_stats(rd.from_pandas(df))
    want = (
        df.groupby("source")
        .agg(n_docs=("text", "size"), n_distinct=("text", "nunique"))
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert int(got.loc[got["source"] == "spam", "n_distinct"].iloc[0]) == 1


def test_sliding_mau_vs_duckdb(ray_session):
    """Sliding COUNT(DISTINCT user) == the SQL window-replication form
    on random event times, including users active in many windows."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.events import sliding_mau

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "ts": np.datetime64("2024-03-01", "us")
            + rng.integers(0, 30 * 86400_000_000, n),
        }
    )
    got = (
        sliding_mau(rd.from_pandas(df), size_s=3 * 86400, slide_s=86400,
                    num_buckets=4)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        w AS (SELECT user_id,
                     unnest(range((us - 259200000000) // 86400000000 + 1,
                                  us // 86400000000 + 1)) AS k
              FROM e)
        SELECT make_timestamp(k * 86400000000) AS window_start,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               count(*) AS n_events
        FROM w GROUP BY 1 ORDER BY 1
    """).df()
    con.close()
    want["window_start"] = want["window_start"].astype("datetime64[us]")
    got["window_start"] = got["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sliding_mau_rejects_non_divisible(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.events import sliding_mau

    with pytest.raises(ValueError, match="multiple"):
        sliding_mau(
            rd.from_pandas(
                pd.DataFrame({"user_id": [1], "ts": [np.datetime64("2024-01-01", "us")]})
            ),
            size_s=7000,
            slide_s=3000,
        )


def test_kmv_distinct_accuracy_and_determinism(ray_session):
    """KMV estimate within ~4/sqrt(k) of truth on a >k vocabulary;
    exact when vocab < k; batch-layout independent."""
    import hashlib

    import ray.data as rd

    from data_harvesting_ray.stages.sketches import kmv_distinct_tokens

    rng = np.random.default_rng(29)
    vocab = [f"word{i:05d}" for i in range(3000)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 60))) for _ in range(400)
    ]
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64), "text": texts})
    truth = len({w for t in texts for w in t.split()})
    got = kmv_distinct_tokens(rd.from_pandas(df), k=256)
    est = int(got["est_distinct"].iloc[0])
    assert abs(est - truth) / truth < 4 / np.sqrt(256)  # 25% guard band
    # determinism under a different block layout
    got2 = kmv_distinct_tokens(
        rd.from_pandas(df).repartition(7), k=256
    )
    pd.testing.assert_frame_equal(got, got2)
    # exact mode: fewer distinct tokens than k
    small = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "b c d"]})
    gs = kmv_distinct_tokens(rd.from_pandas(small), k=256)
    assert int(gs["est_distinct"].iloc[0]) == 4
    assert int(gs["k_used"].iloc[0]) == 4
    # hash definition matches the SQL replay (md5 60-bit prefix)
    hv = int(hashlib.md5(b"a").hexdigest()[:15], 16)
    assert hv < (1 << 60)


def test_conv_dedup_collapses_reingested_conversations(ray_session):
    """Identical transcripts under different conv_ids collapse to the
    min id; reordered turns do NOT collapse (order-sensitive)."""
    import ray.data as rd

    from data_harvesting_ray.stages.dedup import conv_dedup

    rows = []
    for cid, (ta, tb) in {
        "c1": ("hello", "world"),
        "c2": ("hello", "world"),   # exact re-ingest of c1
        "c3": ("world", "hello"),   # same turns, different order
    }.items():
        rows.append((cid, 0, "user", ta))
        rows.append((cid, 1, "assistant", tb))
    rows.append(("c1", 1, "assistant", "world"))  # duplicate turn row
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
    got = conv_dedup(rd.from_pandas(df), num_buckets=2).to_pandas()
    surv = set(got["conv_id"])
    assert surv == {"c1", "c3"}
    assert len(got) == got["fp"].nunique() == 2


def test_hash_sample_deterministic_and_uniform(ray_session):
    """k smallest md5(id): equals the single-process reference, stable
    under repartition, and statistically unbiased across halves."""
    import hashlib

    import ray.data as rd

    from data_harvesting_ray.stages.projection import hash_sample

    n, k = 5000, 200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": (np.arange(n) % 3).astype(str),
        }
    )
    got = hash_sample(rd.from_pandas(df), k=k, columns=["lang"])
    got2 = hash_sample(rd.from_pandas(df).repartition(11), k=k, columns=["lang"])
    pd.testing.assert_frame_equal(got, got2)
    hv = {
        i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in range(n)
    }
    want_ids = sorted(sorted(hv, key=hv.get)[:k])
    assert got["doc_id"].tolist() == want_ids
    # crude uniformity: both id halves represented within 4 sigma
    lo = (got["doc_id"] < n // 2).sum()
    assert abs(lo - k / 2) < 4 * np.sqrt(k / 4)


def test_equi_join_outer_randomized_vs_duckdb(ray_session):
    """FULL outer join == DuckDB on random keys, with int64 values
    above 2^53 on BOTH sides (the nullable-Int precision guard)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    rng = np.random.default_rng(31)
    big = (1 << 60)
    l = pd.DataFrame(
        {
            "k": rng.integers(0, 30, 50).astype(np.int64),
            "lv": big + rng.integers(0, 1000, 50).astype(np.int64),
        }
    )
    r = pd.DataFrame(
        {
            "k": rng.integers(15, 45, 40).astype(np.int64),
            "rv": big + rng.integers(0, 1000, 40).astype(np.int64),
        }
    )
    got = equi_join(
        rd.from_pandas(l), rd.from_pandas(r), on="k", how="outer", num_buckets=4
    ).to_pandas()
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    # fetchall(), NOT .df(): pandas readback of nullable BIGINT goes
    # through float64 and rounds values above 2^53 — the exact bug the
    # engine's nullable-Int guard exists to avoid.
    want = con.execute(
        "SELECT COALESCE(l.k, r.k) AS k, lv, rv FROM l FULL OUTER JOIN r USING (k)"
    ).fetchall()
    con.close()
    g = sorted(
        (int(k), None if pd.isna(a) else int(a), None if pd.isna(b) else int(b))
        for k, a, b in got[["k", "lv", "rv"]].itertuples(index=False)
    )
    w = sorted((int(k), a, b) for k, a, b in want)
    assert g == w
    # precision survived: every non-null value is still exactly >= 2^60
    assert (got["lv"].dropna() >= big).all() and (got["rv"].dropna() >= big).all()


def test_equi_join_outer_rejects_prefilter(ray_session):
    import ray.data as rd

    from data_harvesting_ray.stages.join import equi_join

    df = pd.DataFrame({"k": [1], "v": [2]})
    df2 = pd.DataFrame({"k": [1], "w": [3]})
    with pytest.raises(ValueError, match="outer"):
        equi_join(rd.from_pandas(df), rd.from_pandas(df2), on="k",
                  how="outer", prefilter="left")


def test_vocab_drift_vs_brute_force(ray_session):
    """Full-outer token counts across two snapshots: tokens unique to
    either side appear with a 0 on the other."""
    from collections import Counter

    import ray.data as rd

    from data_harvesting_ray.stages.text import vocab_drift

    a_texts = ["old slang words here", "old words again"]
    b_texts = ["new slang appears here", "new words again again"]
    a = pd.DataFrame({"doc_id": [0, 1], "text": a_texts})
    b = pd.DataFrame({"doc_id": [2, 3], "text": b_texts})
    got = (
        vocab_drift(rd.from_pandas(a), rd.from_pandas(b), num_buckets=2)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    ca = Counter(w for t in a_texts for w in t.split())
    cb = Counter(w for t in b_texts for w in t.split())
    toks = sorted(set(ca) | set(cb))
    want = pd.DataFrame(
        {
            "token": toks,
            "n_a": [ca.get(t, 0) for t in toks],
            "n_b": [cb.get(t, 0) for t in toks],
        }
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert int(got.loc[got["token"] == "old", "n_b"].iloc[0]) == 0
    assert int(got.loc[got["token"] == "new", "n_a"].iloc[0]) == 0


def test_compact_channel_preserves_rows_and_is_idempotent(ray_session, tmp_path):
    """Compaction: exact row multiset preserved, file count reduced to
    ceil(rows/target), re-run with same inputs is a no-op, and a new
    committed epoch triggers an atomic rewrite."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_harvesting_ray.sinks.compact import compact_channel, compacted_files
    from data_harvesting_ray.sinks.exactly_once import EpochSink

    sink = EpochSink(str(tmp_path / "sink"))
    rows = 0
    for e in range(4):
        d = sink.staging_dir(e)
        for s in range(3):
            t = pa.table(
                {
                    "k": pa.array(range(rows, rows + 50), pa.int64()),
                    "v": pa.array([f"e{e}s{s}r{i}" for i in range(50)]),
                }
            )
            pq.write_table(t, sink.staged_file(d, "sessions", s))
            rows += 50
        sink.commit(e, [], {})
    dest = str(tmp_path / "compacted")
    m1 = compact_channel(sink, "sessions", dest, target_rows=250)
    assert m1["rows"] == 600 and m1["n_files"] == 3
    files = compacted_files(dest)
    assert len(files) == 3  # 12 input files -> 3
    got = pq.read_table(files)
    assert sorted(got["k"].to_pylist()) == list(range(600))
    # no-op re-run: manifest returned unchanged, files untouched
    mtimes = {f: os.path.getmtime(f) for f in files}
    m2 = compact_channel(sink, "sessions", dest, target_rows=250)
    assert m2 == m1
    assert {f: os.path.getmtime(f) for f in files} == mtimes
    # a new epoch supersedes the compaction atomically
    d = sink.staging_dir(4)
    pq.write_table(
        pa.table({"k": pa.array([999], pa.int64()), "v": pa.array(["x"])}),
        sink.staged_file(d, "sessions", 0),
    )
    sink.commit(4, [], {})
    m3 = compact_channel(sink, "sessions", dest, target_rows=250)
    assert m3["rows"] == 601
    got3 = pq.read_table(compacted_files(dest))
    assert sorted(got3["k"].to_pylist()) == list(range(600)) + [999]


def test_cli_compact_e2e(ray_session, tmp_path, capsys):
    """Full user story: run the engine, then `compact` its sessions
    channel via the CLI; the compacted dir reads back the same rows."""
    import json

    import pyarrow.parquet as pq

    from data_harvesting_ray.__main__ import compact_main, main
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.sinks.compact import compacted_files
    from data_harvesting_ray.sinks.exactly_once import EpochSink

    out = tmp_path / "out"
    assert main(
        ["--epochs-root", epochs_root("sf0.001"), "--out", str(out),
         "--num-shards", "4"]
    ) == 0
    capsys.readouterr()
    dest = tmp_path / "sessions_compacted"
    assert compact_main(
        ["--out", str(out), "--channel", "sessions", "--dest", str(dest),
         "--target-rows", "100000"]
    ) == 0
    entry = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    files = compacted_files(str(dest))
    assert entry["n_files"] == len(files) == 1  # tiny fixture -> one file
    sink = EpochSink(str(out))
    # partitioning=None on both reads: the epoch= path component is
    # sink layout, not a data column
    orig = pq.read_table(
        sink.committed_files("sessions"), partitioning=None
    ).to_pandas()
    comp = pq.read_table(files, partitioning=None).to_pandas()
    assert "epoch" not in comp.columns
    key = sorted(orig.columns)
    pd.testing.assert_frame_equal(
        orig[key].sort_values(key).reset_index(drop=True),
        comp[key].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_type_cooccurrence_vs_duckdb(ray_session):
    """Pair support counts equal the distinct self-join oracle on
    random baskets, incl. single-type users (no pairs emitted)."""
    import duckdb
    import ray.data as rd

    from data_harvesting_ray.stages.events import type_cooccurrence

    rng = np.random.default_rng(37)
    n = 3000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 120, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "d", "e"], n),
        }
    )
    df.loc[df["user_id"] == 0, "event_type"] = "a"  # single-type user
    got = (
        type_cooccurrence(rd.from_pandas(df), num_buckets=4)
        .to_pandas()
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
        WITH a AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_users
        FROM a x JOIN a y
          ON x.user_id = y.user_id AND x.event_type < y.event_type
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["type_a"] < got["type_b"]).all()


def test_winnow_fingerprints_brute_force_and_guarantee(ray_session):
    """Winnow set == brute-force reference; two docs sharing a long
    verbatim span share at least one fingerprint; short docs emit
    nothing; batch-layout independent."""
    import hashlib

    import ray.data as rd

    from data_harvesting_ray.stages.text import winnow_fingerprints

    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 50))) for _ in range(60)]
    shared = " ".join(rng.choice(vocab, size=20))
    texts.append(shared + " unique tail one two three")
    texts.append("other prefix words " + shared)
    texts.append("too short")  # < n + window - 1 tokens -> nothing
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    n, w = 3, 4

    def brute(text):
        toks = text.strip().split()
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        hv = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        return {min(hv[i : i + w]) for i in range(len(hv) - w + 1)}

    got = winnow_fingerprints(rd.from_pandas(df), n=n, window=w).to_pandas()
    by_doc = {d: set(s["hv"]) for d, s in got.groupby("doc_id")}
    for i, t in enumerate(texts):
        assert by_doc.get(i, set()) == brute(t), i
    assert 62 not in by_doc  # "too short"
    assert by_doc[60] & by_doc[61]  # shared 20-token span -> shared print
    got2 = winnow_fingerprints(
        rd.from_pandas(df).repartition(5), n=n, window=w
    ).to_pandas()
    a = got.sort_values(["doc_id", "hv"]).reset_index(drop=True)
    b = got2.sort_values(["doc_id", "hv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
