"""Distributed connected components over a pair/edge Dataset.

The end-game of near-dup detection is GROUPS, not pairs: cluster the
verified pairs and keep one representative per cluster (the reference's
pairwise suppression, ``condition.py:66-77``, generalized transitively).
Exact min-label propagation: every node's label converges to the
smallest node id in its component.

Physical plan: edges are materialized once (both directions); each
iteration is two key-only shuffles over edge/label rows — labels
co-partitioned with edge sources to attach ``label(u)`` to each (u, v),
then a groupby-min over destinations — never anything corpus-sized on
the driver. Convergence in O(component diameter) iterations; near-dup
clusters are near-cliques, so 2-3 in practice. The per-iteration
convergence check is a single small aggregate (count of changed
labels).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from .partition import apply_per_bucket


def keep_best_per_group(
    groups: ray.data.Dataset,
    metrics: ray.data.Dataset,
    score: str,
    id_col: str = "doc_id",
    group_col: str = "group_id",
    num_buckets: int | None = 16,
) -> ray.data.Dataset:
    """Canonical-survivor selection: one (group_id, keep_doc_id, score)
    row per near-dup group — the member with the HIGHEST ``score``
    (ties break to the smallest id), generalizing keep-min-id to
    quality-ranked dedup (keep the longest / highest-quality document,
    drop its near-duplicates).

    Scale plan: scores for the grouped docs only are fetched via the
    broadcast-id semi-join (group tables are verified-near-dup-scale,
    orders of magnitude below the corpus) and shipped once via
    ``ray.put``; the argmax runs vectorized per group under the shared
    hash-bucket shuffle keyed on ``group_col``."""
    import ray

    from .dedup_approx import _fetch_involved_map
    from .partition import apply_per_bucket

    ids_df = groups.select_columns([id_col]).to_pandas()
    involved = np.unique(ids_df[id_col].to_numpy().astype(np.int64))
    score_map = _fetch_involved_map(metrics, involved, id_col, score)
    missing = [int(i) for i in involved if i not in score_map]
    if missing:
        raise ValueError(
            f"metrics side lacks {score!r} for {len(missing)} grouped ids "
            f"(e.g. {missing[:3]})"
        )
    ref = ray.put(score_map)

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(ref)
        s = g[id_col].map(sm).to_numpy()
        d = pd.DataFrame(
            {
                group_col: g[group_col].to_numpy(),
                "keep_doc_id": g[id_col].to_numpy().astype(np.int64),
                score: s,
            }
        ).sort_values(
            [group_col, score, "keep_doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        return d.drop_duplicates(group_col, keep="first").reset_index(drop=True)

    return apply_per_bucket(groups, kernel, key=group_col, num_buckets=num_buckets)


def _components_local(edges: ray.data.Dataset, max_iter: int) -> ray.data.Dataset:
    """Min-label propagation over a measured-small edge table as
    vectorized numpy passes (one ``np.minimum.at`` scatter per
    iteration — edges already carry both directions, so the one-sided
    update is the full relaxation). Same fixpoint, same
    convergence-or-raise contract as the distributed plan."""
    uv = edges.to_pandas()
    u = uv["u"].to_numpy().astype(np.int64)
    v = uv["v"].to_numpy().astype(np.int64)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    iu, iv = inv[: len(u)], inv[len(u) :]
    label = nodes.copy()
    for _ in range(max_iter):
        new = label.copy()
        np.minimum.at(new, iv, label[iu])
        if np.array_equal(new, label):
            return ray.data.from_pandas(
                pd.DataFrame({"doc_id": nodes, "group_id": label})
            )
        label = new
    raise RuntimeError(
        f"connected_components did not converge within max_iter={max_iter} "
        "iterations (component diameter exceeds max_iter); raise max_iter"
    )


def _min_label_per_key(ds: ray.data.Dataset, key: str, val: str, num_buckets) -> ray.data.Dataset:
    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key, sort=False, as_index=False)[val].min()

    return apply_per_bucket(ds, kernel, key=key, num_buckets=num_buckets)


def connected_components(
    pairs: ray.data.Dataset,
    a: str = "doc_a",
    b: str = "doc_b",
    num_buckets: int | None = 16,
    max_iter: int = 50,
    small_cap: int = 2_000_000,
) -> ray.data.Dataset:
    """(node, group_id) for every node appearing in ``pairs``, where
    group_id = min node id of its connected component. Exact.

    Adaptive plan: the edge count is MEASURED after materialization
    (never assumed); at or below ``small_cap`` edges (~32 MB of int64
    pairs — verified near-dup tables are output-scale, so this is the
    common case) the propagation runs as vectorized numpy passes on
    the driver, skipping the per-iteration shuffle pair whose fixed
    latency dominates small inputs. Past the cap the fully distributed
    two-shuffles-per-iteration plan runs. Both paths are the same
    min-label fixpoint and are conformance-tested identical."""

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        u = df[a].to_numpy().astype(np.int64)
        v = df[b].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "u": np.concatenate([u, v]),
                "v": np.concatenate([v, u]),
            }
        ).drop_duplicates()

    edges = pairs.map_batches(to_edges, batch_format="pandas").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "group_id": pa.array([], pa.int64())})
        )
    if n_edges <= small_cap:
        return _components_local(edges, max_iter)

    # label(x) := min(x, min over neighbors) — seeded from the edges
    labels = _min_label_per_key(
        edges.map_batches(
            lambda df: pd.DataFrame(
                {"u": df["u"], "label": np.minimum(df["u"], df["v"])}
            ),
            batch_format="pandas",
        ),
        "u",
        "label",
        num_buckets,
    ).materialize()

    converged = False
    for _ in range(max_iter):
        # attach label(u) to each edge (u, v): labels and edges share
        # the hash(u) partitioning — one key-only shuffle
        def join_labels(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["v"].isna()][["u", "label"]]
            e = g[g["v"].notna()][["u", "v"]]
            m = e.merge(lab, on="u", how="left")
            return pd.DataFrame(
                {"u": m["v"].astype(np.int64), "label": m["label"].astype(np.int64)}
            )

        tagged = edges.map_batches(
            # v as float64: the label rows carry v=NaN, and union
            # blocks must agree on dtype
            lambda df: pd.DataFrame(
                {
                    "u": df["u"],
                    "v": df["v"].astype(np.float64),
                    "label": np.int64(0),
                }
            ),
            batch_format="pandas",
        ).union(
            labels.map_batches(
                lambda df: pd.DataFrame(
                    {"u": df["u"], "v": np.nan, "label": df["label"]}
                ),
                batch_format="pandas",
            )
        )
        prop = apply_per_bucket(tagged, join_labels, key="u", num_buckets=num_buckets)
        # new label(x) = min(old label(x), min incoming label)
        new_labels = _min_label_per_key(
            prop.union(labels), "u", "label", num_buckets
        ).materialize()

        # convergence: did any label change? (small aggregate, no
        # driver-side label tables)
        def pair_min_sum(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"s": [df["label"].astype(np.int64).sum()], "n": [len(df)]}
            )

        old_sig = labels.map_batches(pair_min_sum, batch_format="pandas").to_pandas()
        new_sig = new_labels.map_batches(pair_min_sum, batch_format="pandas").to_pandas()
        labels = new_labels
        # labels only decrease; equal sums <=> fixpoint
        if int(old_sig["s"].sum()) == int(new_sig["s"].sum()) and int(
            old_sig["n"].sum()
        ) == int(new_sig["n"].sum()):
            converged = True
            break

    if not converged:
        # emitting partially-propagated labels would be SILENTLY wrong
        # (nodes of one component with different group ids)
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations (component diameter exceeds max_iter); raise max_iter"
        )

    return labels.map_batches(
        lambda df: df.rename(columns={"u": "doc_id", "label": "group_id"}),
        batch_format="pandas",
    )
