"""Sampled human-readable transcript rendering — the M12 analogue.

The reference ships a debug frame annotator (SURVEY §2 M12,
``utils/AnnotateFrame.py:8-127``: draw detections/track-ids on a
sampled frame so a human can eyeball the pipeline). The transcript
engine's analogue renders a SAMPLE of conversations as annotated
text: one line per turn with role/tool markers, session-boundary
annotations (the same gap rule the session-window operators apply)
and tool-call/response correlation tags.

Plan shape (scale-safe like every debug channel must be): the sample
is ids-only on the driver (n conversation ids), the corpus is filtered
by a broadcast id set inside ``map_batches`` (only sampled rows move),
and rendering runs per-conversation inside the shared hash-bucket
primitive. Output is bounded by ``n``, never by corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

SESSION_GAP_US = 1800 * 1_000_000


def render_conversations(
    ds: ray.data.Dataset,
    sep: str = "\n",
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Flatten every conversation into ONE training document — the
    export step of a transcript corpus pipeline (the analogue of the
    reference's per-video dataset assembly, ``services/
    harvest_service.py``'s grouped-by-media output). Each turn renders
    as ``role: text``; turns are deduped on (conv_id, turn_idx) and
    joined in turn order, so the output preserves per-turn text
    equality under stable turn ordering (the engine's core invariant).

    Output: (conv_id, n_turns, doc). Scale plan: one hash(conv_id)
    co-location shuffle (the shared bucket primitive); per-bucket work
    is a vectorized dedup+sort (``prepare_bucket``) and a per-group
    string join — the join itself is the irreducible string assembly
    of the output documents. Streams: no driver-side materialization;
    output documents are bounded by input text size."""
    from .dedup import prepare_bucket
    from .partition import apply_per_bucket

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = prepare_bucket(g)
        if not len(g):
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "n_turns": pd.Series(dtype=np.int64),
                    "doc": pd.Series(dtype=object),
                }
            )
        lines = g["role"].astype(str) + ": " + g["text"].astype(str)
        key = g["conv_id"].to_numpy()
        grp = lines.groupby(key, sort=False)
        doc = grp.agg(sep.join)
        n = grp.size()
        return pd.DataFrame(
            {
                "conv_id": doc.index.to_numpy(),
                "n_turns": n.to_numpy().astype(np.int64),
                "doc": doc.to_numpy(),
            }
        )

    return apply_per_bucket(ds, kernel, key="conv_id", num_buckets=num_buckets)


def debug_render(
    ds: ray.data.Dataset,
    n: int = 5,
    session_gap_us: int = SESSION_GAP_US,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Render the ``n`` lexically-smallest conversations as annotated
    transcripts. Returns (conv_id, n_turns, n_sessions, rendered).

    Deterministic: the sample is the n smallest conv_ids (stable across
    runs/cluster sizes), and turns render in (turn_idx) order."""
    from .partition import apply_per_bucket

    def conv_ids(df: pd.DataFrame) -> pd.DataFrame:
        u = df["conv_id"].drop_duplicates().sort_values().head(n)
        return pd.DataFrame({"conv_id": u})

    # ids-only partial top-n per batch, tiny driver reduce
    cand = ds.map_batches(conv_ids, batch_format="pandas").to_pandas()
    sample = np.sort(cand["conv_id"].unique())[:n]
    if not len(sample):
        return pd.DataFrame(
            {
                "conv_id": pd.Series(dtype=object),
                "n_turns": pd.Series(dtype=np.int64),
                "n_sessions": pd.Series(dtype=np.int64),
                "rendered": pd.Series(dtype=object),
            }
        )
    ref = ray.put(set(sample.tolist()))

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["conv_id"].isin(ray.get(ref))
        return df[keep]

    sampled = ds.map_batches(filt, batch_format="pandas")

    def render(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, c in g.groupby("conv_id", sort=True):
            c = c.sort_values("turn_idx", kind="stable")
            ts = c["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            gaps = np.diff(ts, prepend=ts[0] if len(ts) else 0)
            new_session = np.zeros(len(c), dtype=bool)
            if len(c):
                new_session[0] = True
                new_session[1:] = gaps[1:] > session_gap_us
            sess = np.cumsum(new_session) - 1
            lines = [f"=== conversation {conv_id} ==="]
            for i, (_, r) in enumerate(c.iterrows()):
                if new_session[i]:
                    lines.append(
                        f"-- session {sess[i]}"
                        + (
                            f" (gap {gaps[i] // 1_000_000}s)"
                            if i
                            else ""
                        )
                        + " --"
                    )
                tool = r.get("tool", "") or ""
                tag = f" [tool-call:{tool}]" if tool and r["role"] == "assistant" else ""
                if r["role"] == "tool":
                    tag = " [tool-response]"
                text = str(r.get("text", ""))
                if len(text) > 80:
                    text = text[:77] + "..."
                lines.append(f"[{int(r['turn_idx']):4d}] {r['role']:<9}{tag}: {text}")
            rows.append(
                {
                    "conv_id": conv_id,
                    "n_turns": np.int64(len(c)),
                    "n_sessions": np.int64(sess[-1] + 1 if len(c) else 0),
                    "rendered": "\n".join(lines),
                }
            )
        if not rows:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series(dtype=object),
                    "n_turns": pd.Series(dtype=np.int64),
                    "n_sessions": pd.Series(dtype=np.int64),
                    "rendered": pd.Series(dtype=object),
                }
            )
        return pd.DataFrame(rows)

    out = apply_per_bucket(
        sampled, render, key="conv_id", num_buckets=num_buckets
    ).to_pandas()
    return out.sort_values("conv_id", kind="stable").reset_index(drop=True)
