"""Deterministic synthetic transcript generator (FIXTURES.md F1).

Pure function of (seed, params): the single-process oracle, the Ray
engine, and the DuckDB oracle SQL all read byte-identical Parquet.

Structure mirrors what the reference consumes — an ordered stream of
records per outer unit (video → frames there, conversation → turns
here; reference ``services/harvest_service.py:149-158``) — with the
knobs FIXTURES.md F1 asks for: role motifs for CEP, session gaps,
tool-call/response pairs with call-id tokens for the stateful join,
orphan calls, hot conversations for salting tests, exact duplicate
rows for dedup, and a bounded-disorder arrival order (file order is
arrival order) so the default fixture has no beyond-watermark late
rows; dedicated late-row fixtures are built in tests.

Layout per fixture name (e.g. ``sf0.01``) under ``/tmp/graft_fixtures``:

    <root>/<name>/transcripts.parquet            # one file, arrival order
    <root>/<name>/epochs/epoch=E/part-P.parquet  # micro-batch epochs
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import (
    DEFAULT_WATERMARK_DELAY_S,
    DEFAULT_SESSION_GAP_S,
    TOOLS,
    TRANSCRIPT_SCHEMA,
)

FIXTURE_ROOT = os.environ.get("GRAFT_FIXTURE_ROOT", "/tmp/graft_fixtures")

BASE_TS_US = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in µs
_HORIZON_S = 30 * 24 * 3600  # conv start times spread over 30 days

_VOCAB = (
    "stream window batch shuffle state actor arrow block epoch manifest "
    "watermark session pattern match join dedup partition salt commit turn"
).split()


@dataclass(frozen=True)
class GenParams:
    n_convs: int
    seed: int = 42
    median_turns: int = 12
    hot_frac: float = 0.005  # fraction of convs with hot_turns turns (skew)
    hot_turns: int = 600
    tool_unit_p: float = 0.4  # P(unit = user,assistant+call,tool-resp)
    orphan_call_p: float = 0.05  # P(drop the response of a call)
    ghost_resp_p: float = 0.01  # P(emit a response with no matching call)
    dup_frac: float = 0.02  # fraction of rows duplicated exactly
    session_break_p: float = 0.04  # P(inter-turn gap > session gap)
    session_gap_s: int = DEFAULT_SESSION_GAP_S
    watermark_delay_s: int = DEFAULT_WATERMARK_DELAY_S
    n_epochs: int = 4


def params_for_sf(name: str) -> GenParams:
    """Scale knobs from an ``sf*`` directory basename (TESTDATA.md)."""
    try:
        sf = float(name[2:]) if name.startswith("sf") else 0.001
    except ValueError:
        sf = 0.001
    return GenParams(n_convs=max(32, int(300_000 * sf)))


def generate(params: GenParams) -> pa.Table:
    """Build the transcript table in arrival (file) order."""
    rng = np.random.default_rng(params.seed)
    n = params.n_convs

    turns_target = np.maximum(
        2,
        np.rint(
            np.exp(rng.normal(np.log(params.median_turns), 0.5, size=n))
        ).astype(np.int64),
    )
    n_hot = max(1, int(n * params.hot_frac)) if n else 0
    hot_ids = rng.choice(n, size=n_hot, replace=False)
    turns_target[hot_ids] = params.hot_turns

    conv_start_s = rng.uniform(0, _HORIZON_S, size=n)

    conv_ids: list[str] = []
    turn_idx: list[np.ndarray] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    ts_us: list[np.ndarray] = []
    conv_rows: list[int] = []

    vocab = _VOCAB
    n_vocab = len(vocab)
    tools_all = TOOLS

    for ci in range(n):
        cid = f"conv-{ci:08d}"
        target = int(turns_target[ci])
        # Pre-draw randomness for this conversation in bulk.
        unit_is_tool = rng.random(target) < params.tool_unit_p
        orphan = rng.random(target) < params.orphan_call_p
        ghost = rng.random(target) < params.ghost_resp_p
        tool_pick = rng.integers(0, len(tools_all), size=target)
        gaps = rng.exponential(90.0, size=target + 4) + 1.0
        breaks = rng.random(target + 4) < params.session_break_p
        gaps = gaps + breaks * (
            params.session_gap_s + rng.exponential(1200.0, size=target + 4)
        )

        c_roles: list[str] = []
        c_texts: list[str] = []
        c_tools: list[str] = []
        call_k = 0
        u = 0
        while len(c_roles) < target:
            w0 = vocab[(ci * 31 + len(c_roles)) % n_vocab]
            w1 = vocab[(ci * 17 + u * 7) % n_vocab]
            c_roles.append("user")
            c_texts.append(f"{w0} {w1} question {u}")
            c_tools.append("")
            if unit_is_tool[u % target]:
                tool = tools_all[tool_pick[u % target]]
                call_id = f"call-{cid}-{call_k}"
                call_k += 1
                c_roles.append("assistant")
                c_texts.append(f"invoking {tool} [{call_id}] {w1}")
                c_tools.append(tool)
                if not orphan[u % target]:
                    c_roles.append("tool")
                    c_texts.append(f"result for [{call_id}] {w0}")
                    c_tools.append(tool)
            else:
                c_roles.append("assistant")
                c_texts.append(f"answer {w1} {w0} reply {u}")
                c_tools.append("")
            if ghost[u % target]:
                tool = tools_all[(tool_pick[u % target] + 1) % len(tools_all)]
                c_roles.append("tool")
                c_texts.append(f"result for [call-{cid}-ghost{u}] stray")
                c_tools.append(tool)
            u += 1

        rows = len(c_roles)
        conv_rows.append(rows)
        conv_ids.append(cid)
        turn_idx.append(np.arange(rows, dtype=np.int32))
        roles.extend(c_roles)
        texts.extend(c_texts)
        tools.extend(c_tools)
        t0 = BASE_TS_US + np.int64(conv_start_s[ci] * 1e6)
        ts = t0 + np.cumsum((gaps[:rows] * 1e6).astype(np.int64))
        ts_us.append(ts)

    conv_col = np.repeat(np.array(conv_ids, dtype=object), conv_rows)
    turn_col = np.concatenate(turn_idx) if turn_idx else np.array([], np.int32)
    ts_col = np.concatenate(ts_us) if ts_us else np.array([], np.int64)
    total = len(conv_col)

    # Arrival order: event ts + bounded positive jitter (< 0.9 * delay), so
    # watermark(max seen ts - delay) never overtakes an unseen row's ts —
    # the default fixture contains no beyond-watermark late rows.
    jitter = rng.uniform(0, 0.9 * params.watermark_delay_s * 1e6, size=total)
    arrival = ts_col + jitter.astype(np.int64)

    # Exact duplicate rows (FIXTURES.md: dedup keep-first tests).
    n_dup = int(total * params.dup_frac)
    dup_src = rng.choice(total, size=n_dup, replace=False) if n_dup else np.array([], np.int64)
    dup_arrival = arrival[dup_src] + rng.uniform(1e6, 60e6, size=n_dup).astype(np.int64)

    all_idx = np.concatenate([np.arange(total), dup_src]).astype(np.int64)
    all_arrival = np.concatenate([arrival, dup_arrival])
    order = np.argsort(all_arrival, kind="stable")
    sel = all_idx[order]

    table = pa.table(
        {
            "conv_id": pa.array(conv_col[sel], pa.string()),
            "turn_idx": pa.array(turn_col[sel], pa.int32()),
            "role": pa.array(np.array(roles, dtype=object)[sel], pa.string()),
            "text": pa.array(np.array(texts, dtype=object)[sel], pa.string()),
            "tool": pa.array(np.array(tools, dtype=object)[sel], pa.string()),
            "ts": pa.array(ts_col[sel], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    return table


def _write_fixture(table: pa.Table, out_dir: str, n_epochs: int) -> None:
    tmp = tempfile.mkdtemp(dir=os.path.dirname(out_dir), prefix=".gen-")
    # small row groups so parallel readers can split the single file
    pq.write_table(
        table, os.path.join(tmp, "transcripts.parquet"), row_group_size=131_072
    )
    total = table.num_rows
    bounds = np.linspace(0, total, n_epochs + 1).astype(np.int64)
    for e in range(n_epochs):
        lo, hi = int(bounds[e]), int(bounds[e + 1])
        epoch_rows = table.slice(lo, hi - lo)
        edir = os.path.join(tmp, "epochs", f"epoch={e:03d}")
        os.makedirs(edir, exist_ok=True)
        n_parts = max(1, epoch_rows.num_rows // 100_000 + 1)
        pbounds = np.linspace(0, epoch_rows.num_rows, n_parts + 1).astype(np.int64)
        for p in range(n_parts):
            plo, phi = int(pbounds[p]), int(pbounds[p + 1])
            pq.write_table(
                epoch_rows.slice(plo, phi - plo),
                os.path.join(edir, f"part-{p:03d}.parquet"),
            )
    try:
        os.rename(tmp, out_dir)
    except OSError:
        # Concurrent generation already published it; ours is identical.
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def ensure_fixture(sf_dir_or_name: str, params: GenParams | None = None) -> str:
    """Return the fixture dir for an sf dir/name, generating if missing."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    if os.path.exists(os.path.join(out_dir, "transcripts.parquet")):
        return out_dir
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    p = params or params_for_sf(name)
    table = generate(p)
    _write_fixture(table, out_dir, p.n_epochs)
    return out_dir


def transcripts_path(sf_dir_or_name: str) -> str:
    return os.path.join(ensure_fixture(sf_dir_or_name), "transcripts.parquet")


def neardup_embeddings_path(
    sf_dir_or_name: str, every: int = 20, eps: float = 0.25, seed: int = 41
) -> str:
    """Derived embeddings table with PLANTED near-duplicates, cached
    beside the transcript fixture (deterministic: seeded perturbation
    of the driver's embeddings table, so Ray query and DuckDB oracle
    read byte-identical input).

    Every ``every``-th vector gets a copy (vec_id + 10_000_000)
    perturbed by ``eps``·‖v‖ of orthogonal-ish noise → pair cosine ≈
    1/√(1+eps²) ≈ 0.970, far above the 0.9 near-dup threshold, while
    the driver's natural vectors stay near-orthogonal (max pairwise
    cosine ≈ 0.60) — both margins are wide, so the thresholded pair
    set is stable under float round-off."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    out = os.path.join(out_dir, "embeddings_neardup.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(
        os.path.join(src_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    emb = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float32)
    rng = np.random.default_rng(seed)
    sel = np.arange(0, len(ids), every)
    base = emb[sel]
    noise = rng.normal(size=base.shape).astype(np.float32)
    noise /= np.maximum(np.linalg.norm(noise, axis=1, keepdims=True), 1e-12)
    scale = eps * np.linalg.norm(base, axis=1, keepdims=True)
    dup = base + scale * noise
    all_ids = np.concatenate([ids, ids[sel] + 10_000_000]).astype(np.int64)
    all_emb = np.vstack([emb, dup])
    table = pa.table(
        {
            "vec_id": pa.array(all_ids),
            "embedding": pa.array(
                [row.tolist() for row in all_emb], pa.list_(pa.float32())
            ),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=131_072)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out


def multiline_docs_path(sf_dir_or_name: str) -> str:
    """Derived documents table with MULTI-LINE text and PLANTED
    duplicate lines, cached beside the transcript fixture — the input
    the line-dedup gate (``d_line_dedup``) needs: the driver's
    documents are single-line and line dedup over them is a no-op.

    Deterministic (pure function of doc_id + source text, no RNG):
    - header line from a pool of 7 boilerplate variants
      (``doc_id % 7``) — duplicated across ~1/7th of the corpus;
    - the source text split into 3 word-chunks as body lines (unique
      per doc by construction, since source texts embed the doc id);
    - every 5th doc REPEATS the PREVIOUS doc's first body line (a
      cross-doc quote — dropped from whichever doc comes second);
    - footer line from a pool of 3 (``doc_id % 3``);
    - every 13th doc is PURE boilerplate (header+footer only): all
      its lines lose to earlier docs, so the doc itself vanishes;
    - every 17th doc gets a NULL-text twin (doc_id + 20_000_000) —
      emits no lines on either engine or oracle."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    out = os.path.join(out_dir, "documents_multiline.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(
        os.path.join(src_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    headers = [f"=== corpus header variant {k} ===" for k in range(7)]
    footers = [f"-- footer {k} | all rights reserved --" for k in range(3)]
    ids, texts = t["doc_id"].to_pylist(), t["text"].to_pylist()
    out_ids: list[int] = []
    out_txt: list[str | None] = []
    prev_first_body: str | None = None
    for doc_id, text in zip(ids, texts):
        header = headers[doc_id % 7]
        footer = footers[doc_id % 3]
        if doc_id % 13 == 0:
            lines = [header, footer]
            # pure boilerplate: no body, keeps prev_first_body as-is
        else:
            words = (text or "").split()
            k = max(1, len(words) // 3)
            body = [
                " ".join(words[i : i + k]) for i in range(0, len(words), k)
            ] or [""]
            lines = [header]
            if doc_id % 5 == 0 and prev_first_body is not None:
                lines.append(prev_first_body)  # cross-doc quote
            lines += body + [footer]
            prev_first_body = body[0]
        out_ids.append(doc_id)
        out_txt.append("\n".join(lines))
        if doc_id % 17 == 0:
            out_ids.append(doc_id + 20_000_000)
            out_txt.append(None)
    table = pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_txt, pa.string()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=131_072)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out


def epochs_root(sf_dir_or_name: str) -> str:
    return os.path.join(ensure_fixture(sf_dir_or_name), "epochs")


def late_epochs_root(
    sf_dir_or_name: str, displace_every: int = 50, n_epochs: int = 4
) -> str:
    """Epoch layout with DETERMINISTIC late arrivals: the same rows as
    the sf dir's transcript fixture, but every ``displace_every``-th
    row (by stable hash of (conv_id, turn_idx)) is displaced one epoch
    LATER than its event time says — under a tight watermark those
    rows arrive after their window's frontier passed and land on the
    late channel. This is the repair pipeline's test/gate input: the
    ROW SET equals the fixture exactly, so bounded SQL oracles over
    the raw table remain the ground truth."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    # parameter-keyed cache dir: a non-default call must never return a
    # layout built with different displacement/epoch parameters
    out_dir = os.path.join(
        FIXTURE_ROOT, name, f"late_epochs_d{displace_every}_e{n_epochs}"
    )
    if os.path.isdir(out_dir):
        return out_dir
    import numpy as np

    from ..stages.partition import _stable_hash

    table = pq.read_table(transcripts_path(sf_dir_or_name))
    h = _stable_hash(table["conv_id"].to_numpy(zero_copy_only=False))
    h = h * np.uint64(1_000_003) + _stable_hash(
        table["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    total = table.num_rows
    bounds = np.linspace(0, total, n_epochs + 1).astype(np.int64)
    base = np.searchsorted(bounds[1:], np.arange(total), side="right")
    displaced = (h % displace_every == 0) & (base < n_epochs - 1)
    epoch = base + displaced.astype(np.int64)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(out_dir), prefix=".late-")
    for e in range(n_epochs):
        sel = np.flatnonzero(epoch == e)
        edir = os.path.join(tmp, f"epoch={e:03d}")
        os.makedirs(edir, exist_ok=True)
        pq.write_table(
            table.take(sel), os.path.join(edir, "part-000.parquet")
        )
    try:
        os.rename(tmp, out_dir)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def ivf_side_paths(
    sf_dir_or_name: str,
    n_centroids: int = 16,
    nprobe: int = 4,
    n_queries: int = 10,
    sample_frac: float = 0.5,
    seed: int = 13,
) -> tuple[str, str]:
    """(vec_id → IVF cell) assignments and (query_id → probed cell)
    lists for an sf dir's embeddings, recomputed DRIVER-SIDE in plain
    numpy with the SAME shared kernels the engine uses
    (``similarity.ivf_sample_mask`` + ``kmeans_lloyd`` + argmax cell
    assignment) and cached beside the fixtures.

    This makes the IVF KNN query SQL-checkable: centroid training is
    not SQL-expressible, but with assignments and probe lists as INPUT
    tables DuckDB independently verifies the distributed part — the
    probed-cell candidate scan, exclusion of self, cosine ranking and
    top-k — via list_cosine_similarity over the embeddings view."""
    import numpy as np

    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    # parameter-keyed cache files (stale side tables from a different
    # parameterization would silently verify the wrong plan); "b" keys
    # the count-bounded sampling scheme version
    tag = (
        f"c{n_centroids}_p{nprobe}_q{n_queries}"
        f"_f{int(sample_frac * 1000)}_s{seed}_b1"
    )
    cells_out = os.path.join(out_dir, f"ivf_cells_{tag}.parquet")
    probes_out = os.path.join(out_dir, f"ivf_probes_{tag}.parquet")
    if os.path.exists(cells_out) and os.path.exists(probes_out):
        return cells_out, probes_out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    from ..stages.similarity import (
        _normalize_rows,
        _stack,
        ivf_sample_mask,
        ivf_sample_threshold_micro,
        kmeans_lloyd,
    )

    emb = (
        pq.read_table(
            os.path.join(src_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .to_pandas()
        .sort_values("vec_id", kind="stable")  # canonical sample order,
        # matching the engine's id-sorted driver-side training sample
    )
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mraw = _stack(emb["embedding"])
    # kmeans_lloyd normalizes internally — pass RAW rows exactly like
    # the engine's train_centroids (a second normalization would move
    # float bits and diverge the centroids); the sampling threshold is
    # recomputed INDEPENDENTLY from the same row count + params, so the
    # oracle verifies the engine's count-bounded sampling too
    thr = ivf_sample_threshold_micro(len(ids), sample_frac)
    cents = kmeans_lloyd(
        mraw[ivf_sample_mask(ids, threshold_micro=thr)], n_centroids, seed=seed
    )
    m = _normalize_rows(mraw)
    cell = np.argmax(m @ cents.T, axis=1).astype(np.int64)
    qmask = ids < n_queries
    order = np.argsort(ids[qmask])
    qids, qn = ids[qmask][order], m[qmask][order]
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    os.makedirs(out_dir, exist_ok=True)
    for out, table in (
        (cells_out, pa.table({"vec_id": ids, "cell": cell})),
        (
            probes_out,
            pa.table(
                {
                    "query_id": np.repeat(qids, nprobe),
                    "cell": probe.reshape(-1).astype(np.int64),
                }
            ),
        ),
    ):
        tmp = out + f".tmp-{os.getpid()}"
        pq.write_table(table, tmp)
        try:
            os.rename(tmp, out)
        except OSError:
            os.unlink(tmp)
    return cells_out, probes_out


def simhash_sigs_path(sf_dir_or_name: str) -> str:
    """(doc_id, simhash) side table for the documents of an sf dir,
    computed DRIVER-SIDE in plain pandas (no Ray) with the shared
    ``simhash_batch`` kernel and cached beside the fixtures.

    This makes the SimHash near-dup query SQL-checkable: the token
    hash itself is siphash (not SQL-expressible), but with the
    signatures as an INPUT table DuckDB can independently verify the
    distributed part — banding, candidate generation and hamming
    verification — via bit_count(xor(...)) over all pairs."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    out = os.path.join(out_dir, "simhash_sigs.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    from ..stages.dedup_approx import simhash_batch

    docs = pq.read_table(
        os.path.join(src_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    sigs = simhash_batch(docs)
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(pa.Table.from_pandas(sigs, preserve_index=False), tmp)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out


def semdedup_cells_path(
    sf_dir_or_name: str,
    n_centroids: int = 8,
    sample_frac: float = 0.5,
    seed: int = 13,
) -> str:
    """(vec_id → k-means cell) assignments for the PLANTED-near-dup
    embeddings table, recomputed DRIVER-SIDE in plain numpy with the
    SAME shared kernels the engine's ``semdedup`` uses
    (``ivf_sample_threshold_micro`` + ``ivf_sample_mask`` +
    ``kmeans_lloyd`` + argmax assignment) and cached beside the
    fixtures.

    This makes SemDeDup SQL-checkable exactly like IVF KNN: centroid
    training is not SQL-expressible, but with the cell assignment as
    an INPUT table DuckDB independently verifies the distributed part
    — the within-cell keep-first cosine suppression — via
    list_cosine_similarity + NOT EXISTS over the embeddings view."""
    import numpy as np

    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    tag = f"c{n_centroids}_f{int(sample_frac * 1000)}_s{seed}"
    out = os.path.join(out_dir, f"semdedup_cells_{tag}.parquet")
    cents_out = os.path.join(out_dir, f"semdedup_cents_{tag}.parquet")
    if os.path.exists(out) and os.path.exists(cents_out):
        return out
    from ..stages.similarity import (
        _normalize_rows,
        _stack,
        ivf_sample_mask,
        ivf_sample_threshold_micro,
        kmeans_lloyd,
    )

    emb = (
        pq.read_table(
            neardup_embeddings_path(sf_dir_or_name),
            columns=["vec_id", "embedding"],
        )
        .to_pandas()
        .sort_values("vec_id", kind="stable")  # canonical sample order
    )
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mraw = _stack(emb["embedding"])
    thr = ivf_sample_threshold_micro(len(ids), sample_frac)
    cents = kmeans_lloyd(
        mraw[ivf_sample_mask(ids, threshold_micro=thr)], n_centroids, seed=seed
    )
    cell = np.argmax(_normalize_rows(mraw) @ cents.T, axis=1).astype(np.int64)
    os.makedirs(out_dir, exist_ok=True)
    for path, table in (
        (out, pa.table({"vec_id": ids, "cell": cell})),
        (
            # unit-norm centroids as float64 lists: lets the oracle
            # compute centroid-cosines with list_cosine_similarity for
            # the paper-keep (low-centroid-sim survivor) variant
            cents_out,
            pa.table(
                {
                    "cell": np.arange(len(cents), dtype=np.int64),
                    "centroid": pa.array(
                        [row.tolist() for row in cents],
                        pa.list_(pa.float64()),
                    ),
                }
            ),
        ),
    ):
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(table, tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            os.unlink(tmp)
    return out


def semdedup_cents_path(
    sf_dir_or_name: str,
    n_centroids: int = 8,
    sample_frac: float = 0.5,
    seed: int = 13,
) -> str:
    """The (cell → unit-norm centroid) side table written alongside
    ``semdedup_cells_path`` (same parameter-keyed cache)."""
    semdedup_cells_path(sf_dir_or_name, n_centroids, sample_frac, seed)
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    tag = f"c{n_centroids}_f{int(sample_frac * 1000)}_s{seed}"
    return os.path.join(FIXTURE_ROOT, name, f"semdedup_cents_{tag}.parquet")


def dist_centroids_path(
    sf_dir_or_name: str,
    n_centroids: int = 8,
    iters: int = 5,
    seed: int = 13,
    init_budget: int = 4096,
) -> str:
    """Golden centroids for the fully DISTRIBUTED Lloyd trainer,
    recomputed DRIVER-SIDE by a single-process implementation of the
    SAME quantized algorithm (integer-micro partial sums make the
    distributed result a pure function of the table, so the two must
    match bit-for-bit) — the literal "verified against a
    single-process reference implementation's golden outputs"
    criterion. With this table as INPUT, the gate is an exact hash
    compare instead of a rows-only check."""
    import numpy as np

    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    tag = f"c{n_centroids}_i{iters}_s{seed}_b{init_budget}"
    out = os.path.join(out_dir, f"dist_centroids_{tag}.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    from ..stages.similarity import (
        _normalize_rows,
        _stack,
        ivf_sample_mask,
        ivf_sample_threshold_micro,
    )

    emb = (
        pq.read_table(
            os.path.join(src_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        .to_pandas()
        .sort_values("vec_id", kind="stable")  # canonical pool order
    )
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    m = _normalize_rows(_stack(emb["embedding"]))
    thr = ivf_sample_threshold_micro(len(ids), 1.0, init_budget)
    pool = m[ivf_sample_mask(ids, threshold_micro=thr)]
    rng = np.random.default_rng(seed)
    cents = pool[
        rng.choice(len(pool), size=min(n_centroids, len(pool)), replace=False)
    ].copy()
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        micro = np.floor(m * 1e6).astype(np.int64)
        new = cents.copy()
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                new[c] = (micro[mask].sum(axis=0) / 1e6) / mask.sum()
        cents = _normalize_rows(new)
    table = pa.table(
        {
            "centroid": np.arange(len(cents), dtype=np.int64),
            **{
                f"c{j}": np.floor(cents[:, j] * 1e6).astype(np.int64)
                for j in range(cents.shape[1])
            },
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out


def documents_jsonl_path(sf_dir_or_name: str, shards: int = 4) -> str:
    """The documents table re-materialized as sharded line-delimited
    JSON (the interchange format most LLM-corpus pipelines ingest),
    cached beside the transcript fixture. Deterministic byte-for-byte
    (sorted keys, no float fields), so the Ray ``read_json`` query and
    the DuckDB ``read_json_auto`` oracle consume identical input."""
    import json

    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name, "documents_jsonl")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(
        os.path.join(src_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    tmp = out_dir + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    n = t.num_rows
    bounds = np.linspace(0, n, shards + 1).astype(np.int64)
    cols = {c: t[c].to_pylist() for c in t.column_names}
    for s in range(shards):
        with open(os.path.join(tmp, f"part-{s:03d}.jsonl"), "w") as f:
            for i in range(int(bounds[s]), int(bounds[s + 1])):
                f.write(
                    json.dumps(
                        {c: cols[c][i] for c in t.column_names}, sort_keys=True
                    )
                    + "\n"
                )
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok\n")
    try:
        os.rename(tmp, out_dir)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def encode_png(img: np.ndarray, filters: np.ndarray | None = None) -> bytes:
    """Minimal standards-conforming PNG ENCODER (stdlib zlib + numpy)
    for fixtures and tests: 8-bit RGB (h, w, 3) uint8 in,
    non-interlaced color-type-2 PNG out. ``filters`` picks the filter
    type per scanline (default: cycle 0..4 so every fixture payload
    exercises all five unfilter paths in the decoder)."""
    import struct
    import zlib

    h, w, _ = img.shape
    bpp = 3
    if filters is None:
        filters = np.arange(h, dtype=np.int64) % 5
    raw = img.astype(np.int64)
    lines = []
    for y in range(h):
        cur = raw[y].reshape(-1)
        prev = raw[y - 1].reshape(-1) if y > 0 else np.zeros(w * bpp, np.int64)
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        ft = int(filters[y])
        if ft == 0:
            out = cur
        elif ft == 1:
            out = cur - left
        elif ft == 2:
            out = cur - prev
        elif ft == 3:
            out = cur - ((left + prev) >> 1)
        elif ft == 4:
            p = left + prev - upleft
            pa_, pb_, pc_ = (
                np.abs(p - left),
                np.abs(p - prev),
                np.abs(p - upleft),
            )
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_),
                left,
                np.where(pb_ <= pc_, prev, upleft),
            )
            out = cur - pred
        else:
            raise ValueError(f"filter {ft}")
        lines.append(bytes([ft]) + (out & 0xFF).astype(np.uint8).tobytes())

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _golden_feat_checksum(px) -> int:
    """8-feature checksum from raw (h, w, 3) int64 pixels — the golden
    side tables' witness arithmetic, spelled ONCE here and shared by
    the PNG/GIF fixtures. Independent of the engine's decoder (that
    independence is the point of the golden pattern); the maxval byte
    is fixed at 255 for these formats."""
    h, w = px.shape[0], px.shape[1]
    gray = px.mean(axis=2, dtype=np.float64)
    feats = [
        int(px[:, :, 0].sum() // (h * w)) & 0xFF,
        int(px[:, :, 1].sum() // (h * w)) & 0xFF,
        int(px[:, :, 2].sum() // (h * w)) & 0xFF,
        int(gray[: h // 2].sum() // gray[: h // 2].size) & 0xFF,
        int(gray[h - h // 2 :].sum() // gray[h - h // 2 :].size) & 0xFF,
        w % 256,
        h % 256,
        255,
    ]
    return sum(feats)


def _gif_anim_doc_params(doc_id: int, seed: int = 61):
    """Per-document animated-GIF parameters shared by gif_anim_paths
    and gif_resize_golden_path — ONE derivation so the two side tables
    can never desynchronize: (w, h, npal, palette, indices, n_frames),
    drawn in a fixed rng order."""
    rng = np.random.default_rng(seed + int(doc_id))
    w = 6 + int(doc_id) % 7
    h = 6 + (int(doc_id) // 7) % 7
    npal = (4, 16, 64, 256)[int(doc_id) % 4]
    palette = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
    indices = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
    nf = 1 + int(doc_id) % 5
    return w, h, npal, palette, indices, nf


def _lzw_encode_gif(indices, min_code_size: int) -> bytes:
    """Textbook GIF-variant LZW ENCODER for fixtures/tests: variable
    code width from ``min_code_size + 1`` bits, LSB-first packing,
    leading CLEAR, trailing EOI, CLEAR emitted + table reset when the
    12-bit code space fills. Mirrors the decoder's growth rule (width
    bumps when the next assignable code would not fit)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out: list[tuple[int, int]] = [(clear, code_size)]  # (code, width at emit)
    w = b""
    for k in indices.reshape(-1).astype(np.uint8).tolist():
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        out.append((table[w], code_size))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # grow one step LATER than the textbook encoder: the
            # decoder's table lags one entry behind at read time, so
            # width must bump only once the just-added code itself
            # no longer fits (verified against real-world GIFs)
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:  # table full: emit CLEAR at the current width, reset
            out.append((clear, code_size))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([k])
    if w:
        out.append((table[w], code_size))
    out.append((eoi, code_size))
    big = 0
    pos = 0
    for code, width in out:
        big |= code << pos
        pos += width
    return big.to_bytes((pos + 7) // 8, "little")


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, extra_frames: int = 0
) -> bytes:
    """Minimal standards-conforming GIF89a ENCODER (pure Python +
    numpy) for fixtures and tests: (h, w) uint8 palette indices + an
    (n, 3) uint8 color table in, GIF bytes out (global color table,
    one graphic-control extension so decoders must skip 0x21 blocks,
    real LZW body split into ≤255-byte sub-blocks). ``extra_frames``
    appends VALUE-SHIFTED copies of the frame (frame f's index grid is
    ``(indices + f) % n`` — every pixel changes, so per-frame feature
    witnesses differ) making animated poster-frame AND stride-sampling
    semantics testable — lossless for every frame, so golden features
    computed from ``palette[(indices + f) % n]`` equal what a decoder
    recovers."""
    import struct

    h, w = indices.shape
    n = palette.shape[0]
    bits = max(2, int(n - 1).bit_length())  # GIF min code size >= 2
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:n] = palette
    packed = 0x80 | (bits - 1)  # GCT present, 2**bits entries
    head = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, packed, 0, 0)
        + pal.tobytes()
    )
    body = bytearray()
    for f in range(1 + extra_frames):
        # graphic-control extension before every frame (block 0x21)
        body += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        body += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        frame = ((indices.astype(np.int64) + f) % n).astype(np.uint8) if f else indices
        lzw = _lzw_encode_gif(frame, bits)
        body += bytes([bits])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            body += bytes([len(chunk)]) + chunk
        body += b"\x00"
    return head + bytes(body) + b"\x3b"


def gif_payloads_path(sf_dir_or_name: str, seed: int = 59) -> str:
    """(doc_id, payload: GIF89a, feat_checksum: golden) side table —
    one deterministic palette image per document (palette sizes cycle
    4/16/64/256; every third doc is a 2-frame animated GIF so the
    poster-frame path is exercised on real data). The golden checksum
    is computed HERE from the raw palette[indices] pixels with the
    8-feature arithmetic spelled out inline (independent of the
    engine's decoder), making the GIF LZW decode path hash-gateable —
    the third sibling of ``png_payloads_path``/``wav_payloads_path``."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    out = os.path.join(out_dir, "gif_payloads.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"), columns=["doc_id"])
    ids = t["doc_id"].to_numpy().astype(np.int64)
    payloads: list[bytes] = []
    checks = np.zeros(len(ids), dtype=np.int64)
    pal_sizes = (4, 16, 64, 256)
    for i, doc_id in enumerate(ids):
        rng = np.random.default_rng(seed + int(doc_id))
        w = 8 + int(doc_id) % 9
        h = 8 + (int(doc_id) // 9) % 9
        npal = pal_sizes[int(doc_id) % 4]
        palette = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        indices = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
        payloads.append(
            encode_gif(indices, palette, extra_frames=1 if doc_id % 3 == 0 else 0)
        )
        # golden checksum from frame-0 pixels (shared witness helper)
        checks[i] = _golden_feat_checksum(palette[indices].astype(np.int64))
    table = pa.table(
        {
            "doc_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "feat_checksum": pa.array(checks),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=131_072)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out


def gif_anim_paths(sf_dir_or_name: str, seed: int = 61) -> tuple[str, str]:
    """Two side tables for the REAL-decode frame-sampling gate:
    payloads = (doc_id, payload: animated GIF89a, n_frames) — 1 +
    doc_id%5 value-shifted frames per document; golden = (doc_id,
    frame_idx, frame_checksum) for every STRIDE-2 sampled frame, the
    checksum computed HERE from the raw ``palette[(indices+f) % n]``
    pixels with the 8-feature arithmetic spelled out inline
    (independent of the engine's decoder) — so the m_gif_frame_sample
    gate verifies LZW decode of EVERY sampled frame, not just the
    poster."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    pay_out = os.path.join(out_dir, "gif_anim_payloads.parquet")
    gold_out = os.path.join(out_dir, "gif_anim_golden.parquet")
    if os.path.exists(pay_out) and os.path.exists(gold_out):
        return pay_out, gold_out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"), columns=["doc_id"])
    ids = t["doc_id"].to_numpy().astype(np.int64)
    payloads: list[bytes] = []
    nframes_col = np.zeros(len(ids), dtype=np.int64)
    g_doc, g_idx, g_chk = [], [], []
    for i, doc_id in enumerate(ids):
        _w, _h, npal, palette, indices, nf = _gif_anim_doc_params(doc_id, seed)
        payloads.append(encode_gif(indices, palette, extra_frames=nf - 1))
        nframes_col[i] = nf
        for f in range(0, nf, 2):  # stride-2 sampled frames
            px = palette[
                ((indices.astype(np.int64) + f) % npal).astype(np.uint8)
            ].astype(np.int64)
            g_doc.append(int(doc_id))
            g_idx.append(f)
            g_chk.append(_golden_feat_checksum(px))
    os.makedirs(out_dir, exist_ok=True)
    for path, table in (
        (
            pay_out,
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "payload": pa.array(payloads, pa.binary()),
                    "n_frames": pa.array(nframes_col),
                }
            ),
        ),
        (
            gold_out,
            pa.table(
                {
                    "doc_id": pa.array(g_doc, pa.int64()),
                    "frame_idx": pa.array(g_idx, pa.int64()),
                    "frame_checksum": pa.array(g_chk, pa.int64()),
                }
            ),
        ),
    ):
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(table, tmp, row_group_size=131_072)
        try:
            os.rename(tmp, path)
        except OSError:
            os.unlink(tmp)
    return pay_out, gold_out


def gif_resize_golden_path(
    sf_dir_or_name: str,
    seed: int = 61,
    out_h: int = 4,
    out_w: int = 5,
) -> str:
    """(doc_id, frame_idx, resized_checksum) golden table for the
    decode+sample+RESIZE gate: regenerates the same per-document
    palettes/index grids as ``gif_anim_paths`` (identical seed and rng
    draw order), nearest-neighbor resizes every stride-2 sampled frame
    with the integer grid spelled out inline (``y*h // out_h``), and
    computes the 8-feature checksum from those raw resized pixels —
    fully independent of the engine's decoder and resize kernel."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    out = os.path.join(out_dir, "gif_resize_golden.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"), columns=["doc_id"])
    ids = t["doc_id"].to_numpy().astype(np.int64)
    g_doc, g_idx, g_chk = [], [], []
    for doc_id in ids:
        w, h, npal, palette, indices, nf = _gif_anim_doc_params(doc_id, seed)
        ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
        xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
        for f in range(0, nf, 2):
            full = palette[
                ((indices.astype(np.int64) + f) % npal).astype(np.uint8)
            ].astype(np.int64)
            g_doc.append(int(doc_id))
            g_idx.append(f)
            g_chk.append(_golden_feat_checksum(full[ys][:, xs]))
    table = pa.table(
        {
            "doc_id": pa.array(g_doc, pa.int64()),
            "frame_idx": pa.array(g_idx, pa.int64()),
            "resized_checksum": pa.array(g_chk, pa.int64()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=131_072)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out


def encode_bmp_rle8(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal standards-conforming 8-bit RLE8 BMP ENCODER (pure
    Python + numpy) for fixtures and tests: (h, w) uint8 palette
    indices + (n, 3) uint8 RGB palette in, BITMAPINFOHEADER BMP out
    (bottom-up rows, BGRX palette, real run-length encoding mixing
    encoded runs and word-padded absolute blocks so decoders must
    handle both, end-of-line and end-of-bitmap escapes). Lossless —
    golden features from ``palette[indices]`` equal what a decoder
    recovers."""
    import struct

    h, w = indices.shape
    n_pal = palette.shape[0]
    bgrx = np.zeros((n_pal, 4), dtype=np.uint8)
    bgrx[:, 0] = palette[:, 2]
    bgrx[:, 1] = palette[:, 1]
    bgrx[:, 2] = palette[:, 0]
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = indices[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            if run >= 3:
                body += bytes([run, int(row[x])])
                x += run
            else:
                # absolute block: literals until the next >=3 run
                start = x
                while x < w and x - start < 255:
                    r2 = 1
                    while x + r2 < w and row[x + r2] == row[x] and r2 < 255:
                        r2 += 1
                    if r2 >= 3:
                        break
                    x += r2
                lit = row[start:x].astype(np.uint8).tobytes()
                if len(lit) >= 3:
                    body += bytes([0, len(lit)]) + lit
                    if len(lit) & 1:
                        body += b"\x00"  # word padding
                else:  # too short for absolute mode: emit tiny runs
                    for v in lit:
                        body += bytes([1, v])
        body += b"\x00\x00"  # end of line
    body += b"\x00\x01"  # end of bitmap
    pal_bytes = bgrx.tobytes()
    data_off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(body), 2835, 2835, n_pal, 0
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    return file_hdr + info + pal_bytes + bytes(body)


def bmp_payloads_path(sf_dir_or_name: str, seed: int = 67) -> str:
    """(doc_id, payload: RLE8 BMP, feat_checksum: golden) side table —
    one deterministic palette image per document with runs planted
    (stripes + random spans) so the RLE genuinely compresses and both
    encoded-run and absolute-mode paths are exercised on real data.
    Golden checksums from the raw ``palette[indices]`` pixels via the
    shared witness helper — the fifth sibling in the decode-gate
    family."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    out = os.path.join(out_dir, "bmp_payloads.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"), columns=["doc_id"])
    ids = t["doc_id"].to_numpy().astype(np.int64)
    payloads: list[bytes] = []
    checks = np.zeros(len(ids), dtype=np.int64)
    pal_sizes = (4, 16, 64, 256)
    for i, doc_id in enumerate(ids):
        rng = np.random.default_rng(seed + int(doc_id))
        w = 7 + int(doc_id) % 8
        h = 7 + (int(doc_id) // 8) % 8
        npal = pal_sizes[int(doc_id) % 4]
        palette = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        # runs: horizontal stripes with random per-row noise spans
        indices = np.repeat(
            rng.integers(0, npal, size=(h, 1)), w, axis=1
        ).astype(np.uint8)
        noisy = rng.random(h) < 0.5
        for y in np.nonzero(noisy)[0]:
            a = int(rng.integers(0, w))
            b = int(rng.integers(a, w)) + 1
            indices[y, a:b] = rng.integers(0, npal, size=b - a)
        payloads.append(encode_bmp_rle8(indices, palette))
        checks[i] = _golden_feat_checksum(palette[indices].astype(np.int64))
    table = pa.table(
        {
            "doc_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "feat_checksum": pa.array(checks),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=131_072)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out


def encode_wav(samples: np.ndarray, framerate: int, n_channels: int = 1) -> bytes:
    """Minimal PCM WAV encoder via stdlib ``wave`` for fixtures/tests:
    int16 samples (interleaved when ``n_channels > 1``) in, RIFF/WAVE
    bytes out — lossless, so golden features computed from ``samples``
    equal features the decoder recomputes from the bytes."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(n_channels)
        wv.setsampwidth(2)
        wv.setframerate(framerate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_payloads_path(sf_dir_or_name: str, seed: int = 53) -> str:
    """(doc_id, payload: PCM WAV, feat_checksum: golden) side table —
    one deterministic short 16-bit clip per document (mono/stereo
    alternating, varied rates/lengths). The golden checksum is computed
    HERE from the raw pre-encoding samples with the 8-feature
    arithmetic spelled out inline (independent of the engine's
    decoder), making the WAV decode path hash-gateable — the audio
    analogue of ``png_payloads_path``."""
    import math

    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    out = os.path.join(out_dir, "wav_payloads.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"), columns=["doc_id"])
    ids = t["doc_id"].to_numpy().astype(np.int64)
    payloads: list[bytes] = []
    checks = np.zeros(len(ids), dtype=np.int64)
    rates = (8000, 16000, 22050, 44100)
    for i, doc_id in enumerate(ids):
        rng = np.random.default_rng(seed + int(doc_id))
        nch = 1 + int(doc_id) % 2
        fr = rates[int(doc_id) % 4]
        nf = 40 + int(doc_id) % 77  # frames per channel
        x = rng.integers(-30000, 30000, size=nf * nch, dtype=np.int64)
        payloads.append(encode_wav(x, fr, nch))
        # golden 8 audio feature bytes, spelled inline (channels, kHz,
        # frames, mean|x| / peak / RMS high bytes, zero crossings,
        # duration ms) — integer-exact, mirrors nothing from the engine
        ax = np.abs(x)
        feats = [
            nch % 256,
            (fr // 1000) % 256,
            nf % 256,
            (int(ax.sum()) // len(x)) >> 8 & 0xFF,
            int(ax.max()) >> 8 & 0xFF,
            math.isqrt(int((x * x).sum()) // len(x)) >> 8 & 0xFF,
            int(np.count_nonzero((x[1:] < 0) != (x[:-1] < 0))) % 256,
            (nf * 1000 // fr) % 256,
        ]
        checks[i] = sum(feats)
    table = pa.table(
        {
            "doc_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "feat_checksum": pa.array(checks),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=131_072)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out


def png_payloads_path(sf_dir_or_name: str, seed: int = 47) -> str:
    """(doc_id, payload: binary PNG, feat_checksum: golden) side table —
    one deterministic small RGB image per document, PNG-encoded with
    the in-repo encoder (scanline filters cycle 0..4, so real payloads
    exercise every unfilter path). The golden checksum is computed
    HERE from the raw pre-encoding pixels with the 8-feature
    arithmetic spelled out inline (independent of the engine's
    decoder), making the PNG decode path hash-gateable: engine =
    decode(PNG bytes) → features; oracle = this column."""
    name = os.path.basename(os.path.normpath(sf_dir_or_name))
    out_dir = os.path.join(FIXTURE_ROOT, name)
    out = os.path.join(out_dir, "png_payloads.parquet")
    if os.path.exists(out):
        return out
    src_dir = (
        sf_dir_or_name
        if os.path.isdir(sf_dir_or_name)
        else os.path.join("/root/testdata", name)
    )
    t = pq.read_table(os.path.join(src_dir, "documents.parquet"), columns=["doc_id"])
    ids = t["doc_id"].to_numpy().astype(np.int64)
    payloads: list[bytes] = []
    checks = np.zeros(len(ids), dtype=np.int64)
    for i, doc_id in enumerate(ids):
        rng = np.random.default_rng(seed + int(doc_id))
        w = 8 + int(doc_id) % 9
        h = 8 + (int(doc_id) // 9) % 9
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payloads.append(encode_png(img))
        # golden 8-feature bytes, spelled inline (R/G/B means,
        # top/bottom gray means, w%256, h%256, maxval%256)
        px = img.astype(np.int64)
        gray = px.mean(axis=2, dtype=np.float64)
        feats = [
            int(px[:, :, 0].sum() // (h * w)) & 0xFF,
            int(px[:, :, 1].sum() // (h * w)) & 0xFF,
            int(px[:, :, 2].sum() // (h * w)) & 0xFF,
            int(gray[: h // 2].sum() // gray[: h // 2].size) & 0xFF,
            int(gray[h - h // 2 :].sum() // gray[h - h // 2 :].size) & 0xFF,
            w % 256,
            h % 256,
            255,
        ]
        checks[i] = sum(feats)
    table = pa.table(
        {
            "doc_id": pa.array(ids),
            "payload": pa.array(payloads, pa.binary()),
            "feat_checksum": pa.array(checks),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, row_group_size=131_072)
    try:
        os.rename(tmp, out)
    except OSError:
        os.unlink(tmp)
    return out
