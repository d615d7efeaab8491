"""EngineConfig as a live extension surface (X1/X3/X5) + state TTL.

- the enrich batch-UDF (the reference's model slot,
  projects/base_project.py:84-106) must actually run in the router:
  derived columns surface on the committed `turns` channel and
  rewritten columns feed the join state,
- per-conv state must stay bounded over many epochs of disjoint
  conversations (TTL eviction), with committed outputs unchanged.
"""

from __future__ import annotations

import glob
import os
import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from .conftest import assert_frames_equal


def _enrich(t: pa.Table) -> pa.Table:
    """Derive a column AND rewrite one (a stand-in model scorer)."""
    tlen = pc.utf8_length(t["text"])
    t = t.append_column("text_len", tlen)
    upper = pc.if_else(
        pc.equal(t["tool"], pa.scalar("search")),
        pa.scalar("websearch"),
        t["tool"],
    )
    return t.set_column(t.schema.get_field_index("tool"), "tool", upper)


def test_enrich_column_reaches_committed_turns_channel(ray_session, tmp_path):
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    cfg = EngineConfig(enrich=_enrich, emit_turns=True)
    eng = StreamingEngine(str(tmp_path / "out"), num_shards=4, config=cfg)
    eng.run(discover_epochs(epochs_root("sf0.001")))
    turns = eng.results_pandas("turns")
    assert "text_len" in turns.columns and len(turns) > 0
    # rewritten tool names flow into the correlated pairs channel
    pairs = eng.results_pandas("pairs")
    tools = set(pairs["tool"].unique())
    assert "search" not in tools and "websearch" in tools
    # derived value is the enrich output, not a default
    assert (turns["text_len"].to_numpy() > 0).any()


def test_enrich_applies_in_bounded_flagship(ray_session, sf_small):
    import ray.data as rd

    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.pipelines.flagship import flagship_bounded, split_channels

    cfg = EngineConfig(enrich=_enrich)
    u = flagship_bounded(rd.read_parquet(sf_small), config=cfg).to_pandas()
    pairs = split_channels(u)["pairs"]
    tools = set(pairs["tool"].unique())
    assert "search" not in tools and "websearch" in tools


def test_sink_format_registry_jsonl(ray_session, tmp_path, df_small):
    """X2: a registered non-default sink format writes the committed
    channels (manifest-gated, same exactly-once path) and reads back
    to the same rows as the oracle."""
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.oracle import reference as R
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    eng = StreamingEngine(
        str(tmp_path / "jsonl"), num_shards=4, config=EngineConfig(sink_format="jsonl")
    )
    eng.run(discover_epochs(epochs_root("sf0.001")))
    files = eng.sink.committed_files("sessions")
    assert files and all(f.endswith(".jsonl") for f in files)
    assert_frames_equal(
        eng.results_pandas("sessions"), R.session_windows(df_small), ["conv_id", "session_id"]
    )


def test_unknown_sink_format_rejected():
    from data_harvesting_ray.config import EngineConfig

    with pytest.raises(ValueError, match="sink format"):
        EngineConfig(sink_format="avro").validate()


def test_enrich_by_registered_name(ray_session, tmp_path):
    """X4: a dict/YAML config can select an enrich UDF by name; the
    registry resolves it at spawn and the derived column reaches the
    committed turns channel with correct values."""
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    cfg = EngineConfig.from_dict({"enrich": "token_count", "emit_turns": True})
    eng = StreamingEngine(str(tmp_path / "out"), num_shards=4, config=cfg)
    eng.run(discover_epochs(epochs_root("sf0.001")))
    turns = eng.results_pandas("turns")
    assert "n_tokens" in turns.columns and len(turns) > 0
    # spot-check against a whitespace-split oracle on the raw fixture
    import ray.data as rd

    raw = rd.read_parquet(epochs_root("sf0.001")).to_pandas()
    expect = raw["text"].str.split().map(len)
    got = turns.set_index(["conv_id", "turn_idx"])["n_tokens"]
    key = list(zip(raw["conv_id"], raw["turn_idx"]))
    mask = [k in got.index for k in key]
    assert all(
        got.loc[k] == e for k, e, m in zip(key, expect, mask) if m
    )


def test_unknown_enrich_name_rejected():
    from data_harvesting_ray.config import EngineConfig

    with pytest.raises(ValueError, match="enrich UDF"):
        EngineConfig(enrich="no_such_udf").validate()


def test_cli_main_runs_and_resumes(ray_session, tmp_path, capsys):
    """python -m data_harvesting_ray: end-to-end run then exactly-once
    no-op rerun over the same output directory."""
    import json

    from data_harvesting_ray.__main__ import main
    from data_harvesting_ray.fixtures.generator import epochs_root

    argv = [
        "--epochs-root", epochs_root("sf0.001"),
        "--out", str(tmp_path / "out"),
        "--num-shards", "4",
    ]
    assert main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["epochs"] == 4 and first["rows"] > 0
    assert main(argv) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second == {"epochs": 0, "skipped": 4, "rows": 0, "wall_s": 0.0}


def test_cli_yaml_config_with_named_enrich(ray_session, tmp_path, capsys):
    """The full user story: a YAML config selects a registered enrich
    UDF by name; the CLI runs it and the derived column lands on the
    committed turns channel."""
    from data_harvesting_ray.__main__ import main
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.sinks.exactly_once import EpochSink

    cfg = tmp_path / "engine.yaml"
    cfg.write_text("enrich: token_count\nemit_turns: true\nnum_shards: 4\n")
    out = tmp_path / "out"
    assert main([
        "--epochs-root", epochs_root("sf0.001"),
        "--out", str(out),
        "--config", str(cfg),
    ]) == 0
    capsys.readouterr()
    sink = EpochSink(str(out))
    files = sink.committed_files("turns")
    assert files
    turns = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    assert "n_tokens" in turns.columns and (turns["n_tokens"] > 0).any()


def test_user_registered_enrich_resolves():
    from data_harvesting_ray.enrich import register_enrich, resolve_enrich

    def my_udf(t):
        return t

    register_enrich("my_udf", my_udf)
    assert resolve_enrich("my_udf") is my_udf
    assert resolve_enrich(my_udf) is my_udf
    assert resolve_enrich(None) is None


def _disjoint_epochs(root: str, n_epochs: int, spacing_s: int) -> None:
    """Each epoch has fresh conversations, spaced far apart in event
    time, with one call/response pair and one orphan call per conv."""
    import pyarrow.parquet as pq

    from data_harvesting_ray.schema import TRANSCRIPT_SCHEMA

    base = np.int64(1_704_067_200_000_000)
    for e in range(n_epochs):
        rows = []
        t0 = base + np.int64(e) * spacing_s * 1_000_000
        for k in range(20):
            cid = f"conv-e{e}-{k:03d}"
            cal = f"call-{cid}-0"
            orph = f"call-{cid}-9"
            rows += [
                (cid, 0, "user", "hi", "", t0 + k * 1000),
                (cid, 1, "assistant", f"go [{cal}]", "search", t0 + k * 1000 + 10),
                (cid, 2, "tool", f"res [{cal}]", "search", t0 + k * 1000 + 20),
                (cid, 3, "assistant", f"lost [{orph}]", "sql", t0 + k * 1000 + 30),
            ]
        df = pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "us"]
        )
        df["turn_idx"] = df["turn_idx"].astype(np.int32)
        df["ts"] = df.pop("us").astype("datetime64[us]")
        d = os.path.join(root, f"epoch={e:03d}")
        os.makedirs(d)
        pq.write_table(
            pa.Table.from_pandas(df, schema=TRANSCRIPT_SCHEMA),
            os.path.join(d, "part-000.parquet"),
        )


@pytest.mark.parametrize("n_epochs", [6])
def test_state_ttl_bounds_per_conv_state(ray_session, tmp_path, n_epochs):
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    root = str(tmp_path / "epochs")
    _disjoint_epochs(root, n_epochs, spacing_s=8 * 3600)
    epochs = discover_epochs(root)

    outs = {}
    for name, ttl in (("small", 3600), ("huge", 10**7)):
        out = str(tmp_path / name)
        cfg = EngineConfig(state_ttl_s=ttl)
        eng = StreamingEngine(out, num_shards=4, config=cfg)
        eng.run(epochs)
        outs[name] = {
            ch: eng.results_pandas(ch)
            for ch in ("sessions", "pairs", "orphans", "matches")
        }
        # inspect the second-to-last checkpoint (pre-flush state)
        ckpts = sorted(glob.glob(os.path.join(out, "checkpoints", "epoch=*")))
        states = []
        for f in glob.glob(os.path.join(ckpts[-2], "shard-*.bin")):
            with open(f, "rb") as fh:
                states.append(pickle.loads(fh.read()))
        outs[name]["n_tracked"] = sum(len(s["sess_next"]) + len(s["conv_last"]) for s in states)
    # identical committed outputs with and without aggressive eviction
    for ch, sort in (
        ("sessions", ["conv_id", "session_id"]),
        ("pairs", ["conv_id", "call_turn_idx"]),
        ("orphans", ["conv_id", "call_turn_idx"]),
        ("matches", ["conv_id", "start_turn_idx"]),
    ):
        assert_frames_equal(outs["small"][ch], outs["huge"][ch], sort)
    # every orphan surfaced exactly once (20 per epoch)
    assert len(outs["small"]["orphans"]) == 20 * n_epochs
    # with ttl << epoch spacing, only the newest processed epoch's
    # convs are tracked; without eviction every conv ever seen is.
    # (rows of epoch E sit above the watermark until close E+1, so the
    # pre-flush checkpoint at epoch n-2 has processed n-2 epochs.)
    assert outs["huge"]["n_tracked"] >= 20 * (n_epochs - 2) * 2
    assert outs["small"]["n_tracked"] <= 20 * 2 * 2


def test_cli_prep_writes_split_partitioned_manifest(ray_session, tmp_path, capsys):
    """`python -m data_harvesting_ray prep` writes the curated corpus
    manifest partitioned by split, matching the library result."""
    import json

    from data_harvesting_ray.__main__ import main

    out = tmp_path / "prep"
    assert main([
        "prep",
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out),
    ]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 375  # deterministic at sf0.001
    parts = sorted(d.name for d in out.iterdir() if d.is_dir())
    assert parts == ["split=test", "split=train", "split=val"]
    got = pd.read_parquet(out)
    assert len(got) == 375 and set(got["split"]) == {"train", "val", "test"}
    # rerun over the same --out is an exactly-once no-op
    assert main([
        "prep",
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", str(out),
    ]) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again == {"rows": 375, "out": str(out), "skipped": True}
    assert len(pd.read_parquet(out)) == 375


def test_cli_channels_flag_prunes_derived_channels(ray_session, tmp_path, capsys):
    """--channels tool_counts commits the core channels plus only the
    selected derived one."""
    import glob

    from data_harvesting_ray.__main__ import main
    from data_harvesting_ray.fixtures.generator import epochs_root

    out = str(tmp_path / "chan")
    assert main([
        "--epochs-root", epochs_root("sf0.001"),
        "--out", out,
        "--channels", "tool_counts",
        "--no-checkpoint",
    ]) == 0
    committed = {
        os.path.basename(f).split("-shard")[0]
        for f in glob.glob(os.path.join(out, "data", "epoch=*", "*.parquet"))
    }
    assert "tool_counts" in committed
    assert {"latency", "rolling", "tumbling", "sliding"}.isdisjoint(committed)
    assert {"sessions", "pairs", "matches"} <= committed


class _StatefulScorer:
    """A model-factory enrich: 'weights' load once per actor in
    __init__ (ST1), batches are scored in __call__."""

    def __init__(self):
        self.bias = 7  # stand-in for a model load

    def __call__(self, t: pa.Table) -> pa.Table:
        n = pc.add(pc.utf8_length(t["text"]), self.bias)
        return t.append_column("score", pc.cast(n, pa.int64()))


def test_enrich_resources_validation():
    from data_harvesting_ray.config import EngineConfig

    with pytest.raises(ValueError, match="requires enrich"):
        EngineConfig(enrich_resources={"num_gpus": 1}).validate()
    with pytest.raises(ValueError, match="unknown enrich_resources"):
        EngineConfig(enrich=_enrich, enrich_resources={"gpus": 1}).validate()
    with pytest.raises(ValueError, match="num_gpus"):
        EngineConfig(enrich=_enrich, enrich_resources={"num_gpus": -1}).validate()
    with pytest.raises(ValueError, match="concurrency"):
        EngineConfig(enrich=_enrich, enrich_resources={"concurrency": 0}).validate()
    # the YAML/dict path validates too, and a GPU request is accepted
    # shape-wise without needing a GPU to exist
    cfg = EngineConfig.from_dict(
        {
            "enrich": "token_count",
            "enrich_resources": {"num_gpus": 1, "concurrency": 4, "batch_size": 64},
        }
    )
    assert cfg.enrich_resources["num_gpus"] == 1


def test_enrich_resource_kwargs_translation():
    """GPU-less unit check of the placement plumbing: the resource dict
    reaches map_batches kwargs (dedicated stage) and route-task options
    (streaming) with pool-shape keys in the right place."""
    from data_harvesting_ray.enrich import map_batches_kwargs, route_task_options

    r = {
        "num_gpus": 1,
        "num_cpus": 2,
        "memory": 1 << 30,
        "resources": {"accel": 1},
        "concurrency": 8,
        "batch_size": 128,
    }
    kw = map_batches_kwargs(r)
    assert kw["num_gpus"] == 1 and kw["num_cpus"] == 2
    assert kw["resources"] == {"accel": 1} and kw["memory"] == 1 << 30
    assert kw["concurrency"] == 8 and kw["batch_size"] == 128
    assert kw["batch_format"] == "pyarrow"
    opts = route_task_options(r)
    # raw route tasks take the per-task resource request only
    assert opts == {
        "num_cpus": 2,
        "num_gpus": 1,
        "memory": 1 << 30,
        "resources": {"accel": 1},
    }
    assert route_task_options(None) == {}


def test_dedicated_enrich_stage_matches_inline(ray_session, sf_small):
    """With enrich_resources set, the bounded flagship runs the enrich
    as its own actor-pool stage — same committed rows as the fused
    task path."""
    import ray.data as rd

    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.pipelines.flagship import flagship_bounded, split_channels

    inline = flagship_bounded(
        rd.read_parquet(sf_small), config=EngineConfig(enrich=_enrich)
    ).to_pandas()
    pooled = flagship_bounded(
        rd.read_parquet(sf_small),
        config=EngineConfig(
            enrich=_enrich,
            enrich_resources={"num_cpus": 1, "concurrency": 2},
        ),
    ).to_pandas()
    for ch in ("sessions", "matches", "pairs"):
        a = split_channels(inline)[ch]
        b = split_channels(pooled)[ch]
        key = [c for c in ("conv_id", "session_id", "call_id", "start_turn_idx") if c in a]
        assert_frames_equal(a, b, key)


def test_class_enrich_loads_once_per_actor(ray_session):
    """A CLASS registered as an enrich UDF is constructed per actor
    inside the dedicated stage (apply_enrich), not per batch and not
    on the driver."""
    import ray.data as rd

    from data_harvesting_ray.enrich import apply_enrich

    ds = rd.from_arrow(pa.table({"text": [f"m{'x' * i}" for i in range(50)]}))
    out = apply_enrich(
        ds, _StatefulScorer, {"num_cpus": 1, "concurrency": 2, "batch_size": 10}
    ).to_pandas()
    assert (out["score"] == out["text"].str.len() + 7).all()


def test_streaming_enrich_resources_route_options(ray_session, tmp_path):
    """Streaming engine with a resource-carrying enrich: the request is
    forwarded to route tasks (num_cpus here — a GPU-less stand-in for
    num_gpus on a real cluster) and the derived column still lands on
    the committed turns channel."""
    from data_harvesting_ray.config import EngineConfig
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.sources.epochs import discover_epochs

    cfg = EngineConfig(
        enrich=_StatefulScorer,
        enrich_resources={"num_cpus": 1},
        emit_turns=True,
        channels=(),
    )
    eng = StreamingEngine(str(tmp_path / "out"), num_shards=2, config=cfg)
    eng.run(discover_epochs(epochs_root("sf0.001")))
    turns = eng.results_pandas("turns")
    assert "score" in turns.columns and len(turns) > 0


def test_pii_scrub_enrich_redacts_stream(ray_session, tmp_path):
    """enrich='pii_scrub' rewrites the payload in the stream and the
    redaction count rides to the committed turns channel."""
    import pyarrow as pa

    from data_harvesting_ray.enrich import get_enrich
    from data_harvesting_ray.fixtures.generator import epochs_root
    from data_harvesting_ray.pipelines.streaming import StreamingEngine
    from data_harvesting_ray.config import EngineConfig

    fn = get_enrich("pii_scrub")
    t = pa.table({"text": ["mail me at a.b@example.com now", None]})
    out = fn(t)
    assert "@" not in out["text"][0].as_py()
    assert out["n_redactions"][0].as_py() >= 1
    assert out["text"][1].as_py() is None

    o = str(tmp_path / "out")
    eng = StreamingEngine(
        o,
        config=EngineConfig(
            enrich="pii_scrub", emit_turns=True, channels=(), num_shards=2
        ),
    )
    eng.run(epochs_root=epochs_root("sf0.001"))
    turns = eng.results_pandas("turns")
    assert "n_redactions" in turns.columns
    assert (turns["n_redactions"] >= 0).all()
