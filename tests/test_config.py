"""Typed config validation (the reference's X5 env-object + YAML arity
check, done properly)."""

from __future__ import annotations

import pytest


def test_from_dict_and_validate():
    from data_harvesting_ray.config import EngineConfig

    cfg = EngineConfig.from_dict(
        {
            "session_gap_s": 600,
            "pattern": {"roles": ["user", "assistant"], "suppress_turns": 2, "skip_past_last": True},
        }
    )
    assert cfg.session_gap_s == 600
    assert cfg.pattern.roles == ("user", "assistant")


@pytest.mark.parametrize(
    "bad",
    [
        {"session_gap_s": 0},
        {"watermark_delay_s": -1},
        {"pattern": {"roles": ["user", "robot"]}},
        {"pattern": {"suppress_turns": -5}},
        {"num_shards": 0},
    ],
)
def test_rejects_invalid(bad):
    from data_harvesting_ray.config import EngineConfig

    with pytest.raises(ValueError):
        EngineConfig.from_dict(bad)


def test_from_yaml(tmp_path):
    from data_harvesting_ray.config import EngineConfig

    p = tmp_path / "cfg.yaml"
    p.write_text("session_gap_s: 900\npattern:\n  roles: [user, assistant, tool]\n")
    cfg = EngineConfig.from_yaml(str(p))
    assert cfg.session_gap_s == 900 and len(cfg.pattern.roles) == 3
