"""CEP: NFA role-sequence pattern matching over per-conv turn streams.

The reference evaluates a conjunctive predicate per frame and
suppresses the next N frames after a hit (``condition_func`` W5 +
FRAMES_SKIP_AFTER_DETECT W4, ``services/harvest_service.py:228``).
Here patterns are contiguous role sequences matched per conversation in
turn order; candidate matches are found fully vectorized (shifted
equality over the sorted bucket partition), and the after-match skip —
inherently sequential — runs only over the (small) candidate list.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

import ray.data

from .dedup import prepare_bucket
from .partition import apply_per_bucket


@dataclass(frozen=True)
class PatternSpec:
    """User hook analogous to the reference's project plugin
    (``projects/ibase_project.py:9-20``): a role sequence plus
    after-match suppression policy."""

    roles: tuple[str, ...] = ("user", "assistant", "tool")
    skip_past_last: bool = False  # SKIP_PAST_LAST_EVENT
    suppress_turns: int = 0  # FRAMES_SKIP_AFTER_DETECT analogue
    name: str = ""

    def label(self) -> str:
        return self.name or ">".join(self.roles)


def cep_kernel(g: pd.DataFrame, spec: PatternSpec, prepared: bool = False) -> pd.DataFrame:
    if not prepared:
        g = prepare_bucket(g)
    conv = g["conv_id"].to_numpy()
    role = g["role"].to_numpy()
    tidx = g["turn_idx"].to_numpy().astype(np.int32)
    n, plen = len(g), len(spec.roles)
    empty = pd.DataFrame(
        {
            "conv_id": np.array([], dtype=object),
            "pattern": np.array([], dtype=object),
            "start_turn_idx": np.array([], np.int32),
            "end_turn_idx": np.array([], np.int32),
        }
    )
    if n < plen:
        return empty
    m = n - plen + 1
    ok = conv[:m] == conv[plen - 1 :]
    ok &= (tidx[plen - 1 :] - tidx[:m]) == plen - 1
    for j, r in enumerate(spec.roles):
        ok &= role[j : m + j] == r
    cand = np.flatnonzero(ok)
    if (spec.skip_past_last or spec.suppress_turns) and len(cand):
        keep = np.zeros(len(cand), dtype=bool)
        prev_conv: object = None
        prev_end = np.int32(0)
        for i, s in enumerate(cand):
            if conv[s] != prev_conv or tidx[s] > prev_end + spec.suppress_turns:
                keep[i] = True
                prev_conv = conv[s]
                prev_end = tidx[s + plen - 1]
        cand = cand[keep]
    if not len(cand):
        return empty
    return pd.DataFrame(
        {
            "conv_id": conv[cand],
            "pattern": spec.label(),
            "start_turn_idx": tidx[cand],
            "end_turn_idx": tidx[cand + plen - 1],
        }
    )


def cep_matches(
    ds: ray.data.Dataset,
    spec: PatternSpec | None = None,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    spec = spec or PatternSpec()
    return apply_per_bucket(ds, lambda g: cep_kernel(g, spec), num_buckets=num_buckets)
