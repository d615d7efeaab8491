"""Regenerate QUERIES.md — the human index of the driver-contract
query registry (name, gate kind, first docstring line, grouped by
table family).

Usage: python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUPS = {
    "t_": "Transcript / streaming-engine pipelines",
    "d_": "Document-corpus curation pipelines",
    "v_": "Embedding / similarity pipelines",
    "e_": "Event-stream pipelines",
    "h_": "Relational (TPC-H-shaped) pipelines",
    "m_": "Multimodal plumbing pipelines",
    "lineitem_rollup": "Relational (TPC-H-shaped) pipelines",
}


def group_of(name: str) -> str:
    for prefix, label in GROUPS.items():
        if name.startswith(prefix):
            return label
    return "Other"


def main() -> int:
    from data_harvesting_ray.pipelines.queries import oracle_sql, queries

    qs = queries()
    oks = set(oracle_sql().keys())
    by: dict[str, list] = {}
    for name, fn in qs.items():
        doc = (fn.__doc__ or "").strip().split("\n")
        line = " ".join(x.strip() for x in doc[:3]).strip()
        if len(line) > 160:
            line = line[:157] + "..."
        tag = "SQL-gated" if name in oks else "rows-only"
        by.setdefault(group_of(name), []).append((name, tag, line))
    out = [
        "# Gated query inventory",
        "",
        "Auto-generated from `pipelines/queries.py` "
        f"(`tools/gen_queries_md.py`): {len(qs)} driver-contract "
        f"queries, {len(set(qs) & oks)} with exact DuckDB",
        f"oracles (hash-compared) and {len(set(qs) - oks)} rows-only "
        "(not SQL-expressible). The committed",
        "per-round sweep logs are `CORRECTNESS_LOCAL_r5.json` (sf0.01) and `CORRECTNESS_LOCAL_r5_sf01.json` (sf0.1).",
        "",
    ]
    for g in sorted(by):
        out.append(f"## {g}")
        out.append("")
        for name, tag, line in sorted(by[g]):
            out.append(f"- `{name}` [{tag}] — {line or '(see queries.py)'}")
        out.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote QUERIES.md: {len(qs)} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
