"""Per-stage wall/CPU profile for a driver-contract query: runs
``queries()[name]`` and prints the Dataset's ``stats()`` — the
evidence trail for "wall time is dominated by useful compute"
(operator-level read/shuffle/kernel breakdown).

Usage: python tools/profile_query.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import data_harvesting_ray

    data_harvesting_ray.configure_session()
    from data_harvesting_ray.pipelines.queries import queries

    fn = queries().get(name)
    if fn is None:
        print(f"unknown query {name!r}; choose from: {sorted(queries())}")
        return 2
    t0 = time.time()
    res = fn(sf_dir)
    if hasattr(res, "stats"):
        # materialize (not count) so the stats attach to this handle
        res = res.materialize()
        print(f"# {name}: {res.count()} rows in {time.time() - t0:.2f}s")
        print(res.stats())
    else:
        print(f"# {name}: {len(res)} rows in {time.time() - t0:.2f}s "
              "(driver-side result; no Dataset stats)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
