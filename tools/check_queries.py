"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry via Ray and its ``oracle_sql()`` via DuckDB on the
same sf dir, compare row count + order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(df):
    import pandas as pd

    out = df.copy()
    for c in out.columns:
        dt = str(out[c].dtype)
        if dt.startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
        elif dt.startswith(("int", "uint", "Int")):
            out[c] = out[c].astype("int64")
        elif dt.startswith("float"):
            out[c] = out[c].round(9)
        elif out[c].dtype == object or dt == "bool":
            pass
    out = out[sorted(out.columns)]
    return out.sort_values(list(out.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    if not ray.is_initialized():
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
    from data_harvesting_ray.pipelines.queries import oracle_sql, queries

    con = duckdb.connect()
    # Cap the oracle so a blowing-up SQL plan (e.g. an all-pairs
    # verification CTE at 10x docs) fails loudly instead of filling
    # the disk with duckdb temp spill (observed: >230 GB at sf0.1).
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duck_tmp'")
    con.execute("SET max_temp_directory_size='40GB'")
    # Optional per-oracle wall clock: GRAFT_DUCK_TIMEOUT_S interrupts
    # the oracle (NOT the engine) and records status=oracle_timeout.
    duck_timeout = float(os.environ.get("GRAFT_DUCK_TIMEOUT_S", "0") or 0)
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        f = f"{sf_dir}/{t}.parquet"
        if os.path.exists(f):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")

    qs, sqls = queries(), oracle_sql(sf_name)
    results: dict[str, dict] = {}
    json_out = os.environ.get("GRAFT_GATE_JSON")  # write per-query log here
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            got = res.to_pandas() if hasattr(res, "to_pandas") else res
        except Exception as e:  # a crashed query is a failure, not a skip
            failures += 1
            print(f"{name:24s} ERROR {type(e).__name__}: {e}")
            results[name] = {"status": "error", "err": f"{type(e).__name__}: {e}"}
            continue
        ray_s = time.time() - t0
        sql = sqls.get(name)
        if sql is None:
            print(f"{name:24s} rows-only: {len(got):8d} rows   ({ray_s:5.1f}s)")
            results[name] = {
                "status": "rows_only",
                "rows": int(len(got)),
                "ray_s": round(ray_s, 2),
            }
            continue
        t0 = time.time()
        timer = None
        if duck_timeout:
            import threading

            timer = threading.Timer(duck_timeout, con.interrupt)
            timer.start()
        try:
            want = con.sql(sql).df()
        except Exception as e:
            # oracle-side failure (interrupt/OOM/spill cap) — the
            # ENGINE result exists; record it distinctly from a red
            # compare so scale sweeps can cap runaway oracles honestly
            print(
                f"{name:24s} ORACLE-FAIL {type(e).__name__} "
                f"(engine rows={len(got)}, ray {ray_s:5.1f}s)"
            )
            results[name] = {
                "status": "oracle_timeout"
                if "interrupt" in type(e).__name__.lower()
                else "oracle_error",
                "rows_ray": int(len(got)),
                "ray_s": round(ray_s, 2),
                "err": f"{type(e).__name__}: {str(e)[:200]}",
            }
            continue
        finally:
            if timer is not None:
                timer.cancel()
        duck_s = time.time() - t0
        g, w = canon(got), canon(want)
        ok = list(g.columns) == list(w.columns) and len(g) == len(w)
        if ok:
            try:
                import pandas as pd

                pd.testing.assert_frame_equal(g, w, check_dtype=False)
            except AssertionError as e:
                ok = False
                detail = str(e).splitlines()[0]
        if not ok:
            failures += 1
            print(f"{name:24s} FAIL  ray={g.shape} duck={w.shape}")
            if list(g.columns) != list(w.columns):
                print("   cols ray :", list(g.columns))
                print("   cols duck:", list(w.columns))
            else:
                for c in g.columns:
                    if len(g) == len(w) and not g[c].equals(w[c]):
                        print(f"   col {c}: ray={g[c].head(3).tolist()} duck={w[c].head(3).tolist()}")
        else:
            print(f"{name:24s} OK    {len(g):8d} rows   (ray {ray_s:5.1f}s, duck {duck_s:5.1f}s)")
        results[name] = {
            "status": "ok" if ok else "fail",
            "rows_ray": int(len(g)),
            "rows_duck": int(len(w)),
            "ray_s": round(ray_s, 2),
            "duck_s": round(duck_s, 2),
        }
    if json_out:
        import json

        summary = {
            "sf_dir": sf_dir,
            "n_checked": len(results),
            "n_ok": sum(r["status"] == "ok" for r in results.values()),
            "n_rows_only": sum(
                r["status"] == "rows_only" for r in results.values()
            ),
            "n_oracle_fail": sum(
                r["status"].startswith("oracle_") for r in results.values()
            ),
            "n_fail": failures,
            "queries": results,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}: {summary['n_ok']} ok / "
              f"{summary['n_rows_only']} rows-only / {failures} fail")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
