"""Local replica of the driver's correctness gate.

Runs every __ray_entry__.queries() entry at sf0.01 alongside its DuckDB
oracle_sql() and compares row count, column names, and order-insensitive
values.  Usage: python scripts/check_queries.py [--json OUT.json] [name ...]

--json writes a per-query machine-readable artifact (the committed
CHECKLOCAL_r{N}.json files): {name: {status, rows, secs, detail?}} — the
full-registry complement of the driver's 50-entry CORRECTNESS window.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = "/root/testdata/sf0.01"


def to_pandas(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if len(df.columns) == 0:
            # Ray's Dataset.to_pandas() drops the schema when every block
            # is empty (a legitimately-empty result, e.g. a DF-capped pair
            # join on a corpus where every term exceeds the cap), even
            # though ds.schema() and the blocks themselves carry it.
            # Rebuild the empty frame from the dataset schema so the
            # column check compares names, not this conversion artifact.
            sch = res.schema(fetch_if_missing=True)
            if sch is not None:
                df = pa.schema(
                    zip(sch.names, sch.types)).empty_table().to_pandas()
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")

    global SF_DIR
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if "--sf-dir" in argv:  # e.g. the committed sf0.1 full-roster gate
        i = argv.index("--sf-dir")
        SF_DIR = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # the t_* oracle SQL embeds the transcript corpus path — build the
    # registry at the gate's scale so oracle and query read the same data
    from aushape_ray.pipelines.queries import build_registry

    qs, sqls = build_registry(transcript_sf=SF_DIR)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    names = argv or sorted(qs)
    results: "dict[str, dict]" = {}

    def record(name, status, rows, secs, detail=None):
        results[name] = {"status": status, "rows": rows,
                         "secs": round(secs, 2)}
        if detail:
            results[name]["detail"] = detail[:300]

    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pandas(qs[name](SF_DIR)))
        except Exception as e:
            msg = f"ray query raised {type(e).__name__}: {str(e)[:200]}"
            print(f"FAIL {name}: {msg}")
            record(name, "FAIL", None, time.time() - t0, msg)
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: {len(got)} rows ({dt:.1f}s) [rows-only, no oracle]")
            record(name, "rows-only", len(got), dt)
            continue
        try:
            exp = canon(con.sql(sqls[name]).df())
        except Exception as e:
            msg = f"oracle SQL raised {type(e).__name__}: {str(e)[:200]}"
            print(f"FAIL {name}: {msg}")
            record(name, "FAIL", len(got), dt, msg)
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            msg = f"columns ray={list(got.columns)} sql={list(exp.columns)}"
            print(f"FAIL {name}: {msg}")
            record(name, "FAIL", len(got), dt, msg)
            n_fail += 1
            continue
        if len(got) != len(exp):
            msg = f"rows ray={len(got)} sql={len(exp)}"
            print(f"FAIL {name}: {msg}")
            record(name, "FAIL", len(got), dt, msg)
            n_fail += 1
            continue
        if not got.equals(exp):
            diff = (got != exp)
            bad_cols = [c for c in got.columns if diff[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                i = diff[c].idxmax()
                print(f"   e.g. row {i} col {c}: ray={got[c][i]!r} sql={exp[c][i]!r}")
            record(name, "FAIL", len(got), dt,
                   f"value mismatch in {bad_cols}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(got)} rows ({dt:.1f}s)")
        record(name, "PASS", len(got), dt)
    ray.shutdown()
    if json_out:
        import json

        summary = {
            "sf_dir": SF_DIR,
            "n_total": len(names),
            "n_pass": sum(1 for r in results.values()
                          if r["status"] == "PASS"),
            "n_rows_only": sum(1 for r in results.values()
                               if r["status"] == "rows-only"),
            "n_fail": n_fail,
            "queries": results,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {json_out}: {summary['n_pass']} PASS / "
              f"{summary['n_rows_only']} rows-only / {n_fail} FAIL")
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
