"""Driver-contract simulation: run __spark_entry__.entry + every
queries()[name] against oracle_sql()[name] in DuckDB at sf0.01.

Usage: timeout 420 python scripts/verify_driver.py [sf_dir]
Exit 0 iff entry() returns rows and every oracle-paired query matches.
"""
from __future__ import annotations

import os
import sys
import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def canon(rows, cols):
    """Columns sorted by name, rows stringified + sorted — driver compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    import duckdb
    from dumpty_spark.session import get_session

    mod = load_entry()
    spark = get_session()

    # 1. entry() smoke
    edf = mod.entry(spark)
    erows = edf.collect()
    print(f"entry(): {len(erows)} rows, schema={[f.name for f in edf.schema]}")
    assert len(erows) >= 1, "entry() returned 0 rows"

    # 2. oracle parity
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    failed, weak = [], []
    full: dict[str, dict] = {}
    for name, fn in queries.items():
        sdf = fn(spark, SF)
        srows = canon([tuple(r) for r in sdf.collect()], sdf.columns)
        if name not in oracles:
            weak.append(name)
            print(f"  {name}: {len(srows)} rows (rows-only check, no oracle)")
            full[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": "no_oracle",
            }
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = canon(res.fetchall(), ocols)
        entry = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(sdf.columns) == sorted(ocols),
            "hash_match": srows == orows,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None,
        }
        full[name] = entry
        if not entry["schema_match"]:
            failed.append(name)
            print(f"  {name}: COLUMN MISMATCH spark={sorted(sdf.columns)} "
                  f"oracle={sorted(ocols)}")
        elif not entry["hash_match"]:
            failed.append(name)
            print(f"  {name}: VALUE MISMATCH ({len(srows)} vs {len(orows)} rows)")
            for a, b in list(zip(srows, orows))[:3]:
                if a != b:
                    print(f"    spark : {a}\n    oracle: {b}")
        else:
            print(f"  {name}: OK ({len(srows)} rows)")
    print(f"\n{len(queries) - len(failed) - len(weak)} matched, "
          f"{len(weak)} rows-only, {len(failed)} FAILED")
    # compact self-reported summary committed with the repo, so driver-
    # side artifact truncation can never hide verification state
    import json

    with open(REPO / "VERIFY_SUMMARY.json", "w") as fh:
        fh.write(json.dumps({
            "n_queries": len(queries),
            "matched": len(queries) - len(failed) - len(weak),
            "rows_only": sorted(weak),
            "failed": sorted(failed),
            "sf_dir": SF,
        }) + "\n")
    # the FULL per-query artifact (VERDICT r2 task 9): every entry, in
    # the driver's own format, committed so driver-side truncation can
    # never hide a red entry
    # round-stamped name (VERDICT r5 What's wrong #4): explicit via
    # SPARK_GRAFT_ROUND, else derived from the driver's own artifacts —
    # BENCH_r{N}.json lands at the END of round N, so the current round
    # is max(existing)+1. Keeps the audit trail legible without a
    # hardcoded default going stale between rounds.
    round_no = os.environ.get("SPARK_GRAFT_ROUND")
    if not round_no:
        import re

        seen = [
            int(m.group(1))
            for p in REPO.glob("BENCH_r*.json")
            if (m := re.match(r"BENCH_r(\d+)\.json$", p.name))
        ]
        round_no = str(max(seen, default=0) + 1)
    with open(REPO / f"CORRECTNESS_full_r{round_no}.json", "w") as fh:
        json.dump(full, fh, indent=2)
        fh.write("\n")
    if failed:
        print("FAILED:", failed)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
