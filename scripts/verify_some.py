"""Ad-hoc oracle check for a subset of registry queries.

Usage: python scripts/verify_some.py q_name [q_name ...] [--sf DIR]
Same canon/compare as verify_driver.py, but only the named queries —
fast feedback while iterating on one operator.
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from scripts.verify_driver import TABLES, canon, load_entry  # noqa: E402


def main() -> int:
    import duckdb
    from dumpty_spark.session import get_session

    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]

    mod = load_entry()
    spark = get_session()
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries, oracles = mod.queries(), mod.oracle_sql()
    failed = []
    for name in args:
        if name not in queries:
            print(f"  {name}: NOT REGISTERED")
            failed.append(name)
            continue
        sdf = queries[name](spark, sf)
        srows = canon([tuple(r) for r in sdf.collect()], sdf.columns)
        if name not in oracles:
            print(f"  {name}: {len(srows)} rows (rows-only, no oracle)")
            continue
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = canon(res.fetchall(), ocols)
        if sorted(sdf.columns) != sorted(ocols):
            failed.append(name)
            print(f"  {name}: COLUMN MISMATCH spark={sorted(sdf.columns)} "
                  f"oracle={sorted(ocols)}")
        elif srows != orows:
            failed.append(name)
            print(f"  {name}: VALUE MISMATCH ({len(srows)} vs {len(orows)} rows)")
            shown = 0
            for a, b in zip(srows, orows):
                if a != b and shown < 3:
                    print(f"    spark : {a}\n    oracle: {b}")
                    shown += 1
        else:
            print(f"  {name}: OK ({len(srows)} rows)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
