"""CLI entry point — the engine's equivalent of the reference's only true
entry point (`dumpty --config db.yaml gs://bucket ds`,
src/dumpty/main.py:40-85 argument surface, :220-251 full/incremental
switch, :302-314 watermark advance, :317-332 run summary).

Spark-first differences, not omissions:

- the 3-stage queue machine is `pipeline.run_pipeline` (ThreadPoolExecutor
  over concurrent Spark actions — Spark's scheduler is the queue);
- "changed since last successful run" comes from source modification
  times vs the persisted watermark (the reference substitutes the
  watermark into a user SQL `tables_query`, main.py:99; a JDBC deployment
  plugs that back in via sources/jdbc.py);
- the watermark only advances when every table extracted cleanly
  (reference main.py:302-314 semantics).

Usage::

    python -m dumpty_spark.cli --source-dir /root/testdata/sf0.001 \
        --sink-dir /tmp/out --state-dir /tmp/state \
        [--extract full|incremental] [--tables orders lineitem ...] \
        [--format parquet|json] [--workers 8] [--config cfg.json]

Prints ONE JSON run summary on stdout; exit 0 iff no table errored and
every table reconciled (source count == sink count).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def load_config(path: str | None) -> dict:
    """JSON (or YAML when available) config file — reference db.yaml
    analog (src/dumpty/config.py). CLI flags override file values.

    ``$VAR`` / ``${VAR}`` references are substituted from the environment
    before parsing — the reference renders its YAML through Jinja with
    ``env`` for the same purpose (src/dumpty/main.py:77-82); unset
    variables are left verbatim rather than erased so a typo'd reference
    fails loudly at parse time instead of silently becoming ""."""
    if not path:
        return {}
    with open(path) as fh:
        text = os.path.expandvars(fh.read())
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        try:  # YAML optional — not a baked-in dependency
            import yaml  # type: ignore

            return yaml.safe_load(text)
        except ImportError as e:
            raise SystemExit(f"config {path} is not JSON and PyYAML is unavailable: {e}")


def scrambled_order(names: list[str]) -> list[str]:
    """Hash-scrambled submission order (same set, md5-of-name key): the
    deterministic analog of the reference's Jinja ``shuffle`` filter
    (src/dumpty/util.py:13-22) — consecutively-named heavy tables spread
    across workers, but retries and re-runs submit identically."""
    import hashlib

    return sorted(names, key=lambda n: hashlib.md5(n.encode()).hexdigest())


def changed_tables(source_dir: str, names: list[str], watermark: str | None) -> list[str]:
    """Tables whose source data changed after the last successful run —
    the incremental-source scan (reference S5/main.py:224-233; mtime here,
    a change-log SQL query on a JDBC deployment)."""
    if watermark is None:
        return list(names)
    wm = float(watermark)
    out = []
    for n in names:
        p = os.path.join(source_dir, f"{n}.parquet")
        if os.path.exists(p) and os.path.getmtime(p) > wm:
            out.append(n)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dumpty-spark")
    ap.add_argument("--config", default=None, help="JSON/YAML config file")
    ap.add_argument("--source-dir", default=None, help="directory of <table>.parquet sources")
    ap.add_argument("--sink-dir", default=None)
    ap.add_argument("--state-dir", default=None, help="cross-run state store root")
    ap.add_argument("--extract", choices=["full", "incremental"], default="full")
    ap.add_argument("--tables", nargs="*", default=None, help="subset of tables (default: all)")
    ap.add_argument("--format", dest="sink_format", choices=["parquet", "json"], default=None)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--rows-per-partition", type=int, default=None)
    ap.add_argument("--no-normalize", action="store_true", help="skip identifier normalization")
    ap.add_argument(
        "--fastcount",
        action="store_true",
        help="answer introspection from parquet footers without a data "
        "scan (reference --fastcount, main.py:59-60; exact for parquet)",
    )
    ap.add_argument(
        "--shuffle-tables",
        action="store_true",
        help="submit tables in a hash-scrambled order so consecutively-"
        "named heavy tables spread across workers (the reference's Jinja "
        "shuffle filter, src/dumpty/util.py:13-22 — but deterministic: "
        "md5 of the name, so retries/runs submit identically)",
    )
    args = ap.parse_args(argv)

    cfg_file = load_config(args.config)

    def opt(flag, key, default=None):
        return flag if flag is not None else cfg_file.get(key, default)

    source_dir = opt(args.source_dir, "source_dir")
    sink_dir = opt(args.sink_dir, "sink_dir")
    state_dir = opt(args.state_dir, "state_dir")
    if not (source_dir and sink_dir and state_dir):
        ap.error("--source-dir, --sink-dir and --state-dir are required (flag or config)")

    from dumpty_spark.pipeline import PipelineConfig, run_pipeline
    from dumpty_spark.plans.state import StateStore
    from dumpty_spark.session import get_session
    from dumpty_spark.sources import load_table
    from dumpty_spark.sources.parquet import TABLES
    from dumpty_spark.validate import reconcile_table_lists, select_incremental

    available = [t for t in TABLES if os.path.exists(os.path.join(source_dir, f"{t}.parquet"))]
    requested = args.tables if args.tables is not None else cfg_file.get("tables", available)

    # reconcile requested vs actual, case-insensitively (reference P5)
    rec = reconcile_table_lists(requested, available)
    names = [t for t in requested if t not in rec.requested_missing]

    spark = get_session("dumpty-spark-cli")
    run_start = time.time()

    # X9 pre-run hook (reference main.py:199-201): create-or-update the
    # sink dataset with PRE labels + access entries before any extract;
    # drop_dataset empties it first. Post hooks run after success below.
    from dumpty_spark.sinks import dataset as ds

    # ANY dataset-lifecycle key opts in — a config with only post-run
    # keys (post labels / additional entries / drop) must still manage
    # the dataset, else its settings would be silently ignored
    manage_dataset = bool(
        cfg_file.get("manage_dataset")
        or cfg_file.get("dataset_pre_labels")
        or cfg_file.get("dataset_access_entries")
        or cfg_file.get("dataset_post_labels")
        or cfg_file.get("dataset_additional_access_entries")
        or cfg_file.get("drop_dataset")
    )
    if manage_dataset:
        ds.create_dataset(
            sink_dir,
            description=cfg_file.get("dataset_description"),
            location=cfg_file.get("dataset_location", "US"),
            labels=cfg_file.get("dataset_pre_labels", {}),
            access_entries=cfg_file.get("dataset_access_entries"),
            drop=bool(cfg_file.get("drop_dataset")),
        )

    with StateStore(state_dir) as store:
        if args.extract == "incremental":
            changed = changed_tables(source_dir, names, store.get_watermark())
            names = select_incremental(names, changed)
        if args.shuffle_tables or cfg_file.get("shuffle_tables"):
            names = scrambled_order(names)

        tables = {n: load_table(spark, source_dir, n) for n in names}
        pcfg = PipelineConfig(
            sink_dir=sink_dir,
            sink_format=opt(args.sink_format, "sink_format", "parquet"),
            rows_per_partition=opt(args.rows_per_partition, "rows_per_partition", 1_000_000),
            normalize_schema=not args.no_normalize,
            workers=opt(args.workers, "workers", 8),
            pk_by_table=cfg_file.get("pk_by_table", {}),
            fastcount=args.fastcount or bool(cfg_file.get("fastcount")),
            source_dir=source_dir,
        )
        summary = run_pipeline(spark, tables, pcfg, store)
        summary["mode"] = args.extract
        summary["skipped_missing"] = list(rec.requested_missing)
        ok = summary["n_errors"] == 0 and summary["all_consistent"]
        if ok:
            # advance only on a fully successful run (main.py:302-314)
            store.set_watermark(str(run_start))
            # X9 post-run hooks, success-gated like the reference
            # (main.py:294-301): POST labels replace, ADDITIONAL access
            # entries append-dedup
            if manage_dataset and cfg_file.get("dataset_post_labels"):
                ds.apply_labels(sink_dir, cfg_file["dataset_post_labels"])
            if manage_dataset and cfg_file.get(
                "dataset_additional_access_entries"
            ):
                ds.append_access_entries(
                    sink_dir, cfg_file["dataset_additional_access_entries"]
                )

    print(json.dumps(summary, sort_keys=True))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
