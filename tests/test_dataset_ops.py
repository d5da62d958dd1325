"""X9 dataset lifecycle ops (sinks/dataset.py): labels / ACLs /
description as a JSON sidecar on the sink dir, mirroring the reference's
BigQuery dataset management (gcp.py:66-144) plus the pre/post hook
ordering of main.py:199-301 — create-or-update with pre-labels before
extraction, post-labels + additional access entries only after a fully
successful run."""

from __future__ import annotations

import json
import os

import pytest

from dumpty_spark.sinks import dataset as ds


def test_create_is_idempotent_update(tmp_path):
    root = str(tmp_path / "dset")
    m1 = ds.create_dataset(
        root, description="first", labels={"env": "dev"},
        access_entries=[{"role": "READER", "userByEmail": "a@example.com"}],
    )
    assert m1["labels"] == {"env": "dev"}
    # update: description/labels replaced, access entries MERGED
    m2 = ds.create_dataset(
        root, description="second", labels={"env": "prod"},
        access_entries=[
            {"role": "READER", "userByEmail": "a@example.com"},  # dup
            {"role": "WRITER", "userByEmail": "b@example.com"},
        ],
    )
    assert m2["description"] == "second"
    assert m2["labels"] == {"env": "prod"}
    assert len(m2["access_entries"]) == 2  # dup skipped, new appended


def test_drop_deletes_contents(tmp_path):
    root = str(tmp_path / "dset")
    ds.create_dataset(root, labels={"keep": "no"})
    (tmp_path / "dset" / "table.parquet").write_text("data")
    m = ds.create_dataset(root, labels={"fresh": "yes"}, drop=True)
    assert not os.path.exists(tmp_path / "dset" / "table.parquet")
    assert m["labels"] == {"fresh": "yes"}
    assert m["access_entries"] == []


def test_apply_labels_replaces_wholesale(tmp_path):
    root = str(tmp_path / "dset")
    ds.create_dataset(root, labels={"a": "1", "b": "2"})
    m = ds.apply_labels(root, {"c": "3"})
    assert m["labels"] == {"c": "3"}  # replace, not merge (reference)
    with pytest.raises(FileNotFoundError):
        ds.apply_labels(str(tmp_path / "nope"), {})


def test_append_access_entries_set_semantics(tmp_path):
    root = str(tmp_path / "dset")
    e1 = {"role": "READER", "groupByEmail": "team@example.com"}
    ds.create_dataset(root, access_entries=[e1])
    m = ds.append_access_entries(root, [e1, {"role": "OWNER", "userByEmail": "x@example.com"}])
    assert m["access_entries"] == [
        e1, {"role": "OWNER", "userByEmail": "x@example.com"}
    ]


def test_create_table_registers_schema(tmp_path):
    root = str(tmp_path / "dset")
    ds.create_dataset(root)
    schema = [{"name": "id", "type": "INT64", "mode": "Required"}]
    ds.create_table(root, "t1", schema, description="d", labels={"x": "y"})
    got = ds.read_table_meta(root, "t1")
    assert got["schema"] == schema and got["labels"] == {"x": "y"}
    # exists_ok: re-register overwrites metadata without error
    ds.create_table(root, "t1", schema, description="d2")
    assert ds.read_table_meta(root, "t1")["description"] == "d2"


def test_cli_pre_post_hooks(spark, sf_smoke, tmp_path, capsys):
    """End-to-end: config-driven dataset management around a real CLI
    run — pre-labels before extraction, post-labels + additional access
    entries applied only because the run succeeded."""
    from dumpty_spark.cli import main

    cfg = {
        "manage_dataset": True,
        "dataset_description": "nightly extract",
        "dataset_pre_labels": {"state": "loading"},
        "dataset_post_labels": {"state": "ready"},
        "dataset_access_entries": [
            {"role": "READER", "groupByEmail": "etl@example.com"}
        ],
        "dataset_additional_access_entries": [
            {"role": "READER", "groupByEmail": "analysts@example.com"}
        ],
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    sink = str(tmp_path / "out")
    assert main([
        "--config", str(cfg_path),
        "--source-dir", sf_smoke,
        "--sink-dir", sink,
        "--state-dir", str(tmp_path / "state"),
        "--tables", "region",
        "--workers", "2",
    ]) == 0
    capsys.readouterr()
    meta = ds.read_dataset(sink)
    assert meta["description"] == "nightly extract"
    # post hook replaced the pre labels after the successful run
    assert meta["labels"] == {"state": "ready"}
    assert meta["access_entries"] == [
        {"role": "READER", "groupByEmail": "etl@example.com"},
        {"role": "READER", "groupByEmail": "analysts@example.com"},
    ]
