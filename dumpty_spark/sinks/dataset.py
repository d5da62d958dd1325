"""Dataset lifecycle ops (X9): labels / ACLs / description on the SINK
namespace, cloud-free.

The reference manages its BigQuery target dataset around each run
(``/root/reference/src/dumpty/gcp.py:66-144``, wired in
``main.py:199-301``): create-or-update with *pre* labels + access
entries before extraction (optionally dropping the dataset first), then
— only after a fully successful run — apply *post* labels and append
*additional* access entries. The useful semantics are none of them
BigQuery-specific: a dataset is a sink directory, and its metadata is a
JSON sidecar (``_dataset.json``) that travels with the data. On a cloud
deployment these calls map 1:1 back onto the dataset APIs.

Semantics preserved exactly:

- ``create_dataset`` is idempotent create-or-update; ``drop=True``
  deletes contents first (``delete_contents=True`` in the reference).
  Updates replace description/location/labels and MERGE access entries.
- ``append_access_entries`` appends with set semantics — an entry equal
  to an existing one is skipped (``AccessEntry.__eq__`` in the
  reference; dict equality here).
- ``apply_labels`` REPLACES the label map (the reference assigns
  ``dataset.labels = labels`` wholesale).
- ``create_table`` registers an empty table with schema + metadata,
  ``exists_ok`` like the reference's.
"""

from __future__ import annotations

import json
import os
import shutil

_SIDECAR = "_dataset.json"
_TABLES_DIR = "_tables"


def _path(root: str) -> str:
    return os.path.join(root, _SIDECAR)


def read_dataset(root: str) -> dict | None:
    """The dataset's metadata, or None if ``root`` isn't a dataset."""
    p = _path(root)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _write(root: str, meta: dict) -> dict:
    tmp = _path(root) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    os.replace(tmp, _path(root))
    return meta


def create_dataset(
    root: str,
    description: str | None = None,
    location: str = "US",
    labels: dict | None = None,
    access_entries: list[dict] | None = None,
    drop: bool = False,
) -> dict:
    """Create-or-update the dataset at ``root`` (gcp.py:66-105 parity).

    drop=True on an existing dataset deletes its CONTENTS (data and
    metadata) and recreates fresh — the reference's
    ``delete_dataset(delete_contents=True)`` + create."""
    existing = read_dataset(root)
    if existing is not None and drop:
        for entry in os.listdir(root):
            p = os.path.join(root, entry)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        existing = None
    os.makedirs(root, exist_ok=True)
    meta = existing or {"access_entries": []}
    meta["description"] = description
    meta["location"] = location
    meta["labels"] = dict(labels or {})
    if access_entries is not None:
        for entry in access_entries:
            if entry not in meta["access_entries"]:
                meta["access_entries"].append(entry)
    return _write(root, meta)


def apply_labels(root: str, labels: dict) -> dict:
    """Replace the dataset's label map (gcp.py:119-124 parity)."""
    meta = read_dataset(root)
    if meta is None:
        raise FileNotFoundError(f"no dataset at {root}")
    meta["labels"] = dict(labels)
    return _write(root, meta)


def append_access_entries(root: str, access_entries: list[dict]) -> dict:
    """Append access entries with set semantics (gcp.py:126-144)."""
    meta = read_dataset(root)
    if meta is None:
        raise FileNotFoundError(f"no dataset at {root}")
    for entry in access_entries:
        if entry not in meta["access_entries"]:
            meta["access_entries"].append(entry)
    return _write(root, meta)


def create_table(
    root: str,
    name: str,
    schema: list[dict],
    description: str | None = None,
    labels: dict | None = None,
) -> dict:
    """Register an empty table's schema + metadata under the dataset
    (gcp.py:107-117 parity, exists_ok=True: re-registering overwrites
    the metadata, never the data)."""
    if read_dataset(root) is None:
        raise FileNotFoundError(f"no dataset at {root}")
    tdir = os.path.join(root, _TABLES_DIR)
    os.makedirs(tdir, exist_ok=True)
    meta = {
        "name": name,
        "schema": schema,
        "description": description,
        "labels": dict(labels or {}),
    }
    tmp = os.path.join(tdir, f"{name}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(tdir, f"{name}.json"))
    return meta


def read_table_meta(root: str, name: str) -> dict | None:
    p = os.path.join(root, _TABLES_DIR, f"{name}.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)
