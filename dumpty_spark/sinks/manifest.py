"""Manifest-commit protocol for the at-rest mutators (VERDICT r2 task 2).

The round-2 mutators (``delete_keys``/``upsert_keys``/``compact_parquet``)
swap files in place — atomic per file via ``os.replace``, but a crash
between two file swaps leaves a HALF-MUTATED dataset visible to readers.
This module is the fix: the snapshot-isolation commit protocol that
Delta/Iceberg made standard (public designs — log + atomic pointer swap),
reduced to its minimum viable core for a filesystem parquet store. The
reference leans on the equivalent GCS manifest committer
(config.yaml.example:30-34); this is our native analog.

Layout::

    {root}/_VERSION              # pointer: the current version number
    {root}/_manifests/v{N}.json  # immutable: file list of snapshot N
    {root}/data/*.parquet        # immutable data files, never mutated

Protocol invariants:

- **Data files are immutable.** A mutation writes NEW files under
  ``data/`` (names prefixed with the target version, so a crashed
  attempt's leftovers can never collide with a later one), never touches
  existing ones.
- **Publish is ONE atomic step**: write manifest v{N+1}, then
  ``os.replace`` a temp file onto ``_VERSION``. POSIX rename is atomic,
  so every reader resolves either N or N+1 — never a mix. A crash
  anywhere before that final replace leaves ``_VERSION`` at N and the
  staged files unreferenced (invisible to readers, reclaimed by
  ``vacuum``).
- **Readers never list the directory.** ``read_store`` resolves
  ``_VERSION`` → manifest → explicit file list, so half-staged files are
  structurally unreadable, not just unlikely-to-be-read.
- Single writer assumed (like every at-rest store here); on a cluster
  the ``_VERSION`` swap maps to the object store's
  compare-and-swap/preconditioned copy.

Time travel falls out for free: ``read_store(..., version=N)`` reads any
retained snapshot.
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

_VERSION_FILE = "_VERSION"
_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
_COMMIT_LOCK = ".commit.lock"


class ConcurrentWriteError(RuntimeError):
    """A second writer attempted to commit while another commit was in
    flight. The loser fails CLEANLY: nothing it staged is referenced by
    any manifest, the store stays readable at the winner's version, and
    vacuum reclaims the orphaned staging output."""


@contextlib.contextmanager
def _commit_lock(root: str):
    """Exclusive commit section: read-version → stage → publish must be
    one critical section, else two writers both read version N and both
    publish N+1 — the first commit silently vanishes (and their staged
    files, named for the same target version, can collide). O_EXCL file
    creation is the arbiter — atomic on POSIX and cheap, works for
    threads and processes alike; on an object store this maps to an
    if-not-exists precondition. Non-blocking by design: a real writer
    queue belongs in the orchestrator, not hidden in a storage
    primitive. A crash while holding leaves a stale lock; the error
    message names the file to remove (same contract as plans/state.py's
    run lock)."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, _COMMIT_LOCK)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as e:
        raise ConcurrentWriteError(
            f"versioned store {root} has a commit in flight "
            f"(remove {path} if stale)"
        ) from e
    try:
        os.write(fd, str(os.getpid()).encode())
        yield
    finally:
        os.close(fd)
        with contextlib.suppress(FileNotFoundError):
            os.remove(path)


def is_versioned(root: str) -> bool:
    return os.path.isfile(os.path.join(root, _VERSION_FILE))


def current_version(root: str) -> int:
    with open(os.path.join(root, _VERSION_FILE)) as fh:
        return int(fh.read().strip())


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"v{version}.json")


def read_manifest(root: str, version: int | None = None) -> dict:
    if version is None:
        version = current_version(root)
    with open(_manifest_path(root, version)) as fh:
        m = json.load(fh)
    m["version"] = version
    return m


def data_files(root: str, version: int | None = None) -> list[str]:
    """Absolute paths of the files in a snapshot, manifest order."""
    m = read_manifest(root, version)
    return [os.path.join(root, _DATA_DIR, f) for f in m["files"]]


def read_store(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: resolve pointer → manifest → explicit file list.
    An empty snapshot reads back as an empty frame with the schema
    recorded at last non-empty commit (parquet needs ≥1 file, so the
    manifest carries a schema sample file for the empty case)."""
    files = data_files(root, version)
    if not files:
        m = read_manifest(root, version)
        sample = m.get("schema_sample")
        if sample is None:
            raise ValueError(f"empty versioned store with no schema sample: {root}")
        return spark.read.parquet(os.path.join(root, _DATA_DIR, sample)).limit(0)
    # mergeSchema: a snapshot may legitimately mix file schemas after an
    # additive evolution (a commit_snapshot with a new column leaves
    # later keyed mutations carrying the wide schema while untouched
    # files keep the old one) — old files read the new columns as NULL
    return spark.read.option("mergeSchema", "true").parquet(*files)


def _stage_dataframe(
    df: DataFrame, root: str, version: int, tag: str, partitions: int | None = None
) -> list[str]:
    """Write df into data/ as immutable files named for the version that
    will reference them. Returns the new files' basenames (NOT yet
    visible: nothing references them until commit)."""
    tmp = os.path.join(root, f"__stage_v{version}_{tag}")
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").parquet(tmp)
    names = []
    os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)
    for i, part in enumerate(
        sorted(p for p in glob.glob(os.path.join(tmp, "part-*")) if os.path.isfile(p))
    ):
        name = f"v{version}-{tag}-{i:05d}.parquet"
        os.replace(part, os.path.join(root, _DATA_DIR, name))
        names.append(name)
    shutil.rmtree(tmp)
    return names


# test seam: crash-injection hook, called at named points inside the
# commit sequence; tests monkeypatch it to raise and then assert readers
# still resolve the PRIOR snapshot (see tests/test_manifest_store.py)
_crash_hook = None


def _maybe_crash(point: str) -> None:
    if _crash_hook is not None:
        _crash_hook(point)


def _publish(root: str, version: int, files: list[str], schema_sample: str | None) -> None:
    """The single atomic step. Everything before the final os.replace is
    invisible to readers."""
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    manifest = {"files": files}
    if schema_sample:
        manifest["schema_sample"] = schema_sample
    _maybe_crash("pre_manifest")
    mpath = _manifest_path(root, version)
    with open(mpath + ".tmp", "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(mpath + ".tmp", mpath)
    _maybe_crash("pre_pointer_swap")
    vtmp = os.path.join(root, _VERSION_FILE + ".tmp")
    with open(vtmp, "w") as fh:
        fh.write(str(version))
    os.replace(vtmp, os.path.join(root, _VERSION_FILE))


def create_store(
    df: DataFrame, root: str, partitions: int | None = None
) -> dict:
    """Initialize a versioned store at ``root`` with snapshot v0."""
    os.makedirs(root, exist_ok=True)
    with _commit_lock(root):
        if is_versioned(root):
            raise ValueError(f"versioned store already exists at {root}")
        names = _stage_dataframe(df, root, 0, "full", partitions)
        _publish(root, 0, names, names[0] if names else None)
    return {"version": 0, "files": len(names)}


def commit_snapshot(
    df: DataFrame, root: str, partitions: int | None = None,
    _locked: bool = False,
) -> dict:
    """Full-replacement commit: stage a complete new snapshot, publish.
    The building block compaction uses; keyed ops use commit_mutation."""
    lock = contextlib.nullcontext() if _locked else _commit_lock(root)
    with lock:
        v = current_version(root) + 1
        names = _stage_dataframe(df, root, v, "full", partitions)
        _publish(root, v, names, names[0] if names else None)
    return {"version": v, "files": len(names)}


def commit_mutation(
    root: str,
    keep_files: list[str],
    staged: list[str],
    schema_sample: str | None = None,
    _locked: bool = False,
) -> dict:
    """Partial commit: next snapshot = kept basenames + staged basenames.
    Used by keyed delete/upsert, which rewrite only hit files.

    ``_locked``: the keyed mutators hold the commit lock across their
    WHOLE read→stage→publish (a mutation's keep list is only valid
    against the snapshot it was computed from), so they pass True to
    skip re-acquiring here."""
    lock = contextlib.nullcontext() if _locked else _commit_lock(root)
    with lock:
        v = current_version(root) + 1
        files = list(keep_files) + list(staged)
        sample = schema_sample or (
            files[0] if files else read_manifest(root).get("schema_sample")
        )
        _publish(root, v, files, sample)
    return {"version": v, "files": len(files)}


def changes_between(
    spark: SparkSession,
    root: str,
    key_col: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change data feed between two retained snapshots: (key, status)
    for every key added / removed / changed, computed from the two
    snapshot reads (E23 snapshot_diff under the hood). Because versions
    are immutable, the feed for a (from, to) pair is stable forever —
    the consumer contract a downstream incremental pipeline needs.

    Scale note: this is a full-outer join of two snapshots — O(store),
    not O(delta). When the DELTA is what's wanted cheaply, the mutators
    already return per-call stats; this read-side feed is for consumers
    that only see the store."""
    from dumpty_spark.operators.diff import snapshot_diff

    old = read_store(spark, root, from_version)
    new = read_store(spark, root, to_version)
    return snapshot_diff(old, new, [key_col])


def vacuum(root: str, keep_versions: int = 1) -> dict:
    """Reclaim: drop manifests older than the newest ``keep_versions``
    and every data file (and crashed staging dir) no retained manifest
    references. Run AFTER readers of old snapshots have drained — this
    is the only destructive step in the protocol, so it is the one the
    operator schedules, not the writer.

    Takes the commit lock: an in-flight commit's staged-but-not-yet-
    referenced files look exactly like reclaimable orphans to this scan,
    so vacuuming concurrently with a writer would delete the files the
    commit is about to publish."""
    with _commit_lock(root):
        cur = current_version(root)
        keep = set(range(max(0, cur - keep_versions + 1), cur + 1))
        referenced: set[str] = set()
        removed_manifests = 0
        for mp in glob.glob(os.path.join(root, _MANIFEST_DIR, "v*.json")):
            v = int(os.path.basename(mp)[1:-5])
            if v in keep:
                m = read_manifest(root, v)
                referenced.update(m["files"])
                if m.get("schema_sample"):
                    referenced.add(m["schema_sample"])
            else:
                os.remove(mp)
                removed_manifests += 1
        removed_files = 0
        for f in glob.glob(os.path.join(root, _DATA_DIR, "*.parquet")):
            if os.path.basename(f) not in referenced:
                os.remove(f)
                removed_files += 1
        for d in glob.glob(os.path.join(root, "__stage_v*")):
            shutil.rmtree(d, ignore_errors=True)
            removed_files += 1
    return {
        "removed_files": removed_files,
        "removed_manifests": removed_manifests,
    }


# ---------------------------------------------------------------------------
# The at-rest mutators, re-expressed on the commit protocol. Same
# hit-file targeting as the plain-path versions in sinks/writers.py
# (only files containing an affected key are rewritten — at 100 TB a
# keyed trickle must not rewrite the corpus), but the publish is one
# atomic pointer swap instead of N in-place file replaces.
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402


def _hit_basenames(
    spark: SparkSession, root: str, key_col: str, keys=None, keys_df=None
) -> list[str]:
    """Basenames of current-snapshot files containing ≥1 matching key,
    via input_file_name over the snapshot read. Two-regime targeting
    (sinks/writers.py discipline): an In-literal below _ISIN_MAX keys
    (footer min-max / dictionary pruning applies before any row is
    materialized), a broadcast semi join above (expression-size safe;
    the keys are never expanded into a Python In-literal in that
    regime, though the broadcast table itself still passes through the
    driver — bounded by broadcast size, not expression size)."""
    from dumpty_spark.sinks.writers import _hit_semi

    rows = (
        _hit_semi(read_store(spark, root), key_col, keys, keys_df)
        .select(F.input_file_name().alias("_f"))
        .distinct()
        .collect()
    )
    return [os.path.basename(r["_f"].removeprefix("file://")) for r in rows]


def delete_keys_versioned(
    spark: SparkSession, root: str, key_col: str, keys: list
) -> dict:
    """Keyed delete with snapshot isolation: survivors of each hit file
    are staged as new files; untouched files carry over by reference.

    Holds the commit lock for the WHOLE read→stage→publish: the keep
    list is only valid against the snapshot it was computed from, so a
    concurrent commit in the middle would be silently overwritten (write
    skew) — the second writer must fail with ConcurrentWriteError
    instead. Key targeting is two-regime like the plain path; NULL keys
    never match (a null-keyed store row always survives)."""
    from dumpty_spark.sinks.writers import _hit_anti, _hit_semi

    with _commit_lock(root):
        m = read_manifest(root)
        hit_names = set(_hit_basenames(spark, root, key_col, keys))
        if not hit_names:
            return {
                "version": m["version"],
                "files_scanned": len(m["files"]),
                "files_rewritten": 0,
                "files_removed": 0,
                "rows_deleted": 0,
            }
        v_next = m["version"] + 1
        hit_paths = [os.path.join(root, _DATA_DIR, n) for n in hit_names]
        hit_df = spark.read.parquet(*hit_paths)
        rows_deleted = _hit_semi(hit_df, key_col, keys).count()
        survivors = _hit_anti(hit_df, key_col, keys)
        staged = (
            _stage_dataframe(survivors, root, v_next, "del", len(hit_names))
            if not survivors.isEmpty()
            else []
        )
        keep = [f for f in m["files"] if f not in hit_names]
        out = commit_mutation(
            root, keep, staged, m.get("schema_sample"), _locked=True
        )
    out.update(
        {
            # keep the plain-path delete_keys return contract: scanned =
            # current snapshot's files; "removed" = hit files superseded
            # with no survivors staged (versioned stores never physically
            # delete — vacuum does)
            "files_scanned": len(m["files"]),
            "files_rewritten": len(hit_names),
            "files_removed": 0 if staged else len(hit_names),
            "rows_deleted": rows_deleted,
        }
    )
    return out


def upsert_keys_versioned(
    spark: SparkSession, root: str, key_col: str, updates: DataFrame
) -> dict:
    """Keyed MERGE with snapshot isolation: hit files are re-staged with
    updated rows merged in; never-seen keys land in one appended file.
    Commit lock held across read→stage→publish — same write-skew
    argument as delete_keys_versioned. Key targeting is two-regime
    (sinks/writers.py discipline): below _ISIN_MAX distinct keys an
    In-literal (parquet pruning), above it broadcast joins — the keys
    are never collected as a Python list / In-literal, though the
    broadcast itself still materializes the key frame through the
    driver, so the large regime is bounded by broadcast size (~key
    count × key width), not by expression size. The CC store
    (operators/components.py) pushes large changed-node batches
    through this path; a batch beyond broadcast scale would need a
    shuffle join variant (not yet needed at any measured scale)."""
    from dumpty_spark.sinks.writers import _ISIN_MAX

    updates = updates.localCheckpoint()  # evaluated repeatedly below
    # regime gate in ONE action (r11 optimization, guide §2.4): a
    # limit-probe collect replaces the count-then-collect pair; overflow
    # past _ISIN_MAX rows means the large regime (keys never collected).
    kdist = updates.select(key_col).distinct()
    probe_rows = kdist.limit(_ISIN_MAX + 1).collect()
    if len(probe_rows) <= _ISIN_MAX:
        keys, keys_df = [r[0] for r in probe_rows], None
    else:
        keys, keys_df = None, kdist
    with _commit_lock(root):
        return _upsert_locked(spark, root, key_col, updates, keys, keys_df)


def _upsert_locked(
    spark: SparkSession,
    root: str,
    key_col: str,
    updates: DataFrame,
    keys,
    keys_df,
) -> dict:
    from dumpty_spark.sinks.writers import _hit_anti, _hit_semi

    m = read_manifest(root)
    # conform to the store schema — order AND types: a staged file whose
    # physical type differs (e.g. INT literal vs the store's INT64)
    # poisons every later snapshot read
    store_schema = read_store(spark, root).schema
    upd = updates.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in store_schema.fields]
    )

    hit_names = set(_hit_basenames(spark, root, key_col, keys, keys_df))
    v_next = m["version"] + 1
    staged: list[str] = []
    rows_updated = 0
    matched = None
    if hit_names:
        hit_paths = [os.path.join(root, _DATA_DIR, n) for n in hit_names]
        old = spark.read.parquet(*hit_paths)
        # update keys present in the store: change-batch-sized, stays
        # distributed (AQE broadcasts it when small). ONE pass over the
        # hit files yields both the matched-key frame and the updated-row
        # count (r11 optimization, guide §2.4 — was two full hit-file
        # scans: a distinct-keys checkpoint plus a separate semi count).
        per_key = (
            _hit_semi(old.select(key_col), key_col, keys, keys_df)
            .groupBy(key_col)
            .agg(F.count("*").alias("_n"))
            .localCheckpoint()
        )
        matched = per_key.select(key_col)
        rows_updated = int(
            per_key.agg(F.coalesce(F.sum("_n"), F.lit(0))).first()[0]
        )
        # NULL-safe: a null-keyed store row never matches and survives
        merged = _hit_anti(old, key_col, keys, keys_df).unionByName(
            upd.join(matched, key_col, "left_semi")
        )
        staged += _stage_dataframe(merged, root, v_next, "ups", len(hit_names))
    # NULL-safe: a null-keyed update row can never match a hit file by
    # key, and the anti join keeps it — an insert by definition.
    inserts = (
        upd.join(matched, key_col, "left_anti") if matched is not None else upd
    )
    n_inserts = inserts.count()
    if n_inserts:
        staged += _stage_dataframe(inserts, root, v_next, "ins", 1)
    keep = [f for f in m["files"] if f not in hit_names]
    out = commit_mutation(
        root, keep, staged, m.get("schema_sample"), _locked=True
    )
    out.update(
        {
            "files_rewritten": len(hit_names),
            "rows_updated": rows_updated,
            "rows_inserted": n_inserts,
        }
    )
    return out


def compact_versioned(
    spark: SparkSession, root: str, target_bytes: int = 50 * 1024 * 1024
) -> dict:
    """Small-files compaction as a full-replacement snapshot commit —
    readers of the old snapshot are never exposed to the rewrite (the
    round-2 plain-path compactor had a brief readers-see-nothing window
    between its two renames; here there is none)."""
    from dumpty_spark.sinks.writers import advise_partitions

    # lock held across read→rewrite→publish: the compacted snapshot is a
    # rewrite of the files read HERE — a commit landing in between would
    # be silently replaced with recompacted stale data otherwise
    with _commit_lock(root):
        m = read_manifest(root)
        files = data_files(root)
        observed = sum(os.path.getsize(f) for f in files)
        n_files = advise_partitions(observed, len(files), target_bytes)
        out = commit_snapshot(
            read_store(spark, root), root, n_files, _locked=True
        )
    out.update({"files_before": len(m["files"]), "files_after": out.pop("files")})
    return out
