#!/usr/bin/env python
"""×100 spot-check for the two regime operators (round-4 verdict task 7)
— the last extrapolation gap between the measured ×10 sweep and the
claimed 100× headroom.

Replicating the whole CORPUS ×100 would mostly measure the candidate-
pair generators' data quadratic (every near-dup cluster 100× bigger →
~10⁴× pairs — the data's doing, already characterized in
scale_sweep.py's pairs model). The ×10→×100 question is about the
ITERATIVE operators themselves, so this sweep replicates their EDGE
LISTS at the scale a ×100 corpus would hand them (deterministic
id-offset copies: replica k offsets every endpoint by k·stride, giving
structure-identical disjoint subgraphs):

- pagerank edges ×100 — the co-occurrence graph grows ~linearly with
  fact volume (each replica contributes its own baskets): ~239M edges;
- CC edges ×10,000 — within-cluster pair counts grow QUADRATICALLY
  under corpus replication (the measured ×10 behavior), so the edge
  list a ×100 corpus feeds CC is ~100² × the base: ~2.6M edges, far
  past the 200k driver gate;
- banded-LSH candidate generation ×100 docs (round-8 verdict task 6) —
  the 100 TB story's most load-bearing dedup claim. The banded rows
  (id, band_idx, band_hash) are replicated as 100 DISJOINT
  structure-identical corpora (id offset + band-key salt — the same
  disjoint-copy scheme as CC/PR: 100 tenants, each bit-identical to
  the base corpus). A banding plan generates candidates per BUCKET
  (sum_b C(n_b,2)), so disjoint replicas must yield EXACTLY 100× the
  base candidate count — any cross-replica pair or all-pairs
  enumeration would show up as super-linear growth (the identical-text
  replication alternative only re-measures the data's own quadratic:
  every bucket 100× bigger → 10⁴× pairs by construction, already
  characterized by the ×10 sweep's pairs model).

Assertions:

- both operators take the DISTRIBUTED regime at ×100 (gate crossed);
- CC's round count at ×100 EQUALS its forced-distributed round count on
  the base edges — rounds are a function of per-component structure
  (replica 0 is bit-identical to the base graph and replicas are
  disjoint), so any growth would mean the algorithm's convergence
  depends on graph SIZE, which is exactly the failure this checks for;
- pagerank's wall-clock ratio stays under 100 × the linear slack used
  by the ×10 sweep (1.8×/decade → 180), with its fixed 8 rounds;
- driver RSS delta stays bounded (the operators keep node-scale state
  in the JVM, never on the Python driver).

Appends an "x100" section to SCALE_BENCH.json. Run:
    python scripts/scale_x100.py
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PR = 100
N_CC = 10_000
N_DEDUP = 100
STRIDE = 1_000_000_000  # far above any sf0.1 id
RSS_DELTA_MAX_MB = 2000.0
PR_RATIO_MAX = 180.0  # 100x data, same 1.8x/decade slack as scale_sweep


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def replicate_edges(base, cols: tuple[str, str], n: int):
    """×n disjoint structure-identical copies: crossJoin the edge list
    with a broadcast replica index and offset both endpoints — the same
    id-offset scheme as make_scale_fixtures.py, kept inside Spark so no
    parquet staging or driver materialization is needed."""
    from pyspark.sql import functions as F

    spark = base.sparkSession
    reps = F.broadcast(
        spark.range(n).select((F.col("id") * STRIDE).alias("__off"))
    )
    a, b = cols
    return base.crossJoin(reps).select(
        (F.col(a) + F.col("__off")).alias(a),
        (F.col(b) + F.col("__off")).alias(b),
    )


def pr_edges(spark, sf_dir: str):
    """The identical co-occurrence edge construction q_pagerank_parts
    uses (queries/scale2.py) — parts sharing an order, symmetrized."""
    from pyspark.sql import functions as F

    from dumpty_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b").distinct()
    return pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


def cc_edges(spark, sf_dir: str):
    """The identical pair graph q_dedup_clusters clusters (3-gram
    Jaccard ≥ 0.8 over documents)."""
    from dumpty_spark.operators import dedup as D
    from dumpty_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)


def banded_rows(spark, sf_dir: str):
    """The identical banded-LSH front-end rows q_minhash_lsh_pairs
    joins on: (id, band_idx, band_hash) at 32 hashes × 8 bands."""
    from pyspark.sql import functions as F

    from dumpty_spark.operators import dedup as D
    from dumpty_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(docs, "doc_id", "text", 32, 3)
    return sig.select(
        "id",
        F.posexplode(D.minhash_band_hashes(F.col("sig"), 32, 8)).alias(
            "band_idx", "band_hash"
        ),
    )


def banded_candidates(banded):
    """Bucket-join candidate generation exactly as minhash_lsh_pairs
    does it — per-(band_idx, band_hash) pairs, deduped across bands."""
    from pyspark.sql import functions as F

    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band_idx", "band_hash"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a_id"), F.col("y.id").alias("b_id"))
        .distinct()
    )


def store_readout_leg(spark, failures: list[str]) -> dict:
    """Mergeable-store READOUT at ×100 (VERDICT r10 #3): store_delta and
    merge prove the WRITE side is O(delta); this records the READ side —
    the agg-view claim that a readout re-aggregates batches×groups
    PARTIAL rows and never the raw history. Two axes:

    * ``x100_raw``: store B's partials summarize 100× the raw rows per
      batch (counts/sums scaled — structure-identical partials, same
      batches×groups frame). Readout wall must be ~IDENTICAL to base:
      raw history size must not appear anywhere in the read path.
    * ``x100_batches``: store C holds 100× the BATCH PARTITIONS (same
      groups). Readout wall may grow with partials/listing — bounded
      well below 100× — and the merged result must equal 100× the base
      counts exactly (merge algebra), with driver RSS flat.
    """
    import shutil

    from pyspark.sql import functions as F

    from dumpty_spark.operators.aggview import agg_view_append, agg_view_read
    from dumpty_spark.sources.parquet import load_table

    N_BATCH = 20
    N_REP = 100
    scratch = os.path.join(REPO, ".scale", "x100_readout")
    shutil.rmtree(scratch, ignore_errors=True)
    store_a = os.path.join(scratch, "a")
    store_raw = os.path.join(scratch, "raw100")
    store_bat = os.path.join(scratch, "bat100")

    ev = load_table(spark, SF01, "events").select(
        "event_type", "user_id", "value"
    ).localCheckpoint()
    n_raw = ev.count()
    for i in range(N_BATCH):
        agg_view_append(
            ev.filter(F.col("user_id") % N_BATCH == i),
            store_a, ["event_type"], "value", f"b{i:03d}",
        )
    parts_a = spark.read.parquet(store_a)
    n_partials = parts_a.count()

    # store B: same batches×groups frame, partials summarizing 100× the
    # raw rows (cnt/s scaled — min/max unchanged, exactly what disjoint
    # structure-identical raw replicas would aggregate to)
    (
        parts_a.select(
            "event_type",
            (F.col("cnt") * N_REP).alias("cnt"),
            (F.col("s") * N_REP).alias("s"),
            "mn", "mx", "batch_id",
        )
        .coalesce(1)
        .write.partitionBy("batch_id")
        .parquet(store_raw)
    )
    # store C: 100× batch partitions (distinct batch ids per replica) —
    # one job writes all 2000 partitions
    reps = F.broadcast(
        spark.range(N_REP).select(F.col("id").cast("string").alias("__r"))
    )
    (
        parts_a.crossJoin(reps)
        .select(
            "event_type", "cnt", "s", "mn", "mx",
            F.concat_ws("_", "batch_id", "__r").alias("batch_id"),
        )
        .coalesce(4)
        .write.partitionBy("batch_id")
        .parquet(store_bat)
    )

    def _read(store: str) -> tuple[float, dict]:
        best = None
        rows = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = {
                r["event_type"]: (r["cnt"], r["s"], r["mn"], r["mx"])
                for r in agg_view_read(
                    spark, store, ["event_type"]
                ).collect()
            }
            wall = time.perf_counter() - t0
            best = wall if best is None or wall < best else best
        return best, rows

    rss0 = rss_mb()
    t_a, rows_a = _read(store_a)
    t_raw, rows_raw = _read(store_raw)
    t_bat, rows_bat = _read(store_bat)
    entry = {
        "n_batches_base": N_BATCH,
        "n_partials_base": n_partials,
        "raw_rows_per_store": {"base": n_raw, "x100_raw": n_raw * N_REP},
        "base": {"sec": round(t_a, 3)},
        "x100_raw": {"sec": round(t_raw, 3),
                     "ratio": round(t_raw / max(t_a, 1e-6), 2)},
        "x100_batches": {"sec": round(t_bat, 3),
                         "n_partials": n_partials * N_REP,
                         "ratio": round(t_bat / max(t_a, 1e-6), 2)},
        "rss_delta_mb": round(rss_mb() - rss0, 1),
    }

    # result correctness: merge algebra must see the replication exactly
    for et, (cnt, s, mn, mx) in rows_a.items():
        for tag, rows_x in (("x100_raw", rows_raw), ("x100_batches", rows_bat)):
            cx, sx, mnx, mxx = rows_x[et]
            if cx != cnt * N_REP or mnx != mn or mxx != mx:
                failures.append(
                    f"store_readout {tag}: group {et} partial merge "
                    f"diverged (cnt {cx} vs {cnt}*{N_REP})"
                )
                break
    # 100× raw history behind the same partials: readout must not see it
    if entry["x100_raw"]["ratio"] > 3.0:
        failures.append(
            f"store_readout: 100x raw history changed readout wall by "
            f"{entry['x100_raw']['ratio']}x — the read path is touching "
            "raw history, not batches×groups partials"
        )
    # 100× partitions: listing+footer overhead, but nowhere near 100×
    if entry["x100_batches"]["ratio"] > 40.0:
        failures.append(
            f"store_readout: 100x batch partitions cost "
            f"{entry['x100_batches']['ratio']}x readout — partial "
            "re-aggregation is no longer metadata-sized"
        )
    if entry["rss_delta_mb"] > RSS_DELTA_MAX_MB:
        failures.append(
            f"store_readout driver RSS grew {entry['rss_delta_mb']}MB"
        )
    shutil.rmtree(scratch, ignore_errors=True)
    return entry


def main() -> int:
    from pyspark.sql import functions as F

    from dumpty_spark.operators import telemetry
    from dumpty_spark.operators.dedup import connected_components
    from dumpty_spark.operators.graph import pagerank
    from dumpty_spark.session import get_session

    spark = get_session("dumpty-spark-scale-x100")
    failures: list[str] = []
    out: dict = {"n_pr": N_PR, "n_cc": N_CC, "n_dedup": N_DEDUP, "sf_base": SF01}

    # ---- banded-LSH dedup candidates x100 ------------------------------
    base_banded = banded_rows(spark, SF01).localCheckpoint()
    n_docs = base_banded.select("id").distinct().count()
    t0 = time.perf_counter()
    c_base = banded_candidates(base_banded).count()
    t_base_d = time.perf_counter() - t0

    reps = F.broadcast(
        spark.range(N_DEDUP).select(
            (F.col("id") * STRIDE).alias("__off"),
            F.col("id").cast("string").alias("__salt"),
        )
    )
    big_banded = base_banded.crossJoin(reps).select(
        (F.col("id") + F.col("__off")).alias("id"),
        "band_idx",
        F.concat_ws(":", "band_hash", "__salt").alias("band_hash"),
    )
    rss0 = rss_mb()
    t0 = time.perf_counter()
    c_big = banded_candidates(big_banded).count()
    t_big_d = time.perf_counter() - t0
    total_docs = N_DEDUP * n_docs
    all_pairs = total_docs * (total_docs - 1) // 2
    dedup_entry = {
        "base": {"sec": round(t_base_d, 2), "docs": n_docs, "candidates": c_base},
        "x100": {
            "sec": round(t_big_d, 2),
            "docs": total_docs,
            "candidates": c_big,
        },
        "ratio": round(t_big_d / max(t_base_d, 1e-6), 2),
        "candidate_growth": round(c_big / max(c_base, 1), 2),
        "all_pairs_fraction": round(c_big / max(all_pairs, 1), 8),
        "rss_delta_mb": round(rss_mb() - rss0, 1),
    }
    out["dedup_banded"] = dedup_entry
    if c_big != N_DEDUP * c_base:
        failures.append(
            f"dedup x100 candidates {c_big} != {N_DEDUP}x base {c_base} — "
            "banding must grow candidates EXACTLY linearly over disjoint "
            "replica corpora (super-linear = cross-replica/all-pairs leak)"
        )
    if dedup_entry["ratio"] > PR_RATIO_MAX:
        failures.append(f"dedup x100 ratio {dedup_entry['ratio']} > {PR_RATIO_MAX}")
    if dedup_entry["all_pairs_fraction"] > 0.01:
        failures.append(
            f"dedup x100 candidates are {dedup_entry['all_pairs_fraction']:%} "
            "of all-pairs — not sub-quadratic"
        )
    if dedup_entry["rss_delta_mb"] > RSS_DELTA_MAX_MB:
        failures.append(
            f"dedup driver RSS grew {dedup_entry['rss_delta_mb']}MB"
        )

    # ---- base edge lists, pinned once ---------------------------------
    cc_base = cc_edges(spark, SF01).select("a_id", "b_id").localCheckpoint()
    pr_base = pr_edges(spark, SF01).localCheckpoint()

    # ---- connected components ----------------------------------------
    telemetry.LAST.clear()
    t0 = time.perf_counter()
    n_base_comp = connected_components(cc_base, driver_max_edges=0).count()
    t_base = time.perf_counter() - t0
    base_reg = dict(telemetry.LAST.get("connected_components", {}))

    big = replicate_edges(cc_base, ("a_id", "b_id"), N_CC)
    telemetry.LAST.clear()
    rss0 = rss_mb()
    t0 = time.perf_counter()
    n_big_comp = connected_components(big).count()
    t_big = time.perf_counter() - t0
    big_reg = dict(telemetry.LAST.get("connected_components", {}))
    cc_entry = {
        "base": {"sec": round(t_base, 2), "rows": n_base_comp, **base_reg},
        "x10000": {"sec": round(t_big, 2), "rows": n_big_comp, **big_reg},
        "rss_delta_mb": round(rss_mb() - rss0, 1),
    }
    out["connected_components"] = cc_entry
    if big_reg.get("regime") != "distributed":
        failures.append(f"CC x10000 regime {big_reg} — gate did not cross")
    if n_big_comp != N_CC * n_base_comp:
        failures.append(
            f"CC x10000 rows {n_big_comp} != {N_CC}x base {n_base_comp}"
        )
    if "rounds" in base_reg and big_reg.get("rounds") != base_reg["rounds"]:
        failures.append(
            f"CC rounds grew with size: base {base_reg.get('rounds')} "
            f"-> x10000 {big_reg.get('rounds')} (disjoint copies must "
            "converge in identical rounds)"
        )
    if cc_entry["rss_delta_mb"] > RSS_DELTA_MAX_MB:
        failures.append(f"CC driver RSS grew {cc_entry['rss_delta_mb']}MB")

    # ---- pagerank ------------------------------------------------------
    telemetry.LAST.clear()
    t0 = time.perf_counter()
    n_base_pr = pagerank(pr_base, "a", "b", n_iter=8, driver_max_edges=0).count()
    t_base = time.perf_counter() - t0
    base_reg = dict(telemetry.LAST.get("pagerank", {}))

    pr_big = replicate_edges(pr_base, ("a", "b"), N_PR)
    telemetry.LAST.clear()
    rss0 = rss_mb()
    t0 = time.perf_counter()
    # DISK_ONLY checkpoints: the x100 replica packs a 1000-executor
    # job's ENTIRE 239M-edge graph into this one local JVM — on a real
    # cluster each executor holds only its slice, so RAM-pinning the
    # whole static edge list here is an artifact of the spot-check, and
    # the pinned blocks squeeze the unified pool until aggregations OOM
    # (reproduced twice at 32g before this level was plumbed through)
    from pyspark import StorageLevel

    n_big_pr = pagerank(
        pr_big, "a", "b", n_iter=8, ckpt_storage=StorageLevel.DISK_ONLY
    ).count()
    t_big = time.perf_counter() - t0
    big_reg = dict(telemetry.LAST.get("pagerank", {}))
    ratio = round(t_big / max(t_base, 1e-6), 2)
    pr_entry = {
        "base": {"sec": round(t_base, 2), "rows": n_base_pr, **base_reg},
        "x100": {"sec": round(t_big, 2), "rows": n_big_pr, **big_reg},
        "ratio": ratio,
        "rss_delta_mb": round(rss_mb() - rss0, 1),
    }
    out["pagerank"] = pr_entry
    if big_reg.get("regime") != "distributed":
        failures.append(f"PR x100 regime {big_reg} — gate did not cross")
    if n_big_pr != N_PR * n_base_pr:
        failures.append(f"PR x100 rows {n_big_pr} != {N_PR}x base {n_base_pr}")
    if ratio > PR_RATIO_MAX:
        failures.append(f"PR x100 ratio {ratio} > {PR_RATIO_MAX}")
    if pr_entry["rss_delta_mb"] > RSS_DELTA_MAX_MB:
        failures.append(f"PR x100 driver RSS grew {pr_entry['rss_delta_mb']}MB")

    # ---- ANF / neighborhood function ----------------------------------
    # Same replica scheme over the symmetric co-occurrence edges. The
    # per-replica TRUE ball sizes are identical (structure-identical
    # disjoint subgraphs), but FM estimates depend on the node-id
    # hashes, which differ per replica — so the invariants are:
    # exact 100x node count, per-t mean ball size near the base mean
    # (more replicas = more FM draws around the same truth), the
    # broadcast gate CROSSED onto the shuffle regime (2.05M nodes >
    # the 2M gate — the x100 run exercises the big-graph plan), and
    # bounded wall/RSS.
    from dumpty_spark.operators.graph import anf_estimates

    telemetry.LAST.clear()
    t0 = time.perf_counter()
    anf_base = (
        anf_estimates(pr_base.select(F.col("a").alias("u"),
                                     F.col("b").alias("v")), rounds=3)
        .groupBy("t")
        .agg(F.count("*").alias("n"), F.sum("est_micro").alias("s"))
        .collect()
    )
    t_base = time.perf_counter() - t0
    base_anf_reg = dict(telemetry.LAST.get("anf", {}))

    anf_big_edges = replicate_edges(pr_base, ("a", "b"), N_PR).select(
        F.col("a").alias("u"), F.col("b").alias("v")
    )
    telemetry.LAST.clear()
    rss0 = rss_mb()
    t0 = time.perf_counter()
    # DISK_ONLY for the same reason as the pagerank leg: the x100
    # replica packs a cluster's whole edge list into one JVM. The
    # broadcast gate is lowered so the replica (2M nodes — exactly ON
    # the default gate) takes the big-graph SHUFFLE plan: that plan's
    # scaling is the thing this leg exists to measure.
    anf_big = (
        anf_estimates(anf_big_edges, rounds=3,
                      broadcast_max_nodes=1_000_000,
                      ckpt_storage=StorageLevel.DISK_ONLY)
        .groupBy("t")
        .agg(F.count("*").alias("n"), F.sum("est_micro").alias("s"))
        .collect()
    )
    t_big = time.perf_counter() - t0
    big_anf_reg = dict(telemetry.LAST.get("anf", {}))
    base_by_t = {r["t"]: r for r in anf_base}
    big_by_t = {r["t"]: r for r in anf_big}
    ratio = round(t_big / max(t_base, 1e-6), 2)
    anf_entry = {
        "base": {
            "sec": round(t_base, 2),
            "nodes": base_by_t[0]["n"],
            "avg_ball_by_t": {
                t: round(r["s"] / (10000.0 * r["n"]), 3)
                for t, r in sorted(base_by_t.items())
            },
            **base_anf_reg,
        },
        "x100": {
            "sec": round(t_big, 2),
            "nodes": big_by_t[0]["n"],
            "avg_ball_by_t": {
                t: round(r["s"] / (10000.0 * r["n"]), 3)
                for t, r in sorted(big_by_t.items())
            },
            **big_anf_reg,
        },
        "ratio": ratio,
        "rss_delta_mb": round(rss_mb() - rss0, 1),
    }
    out["anf"] = anf_entry
    if big_anf_reg.get("regime") != "distributed":
        failures.append(
            f"ANF x100 regime {big_anf_reg} — broadcast gate did not cross"
        )
    if big_by_t[0]["n"] != N_PR * base_by_t[0]["n"]:
        failures.append(
            f"ANF x100 nodes {big_by_t[0]['n']} != "
            f"{N_PR}x base {base_by_t[0]['n']}"
        )
    for t in sorted(base_by_t):
        b_avg = base_by_t[t]["s"] / (10000.0 * base_by_t[t]["n"])
        g_avg = big_by_t[t]["s"] / (10000.0 * big_by_t[t]["n"])
        if abs(g_avg - b_avg) > 0.15 * max(b_avg, 1.0):
            failures.append(
                f"ANF x100 mean ball at t={t} drifted: base {b_avg:.3f} "
                f"vs x100 {g_avg:.3f} — structure-identical replicas "
                "must estimate the same truth"
            )
    if ratio > PR_RATIO_MAX:
        failures.append(f"ANF x100 ratio {ratio} > {PR_RATIO_MAX}")
    if anf_entry["rss_delta_mb"] > RSS_DELTA_MAX_MB:
        failures.append(
            f"ANF driver RSS grew {anf_entry['rss_delta_mb']}MB"
        )

    # ---- incremental near-dup store: fixed delta vs ×100 history -------
    # The E14' viability property (VERDICT r8 task 6): a store batch must
    # cost ~the DELTA, not the history. Store B's at-rest state is the
    # structure-identical ×100 of store A's (100 disjoint tenant replicas:
    # id offset; band_hash salted for replicas 1..99 with a SUFFIX so the
    # _pfx partitioning is preserved while no cross-replica bucket ever
    # collides; replica 0 bit-identical to A). The SAME fixed delta batch
    # is then applied to both stores. Invariants: the suppression outcome
    # is IDENTICAL (salted replicas must be invisible to the delta), and
    # the batch wall grows far sub-linearly vs the ×100 history (the only
    # history-dependent costs are the prefix-pruned band read and the
    # candidate-id sig join — index slices, never text re-shingling).
    import shutil

    from dumpty_spark.operators.dedup import incremental_near_dedup
    from dumpty_spark.sources.parquet import load_table

    scratch = os.path.join(REPO, ".scale", "x100_store")
    shutil.rmtree(scratch, ignore_errors=True)
    store_a = os.path.join(scratch, "a")
    store_b = os.path.join(scratch, "b")
    docs = load_table(spark, SF01, "documents")
    seed = docs.filter(F.col("doc_id") % 10 != 0)
    incremental_near_dedup(spark, seed, store_a)

    reps = F.broadcast(
        spark.range(N_DEDUP).select(
            (F.col("id") * STRIDE).alias("__off"),
            F.col("id").cast("string").alias("__salt"),
        )
    )
    sigs_a = spark.read.parquet(os.path.join(store_a, "sigs"))
    (
        sigs_a.crossJoin(reps)
        .select((F.col("id") + F.col("__off")).alias("id"), "sig")
        .write.mode("overwrite")
        .parquet(os.path.join(store_b, "sigs"))
    )
    bands_a = spark.read.parquet(os.path.join(store_a, "bands"))
    (
        bands_a.crossJoin(reps)
        .select(
            "band_idx",
            F.when(F.col("__salt") == "0", F.col("band_hash"))
            .otherwise(F.concat_ws(":", "band_hash", "__salt"))
            .alias("band_hash"),
            (F.col("id") + F.col("__off")).alias("id"),
            "_pfx",
        )
        .write.mode("overwrite")
        .partitionBy("_pfx")
        .parquet(os.path.join(store_b, "bands"))
    )
    n_hist_a = sigs_a.count()

    # fixed delta: 500 re-seen texts under fresh ids (suppressed against
    # replica-0 history) + the held-out tenth as genuinely new content
    # fresh ids BEYOND every replica's offset range (replicas use
    # k*STRIDE for k < N_DEDUP)
    delta = docs.filter(
        (F.col("doc_id") % 10 == 0) | (F.col("doc_id") < 500)
    ).withColumn("doc_id", F.col("doc_id") + F.lit(1000 * STRIDE))
    delta = delta.localCheckpoint()

    def _run_store(store_dir: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        n_surv = incremental_near_dedup(spark, delta, store_dir).count()
        return time.perf_counter() - t0, n_surv

    rss0 = rss_mb()
    t_a, surv_a = _run_store(store_a)
    t_b, surv_b = _run_store(store_b)
    store_entry = {
        "base": {"sec": round(t_a, 2), "history_sigs": n_hist_a,
                 "survivors": surv_a},
        "x100": {"sec": round(t_b, 2), "history_sigs": N_DEDUP * n_hist_a,
                 "survivors": surv_b},
        "delta_docs": delta.count(),
        "ratio": round(t_b / max(t_a, 1e-6), 2),
        "rss_delta_mb": round(rss_mb() - rss0, 1),
    }
    out["store_delta"] = store_entry
    if surv_a != surv_b:
        failures.append(
            f"store x100: survivors diverged (base {surv_a}, x100 {surv_b})"
            " — salted history replicas leaked into the delta's candidates"
        )
    if store_entry["ratio"] > 10.0:
        failures.append(
            f"store x100: batch ratio {store_entry['ratio']} > 10 for a "
            "100x history — batch cost is tracking history, not the delta"
        )
    if store_entry["rss_delta_mb"] > RSS_DELTA_MAX_MB:
        failures.append(
            f"store driver RSS grew {store_entry['rss_delta_mb']}MB"
        )
    shutil.rmtree(scratch, ignore_errors=True)

    # ---- at-rest MERGE: fixed delta vs ×100 store (r9 verdict task 4) ---
    # The one-job rewrite (sinks/writers.py) is proven at sf0.1 and in the
    # ×10 sweep; this leg promotes it to the ×100 record the near-dup
    # store got in r9. Store B holds 100× store A's rows in 100× the
    # files at the SAME rows-per-file (disjoint key-range replicas, the
    # id-offset scheme), so the SAME fixed change batch hits the same
    # number of files with the same bytes in both. Invariants: Spark job
    # count does NOT grow with store size (O(1) jobs in hit files — the
    # r8 scale-killer was one job per file), the batch wall tracks
    # hit-file bytes (ratio bounded, NOT ~100×), and the mutation
    # outcome is identical.
    from dumpty_spark.sinks.writers import merge_keys, write_range_clustered

    N_MERGE = 100
    ROWS_PER_FILE = 25_000
    BASE_FILES = 8
    scratch = os.path.join(REPO, ".scale", "x100_merge")
    shutil.rmtree(scratch, ignore_errors=True)
    store_a = os.path.join(scratch, "a")
    store_b = os.path.join(scratch, "b")
    n_base_rows = ROWS_PER_FILE * BASE_FILES
    base_rows = spark.range(n_base_rows).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("val")
    )
    write_range_clustered(base_rows, store_a, ["k"], num_files=BASE_FILES)
    reps = F.broadcast(
        spark.range(N_MERGE).select((F.col("id") * STRIDE).alias("__off"))
    )
    big_rows = base_rows.crossJoin(reps).select(
        (F.col("k") + F.col("__off")).alias("k"), "val"
    )
    write_range_clustered(
        big_rows, store_b, ["k"], num_files=BASE_FILES * N_MERGE
    )

    # fixed batch: one delete + one update in each of the base key ranges
    # (replica-0 keys only -> hits the same BASE_FILES files in A and B)
    ks = [i * ROWS_PER_FILE + 17 for i in range(BASE_FILES)]
    changes = spark.createDataFrame(
        [(k, None, "D") for k in ks] + [(k + 1, "upd", "U") for k in ks],
        "k long, val string, op string",
    ).localCheckpoint()

    def _count_jobs(tag: str, fn) -> int:
        sc = spark.sparkContext
        group = f"x100merge-{tag}"
        sc.setJobGroup(group, tag)
        try:
            fn()
        finally:
            sc.setJobGroup("default", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    results: dict[str, dict] = {}
    rss0 = rss_mb()
    for tag, store in (("base", store_a), ("x100", store_b)):
        t0 = time.perf_counter()
        jobs = _count_jobs(tag, lambda: merge_keys(spark, store, "k", changes))
        wall = time.perf_counter() - t0
        results[tag] = {
            "sec": round(wall, 2),
            "jobs": jobs,
            "files": len(
                [
                    p
                    for p in __import__("glob").glob(
                        os.path.join(store, "part-*")
                    )
                    if os.path.isfile(p)
                ]
            ),
        }
    merge_entry = {
        **results,
        "rows_per_file": ROWS_PER_FILE,
        "ratio": round(
            results["x100"]["sec"] / max(results["base"]["sec"], 1e-6), 2
        ),
        "rss_delta_mb": round(rss_mb() - rss0, 1),
    }
    out["merge"] = merge_entry
    # the two runs execute the identical PLAN (same key count, same hit
    # file count) — job count must not grow with store size at all
    if results["x100"]["jobs"] > results["base"]["jobs"]:
        failures.append(
            f"merge x100: job count grew with store size "
            f"({results['base']['jobs']} -> {results['x100']['jobs']}) — "
            "the rewrite is no longer O(1) jobs in hit files"
        )
    # wall tracks hit-file bytes (identical in both runs), not store
    # size: allow file-listing/footer overhead but nothing near 100x
    if merge_entry["ratio"] > 5.0:
        failures.append(
            f"merge x100: wall ratio {merge_entry['ratio']} > 5 for a "
            "100x store with identical hit bytes — cost is tracking "
            "store size, not the delta"
        )
    # identical outcome on both stores
    surv_a = spark.read.parquet(store_a)
    surv_b = spark.read.parquet(store_b).filter(F.col("k") < STRIDE)
    n_a, n_b = surv_a.count(), surv_b.count()
    if n_a != n_base_rows - BASE_FILES or n_b != n_a:
        failures.append(
            f"merge x100: replica-0 survivors diverged "
            f"(base {n_a}, x100 {n_b}, expected {n_base_rows - BASE_FILES})"
        )
    upd_a = surv_a.filter(F.col("val") == "upd").count()
    upd_b = surv_b.filter(F.col("val") == "upd").count()
    if upd_a != BASE_FILES or upd_b != BASE_FILES:
        failures.append(
            f"merge x100: routed updates diverged (base {upd_a}, "
            f"x100 {upd_b}, expected {BASE_FILES})"
        )
    if merge_entry["rss_delta_mb"] > RSS_DELTA_MAX_MB:
        failures.append(
            f"merge driver RSS grew {merge_entry['rss_delta_mb']}MB"
        )
    shutil.rmtree(scratch, ignore_errors=True)

    # ---- mergeable-store READOUT at x100 (r10 verdict task 3) ----------
    out["store_readout"] = store_readout_leg(spark, failures)

    out["pass"] = not failures
    out["failures"] = failures

    bench_path = os.path.join(REPO, "SCALE_BENCH.json")
    doc = json.load(open(bench_path)) if os.path.exists(bench_path) else {}
    doc["x100"] = out
    with open(bench_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0 if not failures else 1


def readout_only() -> int:
    """Run just the readout leg and MERGE it into the existing x100
    record (so the other legs' committed numbers are untouched)."""
    from dumpty_spark.session import get_session

    spark = get_session("dumpty-spark-scale-x100-readout")
    failures: list[str] = []
    entry = store_readout_leg(spark, failures)
    bench_path = os.path.join(REPO, "SCALE_BENCH.json")
    doc = json.load(open(bench_path)) if os.path.exists(bench_path) else {}
    x100 = doc.setdefault("x100", {})
    x100["store_readout"] = entry
    x100["failures"] = [
        f for f in x100.get("failures", []) if "store_readout" not in f
    ] + failures
    x100["pass"] = not x100["failures"]
    with open(bench_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(entry, indent=1))
    print("failures:", failures)
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(readout_only() if "--readout-only" in sys.argv else main())
