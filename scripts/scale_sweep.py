#!/usr/bin/env python
"""×10 scale sweep — measure the 100×-scale claims instead of asserting
them (VERDICT r2, task 1).

Runs the heaviest registered queries at sf0.1 AND at the deterministic
×10 replication (``scripts/make_scale_fixtures.py`` →
``.scale/sf1``), in one session, and records per-query:

- wall time at both SFs and the ratio,
- the execution regime the two-regime iterative operators actually took
  (``operators/telemetry.py`` — the CC gate MUST cross onto the
  distributed path on the replicated corpus),
- per-stage task counts from the job-group status tracker (the
  AQE-coalescing class of failure: a CPU-heavy shuffle coalesced to a
  handful of tasks because its byte size is small),
- driver RSS before/after (the driver-memory-growth claim).

Work models per query (``model`` field):
- ``linear``: work grows ~with input rows → HARD ASSERT ratio ≤ LINEAR_MAX.
- ``pairs``: candidate-pair generators over a corpus whose every near-dup
  cluster is 10× bigger by construction — within-cluster pairs grow
  ~quadratically with cluster size, so ratios well above 10× are the
  *data's* doing, not the plan's. Recorded, not asserted. (At a real
  100 TB this regime means "your corpus is 10× more duplicated", which
  genuinely costs more; the per-pair cost stays flat.)
- ``topk``: ANN search where BOTH the query set and the base grow 10× →
  candidate work ~100× by contract (still pruned by banding/nprobe).
  Recorded, not asserted.

q_ann_recall_check is deliberately excluded: it runs the brute-force
O(n_q·n_base) oracle BY CONTRACT to score recall — a 100× blowup that
measures the oracle, not the engine's scale path (which IS measured, via
q_ann_ivf_topk / q_ann_lsh_topk).

Writes SCALE_BENCH.json at the repo root (committed per round).
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".scale", "sf1")
LINEAR_MAX = 18.0  # 10x data; <=1.8x/SF-decade slack for fixed overheads


def merge_write(out: dict, bench_path: str) -> None:
    """Read-modify-write SCALE_BENCH.json: scale_x100.py owns foreign
    top-level keys (e.g. "x100") in the same artifact — preserve them,
    never clobber (the round-4 ×100 record was silently dropped by a
    sweep refresh; VERDICT r4, What's wrong #2)."""
    doc = json.load(open(bench_path)) if os.path.exists(bench_path) else {}
    out.update({k: v for k, v in doc.items() if k not in out})
    with open(bench_path, "w") as fh:
        fh.write(json.dumps(out, indent=1) + "\n")

# (query, model) — the heaviest registry queries per round, classified
HEAVY = [
    ("q_pagerank_parts", "linear"),
    ("q_triangle_count", "linear"),
    ("q_bucketed_join", "linear"),
    ("q_salted_join", "linear"),
    ("q_bigram_lm", "linear"),
    ("q_canonical_docs", "pairs"),
    ("q_dedup_clusters", "pairs"),
    ("q_minhash_lsh_pairs", "pairs"),
    ("q_simhash_pairs", "pairs"),
    ("q_ngram_jaccard_pairs", "pairs"),
    ("q_fuzzy_match", "pairs"),
    ("q_ann_ivf_topk", "topk"),
    ("q_ann_lsh_topk", "topk"),
    ("q_ann_pq_topk", "topk"),
    ("q_component_store_batches", "pairs"),
    # round-3 additions: the quantile store and BPE are vocab-/sketch-
    # bounded per design (linear scan + fixed-size state); containment
    # shares the jaccard pair regime (x10 replication makes every
    # near-dup cluster 10x bigger -> cross-copy pairs are the data's
    # quadratic, not the plan's); kcore peels 10 disjoint copies
    ("q_quantile_store_batches", "linear"),
    ("q_bpe_merges", "linear"),
    ("q_bpe_encode_stats", "linear"),
    ("q_containment_pairs", "pairs"),
    ("q_kcore_parts", "linear"),
    # round-3 second batch: the prefix filter shares the jaccard pair
    # regime (x10 replication multiplies cross-copy near-dup pairs);
    # the bootstrap is a linear scan x fixed B=32 explode; the epoch
    # shuffle is one sort-shuffle permutation pass
    ("q_prefix_filter_pairs", "pairs"),
    ("q_bootstrap_ci", "linear"),
    ("q_epoch_shuffle", "linear"),
    # round-4 additions: the new pair-model and corpus-scan queries
    ("q_edit_distance_pairs", "pairs"),
    ("q_weighted_jaccard", "pairs"),
    ("q_dedup_report", "pairs"),
    ("q_source_overlap_matrix", "pairs"),
    ("q_ngram_novelty", "pairs"),
    ("q_temperature_mix", "linear"),
    ("q_heaps_fit", "linear"),
    # round-5 additions: BFS and LPA share the (shared-artifact) pair
    # graph and are edge-linear per hop/round; sliding distinct is one
    # (user, hour) dedup + calendar-sized state; the merkle locator is
    # two digest scans + range-bounded row work; the RAKE rollups are
    # vocabulary-/phrase-keyed
    ("q_bfs_reachability", "linear"),
    ("q_label_propagation", "linear"),
    ("q_sliding_distinct", "linear"),
    ("q_merkle_diff", "linear"),
    ("q_rake_keywords", "linear"),
    # round-6 additions (VERDICT r5 task 7): the cluster cap runs CC
    # over the Jaccard pair graph (regime-gated, pair-model data); the
    # time-travel query does real store I/O (two snapshot writes + CDC
    # full-outer) — the kind that bends non-linearly if the store's
    # file sizing or the diff join degrades; the delete/upsert audit is
    # store I/O with a driver-sized key list (linear in table size)
    ("q_cluster_cap_dedup", "pairs"),
    ("q_manifest_time_travel", "linear"),
    ("q_delete_upsert_audit", "linear"),
    # E132 shares the triangle family's compact-forward bound: wedge
    # fanout O(sqrt m) per node, edge-linear join work
    ("q_clustering_coefficient", "linear"),
    # E137/E138: PPR is one rank-vector shuffle per round (edge-linear,
    # shares the session pair graph); Adamic-Adar's wedge fanout is
    # bounded by the hub cap (<= 64 adj rows per center), so the
    # self-join grows linearly in edges — the cap is exactly what the
    # x10 sweep is here to prove
    ("q_personalized_pagerank", "linear"),
    ("q_adamic_adar", "linear"),
    # E149 does real store I/O (4 delta-batch writes + a pruned history
    # re-join) — the store family's bend-detection case, like E125/E131
    ("q_join_view_store", "linear"),
    # round-7 additions (VERDICT r6 task 7): association rules is
    # pair-model data (map-side C(k,2) fanout per basket after the r7
    # re-plan — the sweep proves the self-join removal holds at x10);
    # quantile normalize is exactly the distinct-value-growth query the
    # linear caps exist to catch (the banded join must stay
    # D_src + D_global, not D_src x D_global)
    ("q_association_rules", "pairs"),
    ("q_quantile_normalize", "linear"),
    # E162/E163 (r7 promotions): sketch-store I/O is linear in batch
    # size (band reads prefix-pruned); compaction is one read + one
    # sized write
    ("q_incremental_neardedup_store", "pairs"),
    ("q_compaction_audit", "linear"),
    # r7 batch heavyweights: the sweep proves each new plan's scaling
    # claim — sweep-line is one sort shuffle (linear), chunk dedup one
    # chunk-hash shuffle (linear), IRLS 4 moment scans (linear), the MG
    # store counters-sized I/O (linear), bitmap distinct word-partials
    # (linear), coverage selection K anti-join scans (linear)
    ("q_peak_concurrency", "linear"),
    ("q_chunk_dedup", "linear"),
    ("q_logistic_irls", "linear"),
    ("q_mg_topk_store", "linear"),
    ("q_bitmap_distinct", "linear"),
    ("q_coverage_selection", "linear"),
    # late-r7 batch: TextTiling is (doc, block, term) rollups + one
    # adjacent-block equi-join (linear); the Luhn scan and nDCG eval
    # are single corpus scans; schema evolution is store I/O
    ("q_text_tiling", "linear"),
    ("q_luhn_scan", "linear"),
    ("q_ndcg_eval", "linear"),
    ("q_schema_evolution", "linear"),
    # E185-E187: the closure's pair count is nodes x avg-depth (depth
    # grows only logarithmically under replication); template dedup is
    # one scan + one shuffle; the nested round trip is store I/O
    ("q_bom_rollup", "linear"),
    ("q_template_dedup", "linear"),
    ("q_nested_roundtrip", "linear"),
    # round-8 additions (VERDICT r7 task 7): item-kNN is map-side
    # C(k,2) pair fanout per basket (the E176/E22 shape — pair-model
    # data since x10 replication multiplies co-occurrence); negative
    # sampling is one hash-ranked scan per (query, stratum); LTTB/LTOB
    # is one LAG/LEAD window per series bucket
    ("q_item_knn", "pairs"),
    ("q_negative_sampling", "linear"),
    ("q_lttb_downsample", "linear"),
    # late-r8 batch: the boilerplate census is a positional explode +
    # two stacked partial-agg shuffles (linear in corpus tokens); the
    # text-lines source is one write + one read-back scan (linear store
    # I/O); JW linkage is blocked-pair work — x10 replication grows
    # every block 10x, so within-block pairs are the data's quadratic
    # (pair model), while per-pair kernel cost stays flat; Holt-Winters
    # folds per-series day arrays (series count fixed, days fixed —
    # only the daily counts grow: linear); ANF is t rounds of one
    # edge-linear join + bit_or groupBy over the shared pair graph
    ("q_boilerplate_ngrams", "linear"),
    ("q_textlines_ingest", "linear"),
    ("q_jaro_winkler_match", "pairs"),
    ("q_holt_winters", "linear"),
    ("q_neighborhood_function", "linear"),
    # late-r8 batches 9-13: Good-Turing and source-KL are stacked
    # partial-agg scans (linear in tokens); the threshold curve filters
    # one pair frame three ways + CC (pair-model data); split finder is
    # one binning scan + 64-row metadata; prefixspan is map-side capped
    # C(24,3) per user (linear in users); shard rebalance evaluates 33
    # md5s per key (linear); merge/binaryfile/format-parity are store
    # I/O passes. q_hubness_audit is EXCLUDED like q_ann_recall_check:
    # it runs a bounded quadratic slice BY CONTRACT (the slice, not the
    # corpus, sets its cost).
    ("q_good_turing", "linear"),
    ("q_source_kl_divergence", "linear"),
    ("q_dedup_threshold_curve", "pairs"),
    ("q_split_finder", "linear"),
    ("q_prefixspan_triples", "linear"),
    ("q_shard_rebalance", "linear"),
    ("q_merge_audit", "linear"),
    ("q_binaryfile_ingest", "linear"),
    ("q_format_parity", "linear"),
    # batch 15: watermark profile is one per-type window pass + rollup
    # (linear); balanced resample two partial-agg scans (linear);
    # layout depth is store I/O + footer metadata (linear)
    ("q_watermark_profile", "linear"),
    ("q_balanced_resample", "linear"),
    ("q_layout_depth_audit", "linear"),
    # batch 16: two partial-agg scans (sketch answers, then exact rank
    # intervals) — linear in rows, sketch state fixed by accuracy
    ("q_quantile_accuracy_ladder", "linear"),
    # round-9 additions (VERDICT r8 task 4): grid DBSCAN's neighbor-pair
    # join is bounded by the FIXED grid extent (cells x 9 neighbors),
    # so x10 points = x10 per-cell mass, work linear; modularity replays
    # the 4 LPA rounds + one edge-side join (edge-linear); HITS is 4
    # half-steps of one edge join + partial agg each (edge-linear);
    # frequent triples is map-side C(cap,3) per user with a fixed
    # per-user cap (linear in users); the at-rest ANN prune audit builds
    # both indexes over the full corpus (linear store I/O) and searches
    # with a FIXED query set (candidates grow with corpus, linearly);
    # the composed-retrieval audit's mutual-NN half is slice-bounded by
    # _MNN_MAX_ID while its IVF build + MMR pool search grow with the
    # corpus (linear)
    ("q_grid_dbscan", "linear"),
    ("q_modularity_score", "linear"),
    ("q_hits_scores", "linear"),
    ("q_frequent_triples", "linear"),
    ("q_ann_index_prune_audit", "linear"),
    ("q_ann_composed_retrieval", "linear"),
    # round-10 additions (VERDICT r9 task 5): the hubness-over-ANN
    # composition runs per-vector LSH top-1 over the full corpus (bucket
    # joins — linear in vectors at fixed bucket geometry) then a
    # histogram rollup; Cohen's kappa is one corpus scan to a 2x2
    # integer contingency (linear, 1-row result)
    ("q_hubness_ann_composed", "linear"),
    ("q_cohens_kappa", "linear"),
    # E232-E235 (r10): isotonic is one binning scan + a bins-cubed (10
    # bins) metadata fit; ANOVA/alpha are single partial-agg scans to
    # 1-row integer contingencies; ROUGE is the BLEU pair machinery
    # (fixed 200-pair fixture -> the corpus scan dominates: linear)
    ("q_isotonic_calibration", "linear"),
    ("q_anova_oneway", "linear"),
    ("q_krippendorff_alpha", "linear"),
    ("q_rouge_pairs", "linear"),
    # E236-E237 (r10 batch 2): one users-sized window pass to spells,
    # then the survival statistics live on the day-span-bounded
    # death-time table (the densified risk theta join is bounded² on
    # that same table — metadata work at any corpus scale)
    ("q_nelson_aalen", "linear"),
    ("q_logrank_test", "linear"),
    # E238: person-period explode is spells x mean-duration rows
    # (linear); each Newton step one nine-moment partial-agg scan
    ("q_discrete_hazard_regression", "linear"),
    # E239: two partial-agg rollups + a values-sized rank frame joined
    # broadcast — linear in rows, metadata-sized statistics
    ("q_kruskal_wallis", "linear"),
    # E240: k fixed sources x H bounded levels, each level one
    # frontier-join + partial-agg — edge-linear per source
    ("q_betweenness_approx", "linear"),
    # E241: 12 fixed partial-agg moment scans (OLS init + 10 Newton
    # steps + final loss pass) — linear, no shuffle of rows
    ("q_quantile_regression", "linear"),
    # E244: one per-day partial agg + days-sized OLS/LAG frame — linear
    ("q_durbin_watson", "linear"),
    # E242/E243: one rater-label scan each (same shape as kappa/alpha),
    # closed forms of a handful of BIGINTs — linear
    ("q_mcnemar_test", "linear"),
    ("q_cochrans_q", "linear"),
    # E245-E247: diagnostics — one grouped-median pass + exact-integer
    # moment scans / one 4-moment scan / one per-day count rollup
    ("q_levene_brown_forsythe", "linear"),
    ("q_jarque_bera", "linear"),
    ("q_poisson_dispersion", "linear"),
    # E248-E250: one per-day rollup each, then days-sized windows/
    # moments/pair-joins — linear in events
    ("q_seasonal_decompose", "linear"),
    ("q_granger_lag1", "linear"),
    ("q_mann_kendall", "linear"),
]
# queries whose heavy shuffle must NOT be AQE-coalesced below core count
TASK_GUARDED = {"q_triangle_count", "q_pagerank_parts", "q_bigram_lm"}
# queries that drive connected_components and must cross the CC gate at x10
CC_GATED = {"q_dedup_clusters", "q_canonical_docs", "q_cluster_cap_dedup"}


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def run_one(spark, name: str, sf_dir: str) -> dict:
    from dumpty_spark.operators import telemetry
    from dumpty_spark.queries import REGISTRY

    sc = spark.sparkContext
    telemetry.LAST.clear()
    group = f"sweep-{name}-{os.path.basename(sf_dir)}"
    sc.setJobGroup(group, name, False)
    t0 = time.perf_counter()
    try:
        n_rows = len(REGISTRY[name].fn(spark, sf_dir).collect())
    finally:
        sc.setJobGroup(None, None, False)
    elapsed = time.perf_counter() - t0
    tracker = sc.statusTracker()
    stage_tasks: list[int] = []
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                stage_tasks.append(sinfo.numTasks)
    spark.catalog.clearCache()
    return {
        "sec": round(elapsed, 2),
        "rows": n_rows,
        "max_stage_tasks": max(stage_tasks, default=0),
        "n_stages": len(stage_tasks),
        "regimes": {k: dict(v) for k, v in telemetry.LAST.items()},
    }


def run_pipeline_bench(sf_dir: str) -> dict:
    """Ingestion loop at ×10 via the committed bench script; the sf0.1
    PIPELINE_BENCH.json artifact is saved/restored around the run."""
    art = os.path.join(REPO, "PIPELINE_BENCH.json")
    saved = open(art).read() if os.path.exists(art) else None
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "bench_pipeline.py")],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        out = json.loads(line)
        out["returncode"] = proc.returncode
        return out
    finally:
        if saved is not None:
            with open(art, "w") as fh:
                fh.write(saved)


def main() -> int:
    from dumpty_spark.session import get_session
    from scripts.make_scale_fixtures import build

    # --only a,b,c : run a subset and MERGE its entries into the
    # committed artifact (late sweep-list joiners get committed entries
    # without re-running the whole 100-query session)
    only: set[str] | None = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        unknown = only - {n for n, _ in HEAVY}
        if unknown:
            print(f"--only names not in sweep list: {sorted(unknown)}")
            return 2
    heavy = [(n, m) for n, m in HEAVY if only is None or n in only]

    build(SF01, SF1, 10)
    spark = get_session("dumpty-spark-scale-sweep")
    cores = spark.sparkContext.defaultParallelism

    # warmup (JIT + python workers) so sf0.1 numbers aren't startup-biased
    from dumpty_spark.queries import REGISTRY
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        REGISTRY["q01_pricing_summary"].fn(spark, warm_dir).collect()

    rss0 = rss_mb()
    results: dict[str, dict] = {}
    failures: list[str] = []
    for name, model in heavy:
        r01 = run_one(spark, name, SF01)
        rss_before = rss_mb()
        r1 = run_one(spark, name, SF1)
        ratio = round(r1["sec"] / max(r01["sec"], 1e-6), 2)
        entry = {
            "model": model,
            "sf01": r01,
            "sf1": r1,
            "ratio": ratio,
            "rss_mb_before_sf1": round(rss_before, 1),
            "rss_mb_after_sf1": round(rss_mb(), 1),
        }
        if model == "linear" and ratio > LINEAR_MAX:
            crossed = {
                op
                for op in set(r01["regimes"]) | set(r1["regimes"])
                if r01["regimes"].get(op, {}).get("regime")
                != r1["regimes"].get(op, {}).get("regime")
            }
            if crossed:
                # the two-regime gate legitimately crossed between the
                # SFs (driver at sf0.1, distributed at x10): the raw
                # ratio compares a numpy loop against the cluster loop
                # and says nothing about the DISTRIBUTED path's scaling
                # — which is what the linear cap is for. Re-measure both
                # SFs with SPARK_GRAFT_FORCE_DISTRIBUTED=1 so the ratio
                # is within-regime; the gate crossing itself is already
                # the recorded (and desired) behavior.
                os.environ["SPARK_GRAFT_FORCE_DISTRIBUTED"] = "1"
                try:
                    r01w = run_one(spark, name, SF01)
                    r1w = run_one(spark, name, SF1)
                finally:
                    os.environ.pop("SPARK_GRAFT_FORCE_DISTRIBUTED", None)
                ratio_w = round(r1w["sec"] / max(r01w["sec"], 1e-6), 2)
                entry["within_regime"] = {
                    "crossed": sorted(crossed),
                    "sf01": r01w,
                    "sf1": r1w,
                    "ratio": ratio_w,
                }
                if ratio_w > LINEAR_MAX:
                    # same one-retry discipline as the non-crossed branch
                    # (ADVICE r6): a single forced-distributed pair can be
                    # a one-off scheduler/IO blip just above LINEAR_MAX —
                    # re-measure once and let the flag stand only if the
                    # retry's ratio also exceeds.
                    os.environ["SPARK_GRAFT_FORCE_DISTRIBUTED"] = "1"
                    try:
                        r01wb = run_one(spark, name, SF01)
                        r1wb = run_one(spark, name, SF1)
                    finally:
                        os.environ.pop("SPARK_GRAFT_FORCE_DISTRIBUTED", None)
                    ratio_wb = round(r1wb["sec"] / max(r01wb["sec"], 1e-6), 2)
                    entry["within_regime"]["retry"] = {
                        "sf01": r01wb, "sf1": r1wb, "ratio": ratio_wb,
                    }
                    if ratio_wb > LINEAR_MAX:
                        failures.append(
                            f"{name}: within-regime ratio {ratio_w} > "
                            f"{LINEAR_MAX} (raw {ratio} crossed "
                            f"{sorted(crossed)}; retry {ratio_wb} — stands)"
                        )
                    else:
                        print(
                            f"cleared {name}: within-regime ratio {ratio_w} "
                            f"was ambient (retry {ratio_wb} <= {LINEAR_MAX})",
                            file=sys.stderr,
                        )
                else:
                    print(
                        f"cleared {name}: raw ratio {ratio} straddled the "
                        f"{sorted(crossed)} regime gate; within-regime "
                        f"ratio {ratio_w} <= {LINEAR_MAX}",
                        file=sys.stderr,
                    )
            else:
                # self-clearing retry (same discipline as bench.py's
                # adjudicate_flags): scheduler/IO luck can push a single
                # measurement a few percent over the cap — re-measure
                # both SFs once and let the flag stand only if the
                # retry's ratio also exceeds. Both measurements recorded.
                r01b = run_one(spark, name, SF01)
                r1b = run_one(spark, name, SF1)
                ratio_retry = round(r1b["sec"] / max(r01b["sec"], 1e-6), 2)
                entry["retry"] = {"sf01": r01b, "sf1": r1b, "ratio": ratio_retry}
                if ratio_retry > LINEAR_MAX:
                    failures.append(
                        f"{name}: linear-model ratio {ratio} > {LINEAR_MAX} "
                        f"(retry {ratio_retry} — stands)"
                    )
                else:
                    print(
                        f"cleared {name}: ratio {ratio} was ambient "
                        f"(retry {ratio_retry} <= {LINEAR_MAX})",
                        file=sys.stderr,
                    )
        if name in TASK_GUARDED and r1["max_stage_tasks"] < cores:
            failures.append(
                f"{name}: max post-shuffle stage tasks {r1['max_stage_tasks']}"
                f" < cores {cores} (AQE-coalescing class)"
            )
        if name in CC_GATED:
            reg = r1["regimes"].get("connected_components", {})
            if reg.get("regime") != "distributed":
                failures.append(
                    f"{name}: CC took regime {reg} at x10 — gate did not cross"
                )
        results[name] = entry
        print(f"{name:24s} {model:7s} {r01['sec']:7.2f}s -> {r1['sec']:7.2f}s "
              f"(x{ratio})  tasks_max={r1['max_stage_tasks']} "
              f"regimes={r1['regimes']}", file=sys.stderr)

    if only is not None:
        # merge the subset into the committed artifact: overlay entries,
        # keep everything else (incl. the full run's pipeline leg)
        bench_path = os.path.join(REPO, "SCALE_BENCH.json")
        doc = json.load(open(bench_path)) if os.path.exists(bench_path) else {}
        doc.setdefault("queries", {}).update(results)
        doc["failures"] = [
            f for f in doc.get("failures", [])
            if not any(f.startswith(n + ":") for n in only)
        ] + failures
        doc["pass"] = not doc["failures"]
        with open(bench_path, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(json.dumps({
            "metric": "scale_sweep_x10_subset",
            "only": sorted(only),
            "pass": not failures,
            "failures": failures,
        }))
        return 0 if not failures else 1

    pipeline = run_pipeline_bench(SF1)
    print(f"pipeline x10: {pipeline.get('value')} rows/s "
          f"({pipeline.get('wall_sec')}s, rc={pipeline.get('returncode')})",
          file=sys.stderr)
    if pipeline.get("returncode") != 0:
        failures.append("pipeline bench at x10 returned nonzero")

    out = {
        "metric": "scale_sweep_x10",
        "sf_base": SF01,
        "sf_x10": SF1,
        "cores": cores,
        "linear_max_ratio": LINEAR_MAX,
        "queries": results,
        "pipeline_x10": pipeline,
        "rss_mb_start": round(rss0, 1),
        "rss_mb_end": round(rss_mb(), 1),
        "excluded": {
            "q_ann_recall_check": "brute-force O(n_q*n_base) oracle by contract"
        },
        "failures": failures,
        "pass": not failures,
    }
    merge_write(out, os.path.join(REPO, "SCALE_BENCH.json"))
    print(json.dumps({k: out[k] for k in ("metric", "pass", "failures")}))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
