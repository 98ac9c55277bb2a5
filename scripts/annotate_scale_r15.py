#!/usr/bin/env python3
"""Post-process the r15 full scale audit into docs/SCALE_FULL_r15.json.

Same protocol as r14 (scale section in a FORKED FRESH JVM for both the
full pass and any tail/quad re-measure; dual medians so a reader can
reconstruct the untouched single-pass view or the min-of-N merged view;
per-cell ratio_full_run / ratio_remeasure preserved). r15 differences:

  - the full pass covers all 383 cells including this round's
    q_bpe_encode / q_pack_sequences_bpe / q_lz4_stats, so there is no
    post-pass wholesale merge (r14's bench_newdec file) at all;
  - the x30 comparison convention advances one round: r14 vs r15
    (scale.r14_comparison).

Usage:
  python3 scripts/annotate_scale_r15.py [bench_full_r15.json] \
      [bench_tail_r15.json] [bench_x30_r15.json] [docs/SCALE_FULL_r15.json]

Tail and quad and x30 files are optional; a missing file is recorded,
never fatal.
"""
import json
import statistics
import sys

BENCH = sys.argv[1] if len(sys.argv) > 1 else "bench_full_r15.json"
TAIL = sys.argv[2] if len(sys.argv) > 2 else "bench_tail_r15.json"
X30_R15 = sys.argv[3] if len(sys.argv) > 3 else "bench_x30_r15.json"
OUT = sys.argv[4] if len(sys.argv) > 4 else "docs/SCALE_FULL_r15.json"
X30_R14 = "bench_x30_r14.json"
QUAD = "bench_quad_r15.json"

# Cost models for cells allowed past 2.5x — each names the declared
# contract or the measured input-growth that explains the wall ratio.
ANNOTATIONS = {
    "q_corr_matrix": (
        "declared O(keys^2) OUTPUT contract: x10 keys emit x100 pairs; "
        "the banded twin (q_corr_pairs_banded) is the scale default, "
        "and since r15 the contract is enforced BY DEFAULT at 20k keys "
        "(Guards.withPairKeyCap) - a 100x caller refuses instead of "
        "sweeping"
    ),
    "q_ngram_jaccard": (
        "declared bounded-corpus exact PPJoin whose candidate volume "
        "saturates with corpus size; the banded twin "
        "(q_ngram_jaccard_banded) is the scale default"
    ),
    "q_tfidf_topterms": (
        "unit of work is DISTINCT (doc,term) rows and the x10 replica's "
        "token jitter grows those 14.1x (116k -> 1.64M) while docs grow "
        "10x - the wall ratio is SUBLINEAR per row (~0.31x/row). "
        "Measured r14: localCheckpoint'ing tf made x10 WORSE (7.0s -> "
        "14.1s); deriving df via a window over t was faster locally but "
        "is a hot-term skew cliff at 100 TB (no partial aggregation). "
        "The groupBy+broadcast shape is the scale-lawful plan; corpus-"
        "level term frequency has the CMS twin (q_heavy_hitters)."
    ),
    "q_percentiles": (
        "declared EXACT per-group percentiles (percentile agg): the "
        "exact merge cost grows with distinct values per group, which "
        "the x10 replica's value jitter multiplies; "
        "q_approx_percentiles (t-digest shape) is the named scale "
        "default and reads ~1x"
    ),
    "q_contribution_delta": (
        "broadcast-to-SMJ transition at the autoBroadcast threshold: at "
        "base the date-filtered orders side broadcasts; at x10 it "
        "crosses into sort-merge, adding one lineitem shuffle - the "
        "intended plan at scale, linear beyond the transition"
    ),
    "q_knn_outliers": (
        "two-level quantizer constant: assignment + in-cell pair volume "
        "engage genuinely at x10 (nlist grows with n); r14 slimmed the "
        "fine-seed window shuffle to 16B rows and broadcast the "
        "centroid table under an exact size gate - x30 constant now "
        "<4x (was 6.5x in r13)"
    ),
    "q_knn_graph": (
        "two-level quantizer constant in composition (edges + rank + "
        "mutual probe): celled stages engage genuinely at x10; x30 "
        "constant 2.4x after the r14 slim-window/broadcast work "
        "(was 9.2x in r13) - sublinear per row"
    ),
    "q_embed_neardup": (
        "declared blocked exact all-pairs sweep over the embeddings "
        "slice (quadratic in VECTORS by contract, guarded by "
        "graft.pairSweep.maxKeys); the celled/banded families are the "
        "scale defaults"
    ),
    "q_containment": (
        "asymmetric containment over df-capped posting lists: candidate "
        "volume grows with posting-list saturation on a 10x corpus "
        "(df cap bounds it; the cap is the declared scale control)"
    ),
    "q_semantic_dedup_trained": (
        "ivfTrain k-means iterations at x10 train on 10x rows with "
        "nlist fixed - per-iteration cost is linear, the constant is "
        "the extra assignment passes; the untrained celled "
        "q_semantic_dedup (same output contract) reads ~1.6x"
    ),
}

GRAPH_FAMILY = [
    "q_knn_classify", "q_knn_graph", "q_knn_outliers", "q_semantic_dedup",
    "q_kmeans_step", "q_intrinsic_dim", "q_bfs_layers", "q_pagerank",
    "q_hits", "q_kcore", "q_label_prop", "q_triangle_count",
    "q_degree_hist", "q_assortativity", "q_common_neighbors",
    "q_resource_alloc",
]


def main():
    d = json.load(open(BENCH))
    scale = d["scale"]
    assert scale.get("forked", False), (
        "r15 protocol expects the scale section from a forked fresh JVM; "
        "got an in-process fallback - rerun or document the fallback"
    )
    qs = scale["queries"]
    full_ratios = {k: v["ratio"] for k, v in qs.items()
                   if isinstance(v, dict) and v.get("ratio", -1) > 0}
    med_full = statistics.median(full_ratios.values())
    # ---- same-protocol merges (min-of-N across runs) ----
    remeasured = []

    def merge(path, replace_timeouts=False):
        try:
            extra = json.load(open(path))
        except FileNotFoundError:
            return
        escale = extra["scale"]
        assert escale.get("forked", False), f"{path} was not forked"
        for k, tv in escale["queries"].items():
            if not (isinstance(tv, dict) and tv.get("ratio", -1) > 0):
                continue
            fv = qs.get(k)
            if not isinstance(fv, dict):
                continue
            if replace_timeouts and "timed_out_after_sec" in fv:
                # the full pass never produced a number for this cell:
                # take the dedicated run's wholesale, disclosed
                fv["timed_out_in_full_run_after_sec"] = fv.pop("timed_out_after_sec")
                fv.update({kk: tv[kk] for kk in
                           ("base", "scaled", "ratio", "reps", "gc_ms") if kk in tv})
                remeasured.append(k)
                continue
            fv["ratio_full_run"] = fv.get("ratio")
            fv["ratio_remeasure"] = tv["ratio"]
            fv["reps_remeasure"] = tv.get("reps", [])
            fv["remeasured"] = True
            if fv.get("ratio", 1e9) > tv["ratio"]:
                fv["ratio"] = tv["ratio"]
                fv["scaled"] = tv["scaled"]
                fv["base_remeasure"] = tv["base"]
            remeasured.append(k)

    merge(TAIL)
    merge(QUAD, replace_timeouts=True)
    # queries that LANDED AFTER the full pass (r15: q_bpe_train):
    # their cells come wholesale from a dedicated same-protocol run,
    # flagged so the provenance is readable (the r14 convention)
    try:
        extra = json.load(open("bench_new_r15.json"))
        escale = extra["scale"]
        assert escale.get("forked", False)
        for k, tv in escale["queries"].items():
            if k not in qs and isinstance(tv, dict) and tv.get("ratio", -1) > 0:
                tv = dict(tv)
                tv["post_full_pass"] = True
                qs[k] = tv
    except FileNotFoundError:
        pass
    ratios = {k: v["ratio"] for k, v in qs.items()
              if isinstance(v, dict) and v.get("ratio", -1) > 0}
    med = statistics.median(ratios.values())
    over = sorted([k for k, r in ratios.items() if r > 2.5])
    scale["median_ratio"] = round(med, 4)
    scale["median_ratio_full_run"] = round(med_full, 4)
    scale["remeasured_tail"] = sorted(remeasured)
    scale["cells"] = len(qs)
    scale["over_2p5"] = len(over)
    scale["over_2p5_cells"] = over
    scale["annotations"] = {
        k: {"ratio": ratios.get(k), "model": ANNOTATIONS[k]}
        for k in over if k in ANNOTATIONS
    }
    # q_corr_matrix may carry a timeout instead of a ratio at the
    # default quad slice: keep its declared model visible either way
    if "q_corr_matrix" in qs and "q_corr_matrix" not in scale["annotations"]:
        scale["annotations"]["q_corr_matrix"] = {
            "ratio": qs["q_corr_matrix"].get("ratio"),
            "model": ANNOTATIONS["q_corr_matrix"],
        }
    unexplained = [k for k in over if k not in ANNOTATIONS]
    scale["unannotated_over_2p5"] = unexplained
    scale["protocol_note"] = (
        "r15: same forked-fresh-JVM protocol as r14 for every pass "
        "(full 383-cell run + optional min-of-N tail/quad re-measures, "
        "all disclosed per cell as ratio_full_run/ratio_remeasure). "
        "q_bpe_encode / q_pack_sequences_bpe / q_lz4_stats are in the "
        "full pass; q_bpe_train landed after it and its cell comes "
        "wholesale from a dedicated same-protocol run, flagged "
        "post_full_pass (the r14 convention). Both medians embedded; "
        "min-of-N per cell is the merge rule."
    )
    # r14/r15 x30 comparison for the graph family
    try:
        x14 = json.load(open(X30_R14))["scale"]["queries"]
        x15 = json.load(open(X30_R15))["scale"]["queries"]
        comp = {}
        for k in GRAPH_FAMILY:
            a, b = x14.get(k), x15.get(k)
            if a and b and a.get("ratio", -1) > 0 and b.get("ratio", -1) > 0:
                comp[k] = {
                    "r14_x30_ratio": a["ratio"], "r15_x30_ratio": b["ratio"],
                    "r14_x30_scaled_sec": a["scaled"],
                    "r15_x30_scaled_sec": b["scaled"],
                }
        scale["r14_comparison"] = {
            "note": (
                "x30 graph-family constants, r14 vs r15: no quantizer "
                "changes this round beyond the ADVICE dim-derivation "
                "fix, so the cells should track r14 within noise"
            ),
            "cells": comp,
        }
    except FileNotFoundError as e:
        scale["r14_comparison"] = {"note": f"unavailable: {e}"}
    json.dump(d, open(OUT, "w"), indent=1)
    print(f"cells={len(qs)} median_merged={med:.4f} "
          f"median_full_run={med_full:.4f} over_2p5={len(over)}: {over}")
    if unexplained:
        print(f"UNANNOTATED >2.5x cells (need cost models): {unexplained}")


if __name__ == "__main__":
    main()
