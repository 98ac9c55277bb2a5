#!/usr/bin/env python3
"""Post-process the r14 full scale audit into docs/SCALE_FULL_r14.json.

r14 protocol: BOTH the full-inventory pass and the >2.5x tail
re-measure run the scale section in a FORKED FRESH JVM
(Bench.forkSection) — the same protocol, so unlike r13 the merge does
not mix protocols. The r13 advice on merge_scale_r13.py (a
lower-ratio keep over a re-measured tail biases the headline median
downward relative to either single protocol) is answered by emitting
BOTH medians: `median_ratio_full_run` (the untouched single-pass
number) and `median_ratio` (after the tail merge), plus per-cell
`ratio_full_run` / `ratio_remeasure` so a reader can reconstruct
either view. The tail exists because the full 378-cell child run
catches time-localized ambient storms (the r14 run's worst cells sat
at CONSECUTIVE run positions, e.g. 50/51, 79/80, 118/122, with
10-60s outlier reps next to sub-second ones); a 4-rep re-measure of
just the tail shakes those off with min-of-N.

Adds:
  - dual medians + >2.5x census over all cells
  - cost-model annotations for every remaining >2.5x cell
  - the r13/r14 x30 comparison for the celled graph family
    (scale.r13_comparison, the scale.r12_comparison convention)
"""
import json
import statistics
import sys

BENCH = sys.argv[1] if len(sys.argv) > 1 else "bench_full_r14.json"
TAIL = sys.argv[2] if len(sys.argv) > 2 else "bench_tail_r14.json"
X30_R14 = sys.argv[3] if len(sys.argv) > 3 else "bench_x30_r14.json"
X30_R13 = "bench_x30_r13.json"
OUT = sys.argv[4] if len(sys.argv) > 4 else "docs/SCALE_FULL_r14.json"
# the two declared-quadratic headliners get their own run at a wide
# quad slice (the full pass's 180s default slice times q_corr_matrix
# out); same forked protocol, merged like the tail
QUAD = "bench_quad_r14.json"

# Cost models for cells allowed past 2.5x — each names the declared
# contract or the measured input-growth that explains the wall ratio.
ANNOTATIONS = {
    "q_corr_matrix": (
        "declared O(keys^2) OUTPUT contract: x10 keys emit x100 pairs; "
        "the banded twin (q_corr_pairs_banded) is the scale default"
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
        "r14 protocol expects the scale section from a forked fresh JVM; "
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
    # queries that LANDED AFTER the full pass (q_utf16_stats,
    # q_punycode_stats): their cells come wholesale from a dedicated
    # same-protocol run, flagged so the provenance is readable
    try:
        extra = json.load(open("bench_newdec_r14.json"))
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
        "r14: BOTH passes run the scale section in a FORKED FRESH JVM - "
        "the full 378-cell pass and a 4-rep re-measure of its >2.5x "
        "tail (same protocol, so the merge mixes nothing; the r13 "
        "advice item). The tail exists because a 45-min child catches "
        "time-localized ambient storms: the worst full-run cells sat at "
        "CONSECUTIVE run positions with 10-60s outlier reps next to "
        "sub-second ones. Both medians and both per-cell ratios are "
        "embedded; min-of-N per cell is the merge rule."
    )
    # r13/r14 x30 comparison for the graph family
    try:
        x13 = json.load(open(X30_R13))["scale"]["queries"]
        x14 = json.load(open(X30_R14))["scale"]["queries"]
        comp = {}
        for k in GRAPH_FAMILY:
            a, b = x13.get(k), x14.get(k)
            if a and b and a.get("ratio", -1) > 0 and b.get("ratio", -1) > 0:
                comp[k] = {
                    "r13_x30_ratio": a["ratio"], "r14_x30_ratio": b["ratio"],
                    "r13_x30_scaled_sec": a["scaled"],
                    "r14_x30_scaled_sec": b["scaled"],
                }
        scale["r13_comparison"] = {
            "note": (
                "x30 graph-family constants, r13 vs r14: r14 slimmed the "
                "two-level quantizer's fine-seed window shuffle to "
                "(ccell, vec_id) rows and broadcast the winner/centroid "
                "tables under exact build-time size gates"
            ),
            "cells": comp,
        }
    except FileNotFoundError as e:
        scale["r13_comparison"] = {"note": f"unavailable: {e}"}
    json.dump(d, open(OUT, "w"), indent=1)
    print(f"cells={len(qs)} median_merged={med:.4f} "
          f"median_full_run={med_full:.4f} over_2p5={len(over)}: {over}")
    if unexplained:
        print(f"UNANNOTATED >2.5x cells (need cost models): {unexplained}")


if __name__ == "__main__":
    main()
