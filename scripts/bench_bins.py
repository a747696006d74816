"""Bin-count sweep: the "one remaining 2x lever", measured.

BENCHMARKS.md names nthresholds reduction as the remaining lever on the
VPU-floor histogram one-hot build (the kernel cost is linear in the bin
count), "at a documented quality trade" — this script produces that
document (r3 verdict weak #5 / next #3):

  * TIMING: LambdaMART s/tree at MSLR scale (19k queries / ~2.2M docs /
    136 feats / 16 leaves) for nthresholds in {63, 127, 255} x growth in
    {level, best, bestk};
  * QUALITY: 100-tree train/valid NDCG@10 on the LEARNABLE synthetic
    fixture (2k queries) for the same grid — what a user gives up by
    quantizing harder.

Burn-in learn first (CLAUDE.md first-timed-loop gotcha).  Results merge
into docs/sweeps/<date>-bins.json; the recommendation goes to
BENCHMARKS.md.  Reference semantics match mart.cc:136-170's nthresholds
cap (0/255 default behavior documented in learning/mart.py).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bins.py
Env:   QRTPU_BINS_TREES (16 timing trees), QRTPU_BINS_QUERIES (19000),
       QRTPU_BINS_QTREES (100 quality trees), QRTPU_BINS_QQUERIES (2000),
       QRTPU_BINS_GROWERS ("level,best,bestk"),
       QRTPU_BINS_SET ("63,127,255"), QRTPU_BINS_SKIP_QUALITY=1
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/qrtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _timing_dataset
    from quickrank_tpu.data.synthetic import make_train_valid_test
    from quickrank_tpu.learning.lambdamart import LambdaMart
    from quickrank_tpu.metrics.metrics import Ndcg

    t_trees = int(os.environ.get("QRTPU_BINS_TREES", 16))
    nq = int(os.environ.get("QRTPU_BINS_QUERIES", 19000))
    q_trees = int(os.environ.get("QRTPU_BINS_QTREES", 100))
    q_nq = int(os.environ.get("QRTPU_BINS_QQUERIES", 2000))
    growers = os.environ.get("QRTPU_BINS_GROWERS", "level,best,bestk").split(",")
    bins_set = [
        int(b) for b in os.environ.get("QRTPU_BINS_SET", "63,127,255").split(",")
    ]
    skip_quality = os.environ.get("QRTPU_BINS_SKIP_QUALITY", "0") == "1"

    train = _timing_dataset(nq)
    log(f"# timing data: {train.num_docs} docs")

    t0 = time.perf_counter()
    burn = LambdaMart(ntrees=6, nleaves=16, nthresholds=255, seed=9,
                      growth="level", max_depth=4, esr=0)
    burn.learn(_timing_dataset(300), None, Ndcg(10), verbose=False)
    log(f"# burn-in done in {time.perf_counter() - t0:.1f}s")

    def mk(growth, nthr, ntrees, esr=0):
        return LambdaMart(
            ntrees=ntrees, nleaves=16, shrinkage=0.1, nthresholds=nthr,
            growth=growth, seed=1, esr=esr,
            max_depth=4 if growth == "level" else 0,
        )

    stamp = time.strftime("%Y-%m-%d")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "sweeps", f"{stamp}-bins.json",
    )
    results = {"timing_docs": train.num_docs, "runs": {}}
    if os.path.exists(out):
        with open(out) as f:
            results["runs"] = json.load(f).get("runs", {})

    def flush():
        # write after EVERY run: a tunnel wedge mid-battery must not lose
        # the completed measurements
        with open(out, "w") as f:
            json.dump(results, f, indent=1)

    for growth in growers:
        for nthr in bins_set:
            name = f"{growth}@{nthr}"
            if "median_s_per_tree" in results["runs"].get(name, {}):
                log(f"# {name}: timing already measured, skipping")
                continue
            lm = mk(growth, nthr, t_trees)
            t0 = time.perf_counter()
            hist = lm.learn(train, None, Ndcg(10), verbose=False)
            it = np.asarray(hist["iter_seconds"])[4:]
            run = {
                "median_s_per_tree": round(float(np.median(it)), 4),
                "p90_s_per_tree": round(float(np.percentile(it, 90)), 4),
                "steady_iters": int(len(it)),
                "compile_iter_s": round(float(hist["iter_seconds"][0]), 1),
                "total_s": round(time.perf_counter() - t0, 1),
            }
            results["runs"].setdefault(name, {}).update(run)
            flush()
            log(f"# {name}: {json.dumps(run)}")

    if not skip_quality:
        qtrain, qvalid, _ = make_train_valid_test(
            num_queries=(q_nq, q_nq // 3, 8)
        )
        results["quality_docs"] = qtrain.num_docs
        results["quality_trees"] = q_trees
        for growth in growers:
            for nthr in bins_set:
                name = f"{growth}@{nthr}"
                if "final_valid_ndcg10" in results["runs"].get(name, {}):
                    log(f"# {name}: quality already measured, skipping")
                    continue
                lm = mk(growth, nthr, q_trees, esr=0)
                hist = lm.learn(qtrain, qvalid, Ndcg(10), verbose=False)
                q = {
                    "final_train_ndcg10": round(float(hist["train"][-1]), 5),
                    "final_valid_ndcg10": round(float(hist["valid"][-1]), 5),
                    "best_valid_ndcg10": round(float(max(hist["valid"])), 5),
                }
                results["runs"].setdefault(name, {}).update(q)
                flush()
                log(f"# quality {name}: {json.dumps(q)}")

    flush()
    print(json.dumps(results))
    log(f"# written to {out}")


if __name__ == "__main__":
    main()
