"""Best-k A/B at MSLR scale: pass-count packing vs exact best-first.

Measures LambdaMART seconds/tree for growth in {best, bestk k=2/4/8,
level} on the bench timing fixture (19k queries, ~2.2M docs, 136 feats,
255 bins, 16 leaves), >= 100 steady iterations per config so the median
and p90 are trustworthy (the r3 verdict flagged 8-iteration windows as
~20% optimistic for best-first's split-count variance).  A throwaway
burn-in learn absorbs the tunnel's first-timed-loop inflation
(CLAUDE.md MEASUREMENT GOTCHA), and the first config is re-run at the end
as a drift sentinel.

Results merge into docs/sweeps/<date>-bestk.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bestk.py
Env:   QRTPU_BESTK_TREES (default 104), QRTPU_BESTK_QUERIES (19000),
       QRTPU_BESTK_KS (default "2,4,8")
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
    from quickrank_tpu.learning.lambdamart import LambdaMart
    from quickrank_tpu.metrics.metrics import Ndcg

    ntrees = int(os.environ.get("QRTPU_BESTK_TREES", 104))
    nq = int(os.environ.get("QRTPU_BESTK_QUERIES", 19000))
    ks = [int(k) for k in os.environ.get("QRTPU_BESTK_KS", "2,4,8").split(",")]
    train = _timing_dataset(nq)
    log(f"# data: {train.num_docs} docs / {train.num_queries} queries")

    t0 = time.perf_counter()
    burn = LambdaMart(ntrees=6, nleaves=16, nthresholds=255, seed=9,
                      growth="level", max_depth=4, esr=0)
    burn.learn(_timing_dataset(300), None, Ndcg(10), verbose=False)
    log(f"# burn-in done in {time.perf_counter() - t0:.1f}s")

    configs = (
        [("best", {})]
        + [(f"bestk{k}", {"growth": "bestk", "split_pack": k}) for k in ks]
        + [("level", {"growth": "level", "max_depth": 4}),
           ("best@end", {})]  # drift sentinel: repeat of config 1
    )
    stamp = time.strftime("%Y-%m-%d")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "sweeps", f"{stamp}-bestk.json",
    )
    results = {"docs": train.num_docs, "queries": train.num_queries,
               "ntrees": ntrees, "runs": {}}
    if os.path.exists(out):
        with open(out) as f:
            results["runs"] = json.load(f).get("runs", {})

    def flush():
        # write after EVERY run: a tunnel wedge mid-battery must not lose
        # the completed measurements (lesson of the 2026-08-20 sentinel)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)

    for name, kw in configs:
        merged = {"growth": "best", **kw}
        lm = LambdaMart(ntrees=ntrees, nleaves=16, shrinkage=0.1,
                        nthresholds=255, seed=1, esr=0, **merged)
        t0 = time.perf_counter()
        hist = lm.learn(train, None, Ndcg(10), verbose=False)
        total = time.perf_counter() - t0
        it = np.asarray(hist["iter_seconds"])[4:]
        run = {
            "median_s_per_tree": round(float(np.median(it)), 4),
            "p90_s_per_tree": round(float(np.percentile(it, 90)), 4),
            "min_s_per_tree": round(float(it.min()), 4),
            "max_s_per_tree": round(float(it.max()), 4),
            "steady_iters": int(len(it)),
            "compile_iter_s": round(float(hist["iter_seconds"][0]), 1),
            "total_s": round(total, 1),
            "final_train_ndcg10": round(float(hist["train"][-1]), 5),
        }
        results["runs"][name] = run
        flush()
        log(f"# {name}: {json.dumps(run)}")
    print(json.dumps(results))
    log(f"# written to {out}")


if __name__ == "__main__":
    main()
