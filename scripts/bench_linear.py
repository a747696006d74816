"""CoordinateAscent / LineSearch / RankBoost wall-clock at scale.

The tree-family s/tree table (BENCHMARKS.md) had no counterpart for the
linear rankers (coordinate_ascent.cc, line_search.cc) or RankBoost
(rankboost.cc) — this measures full `learn()` wall-clock and the
per-unit cost at MSLR-ish scale on the real chip.  Burn-in first
(CLAUDE.md first-timed-loop gotcha); results merge into
docs/sweeps/<date>-linear.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_linear.py
Env:   QRTPU_LIN_QUERIES (default 19000 ~ 2.56M docs),
       QRTPU_LIN_ALGOS (comma list of ca,ls,rb; default all)
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
    from quickrank_tpu.learning.linear import CoordinateAscent, LineSearch
    from quickrank_tpu.learning.rankboost import RankBoost
    from quickrank_tpu.metrics.metrics import Ndcg

    nq = int(os.environ.get("QRTPU_LIN_QUERIES", 19000))
    algos = os.environ.get("QRTPU_LIN_ALGOS", "ca,ls,rb").split(",")

    t0 = time.perf_counter()
    burn = CoordinateAscent(max_iterations=1, num_points=5)
    burn.learn(_timing_dataset(200), None, Ndcg(10), verbose=False)
    log(f"# burn-in in {time.perf_counter() - t0:.1f}s")

    train = _timing_dataset(nq)
    log(f"# data: {train.num_docs} docs / {train.num_queries} queries")

    stamp = time.strftime("%Y-%m-%d")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "sweeps", f"{stamp}-linear.json",
    )
    results = {"docs": int(train.num_docs), "queries": int(train.num_queries),
               "runs": {}}
    if os.path.exists(out):
        with open(out) as f:
            results["runs"] = json.load(f).get("runs", {})

    def run(name, algo, unit_count, unit_name):
        if name in results["runs"]:
            log(f"# {name}: already measured, skipping")
            return
        t0 = time.perf_counter()
        algo.learn(train, None, Ndcg(10), verbose=False)
        total = time.perf_counter() - t0
        results["runs"][name] = {
            "total_s": round(total, 1),
            unit_name: round(total / max(1, unit_count), 3),
            "final_train_metric": round(
                float(algo.evaluate(train, Ndcg(10))), 5
            ),
        }
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
        log(f"# {name}: {json.dumps(results['runs'][name])}")

    # reference defaults: CA 25 outer iterations x 21-point grid per
    # feature (coordinate_ascent.cc:120-138); LS 100 iterations
    # (line_search.cc); RankBoost 300 weak rankers (rankboost.cc)
    if "ca" in algos:
        ca = CoordinateAscent(max_iterations=5, num_points=21)
        run("coordinate_ascent_5it", ca, 5, "s_per_outer_iteration")
    if "ls" in algos:
        ls = LineSearch(max_iterations=20, num_points=21)
        run("line_search_20it", ls, 20, "s_per_iteration")
    if "rb" in algos:
        rb = RankBoost(ntrees=50, seed=1)
        run("rankboost_50wr", rb, 50, "s_per_weak_ranker")

    print(json.dumps(results))
    log(f"# written to {out}")


if __name__ == "__main__":
    main()
