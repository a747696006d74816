"""Measured (not extrapolated) 1000-tree LambdaMART runs at MSLR scale.

BASELINE.json's headline metric is "MSLR-WEB30K LambdaMART train time
(1000 trees)"; bench.py measures a short steady-state window and
multiplies out.  This script runs the FULL 1000 trees for both growers on
the real chip and records what extrapolation can't show: init / compile /
steady breakdown, the per-100-tree iteration-time curve (does the
iteration stay flat at tree 900?), and the final train NDCG@10.  Results
go to docs/sweeps/<date>-train1000.json for the benchmark docs (merged
into the existing file, so configurations can be added across runs).

QRTPU_T1000_WITHVALID=1 adds a level-wise run with a validation set
(~train/3 queries, MSN1 fold proportions) and early stopping disabled
(esr=0, the labels are random), recording valid NDCG and whether the
per-iteration time stays flat at tree 900 when every iteration also
rescored the validation fold with the new tree.

QRTPU_T1000_LEARNABLE=1 switches to the LEARNABLE synthetic fixture
(data/synthetic.py, the suite's quality generator) with a valid fold and
esr=100 — BASELINE.json's "NDCG@10 parity at 1000 trees" axis: records
the per-100-tree valid-NDCG curve, where early stopping fires, and the
best model (previous quality evidence stopped at tree 200).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_1000.py
Env:   QRTPU_T1000_TREES (default 1000), QRTPU_T1000_QUERIES (19000),
       QRTPU_T1000_WITHVALID (default 0), QRTPU_T1000_LEARNABLE (0),
       QRTPU_T1000_GROWERS (comma list, default "level,best"; empty
       string skips the no-validation runs)
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

    ntrees = int(os.environ.get("QRTPU_T1000_TREES", 1000))
    nq = int(os.environ.get("QRTPU_T1000_QUERIES", 19000))
    nthr = int(os.environ.get("QRTPU_T1000_BINS", 255))
    growers = [
        g for g in os.environ.get("QRTPU_T1000_GROWERS", "level,best").split(",")
        if g
    ]
    with_valid = os.environ.get("QRTPU_T1000_WITHVALID", "0") == "1"
    learnable = os.environ.get("QRTPU_T1000_LEARNABLE", "0") == "1"
    t0 = time.perf_counter()
    train = _timing_dataset(nq)
    log(f"# data: {train.num_docs} docs in {time.perf_counter() - t0:.1f}s")

    # Burn-in BEFORE anything timed: the first timed loop in a process reads
    # 2.5-6x inflated on this tunnel even after a warm+sync call (CLAUDE.md
    # MEASUREMENT GOTCHA; the r3 artifact's 989.7 s level-wise init was
    # exactly this hitting a cold first learn()).  A small throwaway train
    # absorbs the artifact so every recorded run starts warm.
    t0 = time.perf_counter()
    burn = LambdaMart(ntrees=6, nleaves=16, nthresholds=255, seed=9,
                      growth="level", max_depth=4, esr=0)
    burn.learn(_timing_dataset(300), None, Ndcg(10), verbose=False)
    log(f"# burn-in train done in {time.perf_counter() - t0:.1f}s")

    stamp = time.strftime("%Y-%m-%d")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "sweeps", f"{stamp}-train1000.json",
    )
    results = {"docs": train.num_docs, "queries": train.num_queries,
               "ntrees": ntrees, "runs": {}}
    if os.path.exists(out):  # merge: configurations accumulate across runs
        with open(out) as f:
            results["runs"] = json.load(f).get("runs", {})

    def flush():
        # write after EVERY run: a tunnel wedge mid-battery must not lose
        # a completed 1000-tree measurement
        with open(out, "w") as f:
            json.dump(results, f, indent=1)

    resume = os.environ.get("QRTPU_T1000_RESUME", "0") == "1"

    def run_one(name, growth, valid, esr, train=train, **mart_kw):
        if nthr != 255:
            name = f"{name}@{nthr}"
        if resume and name in results["runs"]:
            log(f"# {name}: already measured (merged file), skipping")
            return
        lm = LambdaMart(
            ntrees=ntrees, nleaves=16, shrinkage=0.1, nthresholds=nthr,
            growth=growth, seed=1, esr=esr,
            max_depth=4 if growth == "level" else 0, **mart_kw,
        )
        t0 = time.perf_counter()
        hist = lm.learn(train, valid, Ndcg(10), verbose=False)
        total = time.perf_counter() - t0
        it = np.asarray(hist["iter_seconds"])
        curve = [
            {
                "trees": f"{i}-{min(i + 100, len(it))}",
                "median_s": round(float(np.median(it[i : i + 100])), 4),
                "p90_s": round(float(np.percentile(it[i : i + 100], 90)), 4),
            }
            for i in range(0, len(it), 100)
        ]
        run = {
            # per-run config: merged files can mix QRTPU_T1000_* settings,
            # so the top-level docs/queries/ntrees alone would silently
            # misattribute earlier runs (r3 advisor finding)
            "docs": int(train.num_docs),
            "queries": int(train.num_queries),
            "ntrees": ntrees,
            "total_s": round(total, 1),
            "init_s": round(hist["init_seconds"], 1),
            "compile_iter_s": round(float(it[0]), 1),
            "steady_median_s_per_tree": round(float(np.median(it[4:])), 4),
            "steady_p90_s_per_tree": round(
                float(np.percentile(it[4:], 90)), 4
            ),
            "per_100_tree_curve": curve,
            "final_train_ndcg10": round(float(hist["train"][-1]), 5),
            "trees_kept": int(lm.ensemble.num_trees),
        }
        if valid is not None:
            run["valid_docs"] = int(valid.num_docs)
            run["final_valid_ndcg10"] = round(float(hist["valid"][-1]), 5)
            va = np.asarray(hist["valid"])
            run["best_valid_ndcg10"] = round(float(va.max()), 5)
            run["best_iteration"] = int(hist["best_iteration"])
            run["stopped_at_tree"] = int(len(va))
            # valid-NDCG curve: value every 100 trees (quality trajectory)
            run["valid_ndcg_per_100"] = [
                round(float(va[min(i, len(va) - 1)]), 5)
                for i in range(99, len(va) + 99, 100)
            ]
        results["runs"][name] = run
        flush()
        log(f"# {name}: {json.dumps(run)[:400]}")

    if learnable:
        # BASELINE.json's quality axis at the headline tree count: the
        # learnable fixture (same generator as the suite's floors), MSN1
        # fold proportions, esr=100 live — where does valid NDCG peak and
        # does early stopping fire sensibly?
        from quickrank_tpu.data.synthetic import make_ranking_dataset

        t0 = time.perf_counter()
        ltrain = make_ranking_dataset(
            num_queries=nq, avg_docs_per_query=116, seed=31
        )
        lvalid = make_ranking_dataset(
            num_queries=nq // 3, avg_docs_per_query=116, seed=32
        )
        log(
            f"# learnable data: {ltrain.num_docs} train / "
            f"{lvalid.num_docs} valid docs in "
            f"{time.perf_counter() - t0:.1f}s"
        )
        for growth in growers:
            run_one(f"{growth}+learnable", growth, lvalid, 100, train=ltrain)
    else:
        for growth in growers:
            run_one(growth, growth, None, 100)
    if with_valid:
        # MSN1 fold proportions: vali is ~train/3 by query count.  Random
        # labels mean valid NDCG never improves, so esr=0 keeps the run at
        # the full 1000 trees; the point is the per-iteration cost of
        # rescoring the fold with each new tree, not the quality curve.
        import quickrank_tpu.data.dataset as dsmod

        rng = np.random.default_rng(23)
        counts = rng.integers(38, 232, size=nq // 3)
        n = int(counts.sum())
        feats = rng.standard_normal((n, 136), dtype=np.float32)
        labels = rng.integers(0, 5, n).astype(np.float32)
        qids = np.repeat(np.arange(1, nq // 3 + 1), counts)
        valid = dsmod.Dataset.from_arrays(feats, labels, qids, name="t1000-valid")
        log(f"# valid: {valid.num_docs} docs / {valid.num_queries} queries")
        run_one("level+valid", "level", valid, 0)

    flush()
    print(json.dumps(results))
    log(f"# written to {out}")


if __name__ == "__main__":
    main()
