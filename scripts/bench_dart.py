"""DART per-iteration cost on the current (r3/r4) kernels.

The committed DART table (BENCHMARKS.md) was measured on r2-era kernels at
540k docs; DART inherits the r3 gather elimination and G=32 histogram
defaults but was never re-measured, and is absent from the MSLR-scale
s/tree table (r3 verdict weak #8 / next #7).  This script measures the
fused DART iteration (drop -> fit -> weight -> keep/restore -> metrics,
dart.cc:292-569's loop) at MSLR scale (19k queries / ~2.2M docs), with
per-iteration times bucketed by that iteration's dropped-set size, plus
the r1-loop-vs-fused comparison re-run at 540k docs for table continuity.

Burn-in learn first (CLAUDE.md first-timed-loop gotcha).  Results merge
into docs/sweeps/<date>-dart.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_dart.py
Env:   QRTPU_DART_TREES (default 30), QRTPU_DART_QUERIES (19000),
       QRTPU_DART_SMALL_QUERIES (4600 ~ 540k docs; 0 skips),
       QRTPU_DART_TAG (suffixes the result keys, e.g. "@gatherfree", so
       A/B kernel generations coexist in one sweep file),
       QRTPU_DART_GROWTH (best|level|bestk — DART composes with the
       Mart-family growers; tag the run when not "best"),
       QRTPU_DART_XDART=1 (keep_drop + WEIGHTED sampling + LINESEARCH
       weighting + adaptive dropout — tag e.g. "@xdart")
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


def run_dart(train, ntrees):
    from quickrank_tpu.learning import Dart
    from quickrank_tpu.metrics.metrics import Ndcg

    growth = os.environ.get("QRTPU_DART_GROWTH", "best")
    kw = {}
    if os.environ.get("QRTPU_DART_XDART", "0") == "1":
        # the X-DART battery config: permanent pruning when fitting after
        # dropout improves, 16-point line-search weighting, adaptive
        # dropout count (dart.cc:430-515 extensions)
        kw = dict(keep_drop=True, sample_type="WEIGHTED",
                  normalize_type="LINESEARCH",
                  adaptive_type="PLUSHALF_RESET_LB1_UB5")
    d = Dart(ntrees=ntrees, nleaves=16, shrinkage=0.1, nthresholds=255,
             rate_drop=0.1, seed=1, esr=0, growth=growth,
             max_depth=4 if growth == "level" else 0, **kw)
    t0 = time.perf_counter()
    hist = d.learn(train, None, Ndcg(10), verbose=False)
    total = time.perf_counter() - t0
    it = np.asarray(hist["iter_seconds"])
    tail = it[4:]
    dropped = hist.get("dropped_per_iter")
    out = {
        "median_s_per_iter": round(float(np.median(tail)), 4),
        "p90_s_per_iter": round(float(np.percentile(tail, 90)), 4),
        "min_s_per_iter": round(float(tail.min()), 4),
        "compile_iter_s": round(float(it[0]), 1),
        "total_s": round(total, 1),
        "iters": [round(float(x), 4) for x in tail],
    }
    if dropped is not None:
        by = {}
        for dt, nd in zip(it[4:], dropped[4:]):
            by.setdefault(int(nd), []).append(float(dt))
        out["median_by_dropped"] = {
            str(k): round(float(np.median(v)), 4) for k, v in sorted(by.items())
        }
        out["dropped_per_iter"] = [int(x) for x in dropped[4:]]
    return out


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/qrtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import _timing_dataset
    from quickrank_tpu.learning import Dart
    from quickrank_tpu.metrics.metrics import Ndcg

    ntrees = int(os.environ.get("QRTPU_DART_TREES", 30))
    nq = int(os.environ.get("QRTPU_DART_QUERIES", 19000))
    small_nq = int(os.environ.get("QRTPU_DART_SMALL_QUERIES", 4600))

    t0 = time.perf_counter()
    burn = Dart(ntrees=4, nleaves=16, nthresholds=255, rate_drop=0.1,
                seed=9, esr=0)
    burn.learn(_timing_dataset(300), None, Ndcg(10), verbose=False)
    log(f"# burn-in done in {time.perf_counter() - t0:.1f}s")

    stamp = time.strftime("%Y-%m-%d")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "sweeps", f"{stamp}-dart.json",
    )
    results = {"runs": {}}
    if os.path.exists(out):
        with open(out) as f:
            results["runs"] = json.load(f).get("runs", {})

    def flush():
        # write after EVERY run: a tunnel wedge mid-battery must not lose
        # the completed measurements
        with open(out, "w") as f:
            json.dump(results, f, indent=1)

    tag = os.environ.get("QRTPU_DART_TAG", "")
    if "mslr" + tag in results["runs"]:
        log(f"# mslr{tag} already measured, skipping")
    else:
        train = _timing_dataset(nq)
        log(f"# MSLR-scale data: {train.num_docs} docs")
        results["runs"]["mslr" + tag] = {"docs": train.num_docs,
                                         **run_dart(train, ntrees)}
        flush()
        log(f"# mslr{tag}: {json.dumps(results['runs']['mslr' + tag])[:400]}")

    if small_nq and "540k" + tag not in results["runs"]:
        small = _timing_dataset(small_nq)
        log(f"# 540k-scale data: {small.num_docs} docs")
        results["runs"]["540k" + tag] = {"docs": small.num_docs,
                                         **run_dart(small, ntrees)}
        flush()
        log(f"# 540k{tag}: {json.dumps(results['runs']['540k' + tag])[:400]}")
    print(json.dumps(results))
    log(f"# written to {out}")


if __name__ == "__main__":
    main()
