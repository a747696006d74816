"""Isolate DART's per-iteration validation cost at MSLR scale.

A 200-tree learnable-fixture DART run WITH a validation fold measured
1.98 s/iter (2026-08-21) where train-only DART at the same bin count
runs 0.49-0.54 — while LambdaMART's per-tree validation rescoring is
measurably free.  The suspects, in cost order:

  1. the dropped-set delta on the VALID split (``delta_va_fn``: a
     pad-sized scan of depth-md matmul descents over ~735k docs, every
     iteration with a non-empty dropped set);
  2. the fitted tree's valid delta (one descent, _fit_body's d_va);
  3. deeper best-first trees on learnable labels (documented 0.44 ->
     0.66 s/tree effect for exact best-first at 255 bins).

This script A/Bs {random, learnable} x {train-only, with-valid} with a
shared burn-in so the four medians decompose the 1.98 s.  Run it when
the tunnel is healthy:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_dart_valid.py

Env: QRTPU_DV_TREES (18), QRTPU_DV_QUERIES (19000), QRTPU_DV_BINS (63)
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
    from quickrank_tpu.data.synthetic import make_ranking_dataset
    from quickrank_tpu.learning.dart import Dart
    from quickrank_tpu.metrics.metrics import Ndcg

    ntrees = int(os.environ.get("QRTPU_DV_TREES", 18))
    nq = int(os.environ.get("QRTPU_DV_QUERIES", 19000))
    nthr = int(os.environ.get("QRTPU_DV_BINS", 63))

    rnd_tr = _timing_dataset(nq)
    rnd_va = _timing_dataset(nq // 3)
    lrn_tr = make_ranking_dataset(
        num_queries=nq, avg_docs_per_query=116, seed=31
    )
    lrn_va = make_ranking_dataset(
        num_queries=nq // 3, avg_docs_per_query=116, seed=32
    )
    log(f"# data: {rnd_tr.num_docs} random / {lrn_tr.num_docs} learnable docs")

    t0 = time.perf_counter()
    Dart(ntrees=4, nleaves=16, nthresholds=nthr, rate_drop=0.1, seed=9,
         esr=0).learn(_timing_dataset(300), None, Ndcg(10), verbose=False)
    log(f"# burn-in {time.perf_counter() - t0:.1f}s")

    out = {}
    for tag, tr, va in (
        ("random/train-only", rnd_tr, None),
        ("random/with-valid", rnd_tr, rnd_va),
        ("learnable/train-only", lrn_tr, None),
        ("learnable/with-valid", lrn_tr, lrn_va),
    ):
        d = Dart(ntrees=ntrees, nleaves=16, shrinkage=0.1, nthresholds=nthr,
                 rate_drop=0.1, seed=1, esr=0)
        h = d.learn(tr, va, Ndcg(10), verbose=False)
        it = np.asarray(h["iter_seconds"])[4:]
        out[tag] = {
            "median_s_per_iter": round(float(np.median(it)), 3),
            "p90_s_per_iter": round(float(np.percentile(it, 90)), 3),
        }
        log(f"# {tag}: {json.dumps(out[tag])}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
