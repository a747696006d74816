"""Steady-state device profile of one LambdaMART training iteration.

Warms the jitted step past compile, wraps a few steady iterations in a
jax.profiler trace, then summarizes where device time goes (top XLA
ops/fusions).  This is the measurement behind the hot-spot notes in
BENCHMARKS.md — run it before optimizing anything (CLAUDE.md).

Usage:  PYTHONPATH=.:/root/.axon_site python scripts/profile_train.py
Env:    QRTPU_PROFILE_QUERIES (default 19000 ~ 2.2M docs on TPU)
        QRTPU_PROFILE_GROWTH  (level|best, default level)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np
import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/qrtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    on_tpu = jax.devices()[0].platform == "tpu"
    nq = int(os.environ.get("QRTPU_PROFILE_QUERIES", 19000 if on_tpu else 500))
    growth = os.environ.get("QRTPU_PROFILE_GROWTH", "level")
    nthr = int(os.environ.get("QRTPU_PROFILE_BINS", 255))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _timing_dataset
    from quickrank_tpu.learning.lambdamart import LambdaMart
    from quickrank_tpu.metrics.metrics import Ndcg

    t0 = time.perf_counter()
    train = _timing_dataset(nq)
    log(f"# data: {train.num_docs} docs in {time.perf_counter() - t0:.1f}s")

    warm, traced = 3, 3
    cluster = os.environ.get("QRTPU_PROFILE_CLUSTER", "auto")
    lm = LambdaMart(
        ntrees=warm + traced, nleaves=16, shrinkage=0.1, nthresholds=nthr,
        growth=growth, seed=1, max_depth=4 if growth == "level" else 0,
        cluster=cluster,
    )

    tdir = tempfile.mkdtemp(prefix="qrtpu_profile_")
    state = {"m": -1}
    orig_post = lm._post_iteration

    def post(m, improved):
        state["m"] = m
        if m == warm - 1:  # steady state reached -> start capture
            jax.profiler.start_trace(tdir)
        orig_post(m, improved)

    lm._post_iteration = post
    t0 = time.perf_counter()
    hist = lm.learn(train, None, Ndcg(10), verbose=False)
    jax.profiler.stop_trace()
    iters = hist["iter_seconds"]
    log(
        f"# {growth}: compile-iter {iters[0]:.1f}s, steady "
        f"{np.mean(iters[warm:]):.3f} s/tree (traced {traced} iters)"
    )

    path = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")[0]
    data = json.load(gzip.open(path))
    ev = data["traceEvents"]
    # device events live under pids whose process_name mentions the chip
    dev_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower() or "XLA Op" in name:
                dev_pids.add(e["pid"])
    dur = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            dur[e.get("name", "?")] += e["dur"]
            total += e["dur"]
    per_iter = total / 1e6 / traced
    print(f"# device total {total / 1e6:.3f}s over {traced} iters "
          f"({per_iter:.3f} s/iter); trace: {path}")
    for n, d in dur.most_common(30):
        print(f"{d / 1e6 / traced:9.4f}s/iter  {100 * d / total:5.1f}%  {n[:110]}")


if __name__ == "__main__":
    main()
