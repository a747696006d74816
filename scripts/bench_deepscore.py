"""Deep (non-embeddable) model scoring: gather vs matmul descent vs QS.

Best-first 16-leaf trees run to depth 15, past the perfect-tree
embedding's depth-5 economic bound (2^15-leaf tables don't pay), so
Mart.score_dataset falls back to score_ensemble's per-tree descent —
which serialized through per-doc gathers until ops/scoring.py grew the
value-space matmul descent (descend_tree_matmul).  This measures both at
the quickscore workload shape (131k docs x 136 features, 1000 trees of
16 leaves grown best-first-shaped: random leaf split order, depth up to
15 — cf. src/quickscore.cc:96-121 for the reference harness).

Timing: burn-in first (CLAUDE.md first-timed-loop gotcha), rounds chained
through a data dependency with one scalar fetch at the end (the tunnel's
block_until_ready is unreliable).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_deepscore.py
Env:   QRTPU_DEEP_TREES (1000), QRTPU_DEEP_DOCS (131072), QRTPU_DEEP_ROUNDS (10)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/qrtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from quickrank_tpu.ops.scoring import (
        descend_tree,
        descend_tree_matmul,
        kahan_add,
        leaf_values_onehot,
    )
    from quickrank_tpu.trees.perfect import tree_depths
    from quickrank_tpu.trees.random_ensemble import random_bestfirst_ensemble

    T = int(os.environ.get("QRTPU_DEEP_TREES", 1000))
    N = int(os.environ.get("QRTPU_DEEP_DOCS", 131072))
    R = int(os.environ.get("QRTPU_DEEP_ROUNDS", 10))
    F = 136
    ens = random_bestfirst_ensemble(T, 16, F, seed=5)
    md = int(tree_depths(ens).max())
    log(f"# {T} trees, {N} docs, max depth {md}")
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((N, F), dtype=np.float32))

    def scan_score(descend, feats):
        def body(carry, t):
            tree = ens.tree(t)
            d = leaf_values_onehot(descend(feats, tree, md), tree)
            return kahan_add(carry[0], carry[1], ens.weight[t] * d), None

        z = jnp.zeros((feats.shape[0],), jnp.float32)
        (out, _), _ = jax.lax.scan(body, (z, z), jnp.arange(ens.capacity))
        return out

    from quickrank_tpu.trees.qs import ensemble_to_qs, score_qs
    from quickrank_tpu.ops.pallas_qs import score_qs_pallas

    qs = ensemble_to_qs(ens)
    variants = {
        "qs_pallas": lambda f: score_qs_pallas(f, qs),
        "qs": lambda f: score_qs(f, qs),
        "matmul": jax.jit(lambda f: scan_score(descend_tree_matmul, f)),
        "gather": jax.jit(lambda f: scan_score(descend_tree, f)),
    }
    if os.environ.get("QRTPU_DEEP_SKIP_GATHER", "0") == "1":
        variants.pop("gather")
    results = {"trees": T, "docs": N, "max_depth": md}
    ref = None
    for name, fn in variants.items():
        t0 = time.perf_counter()
        out = fn(X)
        s0 = float(out[0])
        log(f"# {name}: first call (compile) {time.perf_counter() - t0:.1f}s")
        # burn-in loop, then timed loop chained via a feature perturbation
        # derived from the previous round's output scalar (can't be elided)
        for _ in range(2):
            out = fn(X + out[0] * 0.0)
        t0 = time.perf_counter()
        for _ in range(R):
            out = fn(X + out[0] * 0.0)
        s = float(out[0])
        dt = (time.perf_counter() - t0) / R
        results[name + "_s"] = round(dt, 4)
        results[name + "_docs_per_sec"] = round(N / dt)
        log(f"# {name}: {dt*1e3:.1f} ms/pass ({N/dt/1e6:.2f}M docs/s)  head={s:.5f}")
        if ref is None:
            ref = s
        else:
            assert abs(ref - s) < 1e-3, (ref, s)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
