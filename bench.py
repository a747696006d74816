"""Headline benchmark: batched ensemble scoring throughput (docs/sec/chip).

Counterpart of the reference's quickscore harness (src/quickscore.cc:96-121):
compiled-C per-doc scoring of a tree model.  ``vs_baseline`` compares against
the SAME 1000-tree / depth-4 model scored by the reference's own generated-C
oblivious path (our io/codegen.py emits the generate_oblivious.cc form),
compiled with the reference's release flags (-O3 -march=native) and measured
on THIS host's CPU: 3.37e-6 s/doc = ~297k docs/s single-threaded (the
reference's quickscore scoring loop is serial, quickscore.cc:100-106; this
4-core host would top out around ~1.2M docs/s if it were parallelized).

The 2.78e-9 s/doc figure in documentation/quickscore.md:35-37 is for an
unspecified (clearly much smaller) example model — at 1000 trees it would
imply 2.8 fs per tree-doc, beyond any hardware — so the same-model
same-machine measurement above is the honest baseline.

Run on whatever jax.devices() offers (one real TPU chip under the driver).
Prints ONE JSON line.  Secondary diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# Measured on this host (see module docstring): reference-style compiled-C
# oblivious scorer, same 1000-tree model, single thread.
BASELINE_DOCS_PER_SEC = 296996.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from quickrank_tpu.ops.oblivious import score_oblivious
    from quickrank_tpu.ops.pallas_oblivious import score_oblivious_pallas
    from quickrank_tpu.trees.oblivious import ObliviousEnsemble

    dev = jax.devices()[0]
    log(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # MSN1-like feature count; 1000-tree / 16-leaf (depth-4 oblivious)
    # LambdaMART-sized model (quicklearn defaults, src/quicklearn.cc:97-140).
    # The oblivious layout is the reference's own headline scoring strategy
    # (generate_oblivious.cc / IPM'16).
    N, F, T, DEPTH = 1 << 17, 136, 1000, 4
    L = 2**DEPTH
    rng = np.random.default_rng(0)
    feats = jax.device_put(rng.normal(size=(N, F)).astype(np.float32))
    ens = jax.device_put(
        ObliviousEnsemble(
            fid=jnp.asarray(rng.integers(0, F, size=(T, DEPTH)).astype(np.int32)),
            thr=jnp.asarray(rng.normal(size=(T, DEPTH)).astype(np.float32)),
            thr_bin=jnp.zeros((T, DEPTH), jnp.int32),
            leaf=jnp.asarray(rng.normal(size=(T, L)).astype(np.float32)),
            weight=jnp.full((T,), 0.1, jnp.float32),
            num_trees=jnp.asarray(T, jnp.int32),
        )
    )

    # Chain rounds through an accumulator so no round can be elided or
    # overlapped — every execution is on the critical path.
    on_tpu = dev.platform == "tpu"

    @jax.jit
    def run(acc):
        if on_tpu:
            return acc + score_oblivious_pallas(feats, ens, tree_block=250)
        return acc + score_oblivious(feats, ens, tree_chunk=125)

    acc = jnp.zeros((N,), jnp.float32)
    acc = run(acc)
    acc.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    rounds = 10
    for _ in range(rounds):
        acc = run(acc)
    acc.block_until_ready()
    dt = (time.perf_counter() - t0) / rounds
    docs_per_sec = N / dt
    log(
        f"# scored {N} docs x {T} trees in {dt * 1e3:.2f} ms/round "
        f"-> {docs_per_sec:,.0f} docs/s"
    )

    print(
        json.dumps(
            {
                "metric": "ensemble_scoring_throughput_1000tree",
                "value": docs_per_sec,
                "unit": "docs/sec/chip",
                "vs_baseline": docs_per_sec / BASELINE_DOCS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
