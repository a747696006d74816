"""Synthetic balanced ensembles for benchmarking/compile checks.

Generates structurally valid complete-binary-tree ensembles (node i has
children 2i+1/2i+2, leaves at the last level) without running training —
scoring cost is independent of the learned values, so these are the standard
fixture for the quickscore-style throughput benchmarks
(cf. src/quickscore.cc:96-121's timing harness)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from quickrank_tpu.trees.structs import EnsembleTensors


def random_balanced_ensemble(
    num_trees: int,
    depth: int,
    num_features: int,
    seed: int = 0,
    weight: float = 0.1,
) -> EnsembleTensors:
    """Complete binary trees of the given depth (2^depth leaves each)."""
    rng = np.random.default_rng(seed)
    n_internal = 2**depth - 1
    max_nodes = 2 ** (depth + 1) - 1
    T = num_trees

    feature = np.full((T, max_nodes), -1, np.int32)
    threshold = np.zeros((T, max_nodes), np.float32)
    left = np.zeros((T, max_nodes), np.int32)
    right = np.zeros((T, max_nodes), np.int32)
    is_leaf = np.ones((T, max_nodes), bool)
    leaf_value = np.zeros((T, max_nodes), np.float32)

    idx = np.arange(n_internal)
    feature[:, :n_internal] = rng.integers(0, num_features, size=(T, n_internal))
    threshold[:, :n_internal] = rng.normal(size=(T, n_internal)).astype(np.float32)
    left[:, :n_internal] = 2 * idx + 1
    right[:, :n_internal] = 2 * idx + 2
    is_leaf[:, :n_internal] = False
    leaf_value[:, n_internal:] = rng.normal(size=(T, max_nodes - n_internal)).astype(
        np.float32
    )

    return EnsembleTensors(
        feature=jnp.asarray(feature),
        threshold=jnp.asarray(threshold),
        threshold_bin=jnp.asarray(np.zeros((T, max_nodes), np.int32)),
        left=jnp.asarray(left),
        right=jnp.asarray(right),
        is_leaf=jnp.asarray(is_leaf),
        leaf_value=jnp.asarray(leaf_value),
        weight=jnp.full((T,), weight, jnp.float32),
        num_trees=jnp.asarray(T, jnp.int32),
    )


def random_bestfirst_ensemble(num_trees, nleaves, num_features, seed=0):
    """Best-first-SHAPED trees: start from a root leaf, repeatedly split a
    random existing leaf (biased toward recent leaves so chains get deep,
    like deviance-guided growth on real data).  max_nodes = 2*nleaves-1."""
    rng = np.random.default_rng(seed)
    T = num_trees
    max_nodes = 2 * nleaves - 1
    feature = np.full((T, max_nodes), -1, np.int32)
    threshold = np.zeros((T, max_nodes), np.float32)
    left = np.zeros((T, max_nodes), np.int32)
    right = np.zeros((T, max_nodes), np.int32)
    is_leaf = np.ones((T, max_nodes), bool)
    leaf_value = np.zeros((T, max_nodes), np.float32)
    for t in range(T):
        leaves = [0]
        nxt = 1
        while nxt < max_nodes:
            # bias toward the newest leaf -> deep chains
            i = leaves.pop(-1 if rng.random() < 0.6 else rng.integers(len(leaves)))
            feature[t, i] = rng.integers(num_features)
            threshold[t, i] = rng.normal()
            left[t, i], right[t, i] = nxt, nxt + 1
            is_leaf[t, i] = False
            leaves += [nxt, nxt + 1]
            nxt += 2
        leaf_value[t, leaves] = rng.normal(size=len(leaves))
    return EnsembleTensors(
        feature=jnp.asarray(feature), threshold=jnp.asarray(threshold),
        threshold_bin=jnp.asarray(np.zeros((T, max_nodes), np.int32)),
        left=jnp.asarray(left), right=jnp.asarray(right),
        is_leaf=jnp.asarray(is_leaf), leaf_value=jnp.asarray(leaf_value),
        weight=jnp.full((T,), 0.1, jnp.float32),
        num_trees=jnp.asarray(T, jnp.int32),
    )
