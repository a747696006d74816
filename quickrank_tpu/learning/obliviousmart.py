"""Oblivious MART / Oblivious LambdaMART — symmetric-tree boosting.

TPU-native counterparts of ``ObliviousMart`` / ``ObliviousLambdaMart``
(src/learning/forests/obliviousmart.cc, obliviouslambdamart.cc): identical
boosting loops to Mart/LambdaMart but the regressor is the level-synchronous
oblivious tree (trees/oblivious.py, ot.cc semantics).  The fitted tree is
stored in the shared dense ensemble layout (a perfect binary tree repeating
one (feature, threshold) per level), and inference can additionally use the
traversal-free bit-OR scorer (ops/oblivious.py) — the quickscore path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from quickrank_tpu.learning.lambdamart import LambdaMart
from quickrank_tpu.learning.mart import Mart, StepData
from quickrank_tpu.ops.oblivious import score_oblivious
from quickrank_tpu.trees.oblivious import (
    ObliviousEnsemble,
    fit_oblivious_tree,
    oblivious_to_tree,
)


class _ObliviousFit:
    """Mixin: replace the best-first grower with the oblivious fit and use
    the bit-OR fast scorer for inference."""

    def __init__(self, *args, treedepth: int = 4, **kw):
        super().__init__(*args, **kw)
        self.treedepth = int(treedepth)
        # nleaves drives ensemble node capacity: a depth-D oblivious tree is
        # a perfect tree with 2^D leaves.
        self.nleaves = 2**self.treedepth

    def _descend_depth(self) -> int:
        return self.treedepth + 1

    def _fit_and_assign(self, tr: StepData, grad, smask, cfg, key, axis_name):
        fid, thr, tbin, leafidx = fit_oblivious_tree(
            tr.binned,
            grad,
            smask,
            tr.thresholds,
            self.treedepth,
            min_leaf_support=self.minleafsupport,
            axis_name=axis_name,
        )
        L = 2**self.treedepth
        tree = oblivious_to_tree(fid, thr, tbin, jnp.zeros((L,), jnp.float32))
        # Leaf node ids in the perfect-tree layout: internal nodes occupy
        # [0, L-1), leaves are (L-1) + leafidx.
        node = jnp.where(smask, (L - 1) + leafidx, -1).astype(jnp.int32)
        return tree, node

    # -- fast inference ------------------------------------------------------

    def oblivious_ensemble(self) -> ObliviousEnsemble:
        """Extract the [T, D] level tables from the stored perfect trees."""
        ens = self._require_model()
        T = int(ens.num_trees)
        D = self.treedepth
        L = 2**D
        # Level d is represented by heap node 2^d - 1 (all nodes of a level
        # share (feature, threshold) in an oblivious tree).
        lvl_nodes = (2 ** np.arange(D)) - 1
        fid = np.asarray(ens.feature)[:T][:, lvl_nodes]
        thr = np.asarray(ens.threshold)[:T][:, lvl_nodes]
        tbin = np.asarray(ens.threshold_bin)[:T][:, lvl_nodes]
        leaf = np.asarray(ens.leaf_value)[:T][:, L - 1 :]
        return ObliviousEnsemble(
            fid=jnp.asarray(fid),
            thr=jnp.asarray(thr),
            thr_bin=jnp.asarray(tbin),
            leaf=jnp.asarray(leaf),
            weight=ens.weight[:T],
            num_trees=jnp.asarray(T, jnp.int32),
        )

    def score_dataset(self, ds, tree_chunk: int = 0) -> np.ndarray:
        obl = self.oblivious_ensemble()
        feats = jnp.asarray(ds.features)
        return np.asarray(score_oblivious(feats, obl, tree_chunk=tree_chunk))


class ObliviousMart(_ObliviousFit, Mart):
    NAME = "OBVMART"


class ObliviousLambdaMart(_ObliviousFit, LambdaMart):
    NAME = "OBVLAMBDAMART"
