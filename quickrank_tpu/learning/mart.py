"""MART — pointwise gradient-boosted regression trees (squared loss).

TPU-native re-design of ``Mart`` (src/learning/forests/mart.cc:208-416).
The per-iteration pipeline (pseudoresponses -> histogram/tree fit -> leaf
outputs -> incremental rescoring -> metric eval) is one jit-compiled step; the
host loop only does early-stopping bookkeeping and logging, mirroring the
process/device boundary SURVEY.md §3.1 prescribes.

Semantics preserved from the reference:
  * pseudoresponse = label - current score (mart.cc:418-431);
  * per-iteration doc subsampling (mart.cc:312-329) as a random k-of-N mask;
  * shrinkage ("learning rate") as the pushed tree weight (mart.cc:342);
  * early stop after ``esr`` non-improving validation iterations with
    rollback to the best model by popping trees (mart.cc:347-395).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from quickrank_tpu.data.dataset import Dataset, PaddedDataset, shard_and_pad
from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.metrics.metrics import Metric
from quickrank_tpu.ops.binning import apply_bins, build_thresholds
from quickrank_tpu.ops.scoring import (
    descend_tree_binned,
    partial_scores,
    score_ensemble,
)
from quickrank_tpu.trees.grow import GrowConfig, fit_tree, leaf_outputs
from quickrank_tpu.trees.structs import EnsembleTensors


@dataclasses.dataclass
class TrainData:
    """Device-side training tensors shared by the boosting loop."""

    padded: PaddedDataset
    binned: jnp.ndarray  # i32 [N, F]
    thresholds: jnp.ndarray  # f32 [F, B]
    num_real_docs: int

    @staticmethod
    def build(ds: Dataset, nthresholds: int, num_shards: int = 1) -> "TrainData":
        padded = shard_and_pad(ds, num_shards=num_shards)
        thresholds, _ = build_thresholds(ds.features, nthresholds)
        binned = apply_bins(np.asarray(padded.features), thresholds)
        return TrainData(
            padded=padded,
            binned=jnp.asarray(binned),
            thresholds=jnp.asarray(thresholds),
            num_real_docs=ds.num_docs,
        )

    @staticmethod
    def for_eval(ds: Dataset, thresholds: jnp.ndarray, num_shards: int = 1):
        """Bin an eval split with the *training* thresholds (bin-space routing
        is then exactly threshold-value routing)."""
        padded = shard_and_pad(ds, num_shards=num_shards)
        binned = apply_bins(np.asarray(padded.features), np.asarray(thresholds))
        return TrainData(
            padded=padded,
            binned=jnp.asarray(binned),
            thresholds=thresholds,
            num_real_docs=ds.num_docs,
        )

    @property
    def num_bins(self) -> int:
        return int(self.thresholds.shape[1])


class Mart(LTRAlgorithm):
    NAME = "MART"
    #: Newton leaf outputs (sum lambda / sum w) — LambdaMART turns this on.
    _newton = False

    def __init__(
        self,
        ntrees: int = 1000,
        shrinkage: float = 0.1,
        nthresholds: int = 255,
        nleaves: int = 10,
        minleafsupport: int = 1,
        esr: int = 100,
        subsample: float = 1.0,
        max_features: float = 1.0,
        seed: int = 0,
    ):
        """Defaults mirror quicklearn's training group (src/quicklearn.cc:97-140)
        except ``nthresholds``: the reference's 0 = "all unique values" is
        hostile to a dense [nodes, F, B] histogram tensor, so we default to
        255 bins (the standard GBDT quantization; LightGBM's default too)."""
        self.ntrees = int(ntrees)
        self.shrinkage = float(shrinkage)
        self.nthresholds = int(nthresholds)
        self.nleaves = int(nleaves)
        self.minleafsupport = int(minleafsupport)
        self.esr = int(esr)
        self.subsample = float(subsample)
        self.max_features = float(max_features)
        self.seed = int(seed)
        self.ensemble: Optional[EnsembleTensors] = None
        self.best_iteration: int = -1
        self.history: dict = {}

    # -- hooks for subclasses ------------------------------------------------

    def _gradients(self, tr: TrainData, scores, sample_mask, key):
        """(pseudoresponses, newton_weights|None) — MART: label - score
        (mart.cc:418-431)."""
        return (tr.padded.labels - scores).astype(jnp.float32), None

    def _grow_config(self, tr: TrainData) -> GrowConfig:
        return GrowConfig(
            nleaves=self.nleaves,
            min_leaf_support=self.minleafsupport,
            num_bins=tr.num_bins,
            max_features=self.max_features,
            newton=self._newton,
        )

    def _tree_weight(self) -> float:
        return self.shrinkage

    # -- sampling ------------------------------------------------------------

    def _sample_mask(self, tr: TrainData, key):
        """Random doc subset of size subsample*N (count if subsample > 1),
        mirroring the shuffle-and-take of mart.cc:312-329."""
        doc_mask = tr.padded.doc_mask
        if self.subsample == 1.0:
            return doc_mask
        n = tr.num_real_docs
        k = int(self.subsample) if self.subsample > 1 else max(
            1, int(self.subsample * n)
        )
        if k >= n:
            return doc_mask
        r = jax.random.uniform(key, doc_mask.shape)
        r = jnp.where(doc_mask, r, jnp.inf)
        kth = jnp.sort(r)[k - 1]
        return doc_mask & (r <= kth)

    # -- training ------------------------------------------------------------

    def _make_step(self, tr: TrainData, va: Optional[TrainData], metric: Metric):
        cfg = self._grow_config(tr)
        md = self.nleaves  # depth bound: best-first chain <= nleaves-1
        shrinkage = self._tree_weight()

        def step(ens, scores_tr, scores_va, key):
            k1, k2, k3 = jax.random.split(key, 3)
            smask = self._sample_mask(tr, k1)
            grad, w = self._gradients(tr, scores_tr, smask, k2)
            tree, node = fit_tree(
                tr.binned, grad, smask, tr.thresholds, cfg, key=k3
            )
            tree = leaf_outputs(
                tree, node, grad, smask, weights=w if self._newton else None
            )
            ens2 = ens.push(tree, shrinkage)
            d_tr = tree.leaf_value[descend_tree_binned(tr.binned, tree, md)]
            s_tr = scores_tr + shrinkage * d_tr
            m_tr = jnp.asarray(metric.evaluate_padded(tr.padded, s_tr), jnp.float32)
            if va is None:
                return ens2, s_tr, scores_va, m_tr, jnp.float32(jnp.nan)
            d_va = tree.leaf_value[descend_tree_binned(va.binned, tree, md)]
            s_va = scores_va + shrinkage * d_va
            m_va = jnp.asarray(metric.evaluate_padded(va.padded, s_va), jnp.float32)
            return ens2, s_tr, s_va, m_tr, m_va

        return jax.jit(step, donate_argnums=(0, 1, 2))

    def learn(
        self,
        train: Dataset,
        valid: Optional[Dataset] = None,
        metric: Optional[Metric] = None,
        verbose: bool = True,
    ) -> dict:
        metric = metric or self.default_metric()
        t_init = time.time()
        tr = TrainData.build(train, self.nthresholds)
        va = (
            TrainData.for_eval(valid, tr.thresholds) if valid is not None else None
        )
        cfg = self._grow_config(tr)
        ens = EnsembleTensors.empty(self.ntrees, cfg.max_nodes)
        scores_tr = jnp.zeros((tr.padded.num_docs_padded,), jnp.float32)
        scores_va = (
            jnp.zeros((va.padded.num_docs_padded,), jnp.float32)
            if va is not None
            else jnp.zeros((1,), jnp.float32)
        )
        step = self._make_step(tr, va, metric)
        self._post_init(tr)
        init_time = time.time() - t_init

        root_key = jax.random.PRNGKey(self.seed)
        hist_tr, hist_va = [], []
        best_va, best_it = -np.inf, -1
        if verbose:
            print(f"# {self.NAME}: {self!r}")
            print("# iter. training validation")
        t_train = time.time()
        for m in range(self.ntrees):
            key = jax.random.fold_in(root_key, m)
            ens, scores_tr, scores_va, m_tr, m_va = step(
                ens, scores_tr, scores_va, key
            )
            m_tr = float(m_tr)
            m_va = float(m_va)
            hist_tr.append(m_tr)
            hist_va.append(m_va)
            improved = False
            if va is not None and m_va > best_va:
                best_va, best_it, improved = m_va, m, True
            if verbose and (m < 5 or (m + 1) % 10 == 0 or improved):
                vtxt = f" {m_va:.6f}" if va is not None else ""
                print(f"# {m + 1:5d} {m_tr:.6f}{vtxt}{' *' if improved else ''}")
            if va is not None and self.esr and m - best_it >= self.esr:
                break

        if va is not None and best_it >= 0:
            # Rollback to the best model (mart.cc:390-395).
            ens = ens.replace(num_trees=jnp.asarray(best_it + 1, jnp.int32))
        self.ensemble = _compact(ens)
        self.best_iteration = best_it if va is not None else self.ntrees - 1
        train_time = time.time() - t_train
        self.history = {
            "train": hist_tr,
            "valid": hist_va,
            "best_iteration": self.best_iteration,
            "best_valid": best_va if va is not None else None,
            "init_seconds": init_time,
            "train_seconds": train_time,
            "metric": repr(metric),
        }
        if verbose:
            print(
                f"# done: {int(self.ensemble.num_trees)} trees kept, "
                f"init {init_time:.2f}s, train {train_time:.2f}s"
            )
        return self.history

    def _post_init(self, tr: TrainData) -> None:
        """Subclass hook run once after data prep (e.g. DART bookkeeping)."""

    # -- inference -----------------------------------------------------------

    def _require_model(self) -> EnsembleTensors:
        if self.ensemble is None:
            raise RuntimeError(f"{self.NAME}: no trained model")
        return self.ensemble

    def score_dataset(self, ds: Dataset) -> np.ndarray:
        ens = self._require_model()
        feats = jnp.asarray(ds.features)
        return np.asarray(score_ensemble(feats, ens, max_depth=self.nleaves))

    def partial_scores_dataset(self, ds: Dataset) -> np.ndarray:
        ens = self._require_model()
        feats = jnp.asarray(ds.features)
        return np.asarray(partial_scores(feats, ens, max_depth=self.nleaves))

    def get_weights(self) -> np.ndarray:
        ens = self._require_model()
        return np.asarray(ens.weight)[: int(ens.num_trees)]

    def update_weights(self, weights: np.ndarray) -> None:
        """Set per-tree weights, dropping zero-weighted trees
        (ensemble.cc:149-192)."""
        ens = self._require_model()
        T = int(ens.num_trees)
        w = np.zeros((ens.capacity,), np.float32)
        w[:T] = np.asarray(weights, np.float32)[:T]
        keep = np.flatnonzero(w != 0.0)
        sel = lambda x: jnp.asarray(np.asarray(x)[keep])  # noqa: E731
        self.ensemble = EnsembleTensors(
            feature=sel(ens.feature),
            threshold=sel(ens.threshold),
            threshold_bin=sel(ens.threshold_bin),
            left=sel(ens.left),
            right=sel(ens.right),
            is_leaf=sel(ens.is_leaf),
            leaf_value=sel(ens.leaf_value),
            weight=jnp.asarray(w[keep]),
            num_trees=jnp.asarray(len(keep), jnp.int32),
        )

    def __repr__(self):
        return (
            f"{self.NAME}(ntrees={self.ntrees}, shrinkage={self.shrinkage}, "
            f"nleaves={self.nleaves}, minls={self.minleafsupport}, "
            f"nthresholds={self.nthresholds}, esr={self.esr}, "
            f"subsample={self.subsample}, max_features={self.max_features})"
        )


def _compact(ens: EnsembleTensors) -> EnsembleTensors:
    """Trim dead capacity beyond num_trees (host-side, post-training)."""
    T = int(ens.num_trees)
    cut = lambda x: jnp.asarray(np.asarray(x)[:T])  # noqa: E731
    return EnsembleTensors(
        feature=cut(ens.feature),
        threshold=cut(ens.threshold),
        threshold_bin=cut(ens.threshold_bin),
        left=cut(ens.left),
        right=cut(ens.right),
        is_leaf=cut(ens.is_leaf),
        leaf_value=cut(ens.leaf_value),
        weight=cut(ens.weight),
        num_trees=jnp.asarray(T, jnp.int32),
    )
