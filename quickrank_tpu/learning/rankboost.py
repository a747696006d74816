"""RankBoost — pairwise boosting of binary threshold weak rankers.

TPU-native re-design of ``Rankboost`` (src/learning/forests/rankboost.cc):
the per-query pair-weight matrices ``D[q][i][j]`` become one padded
``[Q, D, D]`` tensor, the potential ``PI`` a batched column-sum-minus-row-sum,
and the weak-ranker search — the reference's per-feature sorted-document walk
over every threshold (rankboost.cc:365-415) — collapses into a single
histogram-of-potential + suffix-sum:  r(f, t) = sum of PI over docs with
``bin(doc, f) > t``, maximized by one argmax over the [F, B] tensor.

Reference semantics preserved:
  * D init: 1/N on (i, j), i < j in dataset order, with label_j > label_i
    (rankboost.cc:276-292 — pairs whose earlier doc is more relevant are NOT
    tracked, mirroring the reference's upper-triangular loop);
  * alpha = 0.5 ln((z + r)/(z - r)), with the r >= 1 escape hatch
    ``alpha = max_alpha * r`` (rankboost.cc:150-160);
  * weak ranker h(x) = 1 if x[f] > theta else 0 (sign fixed at +1, as the
    sign-flip branch is commented out in the reference :258-262);
  * multiplicative D update with exp(alpha (h_j - h_k)) + Z normalization
    (rankboost.cc:419-445);
  * best_T tracking on validation, model truncated to best_T.

The trained model scores as  score(x) = sum_t alpha_t [x[f_t] > theta_t] —
batched as one column-gather + compare + matvec (the same shape as the
oblivious bit kernel).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from quickrank_tpu.data.dataset import Dataset, gather_padded, shard_and_pad
from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.metrics.metrics import Metric
from quickrank_tpu.ops.binning import bin_dataset


class RankBoost(LTRAlgorithm):
    NAME = "RANKBOOST"

    def __init__(self, ntrees: int = 1000, nthresholds: int = 255, seed: int = 0):
        """``ntrees`` = max weak rankers (reference flag num-trees -> T)."""
        self.T = int(ntrees)
        self.nthresholds = int(nthresholds)
        self.seed = int(seed)
        self.features_: Optional[np.ndarray] = None  # [T] i32
        self.thetas_: Optional[np.ndarray] = None  # [T] f32
        self.signs_: Optional[np.ndarray] = None  # [T] i32
        self.alphas_: Optional[np.ndarray] = None  # [T] f32
        self.best_T: int = 0
        self.history: dict = {}

    def learn(self, train, valid=None, metric=None, verbose=True):
        metric = metric or self.default_metric()
        padded = shard_and_pad(train)
        b = bin_dataset(train.features, nthresholds=self.nthresholds)
        idx = padded.pad_index_global
        sm = padded.slot_mask
        labels = gather_padded(padded.labels, idx, sm)
        Q, Dm = labels.shape
        N_docs = padded.num_docs_padded

        # binned features in padded order
        from quickrank_tpu.data.dataset import pack_doc_values

        binned = jnp.stack(
            [
                pack_doc_values(padded, b.binned[:, f])
                for f in range(train.num_features)
            ],
            axis=1,
        ).astype(jnp.int32)
        thresholds = jnp.asarray(b.thresholds)
        B = b.num_bins
        F = train.num_features

        # pair mask: i < j (dataset order inside the padded query) and
        # label_j > label_i
        ii = jnp.arange(Dm)[None, :, None]
        jj = jnp.arange(Dm)[None, None, :]
        pair_mask = (
            (ii < jj)
            & sm[:, :, None]
            & sm[:, None, :]
            & (labels[:, None, :] > labels[:, :, None])
        )
        n_pairs = jnp.sum(pair_mask)
        Dw = jnp.where(pair_mask, 1.0 / jnp.maximum(n_pairs, 1), 0.0).astype(
            jnp.float32
        )

        if valid is not None:
            vpadded = shard_and_pad(valid)

        @jax.jit
        def weak_search(Dw):
            # potential: column sums - row sums (rankboost.cc:349-361)
            pi = jnp.sum(Dw, axis=1) - jnp.sum(Dw, axis=2)  # [Q, Dm]
            pi_flat = jnp.zeros((N_docs,), jnp.float32)
            pi_flat = pi_flat.at[idx.reshape(-1)].add(
                jnp.where(sm, pi, 0.0).reshape(-1)
            )
            # histogram of potential over (feature, bin), then r(f, t) =
            # sum over bins > t
            fidx = jnp.arange(F, dtype=jnp.int32)[None, :]
            flat = fidx * B + jnp.minimum(binned, B - 1)
            hist = jnp.zeros((F * B,), jnp.float32)
            vals = jnp.broadcast_to(
                jnp.where(padded.doc_mask, pi_flat, 0.0)[:, None], (N_docs, F)
            )
            hist = hist.at[flat.reshape(-1)].add(vals.reshape(-1)).reshape(F, B)
            cum = jnp.cumsum(hist, axis=1)
            r = cum[:, -1:] - cum  # sum over bins strictly greater than t
            best = jnp.argmax(r)
            f_star = (best // B).astype(jnp.int32)
            t_star = (best % B).astype(jnp.int32)
            return f_star, t_star, r.reshape(-1)[best]

        @jax.jit
        def apply_ranker(Dw, f_star, t_star, alpha, scores_flat):
            fcol = jax.lax.dynamic_index_in_dim(
                binned, f_star, axis=1, keepdims=False
            )
            h_flat = (fcol > t_star).astype(jnp.float32)
            scores_flat = scores_flat + alpha * h_flat
            h = gather_padded(h_flat, idx, sm)
            factor = jnp.exp(alpha * (h[:, :, None] - h[:, None, :]))
            Dw = jnp.where(pair_mask, Dw * factor, 0.0)
            z = jnp.sum(Dw)
            Dw = Dw / jnp.maximum(z, 1e-30)
            m = metric.evaluate_padded(padded, scores_flat)
            return Dw, z, scores_flat, m

        scores_flat = jnp.zeros((N_docs,), jnp.float32)
        features, thetas, alphas = [], [], []
        z_t = 1.0
        max_alpha = 0.0
        best_va, best_T = -np.inf, 0
        hist_tr, hist_va = [], []
        valid_scores = (
            np.zeros(valid.num_docs, np.float64) if valid is not None else None
        )
        if verbose:
            print(f"# {self.NAME}: T={self.T}")
        for t in range(self.T):
            f_star, t_star, best_r = weak_search(Dw)
            f_star_i, t_star_i = int(f_star), int(t_star)
            theta = float(np.asarray(b.thresholds)[f_star_i, t_star_i])
            r_t = z_t * float(best_r)
            if r_t >= 1:
                alpha = max_alpha * r_t
            else:
                alpha = float(np.log((z_t + r_t) / (z_t - r_t)) / 2.0)
                max_alpha = max(max_alpha, alpha)
            Dw, z, scores_flat, m_tr = apply_ranker(
                Dw, f_star, t_star, jnp.float32(alpha), scores_flat
            )
            z_t = float(z)
            m_tr = float(m_tr)
            features.append(f_star_i)
            thetas.append(theta)
            alphas.append(alpha)
            hist_tr.append(m_tr)
            improved = False
            if valid is not None:
                valid_scores += alpha * (
                    valid.features[:, f_star_i] > theta
                ).astype(np.float64)
                m_va = float(
                    metric.evaluate_dataset(
                        vpadded, pack_doc_values(vpadded, valid_scores)
                    )
                )
                hist_va.append(m_va)
                if m_va > best_va:
                    best_va, best_T, improved = m_va, t + 1, True
            else:
                best_T = t + 1
            if verbose and (t < 5 or (t + 1) % 10 == 0 or improved):
                vtxt = f" {hist_va[-1]:.6f}" if valid is not None else ""
                print(
                    f"# {t + 1:5d} f={f_star_i} theta={theta:.4g} "
                    f"alpha={alpha:.4g} {m_tr:.6f}{vtxt}"
                    f"{' *' if improved else ''}"
                )

        self.best_T = best_T
        self.features_ = np.asarray(features[:best_T], np.int32)
        self.thetas_ = np.asarray(thetas[:best_T], np.float32)
        self.signs_ = np.ones(best_T, np.int32)
        self.alphas_ = np.asarray(alphas[:best_T], np.float32)
        self.history = {"train": hist_tr, "valid": hist_va, "best_T": best_T}
        return self.history

    # -- inference -----------------------------------------------------------

    def score_dataset(self, ds: Dataset) -> np.ndarray:
        if self.features_ is None:
            raise RuntimeError("RANKBOOST: no trained model")
        X = ds.features
        # one column gather + compare + matvec (weak rankers are bit features)
        bits = (X[:, self.features_] > self.thetas_[None, :]).astype(np.float32)
        return bits @ (self.alphas_ * self.signs_)

    def partial_scores_dataset(self, ds: Dataset) -> np.ndarray:
        X = ds.features
        bits = (X[:, self.features_] > self.thetas_[None, :]).astype(np.float32)
        return bits * self.signs_[None, :]

    def get_weights(self) -> np.ndarray:
        return np.asarray(self.alphas_, np.float64)

    def update_weights(self, weights) -> None:
        """Overwrite alphas (rankboost.cc:564-576; no removal semantics)."""
        w = np.asarray(weights, np.float32)
        if len(w) != self.best_T:
            raise ValueError("weight size mismatch")
        self.alphas_ = w

    # -- XML (rankboost.cc:540-562) -----------------------------------------

    def _to_xml(self):
        import xml.etree.ElementTree as ET

        root = ET.Element("ranker")
        info = ET.SubElement(root, "info")
        ET.SubElement(info, "type").text = self.NAME
        ET.SubElement(info, "maxweakrankers").text = str(self.T)
        ens = ET.SubElement(root, "ensemble")
        for t in range(self.best_T):
            wr = ET.SubElement(ens, "weakranker")
            ET.SubElement(wr, "id").text = str(t)
            ET.SubElement(wr, "featureid").text = str(int(self.features_[t]))
            ET.SubElement(wr, "theta").text = repr(float(self.thetas_[t]))
            ET.SubElement(wr, "sign").text = str(int(self.signs_[t]))
            ET.SubElement(wr, "alpha").text = repr(float(self.alphas_[t]))
        return root

    @classmethod
    def _from_xml(cls, root):
        info = root.find("info")
        T = int(info.find("maxweakrankers").text)
        algo = cls(ntrees=T)
        wrs = root.findall("ensemble/weakranker")
        algo.best_T = len(wrs)
        algo.features_ = np.asarray(
            [int(w.find("featureid").text) for w in wrs], np.int32
        )
        algo.thetas_ = np.asarray(
            [float(w.find("theta").text) for w in wrs], np.float32
        )
        algo.signs_ = np.asarray([int(w.find("sign").text) for w in wrs], np.int32)
        algo.alphas_ = np.asarray(
            [float(w.find("alpha").text) for w in wrs], np.float32
        )
        return algo
