"""Stochastic negative sampling LambdaMART.

TPU-native counterpart of ``StochasticNegative``
(src/learning/forests/stochasticnegative.cc:285-330): every iteration, each
query keeps ALL its positive (label > 0) docs plus a ``subsample`` fraction
(count if > 1) of its negatives drawn uniformly; lambdas are computed only
among the kept docs (query "cleaning", inherited from LambdaMart).

The per-query sort+shuffle of the reference becomes a batched random-key
ranking over the padded [Q, D] view.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quickrank_tpu.data.dataset import gather_padded, scatter_flat
from quickrank_tpu.learning.lambdamart import LambdaMart
from quickrank_tpu.learning.mart import TrainData


class StochasticNegative(LambdaMart):
    NAME = "STOCHASTIC-NEGATIVE"

    def __init__(self, *args, subsample: float = 0.5, **kw):
        super().__init__(*args, subsample=1.0, **kw)
        # Reference reuses the subsample flag as the negative fraction; the
        # base-class uniform subsampling is disabled in favor of this.
        self.negative_fraction = float(subsample)
        self._sampler = None

    def _post_init(self, tr: TrainData) -> None:
        padded = tr.padded
        frac = self.negative_fraction

        @jax.jit
        def sampler(key):
            idx = padded.pad_index_global
            labels = gather_padded(padded.labels, idx, padded.slot_mask)
            pos = (labels > 0) & padded.slot_mask
            neg = (labels <= 0) & padded.slot_mask
            r = jax.random.uniform(key, labels.shape)
            keyed = jnp.where(neg, r, jnp.inf)
            # rank of each negative inside its query (by random key)
            order = jnp.argsort(keyed, axis=-1)
            rank = jnp.argsort(order, axis=-1)
            nneg = jnp.sum(neg, axis=-1, keepdims=True)
            if frac > 1.0:
                k = jnp.minimum(jnp.asarray(int(frac)), nneg)
            else:
                k = jnp.floor(frac * nneg).astype(jnp.int32)
            keep = pos | (neg & (rank < k))
            return scatter_flat(
                keep.astype(jnp.float32), idx, padded.slot_mask,
                padded.num_docs_padded,
            ) > 0.5

        self._sampler = sampler

    def _update_presence(self, m, tr, scores_tr, key):
        if self.negative_fraction == 1.0:
            return None
        return self._sampler(jax.random.fold_in(key, 977))
