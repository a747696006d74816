"""Multi-chip parity: query-sharded training must match single-device
training (the test the reference cannot have — SURVEY.md §2.9/§4)."""

import numpy as np
import jax
import pytest

from quickrank_tpu.data.synthetic import make_train_valid_test
from quickrank_tpu.learning import LambdaMart, Mart
from quickrank_tpu.metrics import Ndcg
from quickrank_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def small_splits():
    return make_train_valid_test(num_queries=(32, 12, 12))


def _train(algo_cls, splits, mesh, ntrees=8, **kw):
    train, valid, _ = splits
    a = algo_cls(ntrees=ntrees, nleaves=8, nthresholds=32, seed=1, **kw)
    info = a.learn(train, valid, Ndcg(10), verbose=False, mesh=mesh)
    return a, info


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("algo_cls", [Mart, LambdaMart])
def test_sharded_matches_single_device(algo_cls, small_splits):
    # MART is bitwise-stable across shardings; LambdaMART's sigmoid/psum
    # reductions reorder f32 sums, which can flip near-tied splits in later
    # trees — tolerance covers that run variance, not a logic gap.
    _, i1 = _train(algo_cls, small_splits, mesh=None)
    _, i4 = _train(algo_cls, small_splits, mesh=make_mesh(4))
    np.testing.assert_allclose(i1["train"], i4["train"], atol=1e-2)
    np.testing.assert_allclose(i1["valid"], i4["valid"], atol=1e-2)
    assert abs(i1["train"][-1] - i4["train"][-1]) < 6e-3


def test_sharded_model_scores_match(small_splits):
    train, valid, test = small_splits
    m1, _ = _train(Mart, small_splits, mesh=None)
    m8, _ = _train(Mart, small_splits, mesh=make_mesh(8))
    s1 = m1.score_dataset(test)
    s8 = m8.score_dataset(test)
    np.testing.assert_allclose(s1, s8, atol=1e-4)
