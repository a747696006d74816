"""Cleaver pruning tests: every strategy prunes the requested count, the
weight write-back drops trees, and quality-aware strategies do not destroy
the metric."""

import numpy as np
import pytest

from quickrank_tpu.learning import LambdaMart, LineSearch
from quickrank_tpu.metrics import Ndcg
from quickrank_tpu.optimization import Cleaver, PRUNING_METHODS, optimization_factory


@pytest.fixture(scope="module")
def trained(splits):
    train, valid, _ = splits
    lm = LambdaMart(ntrees=20, nleaves=8, nthresholds=32, seed=1)
    lm.learn(train, valid, Ndcg(10), verbose=False)
    return lm


@pytest.mark.parametrize("method", PRUNING_METHODS)
def test_all_strategies_prune(method, trained, splits):
    import copy

    train, valid, _ = splits
    lm = copy.copy(trained)
    lm.ensemble = trained.ensemble  # shared read-only
    T = int(lm.ensemble.num_trees)
    cl = Cleaver(pruning_method=method, pruning_rate=0.25, seed=3)
    info = cl.optimize(lm, train, valid, Ndcg(10), verbose=False)
    expected_pruned = int(round(0.25 * T))
    assert len(info["pruned"]) == expected_pruned
    assert int(lm.ensemble.num_trees) == T - expected_pruned
    assert info["metric_after"] > 0.3


def test_quality_loss_beats_heavy_random_damage(trained, splits):
    """QUALITY_LOSS should retain most of the metric at 50% pruning."""
    import copy

    train, valid, _ = splits
    lm = copy.copy(trained)
    lm.ensemble = trained.ensemble
    cl = Cleaver(pruning_method="QUALITY_LOSS", pruning_rate=0.5, seed=0)
    info = cl.optimize(lm, train, valid, Ndcg(10), verbose=False)
    assert info["metric_after"] >= info["metric_before"] - 0.05


def test_cleaver_with_line_search(trained, splits):
    import copy

    train, valid, _ = splits
    lm = copy.copy(trained)
    lm.ensemble = trained.ensemble
    m0 = lm.evaluate(train, Ndcg(10))
    ls = LineSearch(max_iterations=5, num_points=10)
    cl = optimization_factory(
        opt_method="QUALITY_LOSS", pruning_rate=0.5, line_search=ls
    )
    info = cl.optimize(lm, train, valid, Ndcg(10), verbose=False)
    # line-search re-weighting should roughly recover the full-model quality
    assert info["metric_after"] >= m0 - 0.05
    # weights actually changed (re-weighted, not just masked)
    w = lm.get_weights()
    assert not np.allclose(w, w[0])
