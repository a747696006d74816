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


def test_cleaver_xml_roundtrip(tmp_path, trained, splits):
    """optimize -> save -> load -> re-apply reproduces identical weights
    (Cleaver::get_xml_model / Cleaver(xml), cleaver.cc:64-150)."""
    import copy

    train, valid, _ = splits
    lm = copy.copy(trained)
    lm.ensemble = trained.ensemble
    ls = LineSearch(max_iterations=3, num_points=10, window_size=4.0)
    cl = Cleaver(
        pruning_method="QUALITY_LOSS", pruning_rate=0.5, line_search=ls,
        seed=0,
    )
    cl.optimize(lm, train, valid, Ndcg(10), verbose=False)
    path = str(tmp_path / "opt.xml")
    cl.save(path)

    loaded = Cleaver.load(path)
    assert loaded.pruning_method == "QUALITY_LOSS"
    assert loaded.pruning_rate == 0.5
    assert loaded.line_search is not None
    assert loaded.line_search.num_points == 10
    assert loaded.line_search.window_size == 4.0
    # weights round-trip at float precision
    np.testing.assert_allclose(
        loaded.weights_, cl.weights_.astype(np.float32), rtol=1e-6
    )

    # re-apply to a fresh copy of the unpruned model -> same ensemble
    lm2 = copy.copy(trained)
    lm2.ensemble = trained.ensemble
    loaded.apply_weights(lm2)
    assert int(lm2.ensemble.num_trees) == int(lm.ensemble.num_trees)
    np.testing.assert_allclose(
        np.asarray(lm2.ensemble.weight), np.asarray(lm.ensemble.weight),
        rtol=1e-6,
    )


def test_driver_partial_and_opt_model_flow(tmp_path, splits):
    """--train-partial writes then reuses the per-tree score SVML;
    --opt-model persists the optimizer; a second run with --opt-model as
    INPUT (no --opt-algo) re-applies it (driver.cc:270-324)."""
    from quickrank_tpu.cli import main
    from quickrank_tpu.data import read_svml, write_svml
    from quickrank_tpu.learning.base import LTRAlgorithm

    train, valid, test = splits
    d = tmp_path
    write_svml(train, str(d / "tr.svml"))
    write_svml(valid, str(d / "va.svml"))
    # train without valid so no early-stop rollback trims the 8 trees
    rc = main([
        "--algo", "LAMBDAMART", "--train", str(d / "tr.svml"),
        "--num-trees", "8", "--num-leaves", "4", "--num-thresholds", "16",
        "--quiet", "--model-out", str(d / "model.xml"),
    ])
    assert rc == 0
    rc = main([
        "--algo", "LAMBDAMART", "--model-in", str(d / "model.xml"),
        "--skip-train", "--train", str(d / "tr.svml"),
        "--valid", str(d / "va.svml"), "--quiet",
        "--opt-algo", "EPRUNING", "--opt-method", "QUALITY_LOSS",
        "--pruning-rate", "0.5",
        "--train-partial", str(d / "ptrain.svml"),
        "--valid-partial", str(d / "pvalid.svml"),
        "--opt-model", str(d / "opt.xml"),
        "--opt-algo-model", str(d / "pruned.xml"),
    ])
    assert rc == 0
    assert (d / "ptrain.svml").exists()
    assert (d / "pvalid.svml").exists()
    assert (d / "opt.xml").exists()
    pruned = LTRAlgorithm.load(str(d / "pruned.xml"))
    assert int(pruned.ensemble.num_trees) == 4

    pt = read_svml(str(d / "ptrain.svml"))
    assert pt.num_features == 8  # one column per tree
    assert pt.num_docs == train.num_docs

    # second run: reuse the partial file + load the optimizer model
    rc = main([
        "--algo", "LAMBDAMART", "--model-in", str(d / "model.xml"),
        "--skip-train", "--train", str(d / "tr.svml"),
        "--train-partial", str(d / "ptrain.svml"),
        "--opt-model", str(d / "opt.xml"),
        "--opt-algo-model", str(d / "pruned2.xml"), "--quiet",
    ])
    assert rc == 0
    p2 = LTRAlgorithm.load(str(d / "pruned2.xml"))
    assert int(p2.ensemble.num_trees) <= 8
