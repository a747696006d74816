"""Linear-ranker tests: quality floors, weight semantics, XML round-trip
(mirrors test-ca.cc / test-line_search.cc strategy)."""

import numpy as np
import pytest

from quickrank_tpu.learning import CoordinateAscent, LineSearch
from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.metrics import Ndcg


def _random_baseline(ds):
    rng = np.random.default_rng(0)
    from quickrank_tpu.data.dataset import pack_doc_values, shard_and_pad

    padded = shard_and_pad(ds)
    s = pack_doc_values(padded, rng.normal(size=ds.num_docs).astype(np.float32))
    return float(Ndcg(10).evaluate_dataset(padded, s))


def test_coordinate_ascent_learns(splits):
    train, valid, test = splits
    ca = CoordinateAscent(max_iterations=12)
    info = ca.learn(train, valid, Ndcg(10), verbose=False)
    base = _random_baseline(test)
    t = ca.evaluate(test, Ndcg(10))
    assert t > base + 0.1
    # CA weights are L1-normalized after accepted updates (ca.cc:193-198)
    assert ca.best_weights.sum() == pytest.approx(1.0, abs=1e-3)


def test_line_search_learns(splits):
    train, valid, test = splits
    ls = LineSearch(max_iterations=12)
    info = ls.learn(train, valid, Ndcg(10), verbose=False)
    base = _random_baseline(test)
    assert ls.evaluate(test, Ndcg(10)) > base + 0.05
    assert info["train"] == sorted(info["train"])  # monotone best-so-far


def test_line_search_weight_import(splits):
    train, valid, _ = splits
    ls = LineSearch(max_iterations=3)
    w0 = np.full(train.num_features, 2.0)
    ls.update_weights(w0)
    ls.learn(train, valid, Ndcg(10), verbose=False)
    assert ls.best_weights.shape == (train.num_features,)


def test_line_search_train_only_last(splits):
    train, valid, _ = splits
    F = train.num_features
    ls = LineSearch(max_iterations=2, train_only_last=5)
    w0 = np.ones(F)
    ls.update_weights(w0)
    ls.learn(train, None, Ndcg(10), verbose=False)
    # Step 1 may only touch the last 5 features; step 2 moves along the
    # direction w - w_prev, which is zero outside them too.
    changed = np.flatnonzero(ls.best_weights != 1.0)
    assert changed.size == 0 or changed.min() >= F - 5


@pytest.mark.parametrize("cls", [CoordinateAscent, LineSearch])
def test_linear_xml_roundtrip(tmp_path, splits, cls):
    train, valid, test = splits
    a = cls(max_iterations=3)
    a.learn(train, valid, Ndcg(10), verbose=False)
    p = str(tmp_path / "lin.xml")
    a.save(p)
    b = LTRAlgorithm.load(p)
    assert type(b) is cls
    np.testing.assert_allclose(a.score_dataset(test), b.score_dataset(test), rtol=1e-6)
