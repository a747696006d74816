"""Edge-case robustness: degenerate queries, constant features, tiny data,
reference-format XML fixtures, reproducibility."""

import textwrap

import numpy as np
import jax.numpy as jnp
import pytest

from quickrank_tpu.data.dataset import Dataset, pack_doc_values, shard_and_pad
from quickrank_tpu.learning import LambdaMart, Mart
from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.metrics import Ndcg, metric_factory


def _ds(features, labels, qids):
    return Dataset.from_arrays(
        np.asarray(features, np.float32), np.asarray(labels, np.float32),
        np.asarray(qids),
    )


def test_single_doc_queries():
    """Queries with one doc: no pairs, metric defined, training stable."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(6, 4))
    ds = _ds(X, [1, 0, 2, 1, 0, 3], [1, 2, 3, 4, 5, 6])
    lm = LambdaMart(ntrees=3, nleaves=4, nthresholds=8, seed=0)
    info = lm.learn(ds, None, Ndcg(10), verbose=False)
    assert np.isfinite(info["train"]).all()


def test_all_same_labels_query():
    """IDCG = 0 queries must contribute 0, not NaN (ndcg.cc:51-59)."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(8, 4))
    ds = _ds(X, [0, 0, 0, 0, 2, 1, 0, 1], [1, 1, 1, 1, 2, 2, 2, 2])
    padded = shard_and_pad(ds)
    scores = pack_doc_values(padded, rng.normal(size=8).astype(np.float32))
    for spec in ("NDCG@10", "MAP", "TNDCG@5", "DCG@3"):
        v = metric_factory(spec).evaluate_dataset(padded, scores)
        assert np.isfinite(v), spec
    lm = LambdaMart(ntrees=3, nleaves=4, nthresholds=8, seed=0)
    info = lm.learn(ds, None, Ndcg(10), verbose=False)
    assert np.isfinite(info["train"]).all()


def test_constant_feature_column():
    """A constant feature has one unique value -> its only threshold is the
    +inf sentinel; it must never be chosen as a split."""
    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 3)).astype(np.float32)
    X[:, 1] = 7.5
    ds = _ds(X, rng.integers(0, 3, 40), np.repeat([1, 2], 20))
    m = Mart(ntrees=4, nleaves=4, nthresholds=8, seed=0)
    m.learn(ds, None, Ndcg(10), verbose=False)
    feats_used = np.asarray(m.ensemble.feature)
    leaf = np.asarray(m.ensemble.is_leaf)
    assert not ((feats_used == 1) & ~leaf).any()


def test_reproducible_with_seed(splits):
    train, valid, _ = splits
    a = Mart(ntrees=4, nleaves=4, nthresholds=16, subsample=0.5,
             max_features=0.5, seed=7)
    b = Mart(ntrees=4, nleaves=4, nthresholds=16, subsample=0.5,
             max_features=0.5, seed=7)
    ia = a.learn(train, valid, Ndcg(10), verbose=False)
    ib = b.learn(train, valid, Ndcg(10), verbose=False)
    np.testing.assert_array_equal(ia["train"], ib["train"])


def test_load_reference_style_xml(tmp_path):
    """A model file written in the reference's exact textual conventions
    (tabs, pos attributes, 1-based feature ids, scientific notation) must
    load and score (rtnode.cc:48-117 format)."""
    xml = textwrap.dedent("""\
        <?xml version="1.0"?>
        <ranker>
        \t<info>
        \t\t<type>LAMBDAMART</type>
        \t\t<trees>2</trees>
        \t\t<leaves>3</leaves>
        \t\t<shrinkage>0.1</shrinkage>
        \t\t<leafsupport>1</leafsupport>
        \t\t<discretization>0</discretization>
        \t\t<estop>100</estop>
        \t</info>
        \t<ensemble>
        \t\t<tree id="1" weight="0.10000000000000001">
        \t\t\t<split>
        \t\t\t\t<feature>2</feature>
        \t\t\t\t<threshold>1.5</threshold>
        \t\t\t\t<split pos="left">
        \t\t\t\t\t<output>-0.5</output>
        \t\t\t\t</split>
        \t\t\t\t<split pos="right">
        \t\t\t\t\t<feature>1</feature>
        \t\t\t\t\t<threshold>-2.25e-01</threshold>
        \t\t\t\t\t<split pos="left"><output>0.25</output></split>
        \t\t\t\t\t<split pos="right"><output>1.75</output></split>
        \t\t\t\t</split>
        \t\t\t</split>
        \t\t</tree>
        \t\t<tree id="2" weight="0.1">
        \t\t\t<split>
        \t\t\t\t<output>2.0</output>
        \t\t\t</split>
        \t\t</tree>
        \t</ensemble>
        </ranker>
    """)
    p = tmp_path / "ref.xml"
    p.write_text(xml)
    model = LTRAlgorithm.load(str(p))
    X = np.asarray(
        [[0.0, 1.0], [0.0, 2.0], [-0.5, 2.0]], np.float32
    )
    ds = _ds(X, [0, 1, 2], [1, 1, 1])
    s = model.score_dataset(ds)
    # doc0: f2=1.0 <= 1.5 -> -0.5 ; +tree2 2.0 -> 0.1*(-0.5+2.0) = 0.15
    # doc1: f2=2.0 > 1.5, f1=0.0 > -0.225 -> 1.75 ; 0.1*(1.75+2) = 0.375
    # doc2: f2=2.0 > 1.5, f1=-0.5 <= -0.225 -> 0.25 ; 0.1*(0.25+2) = 0.225
    np.testing.assert_allclose(s, [0.15, 0.375, 0.225], rtol=1e-6)


def test_tiny_nthresholds(splits):
    train, _, _ = splits
    m = Mart(ntrees=3, nleaves=4, nthresholds=2, seed=0)
    info = m.learn(train, None, Ndcg(10), verbose=False)
    assert np.isfinite(info["train"]).all()
