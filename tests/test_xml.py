"""XML model round-trip tests: save -> load -> rescore must be identical
(the reference asserts the same, test-lambdamart.cc:110-128)."""

import numpy as np
import pytest

from quickrank_tpu.learning import LambdaMart, Mart, ObliviousMart
from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.metrics import Ndcg


@pytest.mark.parametrize(
    "algo_cls,kw",
    [
        (Mart, dict(nleaves=8)),
        (LambdaMart, dict(nleaves=8)),
        (ObliviousMart, dict(treedepth=3)),
    ],
)
def test_xml_roundtrip_scores(tmp_path, splits, algo_cls, kw):
    train, valid, test = splits
    a = algo_cls(ntrees=8, nthresholds=32, seed=1, **kw)
    a.learn(train, valid, Ndcg(10), verbose=False)
    path = str(tmp_path / "model.xml")
    a.save(path)
    b = LTRAlgorithm.load(path)
    assert type(b) is algo_cls
    sa = a.score_dataset(test)
    sb = b.score_dataset(test)
    np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-6)


def test_xml_carries_hyperparams(tmp_path, splits):
    train, valid, _ = splits
    a = LambdaMart(
        ntrees=6, nleaves=8, shrinkage=0.2, minleafsupport=3, nthresholds=32,
        esr=50, seed=1,
    )
    a.learn(train, valid, Ndcg(10), verbose=False)
    path = str(tmp_path / "m.xml")
    a.save(path)
    b = LTRAlgorithm.load(path)
    assert b.shrinkage == pytest.approx(0.2)
    assert b.nleaves == 8
    assert b.minleafsupport == 3
    assert b.esr == 50


def test_xml_format_shape(tmp_path, splits):
    """Spot-check the on-disk schema matches QuickRank's layout."""
    import xml.etree.ElementTree as ET

    train, valid, _ = splits
    a = Mart(ntrees=3, nleaves=4, nthresholds=16, seed=1)
    a.learn(train, valid, Ndcg(10), verbose=False)
    path = str(tmp_path / "m.xml")
    a.save(path)
    root = ET.parse(path).getroot()
    assert root.tag == "ranker"
    assert root.find("info/type").text == "MART"
    trees = root.findall("ensemble/tree")
    assert len(trees) == int(a.ensemble.num_trees)
    assert trees[0].get("id") == "1"
    split = trees[0].find("split")
    assert split.find("feature") is not None
    assert split.find("split[@pos='left']") is not None
    # 1-based feature ids on disk
    fids = [int(e.text) for e in root.iter("feature")]
    assert min(fids) >= 1


def test_oblivious_fast_scorer_after_load(tmp_path, splits):
    train, valid, test = splits
    a = ObliviousMart(ntrees=6, treedepth=3, nthresholds=32, seed=1)
    a.learn(train, valid, Ndcg(10), verbose=False)
    path = str(tmp_path / "m.xml")
    a.save(path)
    b = LTRAlgorithm.load(path)
    np.testing.assert_allclose(
        a.score_dataset(test), b.score_dataset(test), rtol=1e-5, atol=1e-6
    )
