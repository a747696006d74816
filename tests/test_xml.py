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


def test_threshold_significant_digit_roundtrip():
    """_fmt_f must keep 9 SIGNIFICANT digits so any float32 threshold —
    including small magnitudes — parses back to the identical float32
    (reference: setprecision(max_digits10), rtnode.cc:68-70)."""
    from quickrank_tpu.io.xml_model import _fmt_f

    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.uniform(-1e4, 1e4, 200).astype(np.float32),
        (rng.uniform(1e-7, 1e-3, 200) * rng.choice([-1, 1], 200)).astype(
            np.float32
        ),
        np.asarray([0.0003456789, 1e-30, 3.4e38, 0.0], np.float32),
    ])
    for v in vals:
        assert np.float32(float(_fmt_f(v))) == v, v


def test_dart_xml_restores_dropout_config(tmp_path, splits):
    """A loaded DART model must reconstruct its dropout configuration, not
    silently fall back to defaults (the reference's Dart(xml) ctor parses
    these fields)."""
    from quickrank_tpu.learning.dart import Dart

    train, _, _ = splits
    a = Dart(
        ntrees=3, nleaves=4, nthresholds=16, seed=1,
        sample_type="WEIGHTED", normalize_type="FOREST",
        adaptive_type="PLUS1_DIV2", rate_drop=0.35, skip_drop=0.2,
        keep_drop=True, best_on_train=True, random_keep=0.4,
        drop_on_best=True,
    )
    a.learn(train, None, Ndcg(10), verbose=False)
    path = str(tmp_path / "dart.xml")
    a.save(path)
    b = LTRAlgorithm.load(path)
    assert type(b) is Dart
    for attr in (
        "sample_type", "normalize_type", "adaptive_type", "rate_drop",
        "skip_drop", "keep_drop", "best_on_train", "random_keep",
        "drop_on_best",
    ):
        assert getattr(b, attr) == getattr(a, attr), attr


def test_grower_config_roundtrips_via_info(tmp_path):
    """growth/split_pack/max_depth persist as extra <info> tags (like
    collapse_leaves_factor) so load + resume reconstructs the same
    grower; the reference parser ignores unknown info tags."""
    from quickrank_tpu.data.synthetic import make_ranking_dataset
    from quickrank_tpu.learning import LambdaMart
    from quickrank_tpu.learning.base import LTRAlgorithm
    from quickrank_tpu.metrics.metrics import Ndcg

    ds = make_ranking_dataset(num_queries=20, avg_docs_per_query=12, seed=0)
    lm = LambdaMart(
        ntrees=4, nleaves=4, nthresholds=15, esr=0,
        growth="bestk", split_pack=2, max_depth=3,
    )
    lm.learn(ds, None, Ndcg(10), verbose=False)
    fn = tmp_path / "m.xml"
    lm.save(str(fn))
    lm2 = LTRAlgorithm.load(str(fn))
    assert (lm2.growth, lm2.split_pack, lm2.max_depth) == ("bestk", 2, 3)
