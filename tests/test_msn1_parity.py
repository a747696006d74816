"""Real-data quality parity against the reference's MSN1 floors.

The reference's integration tests train on a 5k-row sample of the MSN1
(MSLR) dataset fetched at build time (CMakeLists.txt:80-89, repo
git.hpc.isti.cnr.it/quickrank/quickranktestdata) and assert NDCG@10 floors
(catch-unit-tests/learning/**).  That data is not redistributable and this
environment has no network egress, so these tests are GATED on the env var
``QUICKRANK_MSN1_DIR`` pointing at a directory containing::

    msn1.fold1.train.5k.txt
    msn1.fold1.vali.5k.txt
    msn1.fold1.test.5k.txt

(see scripts/fetch_msn1.sh).  When the data is present, each test runs the
reference's EXACT configuration and asserts the reference's EXACT floors —
the same REQUIREs, file for file:

  LambdaMART  test-lambdamart.cc:45-52,135-137
  MART        test-mart.cc:45-52,135-137
  ObliviousMART        test-obliviousmart.cc:45-52,134-136
  ObliviousLambdaMART  test-obvlambdamart.cc:45-52,135-137
  RankBoost   test-rankboost.cc:41-44,129-131
  CoordinateAscent     test-ca.cc:44-51,136-138
  LineSearch  test-line_search.cc:44-51,131-133

Each test also repeats the reference's save -> reload -> identical-score
check (test-lambdamart.cc:110-128).
"""

import os

import numpy as np
import pytest

from quickrank_tpu.data.svml import read_svml
from quickrank_tpu.learning import (
    CoordinateAscent,
    LambdaMart,
    LineSearch,
    Mart,
    ObliviousLambdaMart,
    ObliviousMart,
    RankBoost,
)
from quickrank_tpu.learning.base import LTRAlgorithm
from quickrank_tpu.metrics import Ndcg

MSN1_DIR = os.environ.get("QUICKRANK_MSN1_DIR", "")

pytestmark = pytest.mark.skipif(
    not (
        MSN1_DIR
        and os.path.exists(
            os.path.join(MSN1_DIR, "msn1.fold1.train.5k.txt")
        )
    ),
    reason=(
        "MSN1 5k sample not available — set QUICKRANK_MSN1_DIR "
        "(see scripts/fetch_msn1.sh)"
    ),
)


@pytest.fixture(scope="module")
def msn1():
    train = read_svml(os.path.join(MSN1_DIR, "msn1.fold1.train.5k.txt"))
    valid = read_svml(os.path.join(MSN1_DIR, "msn1.fold1.vali.5k.txt"))
    test = read_svml(os.path.join(MSN1_DIR, "msn1.fold1.test.5k.txt"))
    return train, valid, test


def _run_floors(algo, msn1, floors, tmp_path, train_metric=None):
    """Train with validation, evaluate the three splits, assert the
    reference floors, and round-trip the model like the reference does."""
    train, valid, test = msn1
    metric = train_metric or Ndcg(10)
    algo.learn(train, valid, metric, verbose=True)
    scores = {
        "train": algo.evaluate(train, metric),
        "valid": algo.evaluate(valid, metric),
        "test": algo.evaluate(test, metric),
    }
    print(f"# NDCG@10: {scores}")
    for split, floor in zip(("train", "valid", "test"), floors):
        assert scores[split] >= floor, (
            f"{split} NDCG@10 {scores[split]:.4f} < reference floor {floor}"
        )
    # save -> reload -> identical test score (test-lambdamart.cc:110-128)
    path = str(tmp_path / "model.xml")
    algo.save(path)
    reloaded = LTRAlgorithm.load(path)
    np.testing.assert_allclose(
        reloaded.evaluate(test, metric), scores["test"], rtol=1e-5
    )


def test_msn1_lambdamart(msn1, tmp_path):
    algo = LambdaMart(
        ntrees=100, shrinkage=0.1, nthresholds=0, nleaves=16,
        minleafsupport=1, esr=100,
    )
    _run_floors(algo, msn1, (0.74055, 0.4402, 0.3519), tmp_path)


def test_msn1_mart(msn1, tmp_path):
    algo = Mart(
        ntrees=100, shrinkage=0.1, nthresholds=0, nleaves=16,
        minleafsupport=1, esr=100,
    )
    _run_floors(algo, msn1, (0.7153, 0.4580, 0.3706), tmp_path)


def test_msn1_obliviousmart(msn1, tmp_path):
    algo = ObliviousMart(
        ntrees=100, shrinkage=0.1, nthresholds=0, treedepth=4,
        minleafsupport=1, esr=100,
    )
    _run_floors(algo, msn1, (0.69, 0.436, 0.3490), tmp_path)


def test_msn1_obvlambdamart(msn1, tmp_path):
    algo = ObliviousLambdaMart(
        ntrees=100, shrinkage=0.1, nthresholds=0, treedepth=4,
        minleafsupport=1, esr=100,
    )
    _run_floors(algo, msn1, (0.4368, 0.3468, 0.2819), tmp_path)


def test_msn1_rankboost(msn1, tmp_path):
    algo = RankBoost(ntrees=100)
    _run_floors(algo, msn1, (0.4431, 0.4208, 0.3108), tmp_path)


def test_msn1_coordinate_ascent(msn1, tmp_path):
    algo = CoordinateAscent(
        num_points=21, window_size=10.0, reduction_factor=0.95,
        max_iterations=100, max_failed_vali=100,
    )
    _run_floors(algo, msn1, (0.4563, 0.3981, 0.3721), tmp_path)


def test_msn1_line_search(msn1, tmp_path):
    algo = LineSearch(
        num_points=21, window_size=10.0, reduction_factor=0.95,
        max_iterations=100, max_failed_vali=10,
    )
    _run_floors(algo, msn1, (0.2334, 0.2307, 0.2484), tmp_path)
