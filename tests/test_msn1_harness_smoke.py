"""Machinery smoke for the MSN1 parity harness.

tests/test_msn1_parity.py is gated on real MSN1 data that is absent here,
so nothing would catch a harness bug (bad config kwargs, broken floor
plumbing) until the moment the data exists.  This test materializes a
synthetic MSN1-shaped file trio and runs the REAL harness module against
it in a subprocess — the LambdaMART case end to end, exact floors and
save/reload check included (synthetic ranking data is easy enough that
the reference floors pass).  The real-data parity claim stays with the
gated module; this proves its machinery executes."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_msn1_harness_machinery_runs(tmp_path):
    from quickrank_tpu.data.svml import write_svml
    from quickrank_tpu.data.synthetic import make_ranking_dataset

    d = tmp_path / "msn1"
    d.mkdir()
    for split, nq, seed in (("train", 60, 0), ("vali", 20, 1), ("test", 20, 2)):
        ds = make_ranking_dataset(
            num_queries=nq, avg_docs_per_query=18, num_features=20, seed=seed
        )
        write_svml(ds, str(d / f"msn1.fold1.{split}.5k.txt"))

    env = dict(os.environ)
    env["QUICKRANK_MSN1_DIR"] = str(d)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_msn1_parity.py", "-k", "lambdamart and not obv",
         "-q", "--no-header"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1500,
    )
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-3000:]
    assert "1 passed" in out, out[-1500:]
