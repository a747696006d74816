"""CLI + codegen tests, including a compile-and-compare parity check: the
generated C scorer must produce the same scores as the in-framework
kernels (the reference's quickscore workflow, documentation/quickscore.md)."""

import os
import subprocess

import numpy as np
import pytest

from quickrank_tpu.data import write_svml
from quickrank_tpu.io import codegen
from quickrank_tpu.learning import LambdaMart, ObliviousMart
from quickrank_tpu.metrics import Ndcg


@pytest.fixture(scope="module")
def cli_run(tmp_path_factory, splits):
    d = tmp_path_factory.mktemp("cli")
    train, valid, test = splits
    write_svml(train, str(d / "train.svml"))
    write_svml(valid, str(d / "valid.svml"))
    write_svml(test, str(d / "test.svml"))
    from quickrank_tpu.cli import main

    rc = main([
        "--algo", "LAMBDAMART", "--train", str(d / "train.svml"),
        "--valid", str(d / "valid.svml"), "--test", str(d / "test.svml"),
        "--num-trees", "8", "--num-leaves", "8", "--num-thresholds", "32",
        "--model-out", str(d / "model.xml"), "--scores", str(d / "scores.txt"),
        "--partial", "0",
    ])
    assert rc == 0
    return d


def test_cli_outputs_exist(cli_run):
    assert (cli_run / "model.xml").exists()
    assert (cli_run / "scores.txt").exists()
    scores = np.loadtxt(cli_run / "scores.txt")
    assert scores.ndim == 1 and len(scores) > 0


def _compile_and_score(code: str, X: np.ndarray, tmp, extra_main: str = ""):
    src = tmp / "ranker.c"
    src.write_text(
        code
        + """
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char** argv) {
    int n, f;
    if (scanf("%d %d", &n, &f) != 2) return 1;
    float *v = malloc(sizeof(float) * f);
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < f; ++j) scanf("%f", &v[j]);
        printf("%.10g\\n", ranker(v));
    }
    return 0;
}
"""
    )
    exe = tmp / "ranker"
    subprocess.run(
        ["gcc", "-O1", "-o", str(exe), str(src), "-lm"], check=True
    )
    inp = [f"{X.shape[0]} {X.shape[1]}"]
    for row in X:
        inp.append(" ".join(np.format_float_positional(v, unique=True) for v in row))
    out = subprocess.run(
        [str(exe)], input="\n".join(inp), capture_output=True, text=True,
        check=True,
    )
    return np.asarray([float(x) for x in out.stdout.split()])


def test_condop_codegen_matches_scores(tmp_path, splits):
    train, valid, test = splits
    lm = LambdaMart(ntrees=5, nleaves=8, nthresholds=32, seed=1)
    lm.learn(train, valid, Ndcg(10), verbose=False)
    code = codegen.generate_condop(lm)
    X = test.features[:64]
    got = _compile_and_score(code, X, tmp_path)
    want = lm.score_dataset(test)[:64]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_oblivious_codegen_matches_scores(tmp_path, splits):
    train, valid, test = splits
    om = ObliviousMart(ntrees=5, treedepth=3, nthresholds=32, seed=1)
    om.learn(train, valid, Ndcg(10), verbose=False)
    code = codegen.generate_oblivious(om)
    X = test.features[:64]
    got = _compile_and_score(code, X, tmp_path)
    want = om.score_dataset(test)[:64]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_vpred_format(splits):
    train, _, _ = splits
    lm = LambdaMart(ntrees=3, nleaves=4, nthresholds=16, seed=1)
    lm.learn(train, None, Ndcg(10), verbose=False)  # no valid: keep all trees
    txt = codegen.generate_vpred(lm)
    lines = txt.strip().split("\n")
    assert lines[0] == "3"
    assert lines[2].startswith("root 0 ")
    assert txt.count("end\n") + txt.strip().endswith("end") >= 3


def _vpred_reconstruct_and_score(txt: str, X: np.ndarray) -> np.ndarray:
    """Rebuild each tree from the vpred node list via its (nid, pid,
    is_left) links and descend docs with the x[f] <= thr convention.  A
    'node' line is a leaf iff it never appears as a parent (internal lines
    carry feature+threshold, leaf lines carry parent-feature+value —
    generate_vpred.cc:127-146)."""
    lines = txt.strip().split("\n")
    ntrees = int(lines[0])
    pos = 1
    total = np.zeros(X.shape[0])
    for _ in range(ntrees):
        pos += 1  # depth line
        nodes = {}  # nid -> fields
        children = {}  # pid -> {is_left: nid}
        while lines[pos] != "end":
            f = lines[pos].split()
            pos += 1
            if f[0] == "root":
                nodes[0] = f
            else:
                nid, pid, is_left = int(f[1]), int(f[2]), None
                if f[0] == "leaf":
                    is_left = bool(int(f[3]))
                else:  # node nid pid x is_left y
                    is_left = bool(int(f[4]))
                nodes[nid] = f
                children.setdefault(pid, {})[is_left] = nid
        pos += 1  # consume 'end'

        def leaf_value(nid):
            return float(nodes[nid][-1])

        for i in range(X.shape[0]):
            nid = 0
            while nid in children:
                feat = int(nodes[nid][2]) if nodes[nid][0] == "root" else int(
                    nodes[nid][3]
                )
                thr = float(nodes[nid][-1])
                nid = children[nid][bool(X[i, feat] <= thr)]
            total[i] += leaf_value(nid)
    return total


def test_vpred_encodes_the_model_function(tmp_path, splits):
    """Semantic check: the emitted vpred node list must encode the SAME
    function as the model — reconstructed-tree scores equal
    score_dataset (leaf values are pre-scaled by the learning rate)."""
    train, valid, test = splits
    lm = LambdaMart(ntrees=5, nleaves=8, nthresholds=32, seed=1)
    lm.learn(train, valid, Ndcg(10), verbose=False)
    txt = codegen.generate_vpred(lm)
    X = test.features[:64].astype(np.float64)
    got = _vpred_reconstruct_and_score(txt, X)
    want = lm.score_dataset(test)[:64]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_quickscore_cli(cli_run):
    from quickrank_tpu.quickscore import main as qs

    rc = qs([
        "-d", str(cli_run / "test.svml"), "-m", str(cli_run / "model.xml"),
        "-r", "2",
    ])
    assert rc == 0


def test_quickscore_cli_num_shards(cli_run, tmp_path):
    """--num-shards fans scoring over a device mesh; scores must match the
    single-device run exactly."""
    from quickrank_tpu.quickscore import main as qs

    s1 = tmp_path / "s1.txt"
    s4 = tmp_path / "s4.txt"
    for out, extra in ((s1, []), (s4, ["--num-shards", "4"])):
        rc = qs([
            "-d", str(cli_run / "test.svml"),
            "-m", str(cli_run / "model.xml"),
            "-r", "1", "-s", str(out),
        ] + extra)
        assert rc == 0
    np.testing.assert_allclose(
        np.loadtxt(s1), np.loadtxt(s4), rtol=1e-6, atol=1e-6
    )


def test_cli_detailed_and_scores_outputs(tmp_path, splits):
    """--scores and --detailed (per-tree SVML, driver.cc:336-360) outputs."""
    from quickrank_tpu.cli import main
    from quickrank_tpu.data import read_svml, write_svml

    train, valid, test = splits
    d = tmp_path
    write_svml(train, str(d / "tr.svml"))
    write_svml(test, str(d / "te.svml"))
    rc = main([
        "--algo", "MART", "--train", str(d / "tr.svml"),
        "--test", str(d / "te.svml"), "--num-trees", "4", "--num-leaves", "4",
        "--num-thresholds", "16", "--partial", "0",
        "--scores", str(d / "s.txt"), "--detailed", str(d / "det.svml"),
    ])
    assert rc == 0
    scores = np.loadtxt(d / "s.txt")
    assert len(scores) == test.num_docs
    det = read_svml(str(d / "det.svml"))
    assert det.num_docs == test.num_docs
    assert det.num_features == 4  # one column per tree


def test_driver_phase_timings_and_trace(tmp_path, splits):
    """--trace DIR captures a jax.profiler device trace of training and the
    driver records per-phase wall times (SURVEY.md §5 tracing row; the
    reference's chrono phase prints, mart.cc:216-258)."""
    import os

    from quickrank_tpu import driver
    from quickrank_tpu.data import write_svml

    train, valid, _ = splits
    write_svml(train, str(tmp_path / "train.svml"))
    write_svml(valid, str(tmp_path / "test.svml"))
    res = driver.run({
        "algo": "MART",
        "train": str(tmp_path / "train.svml"),
        "test": str(tmp_path / "test.svml"),
        "num_trees": 3, "num_leaves": 4, "num_thresholds": 16,
        "trace": str(tmp_path / "trace"),
        "quiet": True,
    })
    t = res["timings"]
    assert set(t) >= {"load-data", "train", "test"}
    assert all(v > 0 for v in t.values())
    # the profiler wrote a plugin trace directory with at least one event file
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert found, "no trace artifacts captured"
