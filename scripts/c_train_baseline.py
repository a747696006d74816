"""Reference-style multi-core TRAINING baseline: compile + time the C loop.

BASELINE.json's training target is "beating [QuickRank's] multi-core
training wall-clock per chip", but the reference binary cannot be built in
this image (empty submodules) and no measured denominator existed (r3
verdict "missing" item 2).  scripts/c_train_baseline.c re-creates the
reference's per-iteration tree-fitting cost — feature-major bins, per-node
sampleid lists, OpenMP-over-features cumulative double histograms with
sibling subtraction, max-deviance best-first growth (rtnode_histogram.cc:
40-87, rt.cc:49-313, mart.cc:307-383 semantics) — deliberately
conservative: it EXCLUDES the reference's per-iteration metric evaluation
and LambdaMART's pairwise lambda computation, both of which our measured
s/tree includes.

Prints one JSON line with seconds/tree at the same workload shape bench.py
times on the chip (docs, 136 features, 256 bins, 16 leaves).  Importable:
``measure(docs, trees)`` returns mean seconds/tree (multi-core) — bench.py
uses it for the ``train_vs_baseline`` extra.

Usage: python scripts/c_train_baseline.py [--docs 2560000] [--trees 8]
       [--single-thread]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "c_train_baseline.c")


def measure(docs: int = 2_560_000, trees: int = 8, warmup: int = 2,
            threads: int = 0, timeout_s: int = 900, bins: int = 256) -> dict:
    """Compile (gcc -O3 -march=native -fopenmp) and run; returns
    {"mean_s_per_tree", "per_tree", "threads"}.  Raises on any toolchain
    failure; callers fall back."""
    with tempfile.TemporaryDirectory() as d:
        exe = os.path.join(d, "ctrain")
        subprocess.run(
            ["gcc", "-O3", "-march=native", "-fopenmp", "-o", exe, _SRC,
             "-lm"],
            check=True,
        )
        env = dict(os.environ)
        if threads:
            env["OMP_NUM_THREADS"] = str(threads)
        out = subprocess.run(
            [exe, str(docs), "136", str(bins), "16", str(trees + warmup),
             str(warmup), "1", "0"],
            capture_output=True, text=True, check=True, env=env,
            timeout=timeout_s,
        )
    per_tree = []
    summary = {}
    for line in out.stdout.splitlines():
        parts = line.split()
        if parts[0] == "tree":
            per_tree.append(float(parts[2]))
        elif parts[0] == "summary":
            summary = dict(kv.split("=") for kv in parts[1:])
    return {
        "mean_s_per_tree": float(summary["mean_s_per_tree"]),
        "per_tree": per_tree,
        "threads": int(summary["threads"]),
        "docs": docs,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_560_000)
    ap.add_argument("--trees", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--single-thread", action="store_true")
    args = ap.parse_args(argv)

    r = measure(args.docs, args.trees, args.warmup,
                threads=1 if args.single_thread else 0)
    print(
        f"# {args.docs} docs x 136 feats x 256 bins x 16 leaves, "
        f"{r['threads']} threads: {r['mean_s_per_tree']:.3f} s/tree "
        f"(per-tree: {[round(t, 3) for t in r['per_tree']]})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "c_baseline_train_seconds_per_tree",
                "value": r["mean_s_per_tree"],
                "unit": f"s/tree ({r['threads']} threads, -O3 "
                        "-march=native -fopenmp)",
                "extra": {"per_tree": r["per_tree"], "docs": args.docs},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
