#!/usr/bin/env bash
# Fetch the MSN1 (MSLR) 5k LETOR sample the reference's integration tests
# train on, enabling tests/test_msn1_parity.py.
#
# Source: the reference clones http://git.hpc.isti.cnr.it/quickrank/
# quickranktestdata.git at build time (reference CMakeLists.txt:80-89) and
# reads quickranktestdata/msn1/msn1.fold1.{train,vali,test}.5k.txt
# (catch-unit-tests/learning/forests/test-lambdamart.cc:33-37).
#
# Usage:
#   scripts/fetch_msn1.sh [DEST_DIR]        # default ./quickranktestdata
#   export QUICKRANK_MSN1_DIR=$PWD/quickranktestdata/msn1
#   python -m pytest tests/test_msn1_parity.py -v
#
# NOTE: this environment has no network egress — run this wherever the data
# host is reachable, or copy an existing quickranktestdata checkout in.

set -euo pipefail

DEST="${1:-quickranktestdata}"

if [ -d "$DEST/msn1" ]; then
    echo "already present: $DEST/msn1"
else
    git clone http://git.hpc.isti.cnr.it/quickrank/quickranktestdata.git "$DEST"
fi

for f in train vali test; do
    test -f "$DEST/msn1/msn1.fold1.$f.5k.txt" \
        || { echo "missing msn1.fold1.$f.5k.txt" >&2; exit 1; }
done

echo "OK — export QUICKRANK_MSN1_DIR=$(cd "$DEST/msn1" && pwd)"
