"""Data layer tests — counterpart of catch-unit-tests/data/test-hdata.cc:
shape checks, spot values, SVML round-trip, and padded-layout consistency."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from quickrank_tpu.data import (
    Dataset,
    gather_padded,
    read_svml,
    scatter_flat,
    shard_and_pad,
    write_svml,
)
from quickrank_tpu.data.dataset import assign_queries_to_shards
from quickrank_tpu.data.synthetic import make_ranking_dataset


def test_dataset_from_arrays():
    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    labels = np.array([0, 1, 2, 0, 1, 0], dtype=np.float32)
    qids = np.array([7, 7, 7, 9, 9, 11])
    ds = Dataset.from_arrays(feats, labels, qids)
    assert ds.num_docs == 6
    assert ds.num_queries == 3
    assert list(ds.query_offsets) == [0, 3, 5, 6]
    assert list(ds.qids) == [7, 9, 11]
    assert ds.max_docs_per_query == 3


def test_svml_roundtrip(tmp_path):
    ds = make_ranking_dataset(num_queries=5, avg_docs_per_query=20, num_features=11)
    path = os.path.join(tmp_path, "sample.txt")
    write_svml(ds, path)
    ds2 = read_svml(path)
    assert ds2.num_docs == ds.num_docs
    assert ds2.num_queries == ds.num_queries
    assert ds2.num_features == ds.num_features
    np.testing.assert_array_equal(ds2.labels, ds.labels)
    np.testing.assert_array_equal(ds2.query_offsets, ds.query_offsets)
    np.testing.assert_allclose(ds2.features, ds.features, rtol=1e-5, atol=1e-6)


def test_svml_parses_comments_and_sparse(tmp_path):
    path = os.path.join(tmp_path, "s.txt")
    with open(path, "w") as f:
        f.write("2 qid:1 1:0.5 3:1.25 # docid = G1\n")
        f.write("0 qid:1 2:2 # x\n")
        f.write("1 qid:4 1:1 2:1 3:1\n")
    ds = read_svml(path)
    assert ds.num_features == 3
    assert ds.num_queries == 2
    np.testing.assert_allclose(ds.features[0], [0.5, 0.0, 1.25])
    np.testing.assert_allclose(ds.features[1], [0.0, 2.0, 0.0])
    np.testing.assert_allclose(ds.labels, [2, 0, 1])


def test_assign_queries_balanced():
    counts = np.array([10, 10, 10, 10, 100, 10, 10, 10])
    groups = assign_queries_to_shards(counts, 4)
    assert [q for g in groups for q in g] == list(range(8))
    assert all(len(g) >= 1 for g in groups)


@pytest.mark.parametrize("num_shards", [1, 2, 4])
def test_shard_and_pad_roundtrip(num_shards):
    ds = make_ranking_dataset(num_queries=13, avg_docs_per_query=30, num_features=7)
    padded = shard_and_pad(ds, num_shards=num_shards)

    assert padded.num_real_docs == ds.num_docs
    assert int(padded.doc_mask.sum()) == ds.num_docs
    assert int(padded.query_mask.sum()) == ds.num_queries
    # per-query labels visible through the gather map must equal the originals
    lab = np.asarray(
        gather_padded(
            padded.labels, padded.pad_index_global, padded.slot_mask, fill=-1.0
        )
    )
    seen = []
    nv = np.asarray(padded.nvalid)
    qm = np.asarray(padded.query_mask)
    # shard-local pad_index: offset by shard block when flattening
    for gq in range(padded.num_queries_padded):
        if not qm[gq]:
            assert nv[gq] == 0
            continue
        seen.append(lab[gq, : nv[gq]])
    got = np.concatenate(seen)
    # queries keep original global order within the shard partition
    expect = []
    groups = assign_queries_to_shards(ds.docs_per_query(), num_shards)
    for g in groups:
        for q in g:
            expect.append(ds.labels[ds.query_slice(q)])
    np.testing.assert_array_equal(got, np.concatenate(expect))


def test_gather_scatter_inverse():
    ds = make_ranking_dataset(num_queries=9, avg_docs_per_query=25, num_features=5)
    padded = shard_and_pad(ds, num_shards=1)
    flat = jnp.asarray(np.random.default_rng(0).normal(size=(padded.num_docs_padded,)).astype(np.float32))
    flat = jnp.where(padded.doc_mask, flat, 0.0)
    view = gather_padded(flat, padded.pad_index, padded.slot_mask)
    back = scatter_flat(view, padded.pad_index, padded.slot_mask, padded.num_docs_padded)
    back = jnp.where(padded.doc_mask, back, 0.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(flat), rtol=1e-6)


@pytest.mark.parametrize("num_shards", [1, 2, 4])
def test_scatter_padded_matches_gather(num_shards):
    """The sort-based flat->view scatter (build_scatter_keys + lax.sort)
    must be bitwise equal to the index gather it replaces on the training
    hot path (mart.py _step_body), per shard block."""
    from quickrank_tpu.data.dataset import build_scatter_keys, scatter_padded

    ds = make_ranking_dataset(num_queries=13, avg_docs_per_query=17, num_features=4)
    padded = shard_and_pad(ds, num_shards=num_shards)
    keys = build_scatter_keys(padded)
    S = padded.num_shards
    n_loc = padded.docs_per_shard
    q_loc = padded.queries_per_shard
    M = keys.shape[0] // S
    flat = jnp.asarray(
        np.random.default_rng(1)
        .normal(size=(padded.num_docs_padded,))
        .astype(np.float32)
    )
    for s in range(S):
        f = flat[s * n_loc : (s + 1) * n_loc]
        k = jnp.asarray(keys[s * M : (s + 1) * M])
        dm = padded.doc_mask[s * n_loc : (s + 1) * n_loc]
        got = scatter_padded(f, k, (q_loc, padded.max_docs), dm)
        ref = gather_padded(
            f,
            padded.pad_index[s * q_loc : (s + 1) * q_loc],
            padded.slot_mask[s * q_loc : (s + 1) * q_loc],
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_native_svml_parser_matches_numpy(tmp_path, splits):
    """The C++ parser (native/svml_parser.cc) must agree exactly with the
    numpy reference parser."""
    import pytest

    train, _, _ = splits
    from quickrank_tpu.data import write_svml
    from quickrank_tpu.data.svml import _read_numpy

    path = str(tmp_path / "t.svml")
    write_svml(train, path)
    try:
        from quickrank_tpu.data import _svml_native

        nat = _svml_native.read(path)
    except Exception as e:  # pragma: no cover - toolchain missing
        pytest.skip(f"native parser unavailable: {e}")
    ref = _read_numpy(path)
    np.testing.assert_allclose(nat.features, ref.features, rtol=1e-6)
    np.testing.assert_allclose(nat.labels, ref.labels)
    np.testing.assert_array_equal(nat.query_offsets, ref.query_offsets)
    np.testing.assert_array_equal(nat.qids, ref.qids)


def test_native_binner_matches_numpy(rng):
    """native/binner.cc must reproduce the numpy threshold build and
    quantization bit-for-bit (including the equi-width float32 grid)."""
    pytest.importorskip("quickrank_tpu.ops._binning_native")
    from quickrank_tpu.ops import _binning_native as nat
    from quickrank_tpu.ops.binning import FLT_MAX

    N, F = 50_000, 12
    X = rng.normal(size=(N, F)).astype(np.float32)
    X[:, 1] = rng.integers(0, 5, N)   # low cardinality
    X[:, 2] = 1.5                     # constant
    X[:, 3] = -np.abs(X[:, 3])        # negative
    X[:, 4] = rng.integers(0, 700, N)  # cardinality > nthresholds

    for nth in (16, 255):
        th_n, c_n = nat.build_thresholds(X, nth)
        # numpy oracle (the loop in ops/binning.py)
        counts = np.zeros(F, np.int64)
        rows = []
        for f in range(F):
            uniq = np.unique(X[:, f])
            if len(uniq) <= nth:
                th = np.concatenate([uniq, [FLT_MAX]]).astype(np.float32)
            else:
                # r5 grid formula: DOUBLE arithmetic (a float32 step
                # overflows to inf for full-range features), rounded to
                # f32 per entry — the native binner matches bit-for-bit
                fmin, fmax = np.float64(uniq[0]), np.float64(uniq[-1])
                step = np.float64(abs(fmax - fmin)) / np.float64(nth)
                th = np.concatenate([
                    (fmin + step * np.arange(nth, dtype=np.float64)).astype(
                        np.float32
                    ),
                    [FLT_MAX],
                ]).astype(np.float32)
            rows.append(th)
            counts[f] = len(th)
        B = int(counts.max())
        ref = np.full((F, B), FLT_MAX, np.float32)
        for f in range(F):
            ref[f, : counts[f]] = rows[f]
        assert (c_n == counts).all()
        np.testing.assert_array_equal(th_n[:, :B], ref)

        got = nat.apply_bins(X, ref)
        want = np.empty((N, F), np.int32)
        for f in range(F):
            want[:, f] = np.searchsorted(ref[f], X[:, f], side="left")
        np.testing.assert_array_equal(got, want)


def test_native_writer_matches_python_and_roundtrips(tmp_path):
    """The multithreaded C++ SVML writer must emit byte-identical output to
    the Python fallback (label int/%.9g forms, qid, dense fid:val) and
    round-trip float32 exactly (both use 9 significant digits — a
    documented deviation from the reference's std::fixed writer,
    svml.cc:174-180, whose fractional cap truncates small magnitudes)."""
    import dataclasses

    from quickrank_tpu.data import _svml_native
    from quickrank_tpu.data.svml import read_svml, write_svml

    ds = make_ranking_dataset(
        num_queries=25, avg_docs_per_query=16, num_features=7, seed=9
    )
    lab = np.asarray(ds.labels).copy()
    lab[0], lab[1] = 1.25, 0.3333333  # exercise the non-integral label form
    ds = dataclasses.replace(ds, labels=lab)

    native = tmp_path / "n.svml"
    py = tmp_path / "p.svml"
    _svml_native.write(ds, str(native))
    orig = _svml_native.write
    _svml_native.write = lambda *a, **k: (_ for _ in ()).throw(OSError("x"))
    try:
        write_svml(ds, str(py))  # falls back to the Python loop
    finally:
        _svml_native.write = orig
    assert native.read_text() == py.read_text()

    r = read_svml(str(native))
    np.testing.assert_array_equal(np.asarray(r.features), ds.features)
    np.testing.assert_array_equal(np.asarray(r.labels), ds.labels)


def test_svml_edge_cases_native_matches_numpy(tmp_path):
    """Hostile-but-legal SVML: CRLF endings, blank lines, comment-only
    lines, scientific-notation values, float labels, tabs, no trailing
    newline, and a qid that REAPPEARS later (boundary semantics: a new
    query starts whenever qid differs from the previous line, svml.cc:
    38-161).  Both parsers must agree exactly."""
    import pytest

    from quickrank_tpu.data.svml import _read_numpy

    path = os.path.join(tmp_path, "edge.txt")
    content = (
        "# leading comment line\r\n"
        "1.5 qid:7 1:1e-3 3:-2.5E+2 # doc a\r\n"
        "\r\n"
        "0 qid:7\t2:0.125\n"
        "2 qid:3 1:3 2:4 3:5\n"
        "   \n"
        "1 qid:7 3:1"  # qid 7 reappears -> NEW query; no trailing newline
    )
    with open(path, "wb") as f:
        f.write(content.encode())

    ref = _read_numpy(path)
    assert ref.num_queries == 3  # 7, 3, 7 — boundary on change, not unique
    assert ref.num_docs == 4
    np.testing.assert_array_equal(ref.qids, [7, 3, 7])
    np.testing.assert_allclose(ref.labels, [1.5, 0.0, 2.0, 1.0])
    np.testing.assert_allclose(ref.features[0], [1e-3, 0.0, -2.5e2])
    np.testing.assert_allclose(ref.features[3], [0.0, 0.0, 1.0])

    try:
        from quickrank_tpu.data import _svml_native

        nat = _svml_native.read(path)
    except Exception as e:  # pragma: no cover - toolchain missing
        pytest.skip(f"native parser unavailable: {e}")
    np.testing.assert_allclose(nat.features, ref.features, rtol=1e-6)
    np.testing.assert_allclose(nat.labels, ref.labels)
    np.testing.assert_array_equal(nat.query_offsets, ref.query_offsets)
    np.testing.assert_array_equal(nat.qids, ref.qids)


def test_apply_bins_clamps_nonfinite():
    """r5 contract: apply_bins ids always land in [0, B-1] — NaN and +inf
    take the TOP bin (bin-space 'route right everywhere', matching the
    value-space v <= thr -> False descent), -inf takes bin 0; the native
    and numpy binners agree including on non-finite values."""
    import numpy as np

    from quickrank_tpu.ops.binning import apply_bins, build_thresholds

    rng = np.random.default_rng(0)
    X = rng.standard_normal((400, 5)).astype(np.float32)
    X[::17, 1] = np.inf
    X[::23, 2] = -np.inf
    X[::31, 3] = np.nan
    thr, _ = build_thresholds(
        np.nan_to_num(X, posinf=1e30, neginf=-1e30), 16
    )
    B = thr.shape[1]
    out = apply_bins(X, thr)
    assert out.min() >= 0 and out.max() <= B - 1
    assert (out[::17, 1] == B - 1).all()
    assert (out[::31, 3] == B - 1).all()
    assert (out[::23, 2] == 0).all()

    # numpy fallback path must match whatever path apply_bins dispatched
    ref = np.empty_like(out)
    for f in range(X.shape[1]):
        ref[:, f] = np.searchsorted(thr[f], X[:, f], side="left")
    np.minimum(ref, B - 1, out=ref)
    np.testing.assert_array_equal(out, ref)


def test_svml_rejects_fid_zero(tmp_path):
    """SVML feature ids are 1-based: id 0 used to wrap onto the LAST
    feature column silently (numpy path) or be dropped silently (native
    path); both parsers now raise."""
    import pytest

    from quickrank_tpu.data.svml import read_svml

    p = tmp_path / "bad.svml"
    p.write_text("2 qid:1 0:9.5 2:1.0\n")
    with pytest.raises(Exception, match="1-based"):
        read_svml(str(p))
