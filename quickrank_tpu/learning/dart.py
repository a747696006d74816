"""DART / X-DART — LambdaMART with per-iteration tree dropout.

TPU-native re-design of ``Dart`` (src/learning/forests/dart.cc): the boosting
core (lambda gradients, tree fit, rescoring, metric) runs as jitted device
kernels, while the dropout bookkeeping — which trees to drop, weight
normalization on restore, permanent pruning — is host logic mirroring the
reference exactly:

  * sampling types (dart.cc:708-854): UNIFORM, TOP_FIFTY (shuffle of the
    first half), WEIGHTED / WEIGHTED_INV (roulette by weight), CONTR /
    CONTR_INV / WCONTR / WCONTR_INV (roulette by |score| contribution),
    TOP_WCONTR / LESS_WCONTR (extremal weighted contribution);
  * normalization types (dart.cc:856-1060): TREE, NONE, WEIGHTED, FOREST,
    TREE_ADAPTIVE, TREE_BOOST3, LINESEARCH (an embedded 16-point search over
    the new tree's weight), CONTR, WCONTR, LMART_ADAPTIVE;
  * adaptive dropout-count schedules (dart.cc:1095-1181): FIXED, PLUS1_DIV2,
    PLUSHALF_DIV2, PLUSONETHIRD_DIV2, PLUSHALF_RESET(+LB1_UB5/UB10/UBRD),
    capped at half the live model;
  * X-DART extensions (dart.cc:430-515): ``keep_drop`` permanently removes
    the dropped set when fitting after dropout improves the reference metric
    (or with probability ``random_keep``); ``drop_on_best`` compares against
    the best-so-far metric; zero-weight trees are compacted whenever the
    best model improves, and a full rescoring pass fights incremental drift
    every >10 iterations after a cleanup (dart.cc:552-558).

Multi-chip: pass ``mesh`` (1-D data mesh or 2-D data x feature mesh) —
every device kernel (fit, dropped-subset rescoring, metric, embedded line
search) runs under ``shard_map`` with the same histogram/metric psum
discipline as the other learners; under feature sharding the dropped-set
descent routes via per-level owner-psum bits (descend_tree_binned's
``feat_axis``) while the validation split stays feature-replicated, as in
Mart.  Feature-axis sharding is EXACT (routing bits are integer decisions
— tests pin 1 x k mesh == single device bitwise).  Data-axis sharding
reproduces single-device results up to dropout decision ties: a ~1e-7
metric-psum reordering near a ``best_improved`` tie can flip a compaction
and cascade into different dropout draws; the LINESEARCH normalization
adds the same class of variance through its 17-point argmax on NDCG
plateaus (both are the tie-break variance the reference has across OpenMP
schedules; bounded by tests/test_sharding.py against seed variance).
"""

from __future__ import annotations

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from quickrank_tpu.learning.lambdamart import LambdaMart
from quickrank_tpu.learning.mart import (
    TrainData,
    build_valid_traindata,
    eval_metric,
)
from quickrank_tpu.ops.scoring import leaf_values_onehot, tree_delta_binned
from quickrank_tpu.trees.grow import leaf_outputs
from quickrank_tpu.trees.structs import EnsembleTensors, Tree


def _qs_delta_enabled() -> bool:
    """Route the per-iteration dropped-set delta through bin-space QS
    tables instead of the pad-length descent scan.

    The scan (``_delta_body``) costs one full-dataset descent per PAD
    slot, and the pad scales with ntrees (2^ceil(log2(2·rate_drop·T)));
    at ntrees=200 / MSLR scale that is 64 descents ≈ +1.4 s/iter
    (docs/sweeps/2026-08-21-dart-valid.json).  QS tables score every
    tree in one grouped-matmul pass with `weight` separate from
    structure, so zeroing the kept slots yields the same delta with
    cost ~flat in the drop count.  Deltas differ from the scan only in
    summation association (Kahan in slot order vs plain sum in drop
    order); routing and leaf values are bitwise identical (trees/qs.py).

    Gate mirrors mart.rescore_binned: single-controller TPU only (the
    host-built tables are process-local).  QRTPU_DART_QS_DELTA=0
    disables; =force enables on any backend (CPU equivalence tests)."""
    import os

    v = os.environ.get("QRTPU_DART_QS_DELTA", "auto")
    if v == "0":
        return False
    if v == "force":
        return True
    return jax.default_backend() == "tpu" and jax.process_count() == 1

SAMPLING_TYPES = (
    "UNIFORM", "WEIGHTED", "WEIGHTED_INV", "TOP_FIFTY", "CONTR", "CONTR_INV",
    "WCONTR", "WCONTR_INV", "TOP_WCONTR", "LESS_WCONTR",
)
NORMALIZATION_TYPES = (
    "TREE", "NONE", "WEIGHTED", "FOREST", "TREE_ADAPTIVE", "LINESEARCH",
    "TREE_BOOST3", "CONTR", "WCONTR", "LMART_ADAPTIVE",
)
ADAPTIVE_TYPES = (
    "FIXED", "PLUS1_DIV2", "PLUSHALF_DIV2", "PLUSONETHIRD_DIV2",
    "PLUSHALF_RESET", "PLUSHALF_RESET_LB1_UB5", "PLUSHALF_RESET_LB1_UB10",
    "PLUSHALF_RESET_LB1_UBRD",
)


class Dart(LambdaMart):
    NAME = "DART"

    def __init__(
        self,
        *args,
        sample_type: str = "UNIFORM",
        normalize_type: str = "TREE",
        adaptive_type: str = "FIXED",
        rate_drop: float = 0.1,
        skip_drop: float = 0.0,
        keep_drop: bool = False,
        best_on_train: bool = False,
        random_keep: float = 0.0,
        drop_on_best: bool = False,
        **kw,
    ):
        super().__init__(*args, **kw)
        self.sample_type = sample_type.upper()
        self.normalize_type = normalize_type.upper()
        self.adaptive_type = adaptive_type.upper()
        for val, known in (
            (self.sample_type, SAMPLING_TYPES),
            (self.normalize_type, NORMALIZATION_TYPES),
            (self.adaptive_type, ADAPTIVE_TYPES),
        ):
            if val not in known:
                raise ValueError(f"unknown DART option {val!r}; known: {known}")
        self.rate_drop = float(rate_drop)
        self.skip_drop = float(skip_drop)
        self.keep_drop = bool(keep_drop)
        self.best_on_train = bool(best_on_train)
        self.random_keep = float(random_keep)
        self.drop_on_best = bool(drop_on_best)

    # ------------------------------------------------------------------

    def learn(
        self,
        train,
        valid=None,
        metric=None,
        verbose=True,
        mesh=None,
        warm_start=False,
        partial_save=0,
        output_basename="",
    ):
        """Train.  ``warm_start`` resumes from the current ensemble after a
        full rescoring + per-tree contribution rebuild; ``partial_save``
        writes <base>.T<k>.xml snapshots — the Mart-family --partial /
        --restart-train surface (mart.cc:237-253, :378-381) applied to the
        DART loop, which the reference lacks.

        The per-iteration device pipeline — tree fit, tree weighting (incl.
        the 16-point line search), keep-drop vs renormalized restore, and
        both metrics — runs as ONE fixed-shape jitted call fed by a small
        separately-jitted dropped-set delta kernel (only that cheap kernel
        recompiles when the dropout pad grows); the host keeps an exact f32
        mirror of the ensemble weights (updated from the same scalars the
        device used), so each iteration costs two dispatches + one scalar
        fetch instead of ~10 round trips.  That host chatter was the
        dominant per-iteration cost over a remote-chip link."""
        metric = metric or self.default_metric()
        import time as _time

        t0 = _time.time()
        num_shards, num_feat_shards = 1, 1
        axis = feat_axis = None
        if mesh is not None:
            axis = mesh.axis_names[0]
            feat_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
            num_shards = int(mesh.shape[axis])
            num_feat_shards = int(mesh.shape[feat_axis]) if feat_axis else 1
        if feat_axis is not None and warm_start:
            raise NotImplementedError(
                "DART warm start (--restart-train) under feature-axis "
                "sharding is not supported — drop --num-feat-shards "
                "(PARITY.md known exclusions)"
            )
        if isinstance(train, TrainData):
            # pre-assembled step tensors (multi-host path,
            # parallel/multihost.py) — same acceptance as Mart.learn
            tr = train
            if warm_start and tr.presharded:
                raise NotImplementedError(
                    "DART warm start with a presharded multi-host TrainData "
                    "is not supported (host-side rescoring gathers need the "
                    "global flat layout)"
                )
        else:
            tr = TrainData.build(
                train, self.nthresholds, num_shards=num_shards,
                num_feat_shards=num_feat_shards,
            )
        va = build_valid_traindata(tr, valid, self.nthresholds, num_shards)
        if mesh is not None and not tr.presharded:
            import dataclasses as _dc

            from quickrank_tpu.parallel.mesh import shard_step_data

            tr = _dc.replace(
                tr, step=shard_step_data(tr.step, mesh, axis, feat_axis)
            )
            if va is not None:
                va = _dc.replace(va, step=shard_step_data(va.step, mesh, axis))
        cfg = self._grow_config(
            tr.num_bins, feat_axis, num_feat_shards,
            num_real_features=tr.num_real_features,
        )
        self._train_metric = metric
        md = self._descend_depth()
        rng = np.random.default_rng(self.seed)

        if tr.presharded:
            # multi-host: geometry comes from the GLOBAL step tensors
            # (tr.padded is only this process's local block)
            N = tr.step.binned.shape[0]
            # integer sum: an f32 accumulation would round above 2^24 docs
            # and silently skew contrib normalization at pod scale
            n_real = int(
                jax.jit(lambda mk: jnp.sum(mk.astype(jnp.int32)))(
                    tr.step.doc_mask
                )
            )
        else:
            N = tr.padded.num_docs_padded
            n_real = tr.padded.doc_mask.sum()

        # -- device kernels (wrapped in shard_map under a mesh) ------------
        def _fit_body(scores_tr, presence, key, tr_sd, va_sd):
            k1, k2, k3 = jax.random.split(key, 3)
            if axis is not None:
                k1 = jax.random.fold_in(k1, jax.lax.axis_index(axis))
            smask = self._sample_mask(tr_sd, k1, presence & tr_sd.doc_mask)
            grad, w = self._gradients(tr_sd, scores_tr, smask, k2)
            # same grower dispatch as the rest of the Mart family: DART
            # composes with growth="level"/"bestk" too (the fit is most of
            # the 0-dropped iteration cost; dart.cc:318-323 only ever
            # grows best-first because the reference has one grower)
            tree, node, leaves_done = self._fit_and_assign(
                tr_sd, grad, smask, cfg, k3, axis, weights=w
            )
            if not leaves_done:
                tree = leaf_outputs(
                    tree, node, grad, smask, weights=w, axis_name=axis
                )
            d_tr = leaf_values_onehot(node, tree)
            contrib = jnp.sum(jnp.abs(d_tr) * tr_sd.doc_mask)
            if axis is not None:
                contrib = jax.lax.psum(contrib, axis)
            contrib = contrib / n_real
            if va_sd is None:
                d_va = jnp.zeros((1,), jnp.float32)
            else:
                d_va = tree_delta_binned(va_sd.binned, tree, md)
            return tree, d_tr, d_va, contrib

        def _delta_body(ens, idx, w, sd, fa=None):
            """Score delta of the (padded) dropped set: sum_i w_i * tree_i(x).

            Jitted SEPARATELY from the fused iteration: the pad length
            doubles as the dropout count grows, and recompiling this small
            descent scan costs seconds, whereas a pad-shape change inside
            the fused pipeline would recompile the whole training step.

            ``fa`` is the feature-mesh axis when ``sd.binned`` is a
            feature-sharded local block (2-D mesh): descent then routes via
            the owner-psum bit (ops/scoring.py::descend_tree_binned)."""

            def body(acc, iw):
                i, wi = iw
                tree = ens.tree(i)
                d = tree_delta_binned(sd.binned, tree, md, feat_axis=fa)
                return acc + wi * d, None

            out, _ = jax.lax.scan(
                body,
                jnp.zeros((sd.binned.shape[0],), jnp.float32),
                (idx, w),
            )
            return out

        def _linesearch_body(scores_tr, d_tr, tr_sd):
            # 16-point window search for the new tree's weight
            # (dart.cc:977-1034: window 1 around 1.0, positive points only)
            pts = (2.0 / 16.0) * jnp.arange(17, dtype=jnp.float32)
            valid = pts > 0
            cand = scores_tr[None, :] + pts[:, None] * d_tr[None, :]
            ms = jax.vmap(lambda s: eval_metric(metric, tr_sd, s, axis))(cand)
            ms = jnp.where(valid, ms, -jnp.inf)
            return pts[jnp.argmax(ms)]

        cap = self.ntrees + max(16, self.ntrees // 4)
        nt = self.normalize_type
        shr = self.shrinkage

        def _iteration_body(
            scores_tr, scores_va, delta_tr, delta_va, ens, dropmask, n_drop,
            key, ref_tr, ref_va, force_keep, dc_sum, dcw_sum, tr_sd, va_sd,
        ):
            """One full DART iteration on device: drop -> fit -> weight ->
            keep/restore -> metrics.  ``delta_tr``/``delta_va`` are the
            dropped set's score contributions (from the separately-jitted
            _delta_body) and ``dropmask`` is a fixed-shape [cap] bool mask
            of the dropped slots, so this — the expensive pipeline — has no
            pad-dependent shapes and compiles exactly once; all the
            normalize/keep formulas (dart.cc:856-1060, :430-445) run here
            so the host only supplies RNG decisions and reads back scalars.
            """
            have_drop = n_drop > 0

            # 1. remove the dropped trees from the scores
            s_tr = scores_tr - delta_tr
            s_va = scores_va - delta_va if va_sd is not None else scores_va
            w_orig = ens.weight
            ens_z = ens.replace(weight=jnp.where(dropmask, 0.0, w_orig))

            # 2. fit on the dropped-out scores
            tree, d_tr, d_va, contribution = _fit_body(
                s_tr, tr_sd.doc_mask, key, tr_sd, va_sd
            )

            # 3. initial weight of the fitted tree (dart.cc:944-1060)
            s_ = jnp.float32(shr)
            k = n_drop.astype(jnp.float32)
            if nt == "LINESEARCH":
                tw = _linesearch_body(s_tr, d_tr, tr_sd)
            elif nt == "TREE_ADAPTIVE":
                tw = s_ / (s_ + k)
            elif nt == "TREE_BOOST3":
                tw = (s_ * 3) / (s_ * 3 + k)
            elif nt in ("CONTR", "WCONTR"):
                tw = jnp.where(
                    have_drop,
                    (dc_sum / jnp.maximum(contribution, 1e-12)) * s_,
                    s_,
                )
            elif nt == "LMART_ADAPTIVE":
                tw = s_ / (self.rate_drop * ens.num_trees.astype(jnp.float32) + s_)
            else:  # TREE / NONE / WEIGHTED / FOREST
                tw = s_
            ens_f = ens_z.push(tree, tw)
            new_idx = ens_f.num_trees - 1
            s_tr_fit = s_tr + tw * d_tr
            m_tr_fit = eval_metric(metric, tr_sd, s_tr_fit, axis)
            if va_sd is not None:
                s_va_fit = s_va + tw * d_va
                m_va_fit = eval_metric(metric, va_sd, s_va_fit, axis)
                fit_improved = (m_va_fit > ref_va) & have_drop
            else:
                s_va_fit = s_va
                m_va_fit = jnp.float32(jnp.nan)
                fit_improved = (m_tr_fit > ref_tr) & have_drop

            # 4. restored weights (normalize_trees_restore_drop,
            #    dart.cc:856-942); no-drop iterations keep tw / factor 1
            if nt in ("TREE", "TREE_ADAPTIVE", "TREE_BOOST3"):
                alpha = 3.0 if nt == "TREE_BOOST3" else 1.0
                w_new = (s_ * alpha) / (s_ * alpha + k)
                factor = k / jnp.maximum(k + s_ * alpha, 1e-12)
            elif nt == "NONE":
                w_new, factor = s_, jnp.float32(1.0)
            elif nt == "WEIGHTED":
                dsum = jnp.sum(jnp.where(dropmask, w_orig, 0.0))
                w_new = s_ / (dsum + s_)
                factor = dsum / (dsum + s_)
            elif nt == "FOREST":
                w_new = s_ / (1.0 + s_)
                factor = 1.0 / (1.0 + s_)
            elif nt == "LINESEARCH":
                w_new = tw / jnp.maximum(tw + k, 1e-12)
                factor = k / jnp.maximum(k + tw, 1e-12)
            elif nt in ("CONTR", "WCONTR"):
                dc = dcw_sum if nt == "WCONTR" else dc_sum
                cl = (tw if nt == "WCONTR" else 1.0) * contribution
                tot = jnp.maximum(dc + cl, 1e-12)
                w_new, factor = cl / tot, dc / tot
            else:  # LMART_ADAPTIVE
                w_new, factor = tw, jnp.float32(1.0)
            w_new = jnp.where(have_drop, w_new, tw)
            factor = jnp.where(have_drop, factor, 1.0)

            def _restore(_):
                ens_r_w = jnp.where(
                    dropmask, w_orig * factor, ens_f.weight
                ).at[new_idx].set(w_new)
                # restored weights are wdrop*factor — a scalar multiple of
                # the pre-drop weights — so re-adding the dropped set is
                # factor * (the delta already computed), no re-descent
                s_tr_r = s_tr + factor * delta_tr + w_new * d_tr
                m_tr_r = eval_metric(metric, tr_sd, s_tr_r, axis)
                if va_sd is not None:
                    s_va_r = s_va + factor * delta_va + w_new * d_va
                    m_va_r = eval_metric(metric, va_sd, s_va_r, axis)
                else:
                    s_va_r, m_va_r = s_va, jnp.float32(jnp.nan)
                return ens_r_w, s_tr_r, s_va_r, m_tr_r, m_va_r

            if self.keep_drop:
                kept = fit_improved | (force_keep & have_drop)

                def _keep(_):
                    return (
                        ens_f.weight, s_tr_fit, s_va_fit, m_tr_fit, m_va_fit
                    )

                w_out, s_tr_o, s_va_o, m_tr_o, m_va_o = jax.lax.cond(
                    kept, _keep, _restore, None
                )
            else:
                kept = jnp.asarray(False)
                w_out, s_tr_o, s_va_o, m_tr_o, m_va_o = _restore(None)
            ens_out = ens_f.replace(weight=w_out)
            return (
                s_tr_o, s_va_o, ens_out, contribution, tw, w_new, factor,
                kept, m_tr_o, m_va_o,
            )

        if mesh is None:
            # Data tensors passed as jit arguments (not closure constants) to
            # keep compiles fast and executables small.
            if va is not None:
                _it_j = jax.jit(
                    _iteration_body, donate_argnums=(0, 1, 4)
                )
                iteration = lambda *a: _it_j(*a, tr.step, va.step)  # noqa: E731
            else:
                _it_j = jax.jit(
                    lambda *a: _iteration_body(*a, None),
                    donate_argnums=(0, 1, 4),
                )
                iteration = lambda *a: _it_j(*a, tr.step)  # noqa: E731
            _delta_j = jax.jit(_delta_body)
            delta_tr_fn = lambda e, i, w: _delta_j(e, i, w, tr.step)  # noqa: E731
            delta_va_fn = (
                (lambda e, i, w: _delta_j(e, i, w, va.step))
                if va is not None
                else None
            )
            # dropped-set deltas via QS tables (see _qs_delta_enabled);
            # the descent scan above stays as the fallback/mesh path
            use_qs_delta = _qs_delta_enabled()
            _eval_j = jax.jit(lambda s, sd: eval_metric(metric, sd, s))
            eval_tr = lambda s: _eval_j(s, tr.step)  # noqa: E731
            eval_va = (
                (lambda s: _eval_j(s, va.step)) if va is not None else (lambda s: 0.0)
            )
        else:
            from quickrank_tpu.learning.mart import shard_map
            from quickrank_tpu.parallel.mesh import step_data_specs
            from quickrank_tpu.trees.structs import EnsembleTensors as _ET

            rep = P()
            Pd = P(axis)
            tr_specs = step_data_specs(tr.step, axis, feat_axis)
            va_specs = step_data_specs(va.step, axis) if va is not None else None
            ens_specs = jax.tree.map(lambda _: rep, _ET.empty(1, 1))
            Pva = Pd if va is not None else rep

            sharded = shard_map(
                (lambda *a: _iteration_body(*a))
                if va is not None
                else (lambda *a: _iteration_body(*a, None)),
                mesh,
                in_specs=(Pd, Pva, Pd, Pva, ens_specs) + (rep,) * 8
                + (tr_specs,)
                + ((va_specs,) if va is not None else ()),
                out_specs=(Pd, Pva, ens_specs) + (rep,) * 7,
                check_rep=False,
            )
            _it_j = jax.jit(
                sharded,
                donate_argnums=(0, 1, 4),
            )
            if va is not None:
                iteration = lambda *a: _it_j(*a, tr.step, va.step)  # noqa: E731
            else:
                iteration = lambda *a: _it_j(*a, tr.step)  # noqa: E731

            def _mk_delta(sd, specs, fa):
                inner = jax.jit(
                    shard_map(
                        lambda e, i, w, d: _delta_body(e, i, w, d, fa), mesh,
                        in_specs=(ens_specs, rep, rep, specs),
                        out_specs=Pd,
                        check_rep=False,
                    )
                )
                return lambda e, i, w: inner(e, i, w, sd)

            delta_tr_fn = _mk_delta(tr.step, tr_specs, feat_axis)
            delta_va_fn = (
                _mk_delta(va.step, va_specs, None) if va is not None else None
            )
            # mesh / multi-host runs keep the shard_map'd descent scan:
            # host-built QS tables are process-local (see rescore_binned)
            use_qs_delta = False

            def _mk_eval(sd, specs):
                inner = jax.jit(
                    shard_map(
                        lambda s, d: eval_metric(metric, d, s, axis), mesh,
                        in_specs=(Pd, specs), out_specs=rep,
                    )
                )
                return lambda s: inner(s, sd)

            eval_tr = _mk_eval(tr.step, tr_specs)
            eval_va = _mk_eval(va.step, va_specs) if va is not None else (
                lambda s: 0.0
            )

        # -- host state ----------------------------------------------------
        ens = EnsembleTensors.empty(cap, cfg.max_nodes)
        # exact f32 mirror of ens.weight, updated with the same scalars the
        # device used — sampling probabilities and compaction zero-patterns
        # never need a device round trip
        w_host = np.zeros(cap, np.float32)
        T_host = 0
        if tr.presharded:
            # multi-host: score buffers must be GLOBAL sharded arrays laid
            # out like the step tensors (a process-local jnp.zeros cannot
            # feed a multi-process jit) — same device discipline as
            # Mart.learn's presharded branch
            from jax.sharding import NamedSharding

            _sf = NamedSharding(mesh, P(axis))
            _mkz = lambda n: jax.jit(  # noqa: E731
                lambda: jnp.zeros((n,), jnp.float32), out_shardings=_sf
            )()
            scores_tr = _mkz(N)
            scores_va = (
                _mkz(va.step.binned.shape[0])
                if va is not None
                else jnp.zeros((1,), jnp.float32)
            )
        else:
            scores_tr = jnp.zeros((N,), jnp.float32)
            scores_va = (
                jnp.zeros((va.padded.num_docs_padded,), jnp.float32)
                if va is not None
                else jnp.zeros((1,), jnp.float32)
            )
        # sharding-preserving fresh zeros (works for host-local AND global
        # sharded score buffers; eager zeros_like on a non-addressable
        # array is not allowed outside jit)
        _zeros_like_j = jax.jit(lambda x: jnp.zeros_like(x))
        contributions: list[float] = []
        m_tr = 0.0
        m_va = 0.0
        best_tr, best_va = -np.inf, -np.inf
        best_iter = -1
        best_size = 0
        best_weights = np.zeros(0, np.float32)
        dropped_before_cleaning = 0
        dropout_factor_hist = [0.0]
        perf_valid_hist = [0.0]
        last_global_rescore = 0
        hist_tr, hist_va = [], []
        root_key = jax.random.PRNGKey(self.seed)
        # The dropped-set pad doubles as dropout grows; only the small
        # _delta_body scan recompiles on a pad change (seconds) — the fused
        # iteration sees fixed shapes (delta arrays + [cap] mask) and
        # compiles exactly once.  Start the pad at ~2x the EXPECTED drop
        # count (binomial mean rate_drop*T, so 2x covers the steady-state
        # tail) instead of 1: the delta scan's cost is flat in pad size
        # (BENCHMARKS.md DART section), so the only effect is that the
        # {1,2,4,...} recompile ladder — the r4 bench's 2-4 s iteration
        # spikes — collapses to a single compile, paid below during init.
        exp_drop = (
            self.rate_drop if self.rate_drop >= 1
            else self.rate_drop * self.ntrees
        )
        max_pad = 1
        while max_pad < min(cap, max(1, int(2.0 * exp_drop))):
            max_pad *= 2

        def pad_set(idx_list, w_list):
            nonlocal max_pad
            k = max(1, len(idx_list))
            while max_pad < k:
                max_pad *= 2
            idx = np.zeros(max_pad, np.int32)
            w = np.zeros(max_pad, np.float32)
            idx[: len(idx_list)] = idx_list
            w[: len(w_list)] = w_list
            return jnp.asarray(idx), jnp.asarray(w)

        iter_offset = 0
        if warm_start and self.ensemble is not None and int(
            self.ensemble.num_trees
        ) > 0:
            from quickrank_tpu.learning.mart import _copy_into, rebin_ensemble

            src = rebin_ensemble(
                self.ensemble, np.asarray(tr.step.thresholds), force=True
            )
            ens = _copy_into(ens, src)
            T0 = int(ens.num_trees)
            iter_offset = T0
            scores_tr = self._full_rescore(ens, tr, md)
            m_tr = float(eval_tr(scores_tr))
            if va is not None:
                scores_va = self._full_rescore(ens, va, md)
                m_va = float(eval_va(scores_va))
            # per-tree mean |output| drives the CONTR samplers — rebuild it
            # for the imported trees the same way fit-time tracks it
            contribs = self._contribs_j(
                ens, tr.step.binned, tr.step.doc_mask, jnp.float32(n_real), md
            )
            contributions = [float(c) for c in np.asarray(contribs)[:T0]]
            best_tr = m_tr
            best_va = m_va if va is not None else -np.inf
            best_iter = 0
            best_size = T0
            T_host = T0
            w_host[:T0] = np.asarray(ens.weight)[:T0]
            best_weights = w_host[:T0].copy()
        # Pre-compile the delta scan at the initial pad during init: the
        # first dropped iteration would otherwise pay the ~2-4 s compile
        # mid-run (the dominant DART tail spike, r4 verdict weak #2).  A
        # zero idx/w set over the (possibly empty) ensemble compiles the
        # same fixed-shape program every real call reuses; the result is
        # discarded.
        _warm_idx, _warm_w = pad_set([], [])
        if use_qs_delta:
            # warm the QS delta program instead of the (unused) descent
            # scan: capacity-shaped tables + raw binned dtype, so this
            # one compile serves every dropped iteration
            from quickrank_tpu.trees.qs import ensemble_to_qs, score_qs

            _qs_w = ensemble_to_qs(ens, space="bin")
            jax.block_until_ready(score_qs(tr.step.binned, _qs_w))
            if va is not None:
                jax.block_until_ready(score_qs(va.step.binned, _qs_w))
        else:
            jax.block_until_ready(delta_tr_fn(ens, _warm_idx, _warm_w))
            if delta_va_fn is not None:
                jax.block_until_ready(delta_va_fn(ens, _warm_idx, _warm_w))
        if (
            jax.default_backend() == "tpu"
            and jax.process_count() == 1
            and iter_offset == 0  # a warm start's rescore above already
            # compiled and ran the identical capacity-shaped program
            and not use_qs_delta  # the delta warm above compiled the
            # same raw-binned capacity-shaped program already
        ):
            # also pre-compile the periodic-rescore QS program (capacity-
            # shaped tables, so one compile serves every rescore): its
            # first mid-run call otherwise pays ~4 s (the one residual
            # spike after the pad-ladder warm).
            from quickrank_tpu.trees.qs import ensemble_to_qs, score_qs

            _qs0 = ensemble_to_qs(ens, space="bin")
            jax.block_until_ready(score_qs(tr.step.binned, _qs0))
            if va is not None:
                jax.block_until_ready(score_qs(va.step.binned, _qs0))
        init_time = _time.time() - t0
        if verbose:
            print(f"# {self.NAME}: {self!r}")
        t_train = _time.time()
        iter_seconds: list[float] = []
        dropped_per_iter: list[int] = []  # dropped-set size per iteration
        m = 0
        while T_host - dropped_before_cleaning < self.ntrees:
            m += 1
            if va is not None and self.esr and m > best_iter + self.esr:
                break
            t_iter = _time.time()
            key = jax.random.fold_in(root_key, m)

            if T_host >= cap:
                # Capacity guard: drop zero-weighted trees now, but keep the
                # best-snapshot slots (always the first ``best_size`` by the
                # append-only invariant) so the final rollback stays valid.
                ens, contributions, w_host, T_host = (
                    self._compact_zero_weights(
                        ens, contributions, w_host, T_host,
                        protect=max(best_size, 0),
                    )
                )
                dropped_before_cleaning = int(
                    np.sum(w_host[:T_host] == 0)
                )
                if T_host >= cap:
                    raise RuntimeError(
                        "DART ensemble buffer full: best snapshot plus live "
                        "trees exceed capacity; raise ntrees headroom"
                    )

            n_drop = self._trees_to_dropout(
                rng, T_host - dropped_before_cleaning, dropout_factor_hist,
                perf_valid_hist, best_va if va is not None else best_tr,
            )
            random_keep_iter = n_drop > 0 and rng.random() <= self.random_keep
            dropped: list[int] = []
            if n_drop > 0:
                dropped = self._select_dropout(
                    rng, w_host[:T_host], contributions, n_drop
                )
            dc_sum = float(sum(contributions[t] for t in dropped))
            dcw_sum = float(
                sum(w_host[t] * contributions[t] for t in dropped)
            )
            ref_tr = best_tr if self.drop_on_best else m_tr
            ref_va = best_va if self.drop_on_best else m_va

            dropmask = np.zeros(cap, bool)
            if dropped:
                dropmask[dropped] = True
                if use_qs_delta:
                    # one grouped-matmul pass, cost ~flat in drop count:
                    # structure tables for the current ensemble, weight
                    # vector zero except the dropped slots (score_qs's
                    # Kahan chain adds exact zeros there)
                    from quickrank_tpu.trees.qs import (
                        ensemble_to_qs,
                        score_qs,
                    )

                    qs_t = ensemble_to_qs(ens, space="bin")
                    wvec = np.zeros(qs_t.weight.shape[0], np.float32)
                    wvec[dropped] = w_host[dropped]
                    qs_t = qs_t.replace(weight=jnp.asarray(wvec))
                    delta_tr = score_qs(tr.step.binned, qs_t)
                    delta_va = (
                        score_qs(va.step.binned, qs_t)
                        if va is not None
                        else jnp.zeros((1,), jnp.float32)
                    )
                else:
                    idx, w = pad_set(dropped, w_host[dropped])
                    delta_tr = delta_tr_fn(ens, idx, w)
                    delta_va = (
                        delta_va_fn(ens, idx, w)
                        if va is not None
                        else jnp.zeros((1,), jnp.float32)
                    )
            else:
                # fresh zeros each time: these buffers are donated
                delta_tr = _zeros_like_j(scores_tr)
                delta_va = _zeros_like_j(scores_va)

            # the whole expensive pipeline in one fixed-shape dispatch;
            # everything below is host bookkeeping on the returned scalars
            (
                scores_tr, scores_va, ens, contribution, tw, w_new, factor,
                kept, m_tr_j, m_va_j,
            ) = iteration(
                scores_tr, scores_va, delta_tr, delta_va, ens,
                jnp.asarray(dropmask), len(dropped), key,
                np.float32(ref_tr if np.isfinite(ref_tr) else -3e38),
                np.float32(ref_va if np.isfinite(ref_va) else -3e38),
                bool(random_keep_iter), np.float32(dc_sum),
                np.float32(dcw_sum),
            )
            contributions.append(float(contribution))
            m_tr = float(m_tr_j)
            m_va = float(m_va_j) if va is not None else 0.0
            kept = bool(kept)
            new_idx = T_host
            T_host += 1
            if kept:
                # permanently drop D (X-DART, dart.cc:430-445)
                w_host[dropped] = 0.0
                w_host[new_idx] = np.float32(tw)
                dropped_before_cleaning += len(dropped)
            else:
                # D restored with renormalized weights (bitwise the same
                # f32 products the device wrote)
                w_host[dropped] = w_host[dropped] * np.float32(factor)
                w_host[new_idx] = np.float32(w_new)

            hist_tr.append(m_tr)
            hist_va.append(m_va if va is not None else np.nan)

            best_improved = (
                (m_va > best_va)
                if (va is not None and not self.best_on_train)
                else (m_tr > best_tr)
            )
            if va is not None and self.best_on_train and m_va > best_va:
                best_va = m_va
            if best_improved:
                best_tr = m_tr
                if not self.best_on_train and va is not None:
                    best_va = m_va
                best_iter = m
                ens, contributions, w_host, T_host = (
                    self._compact_zero_weights(
                        ens, contributions, w_host, T_host
                    )
                )
                best_size = T_host
                best_weights = w_host[:T_host].copy()
                dropped_before_cleaning = 0
                # periodic full rescoring to fight drift (dart.cc:552-558)
                if m - last_global_rescore > 10:
                    scores_tr = self._full_rescore(ens, tr, md)
                    if va is not None:
                        scores_va = self._full_rescore(ens, va, md)
                    last_global_rescore = m
            if va is not None:
                perf_valid_hist.append(m_va)
            else:
                perf_valid_hist.append(m_tr)
            if (
                partial_save
                and output_basename
                and (m + iter_offset) % partial_save == 0
            ):
                # periodic snapshot as <base>.T<k>.xml (mart.cc:378-381)
                from quickrank_tpu.learning.mart import _compact as _cpt

                snapshot = self.ensemble
                self.ensemble = _cpt(ens)
                self.save(f"{output_basename}.T{m + iter_offset}.xml")
                self.ensemble = snapshot
            iter_seconds.append(_time.time() - t_iter)
            dropped_per_iter.append(len(dropped))
            if verbose and (m < 5 or m % 10 == 0 or best_improved):
                vtxt = f" {m_va:.6f}" if va is not None else ""
                print(
                    f"# {m:5d} {m_tr:.6f}{vtxt} drop={len(dropped)} "
                    f"size={T_host - dropped_before_cleaning}"
                    f"{' *' if best_improved else ''}"
                )

        # Rollback: pop to the best model size and restore its weights
        # (dart.cc:573-580).
        ens = ens.replace(num_trees=jnp.asarray(max(best_size, 1), jnp.int32))
        if best_size > 0:
            w = np.asarray(ens.weight).copy()
            w[:best_size] = best_weights
            ens = ens.replace(weight=jnp.asarray(w))
        from quickrank_tpu.learning.mart import _compact

        self.ensemble = _compact(ens)
        self.best_iteration = best_iter
        self.history = {
            "train": hist_tr,
            "valid": hist_va,
            "best_iteration": best_iter,
            "best_valid": best_va if va is not None else None,
            "init_seconds": init_time,
            "train_seconds": _time.time() - t_train,
            "iter_seconds": iter_seconds,
            "dropped_per_iter": dropped_per_iter,
            "metric": repr(metric),
        }
        if verbose:
            print(f"# done: {int(self.ensemble.num_trees)} trees kept")
        return self.history

    # -- dropout machinery (host) -----------------------------------------

    def _trees_to_dropout(
        self, rng, model_size, factor_hist, perf_hist, best_perf
    ) -> int:
        """Adaptive dropout-count schedule (dart.cc:1095-1181)."""
        if rng.random() <= self.skip_drop or model_size <= 0:
            factor_hist.append(0.0)
            return 0
        at = self.adaptive_type
        last = factor_hist[-1]
        improved = perf_hist[-1] >= best_perf
        x = 0.0
        if at == "FIXED":
            if self.rate_drop >= 1:
                if self.rate_drop * 2 <= model_size:
                    x = self.rate_drop
            else:
                x = self.rate_drop * model_size
        elif at == "PLUS1_DIV2":
            x = last / 2 if improved else last + 1
        elif at == "PLUSHALF_DIV2":
            x = last / 2 if improved else last + 0.5
        elif at == "PLUSONETHIRD_DIV2":
            x = last / 2 if improved else last + 1.0 / 3
        elif at == "PLUSHALF_RESET":
            x = 0 if improved else last + 0.5
        elif at == "PLUSHALF_RESET_LB1_UB5":
            x = 1 if improved else min(5.0, last + 0.5)
        elif at == "PLUSHALF_RESET_LB1_UB10":
            x = 1 if improved else min(10.0, last + 0.5)
        elif at == "PLUSHALF_RESET_LB1_UBRD":
            x = 1 if improved else min(self.rate_drop * model_size, last + 0.5)
        # dart.cc:1176-1181: the cap is C integer division (model_size / 2
        # with int operands -> floor), and round() is C round (half AWAY
        # from zero) — Python's round() is banker's rounding and a true-
        # division cap would let x=3.5 round to 4 > model_size // 2
        x = min(x, model_size // 2)
        factor_hist.append(x)
        return int(np.floor(x + 0.5))

    def _select_dropout(self, rng, weights, contributions, k) -> list:
        """Pick the dropout set D (dart.cc:708-854)."""
        T = len(weights)
        contr = np.asarray(contributions[:T], np.float64)
        st = self.sample_type
        if st in ("UNIFORM", "TOP_FIFTY"):
            # dart.cc:721: round(size / 2) on INTEGER division -> T // 2
            size = T if st == "UNIFORM" else T // 2
            idx = rng.permutation(size)
            out = [int(i) for i in idx if weights[i] > 0][:k]
            return out
        if st in ("WEIGHTED", "WEIGHTED_INV", "CONTR", "CONTR_INV",
                  "WCONTR", "WCONTR_INV"):
            if st in ("WEIGHTED", "WEIGHTED_INV"):
                base = np.asarray(weights, np.float64).copy()
            elif st in ("CONTR", "CONTR_INV"):
                base = np.where(weights > 0, contr, 0.0)
            else:
                base = np.where(weights > 0, weights * contr, 0.0)
            inv = st.endswith("_INV")
            chosen: list = []
            avail = base > 0
            for _ in range(k):
                if not avail.any():
                    break
                p = np.where(avail, base, 0.0)
                s = p.sum()
                if s <= 0:
                    p = avail.astype(np.float64)
                    s = p.sum()
                p = p / s
                if inv:
                    p = np.where(avail, 1.0 - p, 0.0)
                    z = p.sum()
                    if z <= 0:
                        p = avail.astype(np.float64)
                        z = p.sum()
                    p = p / z
                i = int(rng.choice(T, p=p))
                chosen.append(i)
                avail[i] = False
            return chosen
        # TOP_WCONTR / LESS_WCONTR: extremal weighted contributions
        wc = np.asarray(weights, np.float64) * contr
        order = np.argsort(wc, kind="stable")
        if st == "TOP_WCONTR":
            order = order[::-1]
        return [int(i) for i in order[:k]]

    # ------------------------------------------------------------------

    @staticmethod
    def _compact_zero_weights(
        ens: EnsembleTensors, contributions, w_host, T_host, protect: int = 0
    ):
        """filter_out_zero_weighted_trees + contribution compaction
        (ensemble.cc:149-169, dart.cc filter_out_zero_weighted_contributions).

        The zero pattern comes from the host weight mirror, so deciding
        whether to compact costs no device round trip; when compaction does
        happen it is a single device gather per tree tensor.  ``protect``
        keeps the first N slots even when zero-weighted — the capacity-guard
        compaction must preserve the best-snapshot trees for rollback."""
        keep = np.flatnonzero(
            (w_host[:T_host] != 0) | (np.arange(T_host) < protect)
        )
        if len(keep) == T_host:
            return ens, contributions, w_host, T_host
        perm = np.concatenate([keep, np.arange(T_host, ens.capacity)])
        gidx = jnp.asarray(
            np.concatenate([perm, np.arange(len(perm), ens.capacity)]),
            jnp.int32,
        )
        sel = lambda x: jnp.take(x, gidx, axis=0)  # noqa: E731
        new_T = len(keep)
        new = EnsembleTensors(
            feature=sel(ens.feature),
            threshold=sel(ens.threshold),
            threshold_bin=sel(ens.threshold_bin),
            left=sel(ens.left),
            right=sel(ens.right),
            is_leaf=sel(ens.is_leaf),
            leaf_value=sel(ens.leaf_value),
            weight=jnp.where(
                jnp.arange(ens.capacity) < new_T, sel(ens.weight), 0.0
            ),
            num_trees=jnp.asarray(new_T, jnp.int32),
        )
        contributions = [contributions[i] for i in keep]
        w2 = np.zeros_like(w_host)
        w2[:new_T] = w_host[keep]
        return new, contributions, w2, new_T

    @staticmethod
    @partial(jax.jit, static_argnames=("md",))
    def _contribs_j(ens: EnsembleTensors, binned, doc_mask, n_real, md: int):
        """Per-tree mean |output| over the real docs, for the warm-start
        contribution rebuild.  Jitted with ens/binned as ARGUMENTS for the
        same reason as mart._rescore_scan_j (constant-folding a
        multi-hundred-MB binned tensor into the scan's HLO)."""

        def body(_, t):
            tree = ens.tree(t)
            d = tree_delta_binned(binned, tree, md)
            return None, jnp.sum(jnp.abs(d) * doc_mask) / n_real

        _, contribs = jax.lax.scan(body, None, jnp.arange(ens.capacity))
        return contribs

    @staticmethod
    def _full_rescore(ens: EnsembleTensors, td: TrainData, md: int):
        """Full bin-space rescoring — delegates to mart.rescore_binned
        (one implementation of the QS-fast-path / Kahan-scan dispatch;
        r5 removed DART's duplicate so the single-controller guard and
        table construction can't drift between the two copies)."""
        from quickrank_tpu.learning.mart import rescore_binned

        return rescore_binned(ens, td.step, md)

    def _info_dict(self) -> dict:
        d = super()._info_dict()
        d.update(
            {
                "sample-type": self.sample_type,
                "normalize-type": self.normalize_type,
                "adaptive-type": self.adaptive_type,
                "rate-drop": self.rate_drop,
                "skip-drop": self.skip_drop,
                "keep-drop": int(self.keep_drop),
                "best-on-train": int(self.best_on_train),
                "random-keep": self.random_keep,
                "drop-on-best": int(self.drop_on_best),
            }
        )
        return d

    @classmethod
    def _ctor_kwargs_from_info(cls, info) -> dict:
        """Read back the DART-specific <info> tags written by _info_dict so
        a loaded model restores its dropout configuration (the reference's
        Dart(xml) ctor parses the same fields, dart.cc:59-107)."""
        g = cls._info_get
        flag = lambda s: bool(int(s))  # noqa: E731
        d = super()._ctor_kwargs_from_info(info)
        d.update(
            sample_type=g(info, "sample-type", str, "UNIFORM"),
            normalize_type=g(info, "normalize-type", str, "TREE"),
            adaptive_type=g(info, "adaptive-type", str, "FIXED"),
            rate_drop=g(info, "rate-drop", float, 0.1),
            skip_drop=g(info, "skip-drop", float, 0.0),
            keep_drop=g(info, "keep-drop", flag, False),
            best_on_train=g(info, "best-on-train", flag, False),
            random_keep=g(info, "random-keep", float, 0.0),
            drop_on_best=g(info, "drop-on-best", flag, False),
        )
        return d

    def __repr__(self):
        return (
            f"{self.NAME}(ntrees={self.ntrees}, shrinkage={self.shrinkage}, "
            f"nleaves={self.nleaves}, sample={self.sample_type}, "
            f"normalize={self.normalize_type}, adaptive={self.adaptive_type}, "
            f"rate_drop={self.rate_drop}, skip_drop={self.skip_drop}, "
            f"keep_drop={self.keep_drop})"
        )
