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

Multi-chip: pass ``mesh`` (1-D data mesh) — every device kernel (fit,
dropped-subset rescoring, metric, embedded line search) runs under
``shard_map`` with the same histogram/metric psum discipline as the other
learners.  Default DART reproduces single-device results exactly; the
LINESEARCH normalization can diverge across shardings because NDCG plateaus
make its 17-point argmax sensitive to f32 reduction order (the same
tie-break variance the reference has across OpenMP schedules).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from quickrank_tpu.learning.lambdamart import LambdaMart
from quickrank_tpu.learning.mart import TrainData, eval_metric
from quickrank_tpu.ops.scoring import descend_tree_binned
from quickrank_tpu.trees.grow import fit_tree, leaf_outputs
from quickrank_tpu.trees.structs import EnsembleTensors, Tree

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
        DART loop, which the reference lacks."""
        metric = metric or self.default_metric()
        import time as _time

        t0 = _time.time()
        num_shards = 1
        axis = None
        if mesh is not None:
            if len(mesh.axis_names) > 1:
                raise NotImplementedError("DART: 2-D meshes not supported")
            axis = mesh.axis_names[0]
            num_shards = int(mesh.shape[axis])
        tr = TrainData.build(train, self.nthresholds, num_shards=num_shards)
        va = (
            TrainData.build(
                valid, self.nthresholds, num_shards=num_shards,
                thresholds=np.asarray(tr.step.thresholds),
            )
            if valid is not None
            else None
        )
        if mesh is not None:
            import dataclasses as _dc

            from quickrank_tpu.parallel.mesh import shard_step_data

            tr = _dc.replace(tr, step=shard_step_data(tr.step, mesh, axis))
            if va is not None:
                va = _dc.replace(va, step=shard_step_data(va.step, mesh, axis))
        cfg = self._grow_config(tr.num_bins)
        self._train_metric = metric
        md = self._descend_depth()
        rng = np.random.default_rng(self.seed)

        N = tr.padded.num_docs_padded
        n_real = tr.padded.doc_mask.sum()

        # -- device kernels (wrapped in shard_map under a mesh) ------------
        def _fit_body(scores_tr, presence, key, tr_sd, va_sd):
            k1, k2, k3 = jax.random.split(key, 3)
            if axis is not None:
                k1 = jax.random.fold_in(k1, jax.lax.axis_index(axis))
            smask = self._sample_mask(tr_sd, k1, presence & tr_sd.doc_mask)
            grad, w = self._gradients(tr_sd, scores_tr, smask, k2)
            tree, node = fit_tree(
                tr_sd.binned, grad, smask, tr_sd.thresholds, cfg, key=k3,
                axis_name=axis,
            )
            tree = leaf_outputs(
                tree, node, grad, smask, weights=w, axis_name=axis
            )
            d_tr = tree.leaf_value[jnp.maximum(node, 0)]
            contrib = jnp.sum(jnp.abs(d_tr) * tr_sd.doc_mask)
            if axis is not None:
                contrib = jax.lax.psum(contrib, axis)
            contrib = contrib / n_real
            if va_sd is None:
                d_va = jnp.zeros((1,), jnp.float32)
            else:
                d_va = tree.leaf_value[descend_tree_binned(va_sd.binned, tree, md)]
            return tree, d_tr, d_va, contrib

        def _delta_body(ens, idx, w, sd):
            def body(acc, iw):
                i, wi = iw
                tree = ens.tree(i)
                d = tree.leaf_value[descend_tree_binned(sd.binned, tree, md)]
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

        if mesh is None:
            # Data tensors passed as jit arguments (not closure constants) to
            # keep compiles fast and executables small.
            if va is not None:
                _fit_j = jax.jit(_fit_body)
                fit_fn = lambda s, p, k: _fit_j(s, p, k, tr.step, va.step)  # noqa: E731
            else:
                _fit_j = jax.jit(lambda s, p, k, trd: _fit_body(s, p, k, trd, None))
                fit_fn = lambda s, p, k: _fit_j(s, p, k, tr.step)  # noqa: E731
            _delta_j = jax.jit(_delta_body)
            delta_tr_fn = lambda e, i, w: _delta_j(e, i, w, tr.step)  # noqa: E731
            delta_va_fn = (
                (lambda e, i, w: _delta_j(e, i, w, va.step))
                if va is not None
                else None
            )
            _eval_j = jax.jit(lambda s, sd: eval_metric(metric, sd, s))
            eval_tr = lambda s: _eval_j(s, tr.step)  # noqa: E731
            eval_va = (
                (lambda s: _eval_j(s, va.step)) if va is not None else (lambda s: 0.0)
            )
            _ls_j = jax.jit(_linesearch_body)
            linesearch16 = lambda s, d: _ls_j(s, d, tr.step)  # noqa: E731
        else:
            from quickrank_tpu.learning.mart import shard_map
            from quickrank_tpu.parallel.mesh import step_data_specs
            from quickrank_tpu.trees.structs import EnsembleTensors as _ET

            rep = P()
            Pd = P(axis)
            tr_specs = step_data_specs(tr.step, axis)
            va_specs = step_data_specs(va.step, axis) if va is not None else None
            ens_specs = jax.tree.map(lambda _: rep, _ET.empty(1, 1))
            tree_specs = jax.tree.map(lambda _: rep, Tree.empty(1))

            fit_fn = jax.jit(
                shard_map(
                    lambda s, p, k, trd, vad=None: _fit_body(s, p, k, trd, vad),
                    mesh,
                    in_specs=(Pd, Pd, rep, tr_specs)
                    + ((va_specs,) if va is not None else ()),
                    out_specs=(tree_specs, Pd, Pd if va is not None else rep, rep),
                )
            )
            if va is not None:
                _fit_inner = fit_fn
                fit_fn = lambda s, p, k: _fit_inner(s, p, k, tr.step, va.step)  # noqa: E731
            else:
                _fit_inner = fit_fn
                fit_fn = lambda s, p, k: _fit_inner(s, p, k, tr.step)  # noqa: E731

            def _mk_delta(sd, specs):
                inner = jax.jit(
                    shard_map(
                        _delta_body, mesh,
                        in_specs=(ens_specs, rep, rep, specs),
                        out_specs=Pd,
                    )
                )
                return lambda e, i, w: inner(e, i, w, sd)

            delta_tr_fn = _mk_delta(tr.step, tr_specs)
            delta_va_fn = (
                _mk_delta(va.step, va_specs) if va is not None else None
            )

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
            _ls_inner = jax.jit(
                shard_map(
                    _linesearch_body, mesh,
                    in_specs=(Pd, Pd, tr_specs), out_specs=rep,
                )
            )
            linesearch16 = lambda s, d: _ls_inner(s, d, tr.step)  # noqa: E731

        # -- host state ----------------------------------------------------
        cap = self.ntrees + max(16, self.ntrees // 4)
        ens = EnsembleTensors.empty(cap, cfg.max_nodes)
        scores_tr = jnp.zeros((N,), jnp.float32)
        scores_va = (
            jnp.zeros((va.padded.num_docs_padded,), jnp.float32)
            if va is not None
            else jnp.zeros((1,), jnp.float32)
        )
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
        max_pad = 1  # current pad size for dropped-set kernels

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

            src = rebin_ensemble(self.ensemble, np.asarray(tr.step.thresholds))
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
            def _contrib_body(_, t):
                tree = ens.tree(t)
                d = tree.leaf_value[descend_tree_binned(tr.step.binned, tree, md)]
                return None, jnp.sum(jnp.abs(d) * tr.step.doc_mask) / n_real

            _, contribs = jax.lax.scan(
                _contrib_body, None, jnp.arange(ens.capacity)
            )
            contributions = [float(c) for c in np.asarray(contribs)[:T0]]
            best_tr = m_tr
            best_va = m_va if va is not None else -np.inf
            best_iter = 0
            best_size = T0
            best_weights = np.asarray(ens.weight)[:T0].copy()
        init_time = _time.time() - t0
        if verbose:
            print(f"# {self.NAME}: {self!r}")
        t_train = _time.time()
        m = 0
        while int(ens.num_trees) - dropped_before_cleaning < self.ntrees:
            m += 1
            if va is not None and self.esr and m > best_iter + self.esr:
                break
            key = jax.random.fold_in(root_key, m)
            weights = np.asarray(ens.weight).copy()
            T = int(ens.num_trees)
            orig_weights = weights[:T].copy()

            n_drop = self._trees_to_dropout(
                rng, T - dropped_before_cleaning, dropout_factor_hist,
                perf_valid_hist, best_va if va is not None else best_tr,
            )
            random_keep_iter = n_drop > 0 and rng.random() <= self.random_keep

            dropped: list[int] = []
            dropout_better = False
            m_tr_drop = m_va_drop = 0.0
            if n_drop > 0:
                dropped = self._select_dropout(
                    rng, orig_weights, contributions, n_drop
                )
            if dropped:
                idx, w = pad_set(dropped, orig_weights[dropped])
                scores_tr = scores_tr - delta_tr_fn(ens, idx, w)
                m_tr_drop = float(eval_tr(scores_tr))
                if va is not None:
                    scores_va = scores_va - delta_va_fn(ens, idx, w)
                    m_va_drop = float(eval_va(scores_va))
                    dropout_better = m_va_drop > m_va
                else:
                    dropout_better = m_tr_drop > m_tr
                weights[dropped] = 0.0
                ens = ens.replace(weight=jnp.asarray(weights))

            presence = tr.step.doc_mask
            tree, d_tr, d_va, contribution = fit_fn(scores_tr, presence, key)
            contributions.append(float(contribution))

            tree_weight = self._weight_last_tree(
                len(dropped), orig_weights, dropped, contributions,
                T, lambda: float(linesearch16(scores_tr, d_tr)),
            )
            ens = ens.push(tree, tree_weight)
            new_idx = int(ens.num_trees) - 1

            # metric after adding the fitted tree on the dropped-out scores
            s_tr_fit = scores_tr + tree_weight * d_tr
            m_tr_fit = float(eval_tr(s_tr_fit))
            if va is not None:
                s_va_fit = scores_va + tree_weight * d_va
                m_va_fit = float(eval_va(s_va_fit))

            fit_improved = False
            if dropped:
                ref_tr = best_tr if self.drop_on_best else m_tr
                ref_va = best_va if self.drop_on_best else m_va
                fit_improved = (
                    (m_va_fit > ref_va) if va is not None else (m_tr_fit > ref_tr)
                )

            if self.keep_drop and (fit_improved or random_keep_iter):
                # permanently drop D (X-DART, dart.cc:430-445)
                dropped_before_cleaning += len(dropped)
                scores_tr = s_tr_fit
                m_tr = m_tr_fit
                if va is not None:
                    scores_va = s_va_fit
                    m_va = m_va_fit
            else:
                # restore D with renormalized weights + add the new tree
                weights = np.asarray(ens.weight).copy()
                if dropped:
                    new_w = self._normalize_restore(
                        orig_weights, dropped, tree_weight, contributions,
                        new_idx,
                    )
                    weights[:T] = new_w[:T]
                    weights[new_idx] = new_w[new_idx]
                ens = ens.replace(weight=jnp.asarray(weights))
                restore = dropped + [new_idx]
                idx, w = pad_set(restore, weights[restore])
                scores_tr = scores_tr + delta_tr_fn(ens, idx, w)
                m_tr = float(eval_tr(scores_tr))
                if va is not None:
                    scores_va = scores_va + delta_va_fn(ens, idx, w)
                    m_va = float(eval_va(scores_va))

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
                ens, contributions = self._compact_zero_weights(
                    ens, contributions
                )
                best_size = int(ens.num_trees)
                best_weights = np.asarray(ens.weight)[:best_size].copy()
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
            if verbose and (m < 5 or m % 10 == 0 or best_improved):
                vtxt = f" {m_va:.6f}" if va is not None else ""
                print(
                    f"# {m:5d} {m_tr:.6f}{vtxt} drop={len(dropped)} "
                    f"size={int(ens.num_trees) - dropped_before_cleaning}"
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
        x = min(x, model_size / 2)
        factor_hist.append(x)
        return int(round(x))

    def _select_dropout(self, rng, weights, contributions, k) -> list:
        """Pick the dropout set D (dart.cc:708-854)."""
        T = len(weights)
        contr = np.asarray(contributions[:T], np.float64)
        st = self.sample_type
        if st in ("UNIFORM", "TOP_FIFTY"):
            size = T if st == "UNIFORM" else int(round(T / 2))
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

    def _weight_last_tree(
        self, k, weights, dropped, contributions, new_idx, linesearch_fn
    ) -> float:
        """Initial weight of the fitted tree (dart.cc:944-1060)."""
        nt = self.normalize_type
        if nt in ("TREE", "NONE", "WEIGHTED", "FOREST"):
            return self.shrinkage
        if nt == "TREE_ADAPTIVE":
            return self.shrinkage / (self.shrinkage + k)
        if nt == "TREE_BOOST3":
            return (self.shrinkage * 3) / (self.shrinkage * 3 + k)
        if nt == "LINESEARCH":
            return linesearch_fn()
        if nt in ("CONTR", "WCONTR"):
            if k <= 0:
                return self.shrinkage
            dc = sum(contributions[t] for t in dropped)
            cl = contributions[new_idx]
            return (dc / max(cl, 1e-12)) * self.shrinkage
        if nt == "LMART_ADAPTIVE":
            return self.shrinkage / (self.rate_drop * new_idx + self.shrinkage)
        raise AssertionError(nt)

    def _normalize_restore(
        self, orig_weights, dropped, tree_weight, contributions, new_idx
    ) -> np.ndarray:
        """Weights for restored dropped trees + the new tree
        (normalize_trees_restore_drop, dart.cc:856-942)."""
        k = len(dropped)
        w = np.zeros(new_idx + 1, np.float64)
        w[: len(orig_weights)] = orig_weights
        nt = self.normalize_type
        s = self.shrinkage
        if nt in ("TREE", "TREE_ADAPTIVE", "TREE_BOOST3"):
            alpha = 3.0 if nt == "TREE_BOOST3" else 1.0
            w[new_idx] = (s * alpha) / (s * alpha + k)
            norm = k / (k + s * alpha)
            w[dropped] *= norm
        elif nt == "NONE":
            w[new_idx] = s
        elif nt == "WEIGHTED":
            dsum = float(np.sum(w[dropped]))
            with_last = dsum + s
            w[new_idx] = s / with_last
            w[dropped] *= dsum / with_last
        elif nt == "FOREST":
            w[new_idx] = s / (1 + s)
            w[dropped] *= 1 / (1 + s)
        elif nt == "LINESEARCH":
            w[new_idx] = tree_weight / (tree_weight + k)
            w[dropped] *= k / (k + tree_weight)
        elif nt in ("CONTR", "WCONTR"):
            weight = (
                (lambda t: w[t]) if nt == "WCONTR" else (lambda t: 1.0)
            )
            dc = sum(weight(t) * contributions[t] for t in dropped)
            cl = (tree_weight if nt == "WCONTR" else 1.0) * contributions[new_idx]
            tot = dc + cl
            w[new_idx] = cl / max(tot, 1e-12)
            w[dropped] *= dc / max(tot, 1e-12)
        elif nt == "LMART_ADAPTIVE":
            w[new_idx] = tree_weight
        return w.astype(np.float32)

    # ------------------------------------------------------------------

    @staticmethod
    def _compact_zero_weights(ens: EnsembleTensors, contributions):
        """filter_out_zero_weighted_trees + contribution compaction
        (ensemble.cc:149-169, dart.cc filter_out_zero_weighted_contributions)."""
        T = int(ens.num_trees)
        w = np.asarray(ens.weight)[:T]
        keep = np.flatnonzero(w != 0)
        if len(keep) == T:
            return ens, contributions
        sel = lambda x: jnp.asarray(  # noqa: E731
            np.concatenate(
                [np.asarray(x)[keep], np.asarray(x)[T:]], axis=0
            )
        )
        new = EnsembleTensors(
            feature=sel(ens.feature),
            threshold=sel(ens.threshold),
            threshold_bin=sel(ens.threshold_bin),
            left=sel(ens.left),
            right=sel(ens.right),
            is_leaf=sel(ens.is_leaf),
            leaf_value=sel(ens.leaf_value),
            weight=sel(ens.weight),
            num_trees=jnp.asarray(len(keep), jnp.int32),
        )
        contributions = [contributions[i] for i in keep]
        return new, contributions

    @staticmethod
    def _full_rescore(ens: EnsembleTensors, td: TrainData, md: int):
        from quickrank_tpu.ops.scoring import kahan_add

        # Score in bin space via per-tree descent (exact same routing);
        # Kahan-compensated like the Mart-family score carries.
        def body(carry, t):
            tree = ens.tree(t)
            d = tree.leaf_value[descend_tree_binned(td.step.binned, tree, md)]
            w = jnp.where(t < ens.num_trees, ens.weight[t], 0.0)
            return kahan_add(carry[0], carry[1], w * d), None

        z = jnp.zeros((td.step.binned.shape[0],), jnp.float32)
        (out, _), _ = jax.lax.scan(body, (z, z), jnp.arange(ens.capacity))
        return out

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
