"""Validation engine: dense (Sintel/Chairs) and sparse (KITTI) evaluation with
optional warm start.

Parity with the reference (``util/validate.py:134-292``):

- inputs replicate-edge padded to a multiple of 8: 'sintel' (centered) for dense,
  'kitti' (bottom + centered width) for sparse;
- the model runs at eval iters (12 published / 32 sintel default / 24 otherwise,
  evaluate.py:166-174); the FINAL prediction is unpadded and scored;
- dense: per-image mean EPE + 1/3/5-px accuracies; sparse: masked EPE, n-px,
  and Fl-all over valid pixels;
- teacher evaluation: checkpoints that carry a teacher head score BOTH the
  student and the teacher automatically — the reference disambiguates by
  prediction-list arity (validate.py:154-166), we detect ``model.cfg.teacher``;
- warm start: within a scene, the previous pair's final low-res flow is
  forward-splatted on host (scipy) and fed as flow_init (validate.py:141-148).

One jit cache entry per padded shape. Sintel eval shapes are constant; KITTI
images come in a handful of native sizes — ``pad_bucket`` rounds the padded
shape up to a larger multiple to bound the cache (8 = exact reference padding;
64 trades slightly different edge context for ~1 compile per dataset).
Also reports eval throughput as ``pairs_per_sec``.
"""
from __future__ import annotations

import functools
import time
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from flow_supervisor_tpu.data.datasets import FlowRecord
from flow_supervisor_tpu.data.pipeline import load_record
from flow_supervisor_tpu.metrics import dense_metrics, sparse_metrics
from flow_supervisor_tpu.ops.pad import pad_spec_for
from flow_supervisor_tpu.utils.warm_start import forward_interpolate


def _pad_np(x: np.ndarray, spec) -> np.ndarray:
    (t, b), (l, r) = spec
    return np.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


def _unpad(x, spec):
    (t, b), (l, r) = spec
    return x[:, t : x.shape[1] - b, l : x.shape[2] - r]


class Evaluator:
    """Runs a model over record lists. ``variables`` may be fixed at
    construction or swapped per call (training-time validation) — the jitted
    forwards take them as arguments so the jit cache survives the swap."""

    def __init__(
        self,
        model,
        variables=None,
        iters: int = 24,
        use_teacher: Optional[bool] = None,
        pad_bucket: int = 8,
        space_parallel: int = 1,
    ):
        self.model = model
        self.variables = variables
        self.iters = iters
        self.use_teacher = (
            bool(getattr(model.cfg, "teacher", False))
            if use_teacher is None
            else use_teacher
        )
        # space_parallel > 1: shard the image H axis (and with it the corr
        # volume's query rows) over a space-axis mesh (parallel/spatial.py) —
        # multi-chip single-pair eval for resolutions whose volume exceeds one
        # chip's HBM. Padding must align H to 8*space.
        self.space_parallel = space_parallel
        if space_parallel > 1:
            import dataclasses as _dc

            from flow_supervisor_tpu.parallel.mesh import SPACE_AXIS
            from flow_supervisor_tpu.parallel.spatial import make_space_mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = make_space_mesh(space_parallel)
            if (
                getattr(model.cfg, "lookup_backend", "einsum") != "einsum"
                or getattr(model.cfg, "fused_norm", False)
            ):
                # pure-XLA ops only: the pallas lookup would need a shard_map
                # wrapper and the fused instance norm's spatial mean must
                # become a cross-device collective; the einsum lookup and XLA
                # norm shard transparently under SPMD
                model = type(model)(
                    _dc.replace(
                        model.cfg, lookup_backend="einsum", fused_norm=False
                    )
                )
                self.model = model
            img_sh = NamedSharding(mesh, P(None, SPACE_AXIS, None, None))
            repl = NamedSharding(mesh, P())
            pad_bucket = max(pad_bucket, 8 * space_parallel)

            def _shard(t):
                return jax.lax.with_sharding_constraint(t, img_sh)

            def _gather(t):
                return jax.lax.with_sharding_constraint(t, repl)
        else:
            _shard = _gather = lambda t: t
        self._shard, self._gather = _shard, _gather
        self.pad_bucket = pad_bucket

        @functools.partial(jax.jit, static_argnames=("with_init",))
        def forward(variables, image1, image2, flow_init, with_init):
            out = model.apply(
                variables,
                _shard(image1),
                _shard(image2),
                flow_init=flow_init if with_init else None,
                train=False,
                iters=self.iters,
                final_flow_only=True,
            )
            return _gather(out["flow_up"][-1]), _gather(out["flow_low"][-1])

        self._forward = forward

        if self.use_teacher:

            @functools.partial(jax.jit, static_argnames=("with_init",))
            def teacher_forward(variables, image1, image2, flow_init, with_init):
                image1, image2 = _shard(image1), _shard(image2)
                b, h, w, _ = image1.shape
                from flow_supervisor_tpu.ops.coords import coords_grid, downsample_shape

                def run(mdl):
                    f1, f2 = mdl.features(image1, image2)
                    pyr = mdl.build_corr(f1, f2)
                    net, inp = mdl.context(image1)
                    att = mdl.attention_map(inp)
                    h8, w8 = downsample_shape(h), downsample_shape(w)
                    c0 = coords_grid(b, h8, w8)
                    c1 = c0 + flow_init if with_init else c0
                    net, _, stu_up, stu_low = mdl.iterate(
                        net, inp, pyr, c0, c1, (h, w), self.iters,
                        attention=att, final_flow_only=True,
                    )
                    _, _, tea_up, _ = mdl.iterate(
                        net, inp, pyr, c0, c0 + stu_low[-1], (h, w),
                        mdl.cfg.teacher_iters, teacher=True, attention=att,
                        final_flow_only=True,
                    )
                    return stu_up[-1], tea_up[-1], stu_low[-1]

                outs = model.apply(variables, method=run)
                return tuple(_gather(o) for o in outs)

            self._teacher_forward = teacher_forward

    def _run_pair(self, variables, img1, img2, mode: str, flow_init):
        spec = pad_spec_for(
            img1.shape[0], img1.shape[1], mode=mode, multiple=self.pad_bucket
        )
        x1 = _pad_np(img1[None], spec)
        x2 = _pad_np(img2[None], spec)
        h8 = (x1.shape[1] + 7) // 8
        w8 = (x1.shape[2] + 7) // 8
        init = (
            jnp.asarray(flow_init[None])
            if flow_init is not None
            else jnp.zeros((1, h8, w8, 2), jnp.float32)
        )
        results = {}
        if self.use_teacher:
            stu, tea, low = self._teacher_forward(
                variables, jnp.asarray(x1), jnp.asarray(x2), init,
                flow_init is not None,
            )
            results["teacher"] = _unpad(np.asarray(tea), spec)
        else:
            stu, low = self._forward(
                variables, jnp.asarray(x1), jnp.asarray(x2), init,
                flow_init is not None,
            )
        results["student"] = _unpad(np.asarray(stu), spec)
        return results, np.asarray(low)[0]

    def evaluate(
        self,
        records: Iterable[FlowRecord],
        sparse: bool = False,
        warm_start: bool = False,
        variables=None,
    ) -> dict[str, float]:
        variables = self.variables if variables is None else variables
        assert variables is not None, "Evaluator needs variables"
        lists: dict[str, list[float]] = {}
        prev_scene = None
        prev_low = None
        n_pairs = 0
        t0 = time.perf_counter()
        for rec in records:
            img1, img2, flow_gt, valid = load_record(rec)
            scene = rec.extra[0] if rec.extra else None
            flow_init = None
            if warm_start and prev_low is not None and scene == prev_scene:
                flow_init = forward_interpolate(prev_low)
            prev_scene = scene

            mode = "kitti" if sparse else "sintel"
            results, prev_low = self._run_pair(variables, img1, img2, mode, flow_init)
            n_pairs += 1

            for name, pred in results.items():
                gt = jnp.asarray(flow_gt[None])
                if sparse:
                    m = sparse_metrics(
                        jnp.asarray(pred), gt, jnp.asarray(valid[None])
                    )
                else:
                    m = dense_metrics(jnp.asarray(pred), gt)
                for k, v in m.items():
                    lists.setdefault(f"{name}_{k}", []).append(float(v[0]))
        out = {k: float(np.mean(v)) for k, v in lists.items()}
        if n_pairs:
            out["pairs_per_sec"] = n_pairs / max(time.perf_counter() - t0, 1e-9)
        return out


def standing_validation_sets(stage: str, max_records: int = 0):
    """(name, records, sparse) validation sets for training-time callbacks.

    Mirrors the reference's standing callbacks (train.py:211-217 always attaches
    ValidateOnSintel + ValidateOnKITTI; ValidateOnChairs exists for the chairs
    stage, util/validate.py:17-132). Missing dataset roots are skipped silently
    so training runs on partial data installs.
    """
    from flow_supervisor_tpu.data import datasets as D

    candidates = []
    if stage.startswith("chairs"):
        candidates.append(("chairs", lambda: D.flying_chairs(training=False), False))
    candidates.append(("sintel_clean", lambda: D.sintel(True, "clean"), False))
    candidates.append(("sintel_final", lambda: D.sintel(True, "final"), False))
    candidates.append(("kitti", lambda: D.kitti(training=True), True))

    sets = []
    for name, build, sparse in candidates:
        try:
            recs = build()
        except (OSError, FileNotFoundError):
            continue
        if not recs:
            continue
        if max_records:
            recs = recs[:max_records]
        sets.append((name, recs, sparse))
    return sets


def eval_iters_policy(dataset_name: str, override: int = 0) -> int:
    """The eval CLI's refinement-iters policy (reference evaluate.py:166-174):
    32 for Sintel, 24 otherwise, explicit override wins."""
    if override:
        return override
    return 32 if dataset_name.startswith("sintel") else 24


def make_train_validator(cfg, model):
    """validate_fn(step, state) -> metrics dict for the training loop, or None
    when no validation dataset is available (reference train.py:211-217).

    Validation runs at the EVAL iters policy (32 sintel / 24 otherwise,
    reference evaluate.py:166-174 — the same engine/policy as final eval, so
    training val curves are comparable to reference eval numbers), not at the
    train iters; ``cfg.train.val_iters`` overrides. Sparse (KITTI) sets get
    ``cfg.train.val_pad_bucket`` to bound the jit cache over KITTI's several
    native sizes, and ``cfg.train.val_warm_start`` chains flow within scenes
    (reference util/validate.py:141-148)."""
    sets = standing_validation_sets(cfg.train.stage, cfg.train.val_max_records)
    if not sets:
        return None
    evaluators = {}
    for name, _recs, sparse in sets:
        evaluators[name] = Evaluator(
            model,
            None,
            iters=eval_iters_policy(name, cfg.train.val_iters),
            pad_bucket=cfg.train.val_pad_bucket if sparse else 8,
        )

    def validate_fn(step: int, state) -> dict[str, float]:
        variables = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
        }
        out = {}
        for name, recs, sparse in sets:
            r = evaluators[name].evaluate(
                recs,
                sparse=sparse,
                warm_start=cfg.train.val_warm_start,
                variables=variables,
            )
            out.update({f"{name}_{k}": v for k, v in r.items()})
        return out

    validate_fn.evaluators = evaluators
    return validate_fn
