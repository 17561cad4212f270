"""Validation engine: dense (Sintel/Chairs) and sparse (KITTI) evaluation with
optional warm start.

Parity with the reference (``util/validate.py:134-292``):

- inputs replicate-edge padded to a multiple of 8: 'sintel' (centered) for dense,
  'kitti' (bottom + centered width) for sparse;
- the model runs at eval iters (12 published / 32 sintel default / 24 otherwise,
  evaluate.py:166-174); the FINAL prediction is unpadded and scored;
- dense: per-image mean EPE + 1/3/5-px accuracies; sparse: masked EPE, n-px,
  and Fl-all over valid pixels;
- teacher evaluation: when the model carries a teacher head, its predictions are
  scored as a second 'teacher' entry (validate.py:154-166);
- warm start: within a scene, the previous pair's final low-res flow is
  forward-splatted on host (scipy) and fed as flow_init (validate.py:141-148).

One jit cache entry per padded shape; Sintel/KITTI eval shapes are constant so
this compiles once per dataset.
"""
from __future__ import annotations

import functools
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
    def __init__(self, model, variables, iters: int = 24, use_teacher: bool = False):
        self.model = model
        self.variables = variables
        self.iters = iters
        self.use_teacher = use_teacher

        @functools.partial(jax.jit, static_argnames=("with_init",))
        def forward(image1, image2, flow_init, with_init):
            out = model.apply(
                variables,
                image1,
                image2,
                flow_init=flow_init if with_init else None,
                train=False,
                iters=self.iters,
            )
            return out["flow_up"][-1], out["flow_low"][-1]

        self._forward = forward

        if use_teacher:

            @jax.jit
            def teacher_forward(image1, image2):
                b, h, w, _ = image1.shape
                from flow_supervisor_tpu.ops.coords import coords_grid, downsample_shape

                def run(mdl):
                    f1, f2 = mdl.features(image1, image2)
                    pyr = mdl.build_corr(f1, f2)
                    net, inp = mdl.context(image1)
                    h8, w8 = downsample_shape(h), downsample_shape(w)
                    c0 = coords_grid(b, h8, w8)
                    net, _, stu_up, stu_low = mdl.iterate(
                        net, inp, pyr, c0, c0, (h, w), self.iters
                    )
                    _, _, tea_up, _ = mdl.iterate(
                        net, inp, pyr, c0, c0 + stu_low[-1], (h, w),
                        mdl.cfg.teacher_iters, teacher=True,
                    )
                    return stu_up[-1], tea_up[-1], stu_low[-1]

                return model.apply(variables, method=run)

            self._teacher_forward = teacher_forward

    def _run_pair(self, img1, img2, mode: str, flow_init: Optional[np.ndarray]):
        spec = pad_spec_for(img1.shape[0], img1.shape[1], mode=mode)
        x1 = _pad_np(img1[None], spec)
        x2 = _pad_np(img2[None], spec)
        results = {}
        if self.use_teacher:
            stu, tea, low = self._teacher_forward(jnp.asarray(x1), jnp.asarray(x2))
            results["teacher"] = _unpad(np.asarray(tea), spec)
        else:
            h8 = (x1.shape[1] + 7) // 8
            w8 = (x1.shape[2] + 7) // 8
            init = (
                jnp.asarray(flow_init[None])
                if flow_init is not None
                else jnp.zeros((1, h8, w8, 2), jnp.float32)
            )
            stu, low = self._forward(
                jnp.asarray(x1), jnp.asarray(x2), init, flow_init is not None
            )
        results["student"] = _unpad(np.asarray(stu), spec)
        return results, np.asarray(low)[0]

    def evaluate(
        self,
        records: Iterable[FlowRecord],
        sparse: bool = False,
        warm_start: bool = False,
    ) -> dict[str, float]:
        lists: dict[str, list[float]] = {}
        prev_scene = None
        prev_low = None
        for rec in records:
            img1, img2, flow_gt, valid = load_record(rec)
            scene = rec.extra[0] if rec.extra else None
            flow_init = None
            if warm_start and prev_low is not None and scene == prev_scene:
                flow_init = forward_interpolate(prev_low)
            prev_scene = scene

            mode = "kitti" if sparse else "sintel"
            results, prev_low = self._run_pair(img1, img2, mode, flow_init)

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
        return {k: float(np.mean(v)) for k, v in lists.items()}
