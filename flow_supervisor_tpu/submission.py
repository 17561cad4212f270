"""Benchmark submission writers.

Parity with the torch tree's submission helpers (``pytorch/evaluate.py:24-73``):
run the model with warm start over the Sintel test split (writing Middlebury
``.flo`` per frame under <out>/<dstype>/<scene>/frame%04d.flo) and over the KITTI
test split (16-bit ``.png`` flow under <out>/).
"""
from __future__ import annotations

import os

import numpy as np

from flow_supervisor_tpu.data import datasets as D
from flow_supervisor_tpu.data.io import read_image, write_flo, write_flow_kitti
from flow_supervisor_tpu.utils.warm_start import forward_interpolate


def create_sintel_submission(
    evaluator, output_path: str = "sintel_submission", warm_start: bool = False
) -> None:
    for dstype in ("clean", "final"):
        records = D.sintel(training=False, dstype=dstype)
        prev_scene, prev_low = None, None
        for rec in records:
            scene, idx = rec.extra
            img1 = read_image(rec.images[0])
            img2 = read_image(rec.images[1])
            flow_init = None
            if warm_start and prev_low is not None and scene == prev_scene:
                flow_init = forward_interpolate(prev_low)
            prev_scene = scene
            results, prev_low = evaluator._run_pair(
                evaluator.variables, img1, img2, "sintel", flow_init
            )
            flow = np.asarray(results["student"])[0]
            out_dir = os.path.join(output_path, dstype, scene)
            os.makedirs(out_dir, exist_ok=True)
            write_flo(os.path.join(out_dir, "frame%04d.flo" % (idx + 1)), flow)


def create_kitti_submission(evaluator, output_path: str = "kitti_submission") -> None:
    os.makedirs(output_path, exist_ok=True)
    for rec in D.kitti(training=False):
        (frame_id,) = rec.extra
        img1 = read_image(rec.images[0])
        img2 = read_image(rec.images[1])
        results, _ = evaluator._run_pair(evaluator.variables, img1, img2, "kitti", None)
        flow = np.asarray(results["student"])[0]
        write_flow_kitti(os.path.join(output_path, frame_id), flow)
