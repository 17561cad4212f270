#!/usr/bin/env python
"""Flow extraction CLI: run pairwise inference over frame directories and write
Middlebury ``.flo`` files + HSV visualization PNGs.

Usage parity with the reference (``extract_flow.py``; samples/README.md):
    python extract_flow.py <ckpt_dir> --source_dirs samples/davis/frames \
        --target_dirs samples/davis/ [--eval_iters 12]

Each source dir's consecutive frame pairs produce <frame>.flo in
<target>/flo/ and <frame>_flow.png in <target>/vis/.
"""
from __future__ import annotations

import argparse
import os


def main():
    from flow_supervisor_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()

    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir", nargs="?", default=None,
                   help="checkpoint dir; omit for randomly initialized weights (smoke)")
    p.add_argument("--source_dirs", nargs="+", required=True)
    p.add_argument("--target_dirs", nargs="+", required=True)
    p.add_argument("--eval_iters", type=int, default=12)
    p.add_argument("-e", "--run_eagerly", action="store_true",
                   help="disable jit for debugging (reference extract_flow.py:37)")
    args = p.parse_args()
    assert len(args.source_dirs) == len(args.target_dirs)

    if args.run_eagerly:
        import jax

        with jax.disable_jit():
            return _run(args)
    return _run(args)


def _run(args):

    import numpy as np
    import jax.numpy as jnp

    from flow_supervisor_tpu.config import ExperimentConfig
    from flow_supervisor_tpu.data.datasets import frames_directory
    from flow_supervisor_tpu.data.io import read_image, write_flo
    from flow_supervisor_tpu.evaluation import Evaluator
    from flow_supervisor_tpu.training import checkpoint as ckpt
    from flow_supervisor_tpu.training.loop import build_model, init_variables
    from flow_supervisor_tpu.utils.viz import visualize_flow

    if args.ckpt_dir:
        cfg = ExperimentConfig.load_yaml(args.ckpt_dir)
        cfg.ckpt_dir = args.ckpt_dir
    else:
        cfg = ExperimentConfig()
    cfg.model.compute_dtype = "float32"  # fp32 extraction for parity
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    if args.ckpt_dir:
        restored = ckpt.restore_checkpoint(args.ckpt_dir)
        assert restored is not None, f"no checkpoint in {args.ckpt_dir}"
        variables = {
            "params": restored["params"],
            "batch_stats": restored.get(
                "batch_stats", variables.get("batch_stats", {})
            ),
        }

    ev = Evaluator(model, variables, iters=args.eval_iters)

    import cv2

    for src, dst in zip(args.source_dirs, args.target_dirs):
        flo_dir = os.path.join(dst, "flo")
        vis_dir = os.path.join(dst, "vis")
        os.makedirs(flo_dir, exist_ok=True)
        os.makedirs(vis_dir, exist_ok=True)
        for rec in frames_directory(src):
            img1 = read_image(rec.images[0])
            img2 = read_image(rec.images[1])
            results, _ = ev._run_pair(ev.variables, img1, img2, "sintel", None)
            flow = np.asarray(results["student"])[0]
            name = os.path.basename(rec.images[0])
            write_flo(os.path.join(flo_dir, name + ".flo"), flow)
            vis = (visualize_flow(flow) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(vis_dir, name + "_flow.png"), vis[:, :, ::-1])
            print(f"{name}: flow range x[{flow[...,0].min():.1f},{flow[...,0].max():.1f}]")


if __name__ == "__main__":
    main()
