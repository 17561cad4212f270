#!/usr/bin/env python
"""Evaluation CLI.

Usage parity with the reference (``evaluate.py``):
    python evaluate.py <ckpt_dir> --dataset sintel --eval_iters 12 [--warm_start]

Datasets: sintel (clean+final train split, dense), chairs (val split), kitti
(KITTI-2015 train split, sparse w/ Fl-all). Iters policy matches the reference:
32 for sintel, 24 otherwise, unless --eval_iters is given (evaluate.py:166-174).
"""
from __future__ import annotations

import argparse
import json


def main():
    from flow_supervisor_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()

    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir")
    p.add_argument("--dataset", default="sintel",
                   choices=["sintel", "chairs", "kitti", "kitti2012"])
    p.add_argument("--eval_iters", type=int, default=None)
    p.add_argument("--warm_start", action="store_true")
    p.add_argument("--use_teacher", action="store_true", default=None,
                   help="force scoring the teacher head; by default teacher-"
                        "bearing (semi) checkpoints score student AND teacher "
                        "automatically (reference util/validate.py:154-166)")
    p.add_argument("--pad_bucket", type=int, default=8,
                   help="round padded eval shapes up to this multiple; 8 = "
                        "exact reference padding, larger values bound the jit "
                        "cache on variable-size datasets (KITTI)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--tf_ckpt", default=None,
                   help="evaluate a reference TF checkpoint prefix directly "
                        "(e.g. ckpts/semi/sintel/ckpt-100000-weights); "
                        "ckpt_dir then only provides the config (or pass a "
                        "dot '.' to use defaults)")
    p.add_argument("--space_parallel", type=int, default=1,
                   help="shard the image H axis (and the correlation volume's "
                        "query rows) over this many devices for one forward - "
                        "multi-chip eval of resolutions that exceed one chip's "
                        "HBM (parallel/spatial.py)")
    p.add_argument("--precision", default="float32",
                   choices=["float32", "bfloat16"],
                   help="eval compute dtype (fp32 default for parity; the "
                        "reference evaluates fp32 unless --mixed_precision, "
                        "evaluate.py:81-83)")
    p.add_argument("-e", "--run_eagerly", action="store_true",
                   help="disable jit for debugging (reference evaluate.py:36)")
    args = p.parse_args()

    if args.run_eagerly:
        import jax

        with jax.disable_jit():
            return _run(args)
    return _run(args)


def _run(args):

    from flow_supervisor_tpu.config import ExperimentConfig
    from flow_supervisor_tpu.data import datasets as D
    from flow_supervisor_tpu.evaluation import Evaluator
    from flow_supervisor_tpu.training import checkpoint as ckpt
    from flow_supervisor_tpu.training.loop import build_model, init_variables

    import os

    if os.path.isdir(args.ckpt_dir) and os.path.exists(
        os.path.join(args.ckpt_dir, "args.yaml")
    ):
        cfg = ExperimentConfig.load_yaml(args.ckpt_dir)
        cfg.ckpt_dir = args.ckpt_dir
    else:
        assert args.tf_ckpt, f"no config in {args.ckpt_dir} and no --tf_ckpt"
        cfg = ExperimentConfig()
    cfg.model.compute_dtype = args.precision

    if args.tf_ckpt:
        # reference TF checkpoint: the ≤0.05-EPE parity check is
        #   python evaluate.py . --tf_ckpt <prefix> --dataset sintel --eval_iters 12
        from flow_supervisor_tpu.convert import load_tf_checkpoint

        params, batch_stats = load_tf_checkpoint(args.tf_ckpt)
        cfg.model.model_type = (
            "raft-semi" if "teacher_update_block" in params else "raft-baseline"
        )
        model = build_model(cfg)
        init = init_variables(model, cfg)
        bs = init.get("batch_stats", {})
        for k, v in batch_stats.items():
            if k in bs:
                bs = {**bs, k: v}
        variables = {"params": params, "batch_stats": bs}
    else:
        model = build_model(cfg)
        variables = init_variables(model, cfg)
        restored = ckpt.restore_checkpoint(args.ckpt_dir, step=args.step)
        assert restored is not None, f"no checkpoint in {args.ckpt_dir}"
        variables = {
            "params": restored["params"],
            "batch_stats": restored.get(
                "batch_stats", variables.get("batch_stats", {})
            ),
        }

    iters = args.eval_iters or (32 if args.dataset == "sintel" else 24)
    ev = Evaluator(model, variables, iters=iters, use_teacher=args.use_teacher,
                   pad_bucket=args.pad_bucket, space_parallel=args.space_parallel)

    results = {}
    if args.dataset == "sintel":
        for dstype in ("clean", "final"):
            recs = D.sintel(training=True, dstype=dstype)
            r = ev.evaluate(recs, sparse=False, warm_start=args.warm_start)
            results.update({f"{dstype}_{k}": v for k, v in r.items()})
    elif args.dataset == "chairs":
        recs = D.flying_chairs(training=False)
        results = ev.evaluate(recs, sparse=False)
    elif args.dataset == "kitti":
        recs = D.kitti(training=True)
        results = ev.evaluate(recs, sparse=True, warm_start=args.warm_start)
    elif args.dataset == "kitti2012":
        recs = D.kitti_2012(training=True)
        results = ev.evaluate(recs, sparse=True, warm_start=args.warm_start)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
