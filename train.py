#!/usr/bin/env python
"""Training CLI.

Usage parity with the reference (``train.py``):
    python train.py ckpts/raft_baseline/chairs --stage chairs --iters 12 \
        --image_size 368 496 --num_steps 100000 --lr 4e-4 --batch_size 10
    python train.py ckpts/semi/sintel --stage semi-sintel_unsup_test-things_unsup \
        --model_type raft-semi --lr 1e-5 --lr_schedule exponential ...

The config is saved as YAML beside the checkpoints and restored by
evaluate/extract (cargbox semantics, reference train.py:80-87).
"""
from __future__ import annotations


def main():
    from flow_supervisor_tpu.utils.jax_setup import setup as _jax_setup
    _jax_setup()

    import contextlib
    import sys

    # debug escape hatch (reference train.py:37 --run_eagerly/-e): run the
    # whole loop with jit disabled so python breakpoints/prints work. Handled
    # before the config parser so it never persists into args.yaml.
    run_eagerly = bool({"--run_eagerly", "-e"} & set(sys.argv))
    sys.argv = [a for a in sys.argv if a not in ("--run_eagerly", "-e")]

    from flow_supervisor_tpu.config import (
        ExperimentConfig,
        build_argparser,
        config_from_args,
        explicit_cli_fields,
    )

    parser = build_argparser()
    cfg = config_from_args(parser.parse_args())
    cfg = ExperimentConfig.maybe_restore(
        cfg.ckpt_dir, cfg, explicit=explicit_cli_fields(sys.argv[1:])
    )

    from flow_supervisor_tpu.data.pipeline import fetch_dataloader
    from flow_supervisor_tpu.training.loop import train

    data_iter = fetch_dataloader(cfg.train)
    if run_eagerly:
        import jax

        ctx = jax.disable_jit()
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        train(cfg, data_iter)


if __name__ == "__main__":
    main()
