#!/usr/bin/env python
"""Checkpoint maintenance CLI — the reference's ``ckpt_cleaner.py`` equivalent.

The reference lazily re-saves an optimizer-free '-weights' twin of a checkpoint
in a subprocess (ckpt_cleaner.py:8-60) because TF entangles optimizer slots with
the model. Here params/opt_state are separate pytrees, so 'clean' is a plain
params+stats re-save.

Usage:
    python ckpt_tool.py list <ckpt_dir>
    python ckpt_tool.py clean <ckpt_dir> <out_dir> [--step N]
"""
from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["list", "clean"])
    p.add_argument("ckpt_dir")
    p.add_argument("out_dir", nargs="?")
    p.add_argument("--step", type=int, default=None)
    args = p.parse_args()

    from flow_supervisor_tpu.training import checkpoint as ckpt

    if args.cmd == "list":
        import orbax.checkpoint as ocp
        import os

        mgr = ocp.CheckpointManager(os.path.abspath(args.ckpt_dir))
        print("steps:", list(mgr.all_steps()))
        mgr.close()
        return

    assert args.out_dir, "clean requires an output dir"
    restored = ckpt.restore_checkpoint(args.ckpt_dir, step=args.step)
    assert restored is not None, f"no checkpoint in {args.ckpt_dir}"
    step = args.step if args.step is not None else (ckpt.latest_step(args.ckpt_dir) or 0)
    ckpt.save_checkpoint(
        args.out_dir, step, restored["params"], restored.get("batch_stats", {})
    )
    print(f"wrote optimizer-free checkpoint step {step} to {args.out_dir}")


if __name__ == "__main__":
    main()
