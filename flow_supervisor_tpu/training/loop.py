"""Training loop: model build, restore/pretrain/resume, stepping, validation
callbacks, checkpointing, metric logging.

Replaces the reference Keras fit harness (train.py:90-221 + util/callback.py +
util/validate.py callbacks) with an explicit loop around the jitted train steps.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from flow_supervisor_tpu.config import ExperimentConfig
from flow_supervisor_tpu.models import RAFT, RAFTConfig
from flow_supervisor_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from flow_supervisor_tpu.training import checkpoint as ckpt
from flow_supervisor_tpu.training.baseline import make_train_step
from flow_supervisor_tpu.training.optim import make_optimizer
from flow_supervisor_tpu.training.semi import make_semi_train_step
from flow_supervisor_tpu.training.unsup import make_unsup_train_step
from flow_supervisor_tpu.training.state import TrainState


def build_model(cfg: ExperimentConfig) -> RAFT:
    mc = cfg.model
    rcfg = RAFTConfig(
        small=mc.small,
        iters=mc.iters,
        dropout=mc.dropout,
        teacher=mc.model_type.endswith("semi"),
        teacher_iters=mc.teacher_iters,
        freeze_bn=cfg.train.freeze_bn or cfg.train.stage not in ("chairs", "chairs_unsup"),
        gma=mc.model_type.startswith("gma"),
        num_heads=mc.num_heads,
        position_only=mc.position_only,
        position_and_content=mc.position_and_content,
        dtype=jnp.bfloat16 if mc.compute_dtype == "bfloat16" else jnp.float32,
        corr_dtype=jnp.bfloat16 if mc.corr_dtype == "bfloat16" else jnp.float32,
        lookup_backend=mc.lookup_backend,
        scan_iters=mc.scan_iters,
    ).resolved()
    return RAFT(rcfg)


def init_variables(model: RAFT, cfg: ExperimentConfig, rng_key=None):
    # Init runs at SMALL fixed shapes: the variable tree (conv params, BN
    # stats) is image-size independent, and initializing at recipe/eval
    # shapes has two TPU costs: (a) an unjitted init dispatches each pallas
    # lookup as its own standalone XLA program, where the compiler allocates
    # the kernel OUTPUT on the scoped-vmem stack next to the kernel's working
    # set — measured 17.15M > the 16M limit at 368x768; (b) jitting it
    # instead pays a full-forward remote compile just to make zeros.
    rng_key = jax.random.PRNGKey(cfg.train.seed) if rng_key is None else rng_key
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    if model.cfg.teacher:
        full = jnp.zeros((1, 96, 128, 3), jnp.float32)
        return model.init(
            rng_key,
            img,
            img,
            full,
            full,
            jnp.zeros((1, 2), jnp.int32),
            train=False,
            method="semi_forward",
        )
    return model.init(rng_key, img, img, train=False)


class MetricLogger:
    """JSONL metric log + console echo, plus TensorBoard event files when
    TensorFlow is importable (reference observability: TensorBoard scalars
    every 10 steps + per-epoch validation writers, train.py:211-217)."""

    def __init__(self, ckpt_dir: str):
        os.makedirs(ckpt_dir, exist_ok=True)
        self.path = os.path.join(ckpt_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            import tensorflow as tf  # optional

            self._tb = tf.summary.create_file_writer(
                os.path.join(ckpt_dir, "tb")
            )
        except Exception:
            pass

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        row = {"step": step, "prefix": prefix}
        row.update(
            {
                k: (float(v) if not isinstance(v, (str, int)) else v)
                for k, v in metrics.items()
            }
        )
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    if not isinstance(v, str):
                        tf.summary.scalar(f"{prefix}/{k}", float(v), step=step)
            self._tb.flush()

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def train(
    cfg: ExperimentConfig,
    data_iter,
    max_steps: Optional[int] = None,
    validate_fn: Optional[Callable[[int, TrainState], dict]] = None,
):
    """Run training for cfg.train.num_steps (or max_steps), checkpointing and
    validating every val_step steps (and once at start unless
    cfg.train.skip_validation_at_start — reference train.py:38,211-217).
    ``data_iter`` yields batches (for semi: (sup_batch, unsup_batch) tuples).
    ``validate_fn`` overrides the standing Sintel/KITTI/Chairs validators built
    from the stage (datasets whose roots are missing are skipped silently)."""
    model = build_model(cfg)
    variables = init_variables(model, cfg)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    # BN freeze also removes gamma/beta from training entirely (reference
    # util/train.py:4-12 sets trainable=False; see optim._zero_frozen_bn)
    tx = make_optimizer(cfg.train, freeze_bn=model.cfg.freeze_bn)
    is_semi = cfg.model.model_type.endswith("semi")
    is_unsup = cfg.model.model_type.endswith("unsup")

    # restore-or-init (train.py:188-209 semantics)
    restored = ckpt.restore_checkpoint(cfg.ckpt_dir)
    start_step = 0
    if restored is not None:
        params = restored["params"]
        batch_stats = restored.get("batch_stats", batch_stats)
        start_step = ckpt.latest_step(cfg.ckpt_dir) or 0
        print(f"resumed from {cfg.ckpt_dir} at step {start_step}")
    elif cfg.train.pretrained_ckpt:
        pre = ckpt.restore_checkpoint(cfg.train.pretrained_ckpt)
        assert pre is not None, cfg.train.pretrained_ckpt
        params = ckpt.initialize_from_baseline(params, pre["params"])
        if "batch_stats" in pre:
            bs = dict(batch_stats)
            for k in pre["batch_stats"]:
                if k in bs:
                    bs[k] = pre["batch_stats"][k]
            batch_stats = bs
        if is_semi:
            params = ckpt.initialize_teacher_net(params)
        print(f"initialized from pretrained {cfg.train.pretrained_ckpt}")

    state = TrainState.create(params, batch_stats, tx)
    if start_step:
        state = state.replace(step=jnp.asarray(start_step, jnp.int32))

    from flow_supervisor_tpu.parallel.mesh import auto_data_parallel, make_pod_mesh

    if cfg.train.dcn_parallel > 1:
        mesh = make_pod_mesh(cfg.train.dcn_parallel)
        n_mesh = int(np.prod(mesh.devices.shape))
        assert cfg.train.batch_size % n_mesh == 0, (
            f"batch_size={cfg.train.batch_size} must divide evenly over the "
            f"pod mesh ({mesh.devices.shape[0]} dcn x {mesh.devices.shape[1]} "
            f"ici = {n_mesh} devices); pick a batch that is a multiple of the "
            f"device count or lower --dcn_parallel"
        )
    else:
        mesh = make_mesh(
            auto_data_parallel(cfg.train.batch_size, cfg.train.data_parallel)
        )
    logger = MetricLogger(cfg.ckpt_dir)
    cfg.save_yaml()

    if is_semi:
        step_fn = make_semi_train_step(
            model, cfg.model, gamma=cfg.train.loss_decay_rate,
            sup_loss_type=cfg.train.loss_type,
        )
    elif is_unsup:
        step_fn = make_unsup_train_step(model, cfg.model)
    else:
        step_fn = make_train_step(
            model, loss_type=cfg.train.loss_type, gamma=cfg.train.loss_decay_rate
        )

    if validate_fn is None:
        from flow_supervisor_tpu.evaluation import make_train_validator

        validate_fn = make_train_validator(cfg, model)

    def run_validation(at_step: int, st) -> None:
        if validate_fn is None:
            return
        val = validate_fn(at_step, st)
        logger.log(at_step, val, prefix="val")
        print(f"val {at_step}: " + ", ".join(f"{k}={v:.4f}" for k, v in val.items()))

    total = cfg.train.num_steps if max_steps is None else max_steps
    last_log_time = time.time()
    steps_since_log = 0
    # --trace_dir: xplane trace of trace_steps steady-state steps, started
    # after 2 warmup steps so compiles don't pollute the timeline
    trace_start = start_step + 2 if cfg.train.trace_dir else -1
    trace_stop = trace_start + cfg.train.trace_steps
    tracing = False
    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        if start_step == 0 and not cfg.train.skip_validation_at_start:
            run_validation(0, state)
        for step_i in range(start_step, total):
            if step_i == trace_start:
                jax.block_until_ready(state.params)
                jax.profiler.start_trace(cfg.train.trace_dir)
                tracing = True
            elif step_i == trace_stop and tracing:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                tracing = False
                print(f"trace written to {cfg.train.trace_dir}")
            batch = next(data_iter)
            if is_semi:
                sup_b, unsup_b = batch
                state, metrics = step_fn(
                    state, shard_batch(_to_semi_sup(sup_b), mesh),
                    shard_batch(_to_semi_unsup(unsup_b), mesh),
                )
            else:
                state, metrics = step_fn(state, shard_batch(batch, mesh))

            steps_since_log += 1
            if (step_i + 1) % cfg.train.log_every == 0:
                # materialize metrics first: dispatch is async, so wall time is
                # only meaningful after the device work is consumed
                m = {k: float(v) for k, v in metrics.items()}
                now = time.time()
                m["steps_per_sec"] = steps_since_log / max(now - last_log_time, 1e-9)
                last_log_time = now
                steps_since_log = 0
                logger.log(step_i + 1, m)
                print(f"step {step_i+1}: " + ", ".join(f"{k}={v:.4f}" for k, v in m.items()))

            if (step_i + 1) % cfg.train.val_step == 0 or (step_i + 1) == total:
                ckpt.save_checkpoint(
                    cfg.ckpt_dir, step_i + 1, state.params, state.batch_stats,
                    state.opt_state,
                )
                run_validation(step_i + 1, state)
        if tracing:  # run ended inside the trace window
            jax.block_until_ready(state.params)
            jax.profiler.stop_trace()
            print(f"trace written to {cfg.train.trace_dir}")
    logger.close()
    return state


def _to_semi_sup(b: dict) -> dict:
    return {
        "image1": b["image1"],
        "image2": b["image2"],
        "orig_image1": b["orig_image1"],
        "orig_image2": b["orig_image2"],
        "crop_yx": b["crop_yx"],
        "flow": b["flow"],
        "valid": b["valid"],
    }


def _to_semi_unsup(b: dict) -> dict:
    return {
        "image1": b["image1"],
        "image2": b["image2"],
        "orig_image1": b["orig_image1"],
        "orig_image2": b["orig_image2"],
        "crop_yx": b["crop_yx"],
    }
