"""Multi-chip dry run: jit + execute ONE full flow-supervisor training step over
an n-device data-parallel mesh on tiny shapes. Used by the driver
(``__graft_entry__.dryrun_multichip``) with virtual CPU devices to validate that
the multi-chip sharding compiles and executes without real chips.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def run_dryrun(n_devices: int) -> None:
    import time as _time

    _t0 = _time.time()

    def _stamp(msg: str) -> None:
        print(f"[dryrun +{_time.time() - _t0:.0f}s] {msg}", flush=True)

    from flow_supervisor_tpu.config import ModelCfg
    from flow_supervisor_tpu.models import RAFT, RAFTConfig
    from flow_supervisor_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from flow_supervisor_tpu.training.optim import adamw
    from flow_supervisor_tpu.training.semi import make_semi_train_step
    from flow_supervisor_tpu.training.state import TrainState

    import os

    # The driver validates multi-chip sharding with virtual CPU devices
    # (xla_force_host_platform_device_count). A TPU plugin may have overridden
    # jax_platforms at interpreter start, and the override cannot be undone once
    # backends are initialized — so when the virtual-CPU flag is present, force
    # the CPU platform BEFORE the first device query.
    if "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    # Persistent compile cache: the semi-step backward is a multi-minute XLA
    # compile on a 1-core host; repeat dryruns (driver re-validations, local
    # debugging) should pay it once.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    devs = jax.devices()
    assert len(devs) >= n_devices, (len(devs), n_devices)
    mesh = make_mesh(n_devices)

    cfg = RAFTConfig(iters=2, teacher=True, teacher_iters=1, freeze_bn=True).resolved()
    model = RAFT(cfg)
    mc = ModelCfg(
        teacher_iters=1,
        teacher_smurf_weight=1.0,
        occlusion="wang",
        lfr_loss_type="robust",
    )

    b = n_devices
    h, w = 32, 48
    fh, fw = 48, 64
    rng = np.random.default_rng(0)

    def img(shape):
        return jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)

    sup_batch = {
        "image1": img((b, h, w, 3)),
        "image2": img((b, h, w, 3)),
        "orig_image1": img((b, fh, fw, 3)),
        "orig_image2": img((b, fh, fw, 3)),
        "crop_yx": jnp.zeros((b, 2), jnp.int32) + 8,
        "flow": img((b, h, w, 2)),
        "valid": jnp.ones((b, h, w, 1), jnp.float32),
    }
    unsup_batch = {k: v for k, v in sup_batch.items() if k not in ("flow", "valid")}

    variables = model.init(
        jax.random.PRNGKey(0),
        sup_batch["image1"][:1],
        sup_batch["image2"][:1],
        sup_batch["orig_image1"][:1],
        sup_batch["orig_image2"][:1],
        sup_batch["crop_yx"][:1],
        train=False,
        method="semi_forward",
    )
    tx = adamw(lambda s: 1e-4, lambda s: 0.0)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    with jax.set_mesh(mesh):
        state = replicate(state, mesh)
        sup_sharded = shard_batch(sup_batch, mesh)
        unsup_sharded = shard_batch(unsup_batch, mesh)
        step = make_semi_train_step(model, mc, donate=False)
        new_state, log = step(state, sup_sharded, unsup_sharded)
        jax.block_until_ready(new_state.params)

    assert int(new_state.step) == 1
    for k, v in log.items():
        assert np.isfinite(float(v)), (k, v)
    _stamp(
        f"dryrun_multichip ok: {n_devices} devices, "
        + ", ".join(f"{k}={float(v):.4f}" for k, v in sorted(log.items()))
    )

    # Pod-scale hierarchical DP (BASELINE config 5): the same semi step over a
    # (dcn, ici) 2-D mesh — batch sharded over both axes, gradient all-reduce
    # ICI-first then cross-slice over DCN.
    if n_devices % 2 == 0 and n_devices >= 4:
        from flow_supervisor_tpu.parallel.mesh import make_pod_mesh

        pod = make_pod_mesh(2, n_devices // 2)
        with jax.set_mesh(pod):
            pstate = replicate(state, pod)
            psup = shard_batch(sup_batch, pod)
            punsup = shard_batch(unsup_batch, pod)
            pnew, plog = step(pstate, psup, punsup)
            jax.block_until_ready(pnew.params)
        assert int(pnew.step) == 1
        for k, v in plog.items():
            assert np.isfinite(float(v)), (k, v)
        _stamp(
            f"dryrun_multichip pod mesh ok: (dcn=2, ici={n_devices // 2}), "
            + ", ".join(f"{k}={float(v):.4f}" for k, v in sorted(plog.items()))
        )

    # Flagship recipe composed ONCE (BASELINE config 5): GMA flow-supervisor on
    # the (dcn, ici) pod mesh, fed by the REAL `semi-davis_unsup-ctskh` zipped
    # dataloader (mixed C+T+S+K+H labeled stream + DAVIS unlabeled stream,
    # reference pytorch/train_gma.py:345-356 + README.md:31-33) over a
    # synthetic dataset tree at tiny shapes.
    if n_devices % 2 == 0 and n_devices >= 4:
        import importlib
        import tempfile

        from flow_supervisor_tpu.config import TrainCfg
        from flow_supervisor_tpu.data import paths
        from flow_supervisor_tpu.data.synthetic import build_synthetic_tree
        from flow_supervisor_tpu.parallel.mesh import make_pod_mesh

        gcfg = RAFTConfig(
            iters=2, teacher=True, teacher_iters=1, freeze_bn=True,
            gma=True,
        ).resolved()
        gmodel = RAFT(gcfg)

        old_root = os.environ.get("FST_DATA_ROOT")
        tmp = tempfile.TemporaryDirectory(prefix="fst_dryrun_")
        try:
            build_synthetic_tree(tmp.name)
            os.environ["FST_DATA_ROOT"] = tmp.name
            importlib.reload(paths)
            from flow_supervisor_tpu.data.pipeline import fetch_dataloader

            tcfg = TrainCfg(
                stage="semi-davis_unsup-ctskh",
                batch_size=n_devices,
                image_size=(h, w),
                unsup_image_size=(h, w),
                full_size=(fh, fw),
                loader_workers=0,
                seed=0,
            )
            loader = fetch_dataloader(tcfg)
            sup_b, unsup_b = next(loader)
            # stop the prefetch thread BEFORE the tempdir vanishes under it
            loader.close()
        finally:
            if old_root is None:
                os.environ.pop("FST_DATA_ROOT", None)
            else:
                os.environ["FST_DATA_ROOT"] = old_root
            importlib.reload(paths)
            tmp.cleanup()

        gvars = gmodel.init(
            jax.random.PRNGKey(2),
            jnp.asarray(sup_b["image1"][:1]),
            jnp.asarray(sup_b["image2"][:1]),
            jnp.asarray(sup_b["orig_image1"][:1]),
            jnp.asarray(sup_b["orig_image2"][:1]),
            jnp.asarray(sup_b["crop_yx"][:1]),
            train=False,
            method="semi_forward",
        )
        gstate = TrainState.create(gvars["params"], gvars["batch_stats"], tx)
        gstep = make_semi_train_step(gmodel, mc, donate=False)
        pod = make_pod_mesh(2, n_devices // 2)
        sup_keys = ("image1", "image2", "orig_image1", "orig_image2",
                    "crop_yx", "flow", "valid")
        with jax.set_mesh(pod):
            gstate = replicate(gstate, pod)
            gsup = shard_batch({k: jnp.asarray(sup_b[k]) for k in sup_keys}, pod)
            gunsup = shard_batch(
                {k: jnp.asarray(unsup_b[k]) for k in sup_keys[:5]}, pod
            )
            gnew, glog = gstep(gstate, gsup, gunsup)
            jax.block_until_ready(gnew.params)
        assert int(gnew.step) == 1
        for k, v in glog.items():
            assert np.isfinite(float(v)), (k, v)
        _stamp(
            f"dryrun_multichip gma pod mesh ok: (dcn=2, ici={n_devices // 2}), "
            f"stage=semi-davis_unsup-ctskh, "
            + ", ".join(f"{k}={float(v):.4f}" for k, v in sorted(glog.items()))
        )

    # Space-axis sharded eval forward (parallel/spatial.py): one image pair's
    # H axis — and with it the correlation volume's query rows — split across
    # all devices, vs the single-device oracle.
    from flow_supervisor_tpu.parallel.spatial import make_space_mesh, spatial_forward

    emodel = RAFT(RAFTConfig(iters=2, lookup_backend="einsum").resolved())
    eh, ew = 8 * n_devices * 2, 48
    ei1, ei2 = img((1, eh, ew, 3)), img((1, eh, ew, 3))
    evars = emodel.init(jax.random.PRNGKey(1), ei1, ei2, train=False)
    ref = emodel.apply(evars, ei1, ei2, train=False)["flow_up"][-1]
    got = spatial_forward(emodel, make_space_mesh(n_devices))(evars, ei1, ei2)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 2e-4, f"space-sharded forward mismatch: {err}"
    _stamp(f"dryrun_multichip space mesh ok: {n_devices}-way H shard, max|d|={err:.2e}")
