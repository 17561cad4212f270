"""Interleaved A/B: production SepConvGRU (6 separate k=5 convs, N=128 each)
vs gate-fused compute (same params, concatenated at apply time).

Per direction the GRU pays 3 matmuls with N=128: z(hx), r(hx), q([r*h, x]).
The fused variant exploits shared inputs: z and r read the same hx, and q's
x-half is the same x — so compute ONE dot on the x im2col with [Wz_x|Wr_x|Wq_x]
(N=384), ONE dot on the h im2col with [Wz_h|Wr_h] (N=256), and one dot on the
(r*h) im2col with Wq_h (N=128). Same FLOPs, 3 dots instead of 3, but wider N
(MXU utilization) and one less im2col materialization.

Parameters are bit-identical (concat at apply time): checks max|dh| first.

  PYTHONPATH=/root/repo:/root/.axon_site python -u tools/exp_gru_fuse.py
  (CPU check: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/exp_gru_fuse.py --check)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from flow_supervisor_tpu.models.update import BasicUpdateBlock

H, W = 56, 128
HD = 128  # hidden
XD = 256  # GRU input (context 128 + motion 128)


def _im2col_1d(x, k, axis):
    """[B,H,W,C] -> [B,H,W,k*C] taps along `axis` (1=H,2=W), SAME zero pad."""
    pad = [(0, 0)] * 4
    pad[axis] = (k // 2, k // 2)
    xp = jnp.pad(x, pad)
    taps = []
    for i in range(k):
        idx = [slice(None)] * 4
        idx[axis] = slice(i, i + x.shape[axis])
        taps.append(xp[tuple(idx)])
    return jnp.concatenate(taps, axis=-1)


def _dot(cols, w):
    m = cols.shape[0] * cols.shape[1] * cols.shape[2]
    y = jax.lax.dot_general(
        cols.reshape(m, cols.shape[-1]), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(cols.shape[:3] + (w.shape[-1],))


def _gate_kernels(p, idx, k, axis):
    """kernel (kh,kw,cin,cout) -> im2col-ordered [k*cin, cout] split at HD."""
    kern = p[f"UpdateConv_{idx}"]["Conv_0"]["kernel"].astype(jnp.bfloat16)
    kern = kern.reshape(k, HD + XD, HD) if axis == 1 else kern.reshape(k, HD + XD, HD)
    wh = kern[:, :HD, :].reshape(k * HD, HD)
    wx = kern[:, HD:, :].reshape(k * XD, HD)
    bias = p[f"UpdateConv_{idx}"]["Conv_0"]["bias"].astype(jnp.float32)
    return wh, wx, bias


def fused_sepconv_gru(params, h, x):
    """Same math as SepConvGRU with gate-concatenated dots."""
    p = params
    for axis, base in ((2, 0), (1, 3)):  # horizontal (1x5) then vertical (5x1)
        k = 5
        wzh, wzx, bz = _gate_kernels(p, base + 0, k, axis)
        wrh, wrx, br = _gate_kernels(p, base + 1, k, axis)
        wqh, wqx, bq = _gate_kernels(p, base + 2, k, axis)
        cols_x = _im2col_1d(x, k, axis)   # [B,H,W,k*XD]
        cols_h = _im2col_1d(h, k, axis)   # [B,H,W,k*HD]
        pre_x = _dot(cols_x, jnp.concatenate([wzx, wrx, wqx], axis=-1))
        pre_h = _dot(cols_h, jnp.concatenate([wzh, wrh], axis=-1))
        z = jax.nn.sigmoid(pre_x[..., :HD] + pre_h[..., :HD] + bz)
        r = jax.nn.sigmoid(pre_x[..., HD : 2 * HD] + pre_h[..., HD:] + br)
        cols_rh = _im2col_1d((r * h).astype(h.dtype), k, axis)
        q = jnp.tanh(pre_x[..., 2 * HD :] + _dot(cols_rh, wqh) + bq)
        h = ((1.0 - z) * h.astype(jnp.float32) + z * q).astype(h.dtype)
    return h


def main():
    check_only = "--check" in sys.argv
    if check_only:
        jax.config.update("jax_platforms", "cpu")
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(560)

    dtype = jnp.float32 if check_only else jnp.bfloat16
    blk = BasicUpdateBlock(dtype=dtype, dy_major_corr=True)
    rng = np.random.RandomState(0)
    net = jnp.asarray(rng.randn(1, H, W, 128) * 0.1, dtype)
    inp = jnp.asarray(rng.randn(1, H, W, 128) * 0.1, dtype)
    corr = jnp.asarray(rng.randn(1, H, W, 324), dtype)
    flow = jnp.asarray(rng.randn(1, H, W, 2), dtype)
    variables = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    gru_params = variables["params"]["SepConvGRU_0"]

    # correctness: fused GRU == module GRU on the same state
    from flow_supervisor_tpu.models.update import SepConvGRU

    gru = SepConvGRU(128, 256, dtype)
    x = jnp.concatenate([inp, inp], axis=-1)  # any 256-ch input
    # jit both: eager through the lazy relay dispatches each op separately
    # and the final fetch can exceed the watchdog
    ref = jax.jit(lambda p, h, xx: gru.apply({"params": p}, h, xx))(
        gru_params, net, x)
    got = jax.jit(fused_sepconv_gru)(gru_params, net, x)
    err = float(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max())
    # splitting the hx dot into h-dot + x-dot reassociates the K=1920 fp32
    # sum: ~2e-4 activation delta, not a bug (goldens arbitrate adoption)
    print(f"fused-vs-module max|dh| = {err:.2e}", flush=True)
    assert err < (1e-3 if check_only else 3e-2), err
    if check_only:
        return

    reps = 48

    def make_chain(fused):
        @jax.jit
        def chain(v, net0, inp_, corr_, flow_):
            def it(i, carry):
                net_, fl = carry

                def run(net__):
                    if fused:
                        # motion/flow/mask heads via modules, GRU fused
                        from flow_supervisor_tpu.models.update import (
                            BasicMotionEncoder, FlowHead, UpdateConv,
                        )
                        m = BasicMotionEncoder(dtype=dtype, dy_major_corr=True).apply(
                            {"params": v["params"]["BasicMotionEncoder_0"]},
                            fl, corr_)
                        xx = jnp.concatenate([inp_, m], axis=-1)
                        net2 = fused_sepconv_gru(
                            v["params"]["SepConvGRU_0"], net__, xx)
                        df = FlowHead(256, 128, dtype).apply(
                            {"params": v["params"]["FlowHead_0"]}, net2)
                        mm = jax.nn.relu(UpdateConv(128, 256, 3, dtype).apply(
                            {"params": v["params"]["UpdateConv_0"]}, net2))
                        mask = 0.25 * UpdateConv(256, 576, 1, dtype).apply(
                            {"params": v["params"]["UpdateConv_1"]}, mm)
                        return net2, df + 0 * mask[..., :2].astype(df.dtype)
                    net2, mask, df = blk.apply(v, net__, inp_, corr_, fl)
                    return net2, df + 0 * mask[..., :2].astype(df.dtype)

                net2, df = run(net_)
                return (net2, fl + df.astype(fl.dtype) * 1e-3)

            net_f, fl_f = jax.lax.fori_loop(
                0, reps, it, (net0, flow))
            return jnp.mean(jnp.abs(net_f.astype(jnp.float32))) + jnp.mean(
                jnp.abs(fl_f.astype(jnp.float32)))

        return chain

    prod = make_chain(False)
    fused = make_chain(True)
    for name, fn in (("prod", prod), ("fused", fused)):
        t0 = time.perf_counter()
        v = float(fn(variables, net, inp, corr, flow))
        print(f"{name}: compile {time.perf_counter() - t0:.1f}s v={v:.4f}",
              flush=True)
    res = {"prod": [], "fused": []}
    for r in range(4):
        for name, fn in (("prod", prod), ("fused", fused)):
            t0 = time.perf_counter()
            float(fn(variables, net, inp, corr, flow))
            res[name].append((time.perf_counter() - t0) / reps * 1e3)
    for name, ts in res.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med:.3f} ms/iter (" +
              " ".join(f"{t:.3f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    main()
