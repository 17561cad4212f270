"""Raw conv-emitter efficiency probe at encoder stage-1 shapes (round 4).

The encoder stack runs at <10% of MXU roofline (tools/exp_encoder_ablate.py
motivation). This prices XLA's conv emitter at the exact hot shapes,
independent of the encoder structure, with matched-FLOP matmuls as the
roofline reference:

  conv64  : 3x3 conv [2,224,512,64]->64, SAME (stage-1 shape, 2 imgs)
  conv96  : 3x3 conv [2,112,256,96]->96 (stage-2 shape)
  conv128 : 3x3 conv [2,56,128,128]->128 (stage-3 shape)
  conv64p : stage-1 conv with channels zero-padded to 128 in+out (same
            useful FLOPs, 4x the nominal FLOPs — tests whether <128-lane
            channel counts are the limiter)
  mm64    : matched matmul [2*224*512, 576] @ [576, 64] (stage-1 im2col
            FLOPs without the im2col materialization)
  mm128   : [2*224*512, 576] @ [576, 128]
  stemmm  : the s2d stem matmul [2*224*512, 192] @ [192, 64]

Chained fori_loop, one scalar fetch, interleaved rounds (docs/PERF.md).
All ops bf16 with f32 accumulation (production dtypes).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def conv_chain(n, shape, cin, cout, pad_to=None):
    kh = kw = 3
    if pad_to:
        cin_p, cout_p = pad_to, pad_to
    else:
        cin_p, cout_p = cin, cout
    b, h, w = shape
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.normal(0, 0.05, (kh, kw, cin_p, cout_p)), jnp.bfloat16)

    @jax.jit
    def chained(k_, x, s0):
        def body(i, s):
            y = jax.lax.conv_general_dilated(
                (x + s * jnp.bfloat16(1e-3)),
                k_,
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return jnp.mean(y).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, s0)

    x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, cin_p)), jnp.bfloat16)
    return chained, (k, x)


def mm_chain(n, m, kk, nn_):
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.normal(0, 0.05, (kk, nn_)), jnp.bfloat16)

    @jax.jit
    def chained(w_, x, s0):
        def body(i, s):
            y = jax.lax.dot_general(
                x + s * jnp.bfloat16(1e-3), w_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.mean(y).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n, body, s0)

    x = jnp.asarray(rng.uniform(-1, 1, (m, kk)), jnp.bfloat16)
    return chained, (w, x)


def main():
    import signal

    def _alarm(signum, frame):
        raise RuntimeError("relay watchdog")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(sys.argv[sys.argv.index("--watchdog") + 1])
                 if "--watchdog" in sys.argv else 900)

    n = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 100
    builders = {
        "conv64": lambda: conv_chain(n, (2, 224, 512), 64, 64),
        "conv96": lambda: conv_chain(n, (2, 112, 256), 96, 96),
        "conv128": lambda: conv_chain(n, (2, 56, 128), 128, 128),
        "conv64p": lambda: conv_chain(n, (2, 224, 512), 64, 64, pad_to=128),
        "mm64": lambda: mm_chain(n, 2 * 224 * 512, 576, 64),
        "mm128": lambda: mm_chain(n, 2 * 224 * 512, 576, 128),
        "stemmm": lambda: mm_chain(n, 2 * 224 * 512, 192, 64),
    }
    gflop = {
        "conv64": 2 * 224 * 512 * 64 * 64 * 9 * 2 / 1e9,
        "conv96": 2 * 112 * 256 * 96 * 96 * 9 * 2 / 1e9,
        "conv128": 2 * 56 * 128 * 128 * 128 * 9 * 2 / 1e9,
        "conv64p": 2 * 224 * 512 * 64 * 64 * 9 * 2 / 1e9,  # useful flops
        "mm64": 2 * 224 * 512 * 576 * 64 * 2 / 1e9,
        "mm128": 2 * 224 * 512 * 576 * 128 * 2 / 1e9,
        "stemmm": 2 * 224 * 512 * 192 * 64 * 2 / 1e9,
    }
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip = False
    clean = []
    for a in sys.argv[1:]:
        if skip:
            skip = False
            continue
        if a.startswith("--"):
            skip = True
            continue
        clean.append(a)
    names = clean or list(builders)

    fns = {}
    for name in names:
        try:
            fn, args = builders[name]()
            t0 = time.perf_counter()
            val = float(fn(*args, jnp.bfloat16(0)))
            print(f"{name:8s} warm: {val:.4f} ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
            fns[name] = (fn, args)
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__}: {e}", flush=True)

    times = {k: [] for k in fns}
    for r in range(3):
        for name, (fn, args) in fns.items():
            t0 = time.perf_counter()
            float(fn(*args, jnp.bfloat16(r + 1)))
            times[name].append(time.perf_counter() - t0)
    print("---")
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2] / n * 1e3
        eff = gflop[name] / (med / 1e3) / 1e3  # TFLOP/s
        print(f"{name:8s}: {med:7.3f} ms  {eff:6.1f} TFLOP/s useful")


if __name__ == "__main__":
    main()
