"""Probe: does int8 W8A8 matmul beat bf16 on the axon v5e at our shapes?

1. correctness: int8@int8 -> int32 vs numpy
2. timing (rep differencing in scanned programs): 12-layer mlp-ish chain
   (N,192)@(192,768) + (N,768)@(768,192), bf16 vs W8A8-dynamic-quant,
   at N=320 (single-stream) and N=5120 (16 streams).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gstreamer_vit_tracker_tpu.utils import compile_cache

compile_cache.enable()

print("backend:", jax.default_backend())

# ---- 1. correctness -------------------------------------------------------
rng = np.random.default_rng(0)
a8 = rng.integers(-127, 128, (64, 192), dtype=np.int8)
b8 = rng.integers(-127, 128, (192, 128), dtype=np.int8)


@jax.jit
def i8mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


got = np.asarray(i8mm(jnp.asarray(a8), jnp.asarray(b8)))
want = a8.astype(np.int32) @ b8.astype(np.int32)
print("int8 matmul exact:", bool((got == want).all()))

# ---- 2. timing ------------------------------------------------------------
D, HID, DEPTH = 192, 768, 12


def make_weights(key):
    ks = jax.random.split(key, 2 * DEPTH)
    ws = []
    for i in range(DEPTH):
        w1 = jax.random.normal(ks[2 * i], (D, HID), jnp.float32) * 0.05
        w2 = jax.random.normal(ks[2 * i + 1], (HID, D), jnp.float32) * 0.05
        ws.append((w1, w2))
    return ws


def quant_w(w):
    # per-output-channel symmetric
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    q = jnp.round(w / s).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def qdq_matmul(x, wq, ws):
    # dynamic per-row activation quant
    xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-8)
    xq = jnp.round(x / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws


def bench(n, reps_lo=50, reps_hi=250):
    ws = make_weights(jax.random.PRNGKey(0))
    ws_bf = [(w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16))
             for w1, w2 in ws]
    ws_q = [(quant_w(w1), quant_w(w2)) for w1, w2 in ws]
    x0 = jax.random.normal(jax.random.PRNGKey(1), (n, D), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_bf16(x, reps):
        def body(c, _):
            y = c.astype(jnp.bfloat16)
            for w1, w2 in ws_bf:
                y = jnp.tanh(y @ w1) @ w2
            return y.astype(jnp.float32) * 0.5 + c * 0.5, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_i8(x, reps):
        def body(c, _):
            y = c
            for (w1q, w1s), (w2q, w2s) in ws_q:
                y = qdq_matmul(jnp.tanh(qdq_matmul(y, w1q, w1s)), w2q, w2s)
            return y * 0.5 + c * 0.5, ()
        c, _ = jax.lax.scan(body, x, None, length=reps)
        return c

    def t(fn, reps):
        out = fn(x0, reps)
        np.asarray(out)
        t0 = time.perf_counter()
        out = fn(x0, reps)
        np.asarray(out)
        return time.perf_counter() - t0

    for name, fn in (("bf16", run_bf16), ("int8", run_i8)):
        t(fn, reps_lo); t(fn, reps_hi)
        a = min(t(fn, reps_lo) for _ in range(2))
        b = min(t(fn, reps_hi) for _ in range(2))
        ms = 1000.0 * (b - a) / (reps_hi - reps_lo)
        print(f"N={n} {name}: {ms:.4f} ms per 12x(mlp) chain "
              f"({ms / DEPTH * 1000:.2f} us/layer)")


bench(320)
bench(5120, reps_lo=20, reps_hi=100)
print("done")
