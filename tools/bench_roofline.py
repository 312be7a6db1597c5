"""Empirical rooflines for the tunneled v5e chip.

Measures, in ONE jit dispatch each (chained repeats inside the jit to
amortize the ~29 ms tunnel overhead, see docs/PERFORMANCE.md):
  * big-matmul bf16 MAC throughput (the practical MXU peak),
  * kernel-shaped matmul throughput (the [128, 128] x [128, 2048] and
    [125, 128] x [128, 2048] shapes the attention kernels issue),
  * VPU elementwise f32 throughput (fused multiply-add chains),
  * exp throughput (the softmax transcendental).

These anchor the cost models in kernels/spa_attn_hp.py /
kernels/ang_attn_mxu.py against reality instead of datasheet numbers.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    # block_until_ready does not actually synchronize on the tunneled
    # (axon) platform; a host transfer does (same trick as bench_attn.py).
    return float(jnp.sum(out[0][:1, :1]))


def _timed(fn, *args, reps=5):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    # subtract the measured per-dispatch tunnel floor (~29 ms); chained
    # iters inside the jit amortize most of it already
    return max(min(ts) - 0.029, 1e-9)


def big_matmul(n=4096, iters=32, dtype=jnp.bfloat16):
    a = jnp.ones((n, n), dtype)
    b = jnp.ones((n, n), dtype)

    @jax.jit
    def f(a, b):
        def body(x, _):
            return jnp.dot(x, b, preferred_element_type=dtype), None
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return (out,)

    t = _timed(f, a, b)
    macs = n * n * n * iters
    return macs / t / 1e12, t


def kernel_matmul(m, k, n, iters=None, dtype=jnp.bfloat16):
    if iters is None:
        iters = max(256, int(4e12 / (m * k * n)))
    a = jnp.ones((m, k), dtype)
    b = jnp.ones((k, n), dtype)

    @jax.jit
    def f(a, b):
        def body(c, _):
            s = jax.lax.dot_general(
                c, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # fold back to [m, k] so the chain has a data dependency
            if n >= k:
                nxt = s[:, :k]
            else:
                nxt = jnp.concatenate([s] * (-(-k // n)), axis=1)[:, :k]
            return (nxt * 1e-6).astype(dtype), None
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return (out,)

    t = _timed(f, a, b)
    macs = m * k * n * iters
    return macs / t / 1e12, t


def vpu_fma(rows=4096, cols=1024, iters=16384):
    a = jnp.ones((rows, cols), jnp.float32)

    @jax.jit
    def f(a):
        def body(x, _):
            return x * 1.0000001 + 0.0000001, None
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return (out,)

    t = _timed(f, a)
    ops = rows * cols * iters  # one fma per element per iter
    return ops / t / 1e12, t


def vpu_exp(rows=4096, cols=1024, iters=8192):
    a = jnp.full((rows, cols), -1.0, jnp.float32)

    @jax.jit
    def f(a):
        def body(x, _):
            return jnp.exp(x * 0.5), None
        out, _ = jax.lax.scan(body, a, None, length=iters)
        return (out,)

    t = _timed(f, a)
    ops = rows * cols * iters
    return ops / t / 1e12, t


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    tf, t = big_matmul()
    print(f"big matmul 4096^3 bf16      : {tf:8.2f} TMAC/s   ({t*1e3:.2f} ms)")
    for (m, k, n) in [(128, 128, 2048), (125, 128, 2048), (128, 2048, 128),
                      (1024, 128, 128), (1024, 128, 8), (128, 128, 256)]:
        tf, t = kernel_matmul(m, k, n)
        print(f"matmul [{m:4d},{k:4d}]x[{k:4d},{n:4d}] bf16: {tf:8.2f} TMAC/s"
              f"   ({t*1e3:.2f} ms)")
    tf, t = vpu_fma()
    print(f"VPU fma f32                 : {tf:8.2f} Top/s    ({t*1e3:.2f} ms)")
    tf, t = vpu_exp()
    print(f"VPU exp f32                 : {tf:8.2f} Tel/s    ({t*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
