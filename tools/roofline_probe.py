"""Microbenchmarks: achievable HBM bandwidth + MXU peak on this chip.

Anchors the roofline analysis of the ResNet18 train step (EXPERIMENTS.md):
  - stream: y = a*x + y over a large array (3 HBM accesses/element)
  - matmul: large bf16 square matmuls (MXU peak)

Run on the TPU backend: python -u tools/roofline_probe.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out.ravel()[:1]))
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)

    # --- stream (bf16 and fp32) ---
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "fp32")):
        n = 512 * 1024 * 1024  # elements
        x = jnp.ones((n,), dtype=dtype)
        y = jnp.ones((n,), dtype=dtype)

        @jax.jit
        def saxpy(x, y):
            return 1.5 * x + y

        dt = timeit(saxpy, x, y, iters=10)
        bytes_moved = 3 * n * x.dtype.itemsize  # read x, read y, write out
        print(f"stream {name}: {bytes_moved/dt/1e9:.0f} GB/s", flush=True)

    # --- matmul peak (bf16 inputs, fp32 accum default) ---
    for m in (4096, 8192):
        a = jnp.ones((m, m), dtype=jnp.bfloat16)
        b = jnp.ones((m, m), dtype=jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            return a @ b

        dt = timeit(mm, a, b, iters=20)
        fl = 2 * m**3
        print(f"matmul {m}x{m} bf16: {fl/dt/1e12:.0f} TF/s", flush=True)

    # --- conv peak: a representative ResNet body conv (stage2, 3x3) ---
    import flax.linen as nn

    conv = nn.Conv(128, (3, 3), use_bias=False, dtype=jnp.bfloat16)
    x = jnp.ones((1024, 28, 28, 128), dtype=jnp.bfloat16)
    v = conv.init(jax.random.PRNGKey(0), x[:1])

    @jax.jit
    def run(v, x):
        return conv.apply(v, x)

    dt = timeit(run, v, x, iters=20)
    fl = 2 * 1024 * 28 * 28 * 128 * 128 * 9
    print(f"conv3x3 28x28x128 b1024: {fl/dt/1e12:.0f} TF/s", flush=True)


if __name__ == "__main__":
    main()
