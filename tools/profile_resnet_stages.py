"""Per-stage fwd+bwd timing of the ResNet18 train step + clean per-op
probes (dispatch amortized via lax.fori_loop chains).

Answers: which stage eats the 121 ms, and what TF/s does each stage's
conv mix achieve in isolation? Used for the EXPERIMENTS.md roofline
section. Run on the TPU backend.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo")

from cl_ica_tpu.models.resnet import BasicBlock

B = 1024  # images (= 2 views x 512 pairs)


def bench_loop(fn, x, iters=5, inner=4):
    """Time fn chained inner times inside one jit (data-dependent), so
    dispatch cost is 1/inner per application."""

    @jax.jit
    def run(x):
        def body(i, x):
            return fn(x)
        return jax.lax.fori_loop(0, inner, body, x)

    out = run(x)
    float(jnp.sum(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)
    float(jnp.sum(out.ravel()[:1]))
    return (time.perf_counter() - t0) / (iters * inner)


class Stage(nn.Module):
    filters: int
    n_blocks: int
    first_stride: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        for j in range(self.n_blocks):
            s = (self.first_stride,) * 2 if j == 0 else (1, 1)
            x = BasicBlock(filters=self.filters, strides=s, conv=conv,
                           norm=norm)(x)
        return x


def stage_fwdbwd(tag, mod, shape):
    x = jnp.ones(shape, dtype=jnp.bfloat16)
    v = mod.init(jax.random.PRNGKey(0), x[:1])
    params, bs = v["params"], v.get("batch_stats", {})

    def loss(p, x):
        y, _ = mod.apply({"params": p, "batch_stats": bs}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    (val, g) = grad_fn(params, x)
    float(val)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        val, g = grad_fn(params, x)
    float(val)
    dt = (time.perf_counter() - t0) / iters
    cost = grad_fn.lower(params, x).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    fl, by = cost.get("flops", 0), cost.get("bytes accessed", 0)
    print(f"{tag:28s} {dt*1e3:7.2f} ms  {fl/dt/1e12:5.0f} TF/s  "
          f"{by/1e9:5.1f} GB  {by/dt/1e9:4.0f} GB/s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    # clean per-op probes, dispatch amortized
    n = 256 * 1024 * 1024
    x = jnp.ones((n,), dtype=jnp.bfloat16)
    dt = bench_loop(lambda x: 1.0009 * x + 0.001, x)
    print(f"stream bf16 (amortized): {2*n*2/dt/1e9:.0f} GB/s", flush=True)
    xf = jnp.ones((n // 2,), dtype=jnp.float32)
    dt = bench_loop(lambda x: 1.0009 * x + 0.001, xf)
    print(f"stream fp32 (amortized): {2*(n//2)*4/dt/1e9:.0f} GB/s", flush=True)

    a = jnp.ones((8192, 8192), dtype=jnp.bfloat16)
    dt = bench_loop(lambda a: (a @ a) * 1e-4, a, inner=4)
    print(f"matmul 8192 bf16 (amortized): {2*8192**3/dt/1e12:.0f} TF/s",
          flush=True)

    # conv fwd probes per stage geometry
    for (hw, cin, cout, name) in (
        (56, 64, 64, "stage1-geom"),
        (28, 128, 128, "stage2-geom"),
        (14, 256, 256, "stage3-geom"),
        (7, 512, 512, "stage4-geom"),
    ):
        conv = nn.Conv(cout, (3, 3), use_bias=False, dtype=jnp.bfloat16)
        xx = jnp.ones((B, hw, hw, cin), dtype=jnp.bfloat16)
        v = conv.init(jax.random.PRNGKey(0), xx[:1])
        f = lambda x, v=v, conv=conv: conv.apply(v, x) * 0.5
        dt = bench_loop(f, xx, inner=4)
        fl = 2 * B * hw * hw * cin * cout * 9
        print(f"conv3x3 fwd {name:12s}: {fl/dt/1e12:5.0f} TF/s "
              f"({dt*1e3:.2f} ms)", flush=True)

    # full fwd+bwd per stage (incl BN), batch-1024 geometry
    stage_fwdbwd("stem(conv7+bn+pool)", StemWrap(), (B, 224, 224, 3))
    stage_fwdbwd("stage1 56x56x64 x2", Stage(64, 2, 1), (B, 56, 56, 64))
    stage_fwdbwd("stage2 28x28x128 x2", Stage(128, 2, 2), (B, 56, 56, 64))
    stage_fwdbwd("stage3 14x14x256 x2", Stage(256, 2, 2), (B, 28, 28, 128))
    stage_fwdbwd("stage4 7x7x512 x2", Stage(512, 2, 2), (B, 14, 14, 256))


class StemWrap(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=jnp.bfloat16)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


if __name__ == "__main__":
    main()
