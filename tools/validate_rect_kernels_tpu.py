"""Validate the COMPILED rectangular fused-InfoNCE kernels on real TPU.

The per-shard shard_map composition (parallel.collective.shardmap_cl_
loss, VERDICT r4 weak #1) streams M = B/n_shards rows against N = B
all-gathered negatives — a rectangular (M, N) grid the CPU tests only
exercise in interpret mode. This probe runs the exact compiled shape
class single-chip: fused_neg_lse (p in {1,2,3}) and fused_dot_lse at
M != N, value+grad against a precision-pinned materialized reference.

Run with the default env (TPU routing active):
    python -u tools/validate_rect_kernels_tpu.py

Note the reference MUST pin precision=HIGHEST: the kernels pin their
in-kernel dots to HIGHEST (ops/infonce_pallas.py), and a bf16
default-precision jnp.dot reference differs by ~1e-4 val / ~8e-3 grad
on the MXU (measured r5) — that gap is the reference's, not the
kernel's.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cl_ica_tpu.ops.infonce_pallas import fused_dot_lse, fused_neg_lse

M, N, N_FEAT = 384, 3072, 10
TAU = 0.7


def ref_lp(z1, z3, p, tau):
    d = jnp.sum(jnp.abs(z1[:, None, :] - z3[None, :, :]) ** p, axis=-1)
    return jax.scipy.special.logsumexp(-d / tau, axis=1)


def ref_dot(z1, z3, tau):
    x = jnp.dot(z1, z3.T, precision=jax.lax.Precision.HIGHEST) / tau
    return jax.scipy.special.logsumexp(x, axis=1)


def check(name, fused_fn, ref_fn, z1, z3):
    w = jnp.arange(1.0, z1.shape[0] + 1.0)
    f = lambda a, b: jnp.sum(fused_fn(a, b) * w)
    g = lambda a, b: jnp.sum(ref_fn(a, b) * w)
    v, gv = jax.value_and_grad(f, argnums=(0, 1))(z1, z3)
    vr, gr = jax.value_and_grad(g, argnums=(0, 1))(z1, z3)
    dv = abs(float(v) - float(vr)) / abs(float(vr))
    dg = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        for a, b in zip(gv, gr)
    )
    status = "OK" if (dv < 1e-5 and dg < 1e-4) else "FAIL"
    print(f"{name}: val rel {dv:.2e}  grad rel {dg:.2e}  {status}")
    return status == "OK"


def main():
    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.normal(size=(M, N_FEAT)), jnp.float32)
    z3 = jnp.asarray(rng.normal(size=(N, N_FEAT)), jnp.float32)
    ok = True
    for p in (1.0, 2.0, 3.0):
        ok &= check(
            f"lp p={p} ({M}x{N})",
            lambda a, b, p=p: fused_neg_lse(a, b, p, TAU),
            lambda a, b, p=p: ref_lp(a, b, p, TAU),
            z1, z3,
        )
    ok &= check(
        f"dot ({M}x{N})",
        lambda a, b: fused_dot_lse(a, b, TAU),
        lambda a, b: ref_dot(a, b, TAU),
        z1, z3,
    )
    platform = jax.devices()[0].platform
    print(f"rectangular compiled kernels on {platform}: "
          + ("ALL OK" if ok else "FAILURES"))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
