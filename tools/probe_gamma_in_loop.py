"""Minimal repro probe for the box+gennorm3 TPU worker crash.

claim_matrix box_mp0_cp3_* cells crash the TPU worker at step 1, 4/4
attempts. Unique structural feature of that config: the conditional
sampler is sample_generalized_normal (jax.random.gamma — itself an
internal rejection while_loop) invoked INSIDE truncated_rejection_
resampling's lax.while_loop body. Every other cell either has no
truncation loop (sphere/unbounded) or no gamma (box laplace/normal).

Variants, each run as an isolated jitted program:
  A  gamma alone (no loop)                  — expect ok
  B  while_loop with normal inside          — expect ok (box+normal ran)
  C  while_loop with gamma inside           — crash hypothesis
  D  C inside a lax.scan (as the train step) — the actual failing shape
"""
import sys

import jax
import jax.numpy as jnp

SIZE, N = 6144, 10


def loop_with(sampler):
    def run(key):
        def cond(state):
            _, _, done, it = state
            return jnp.logical_and(~jnp.all(done), it < 128)

        def body(state):
            key, result, done, it = state
            key, sub = jax.random.split(key)
            buf = sampler(sub)
            ok = (buf >= -1.0) & (buf <= 1.0)
            take = ok & ~done
            result = jnp.where(take, buf, result)
            done = done | take
            return key, result, done, it + 1

        init = (key, jnp.zeros((SIZE, N)), jnp.zeros((SIZE, N), bool),
                jnp.array(0, jnp.int32))
        _, r, _, _ = jax.lax.while_loop(cond, body, init)
        return r

    return run


def gamma_sampler(sub):
    g = jax.random.gamma(sub, 1.0 / 3.0, shape=(SIZE, N))
    s = jax.random.rademacher(jax.random.fold_in(sub, 1), (SIZE, N),
                              dtype=jnp.float32)
    return 0.05 * s * jnp.power(jnp.abs(g), 1.0 / 3.0)


def normal_sampler(sub):
    return 0.05 * jax.random.normal(sub, (SIZE, N))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ABCD"
    key = jax.random.PRNGKey(0)
    if "A" in which:
        x = jax.jit(lambda k: gamma_sampler(k))(key)
        print("A gamma-alone ok", float(jnp.mean(x)))
    if "B" in which:
        x = jax.jit(loop_with(normal_sampler))(key)
        print("B loop+normal ok", float(jnp.mean(x)))
    if "C" in which:
        x = jax.jit(loop_with(gamma_sampler))(key)
        print("C loop+gamma ok", float(jnp.mean(x)))
    if "D" in which:
        def step(carry, _):
            k = carry
            k, sub = jax.random.split(k)
            return k, jnp.mean(loop_with(gamma_sampler)(sub))

        _, ms = jax.jit(lambda k: jax.lax.scan(step, k, None, length=3))(key)
        print("D scan(loop+gamma) ok", [float(m) for m in ms])


if __name__ == "__main__":
    main()
