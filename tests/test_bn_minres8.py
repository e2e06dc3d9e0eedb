"""Float8-residual BN variants (ops/bn_minres8.py).

Contract under test (module docstring there):
- forward outputs (y, mean, var) are IDENTICAL to the bf16-residual
  bn_minres ops — the quantization touches only the saved residuals;
- gradients equal the exact BN backward up to e4m3 rounding of the
  normalized activation (~2^-4 relative per element, averaging out in
  the channel sums) — checked as relative-L2 closeness, not elementwise
  (a relu-mask flip at z ≈ 0 is admissible there by design);
- the stats outputs stay non-differentiable;
- the ResNet wiring (norm_kind='minres8') reproduces 'minres' forward
  values/batch-stats exactly and its gradients to a few percent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from cl_ica_tpu.ops import bn_minres, bn_minres8

EPS = 1e-5


def _data(seed, n=3, h=8, w=8, c=5):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)) * 2, jnp.float32)
    res = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
    scale = jnp.asarray(1.0 + 0.4 * rng.normal(size=(c,)), jnp.float32)
    bias = jnp.asarray(0.3 * rng.normal(size=(c,)), jnp.float32)
    return x, res, scale, bias


def _rel_l2(u, v):
    return float(jnp.linalg.norm(u - v) / (jnp.linalg.norm(v) + 1e-30))


def _loss_through(fn):
    return lambda *args: jnp.sum(jnp.sin(fn(*args)))


def test_quantized_xhat_error_bound():
    # e4m3 (3 mantissa bits): relative rounding error <= 2^-4 for
    # normal values; absolute floor 2^-10 for subnormals near zero
    rng = np.random.default_rng(0)
    xh = jnp.asarray(rng.normal(size=(4096,)), jnp.float32)
    err = jnp.abs(xh.astype(jnp.float8_e4m3fn).astype(jnp.float32) - xh)
    bound = 2.0 ** -4 * jnp.abs(xh) + 2.0 ** -10
    assert bool(jnp.all(err <= bound))


@pytest.mark.parametrize("op", ["relu", "add_relu", "only"])
def test_forward_identical_to_minres(op):
    x, res, scale, bias = _data(1)
    if op == "add_relu":
        exact = bn_minres.bn_add_relu(x, res, scale, bias, EPS)
        quant = bn_minres8.bn_add_relu8(x, res, scale, bias, EPS)
    else:
        f_e = getattr(bn_minres, f"bn_{op}")
        f_q = getattr(bn_minres8, f"bn_{op}8")
        exact = f_e(x, scale, bias, EPS)
        quant = f_q(x, scale, bias, EPS)
    for e, q in zip(exact, quant):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(q))


# Two distinct error sources, pinned separately:
# - sum quantization (dscale = Σ g·x̂q): sub-1% — the 'only' op has no
#   mask, so its thresholds isolate this source;
# - relu-mask flips at |z| ≲ |scale|·qerr(x̂): full-magnitude pointwise
#   dx/dres discrepancies wherever the preactivation sits within the
#   quantization error of the kink (~few % of elements for unit-variance
#   data). This equals the EXACT gradient of a network whose relu gate
#   reads the quantized preactivation — a straight-through-style
#   approximation. (The variant measured byte-neutral on v5e and ships
#   as an opt-in record — EXPERIMENTS.md.)
_TOL = {"relu": 0.15, "add_relu": 0.25, "only": 0.03}


@pytest.mark.parametrize("op", ["relu", "add_relu", "only"])
def test_grads_match_exact_within_quantization(op):
    x, res, scale, bias = _data(2, n=8, h=16, w=16, c=5)
    if op == "add_relu":
        ours = _loss_through(lambda *a: bn_minres8.bn_add_relu8(*a, EPS)[0])
        ref = _loss_through(lambda *a: bn_minres.bn_add_relu(*a, EPS)[0])
        g1 = jax.grad(ours, (0, 1, 2, 3))(x, res, scale, bias)
        g2 = jax.grad(ref, (0, 1, 2, 3))(x, res, scale, bias)
    else:
        f_q = getattr(bn_minres8, f"bn_{op}8")
        f_e = getattr(bn_minres, f"bn_{op}")
        ours = _loss_through(lambda *a: f_q(*a, EPS)[0])
        ref = _loss_through(lambda *a: f_e(*a, EPS)[0])
        g1 = jax.grad(ours, (0, 1, 2))(x, scale, bias)
        g2 = jax.grad(ref, (0, 1, 2))(x, scale, bias)
    for u, v in zip(g1, g2):
        assert _rel_l2(u, v) < _TOL[op], (op, _rel_l2(u, v))


def test_stats_outputs_carry_no_gradient():
    x, _, scale, bias = _data(3)
    g = jax.grad(
        lambda x: jnp.sum(bn_minres8.bn_relu8(x, scale, bias, EPS)[1])
        + jnp.sum(bn_minres8.bn_relu8(x, scale, bias, EPS)[2])
    )(x)
    np.testing.assert_allclose(g, jnp.zeros_like(g))


def test_resnet_minres8_matches_minres():
    """norm_kind='minres8' shares the MinResBN module naming with
    'minres' (checkpoints interchange), reproduces its forward loss and
    running stats exactly, and its gradients to quantization noise."""
    from cl_ica_tpu.models.resnet import ResNet18

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3), jnp.float32)
    out = {}
    for kind in ("minres", "minres8"):
        m = ResNet18(num_classes=5, norm_kind=kind)
        v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))

        def obj(p):
            z, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(z)), mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(obj, has_aux=True)(v["params"])
        out[kind] = (loss, flatten_dict(grads), flatten_dict(bs))

    le, ge, be = out["minres"]
    lq, gq, bq = out["minres8"]
    np.testing.assert_allclose(le, lq, atol=1e-6)  # forward identical
    assert set(ge) == set(gq)  # same module naming -> same param tree
    for k in ge:
        # per-leaf direction agreement; quantization noise compounds
        # through 18 layers, a few percent is the expected scale
        assert _rel_l2(gq[k], ge[k]) < 0.25, (k, _rel_l2(gq[k], ge[k]))
    assert set(be) == set(bq)
    for k in be:
        np.testing.assert_allclose(bq[k], be[k], atol=1e-6)


def test_cli_rejects_fused_stem_with_minres8():
    from cl_ica_tpu.cli.main_3dident import parse_args

    # --offline-dataset satisfies the required arg so the SystemExit
    # comes from the guard under test, not argparse's missing-argument
    # error (match= pins it)
    with pytest.raises(SystemExit, match="float8 residuals"):
        parse_args([
            "--offline-dataset", "/tmp",
            "--fused-stem", "--norm-kind", "minres8",
        ])


def test_resnet_rejects_argmax_stem_with_minres8():
    from cl_ica_tpu.models.resnet import ResNet18

    m = ResNet18(num_classes=5, norm_kind="minres8", stem_pool="argmax")
    with pytest.raises(ValueError, match="argmax"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
