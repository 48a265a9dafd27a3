"""Pallas im2col conv vs flax nn.Conv oracle (CPU interpret mode).

Pins forward AND custom-VJP equality of ops/pallas_conv.py :: conv3x3
against flax.linen.Conv, then whole-net parity for CFENet/UNet with
conv_impl='pallas' (models/nets.py :: Conv routing + fallbacks).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from pde_control_tpu.models.nets import CFENet, UNet
from pde_control_tpu.ops.pallas_conv import conv3x3, conv3x3_fits

H = 16
B = 2


@pytest.mark.parametrize("cin,cout,bias", [(5, 32, True), (64, 64, True),
                                           (32, 1, False)])
def test_conv3x3_matches_flax(rng, cin, cout, bias):
    x = jnp.asarray(rng.standard_normal((B, H, H, cin)).astype(np.float32))
    ref = nn.Conv(cout, (3, 3), padding="SAME", use_bias=bias,
                  dtype=jnp.float32)
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    kernel = params["kernel"]
    bvec = params.get("bias")

    a = jax.jit(lambda x: ref.apply({"params": params}, x))(x)
    b = jax.jit(lambda x: conv3x3(x, kernel, bvec, dtype=jnp.float32,
                                  interpret=True))(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)

    cot = jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))

    def loss(fn):
        def f(args):
            xx, kk, bb = args
            return jnp.vdot(cot, fn(xx, kk, bb))
        return f

    fa = loss(lambda xx, kk, bb: nn.Conv(
        cout, (3, 3), padding="SAME", use_bias=bias,
        dtype=jnp.float32).apply(
            {"params": {"kernel": kk, **({"bias": bb} if bias else {})}},
            xx))
    fb = loss(lambda xx, kk, bb: conv3x3(xx, kk, bb if bias else None,
                                         dtype=jnp.float32, interpret=True))
    args = (x, kernel, bvec if bias else jnp.zeros((cout,), jnp.float32))
    ga = jax.jit(jax.grad(fa))(args)
    gb = jax.jit(jax.grad(fb))(args)
    for i, (u, v) in enumerate(zip(ga, gb)):
        if i == 2 and not bias:
            continue  # flax has no bias param; ours gets zero cotangent
        scale = float(jnp.max(jnp.abs(u))) + 1e-9
        np.testing.assert_allclose(np.asarray(u) / scale,
                                   np.asarray(v) / scale, atol=2e-5)


def test_conv3x3_bf16_close(rng):
    x = jnp.asarray(rng.standard_normal((B, H, H, 32)).astype(np.float32))
    ref = nn.Conv(32, (3, 3), padding="SAME", dtype=jnp.bfloat16)
    params = ref.init(jax.random.PRNGKey(0), x)["params"]
    a = ref.apply({"params": params}, x)
    b = conv3x3(x, params["kernel"], params["bias"], dtype=jnp.bfloat16,
                interpret=True)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32),
                               atol=0.05, rtol=0.05)


@pytest.mark.parametrize("impl", ["pallas", "patches", "shifted", "im2col"])
@pytest.mark.parametrize("net,cin", [
    (CFENet(out_channels=1, dim=2, dtype=jnp.float32), 5),
    (UNet(out_channels=1, levels=2, dim=2, dtype=jnp.float32), 2),
])
def test_net_parity_alt_impl_vs_xla(rng, net, cin, impl):
    """Same params, same input: conv_impl='pallas'/'patches' output and
    param grads match 'xla' (ineligible layers fall back in the same
    net). Both alternatives lost the perf A/B (nets.Conv docstring) but
    stay correctness-pinned for other regimes."""
    import dataclasses

    x = jnp.asarray(rng.standard_normal((B, H, H, cin)).astype(np.float32))
    net_x = dataclasses.replace(net, conv_impl="xla")
    net_p = dataclasses.replace(net, conv_impl=impl)
    params = net_x.init(jax.random.PRNGKey(0), x)
    # identical param trees (checkpoint compatibility)
    pa = jax.tree_util.tree_structure(params)
    pb = jax.tree_util.tree_structure(net_p.init(jax.random.PRNGKey(0), x))
    assert pa == pb

    a = net_x.apply(params, x)
    b = net_p.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)

    cot = jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    ga = jax.grad(lambda p: jnp.vdot(cot, net_x.apply(p, x)))(params)
    gb = jax.grad(lambda p: jnp.vdot(cot, net_p.apply(p, x)))(params)
    for u, v in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        scale = float(jnp.max(jnp.abs(u))) + 1e-9
        np.testing.assert_allclose(np.asarray(u) / scale,
                                   np.asarray(v) / scale, atol=5e-4)


def test_fits_gate():
    assert conv3x3_fits(64, 64, 64, 64)
    assert not conv3x3_fits(128, 128, 64, 64)
