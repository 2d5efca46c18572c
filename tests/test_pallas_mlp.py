"""Fused-trunk kernel vs the flax module (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from season_nerf_tpu.models.tnerf import TNeRF
from season_nerf_tpu.ops import pallas_mlp


@pytest.fixture(scope="module")
def model_and_vars():
    model = TNeRF(layer_width=512, n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    return model, variables


def test_fused_trunk_matches_flax(model_and_vars):
    model, variables = model_and_vars
    ft = pallas_mlp.FusedTrunk(model, variables, interpret=True)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                             minval=-1, maxval=1)
    got = np.asarray(ft.x_enc(pts))
    want = np.asarray(model.apply(variables, pts, train=False,
                                  method=lambda m, x, train: m.gnerf.encode_x(x, train)))
    # accumulation-order noise amplifies through 9 sin layers: atol only
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_fused_sigma_matches(model_and_vars):
    model, variables = model_and_vars
    ft = pallas_mlp.FusedTrunk(model, variables, interpret=True)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (32, 3),
                             minval=-1, maxval=1)
    got = np.asarray(ft.sigma(pts))
    want = np.asarray(model.apply(variables, pts, train=False,
                                  method="sigma_only"))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_trunk_with_updated_batch_stats(model_and_vars):
    """Non-trivial BN running stats must fold correctly."""
    model, variables = model_and_vars
    pts = jax.random.uniform(jax.random.PRNGKey(3), (256, 3),
                             minval=-1, maxval=1)
    sun = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (256, 3))
    t4 = jnp.ones((256, 4))
    _, upd = model.apply(variables, pts, sun, t4, train=True,
                         mutable=["batch_stats"])
    v2 = {"params": variables["params"], "batch_stats": upd["batch_stats"]}
    ft = pallas_mlp.FusedTrunk(model, v2, interpret=True)
    got = np.asarray(ft.sigma(pts[:16]))
    want = np.asarray(model.apply(v2, pts[:16], train=False,
                                  method="sigma_only"))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_trunk_fast_sine_matches(model_and_vars):
    """fast_sine inside the kernel == the fast_sine flax model (and the
    FusedTrunk default follows the model's own flag)."""
    model, variables = model_and_vars
    fmodel = TNeRF(layer_width=512, n_classes=4, fast_sine=True)
    ft = pallas_mlp.FusedTrunk(fmodel, variables, interpret=True)
    assert ft.fast_sine
    pts = jax.random.uniform(jax.random.PRNGKey(5), (32, 3),
                             minval=-1, maxval=1)
    got = np.asarray(ft.sigma(pts))
    want = np.asarray(fmodel.apply(variables, pts, train=False,
                                   method="sigma_only"))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # and it is genuinely the polynomial, not exact sin: same weights
    # rendered exact differ at the approximation scale — nonzero (the flag
    # actually reached the kernel) but tiny (it is still a sin)
    exact = np.asarray(model.apply(variables, pts, train=False,
                                   method="sigma_only"))
    diff = float(np.max(np.abs(got - exact)))
    assert 0.0 < diff < 1e-2, diff


def test_padding_arbitrary_n(model_and_vars):
    model, variables = model_and_vars
    ft = pallas_mlp.FusedTrunk(model, variables, interpret=True)
    pts = jax.random.uniform(jax.random.PRNGKey(4), (7, 3))
    out = np.asarray(ft.x_enc(pts))
    assert out.shape == (7, 256)
    assert np.isfinite(out).all()
