"""Correctness of the Pallas training megakernel (ops/pallas_train.py).

Runs in interpret mode on the CPU mesh: forward vs the pure-jnp ghost-BN
oracle (near-exact — same math), backward vs jax.grad of the oracle
(loose-ish tolerance: the kernel feeds bfloat16 gradients to its backward
matmuls by design, the oracle's autodiff keeps f32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from season_nerf_tpu.ops import pallas_train as pt


def _spec(fast_sine=True):
    return pt.TrunkSpec(widths=(32, 32, 32, 16), skip_idx=2, pe_dim=16,
                        tile=64, fast_sine=fast_sine)


def _make_params(spec, seed=0):
    rng = np.random.default_rng(seed)
    params = []
    for i in range(spec.n_layers):
        fan = spec.in_dims[i]
        w = rng.uniform(-1, 1, (fan, spec.widths[i])) / np.sqrt(fan) / 8.0
        b = rng.uniform(-0.5, 0.5, (1, spec.widths[i])) / np.sqrt(fan)
        params.append(jnp.asarray(w, jnp.bfloat16))
        params.append(jnp.asarray(b, jnp.float32))
        if spec.has_bn[i]:
            params.append(jnp.asarray(1.0 + 0.1 * rng.standard_normal(
                (1, spec.widths[i])), jnp.float32))
            params.append(jnp.asarray(0.1 * rng.standard_normal(
                (1, spec.widths[i])), jnp.float32))
    wh = rng.uniform(-1, 1, (spec.enc_width, pt.HEAD_PAD)) / 4.0
    wh[:, 4:] = 0.0
    bh = np.zeros((1, pt.HEAD_PAD))
    params.append(jnp.asarray(wh, jnp.bfloat16))
    params.append(jnp.asarray(bh, jnp.float32))
    return params


def _pe(spec, n=128, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (n, spec.pe_dim)), jnp.bfloat16)


@pytest.mark.parametrize("fast_sine", [True, False])
def test_fwd_matches_reference(fast_sine):
    spec = _spec(fast_sine)
    params = _make_params(spec)
    pe = _pe(spec)
    xk, hk, sk = pt.trunk_fwd(spec, (pe, *params), True)
    xr, hr, sr = pt.trunk_train_reference(spec, pe, params)
    np.testing.assert_allclose(np.asarray(xk, np.float32),
                               np.asarray(xr, np.float32), atol=2e-2)
    np.testing.assert_allclose(hk, hr, atol=2e-2)
    np.testing.assert_allclose(sk, sr, rtol=1e-4, atol=1e-4)


def test_ghost_stats_are_tile_local():
    """Two tiles with different distributions: the stats output must be the
    sum of two distinct per-tile (mean, var) rows, not full-batch stats."""
    spec = _spec()
    params = _make_params(spec)
    pe = np.asarray(_pe(spec), np.float32)
    pe[spec.tile:] *= 3.0                          # second tile differs
    pe = jnp.asarray(pe, jnp.bfloat16)
    _, _, stats = pt.trunk_fwd(spec, (pe, *params), True)
    ref_a = pt.trunk_train_reference(spec, pe[:spec.tile], params)[2]
    ref_b = pt.trunk_train_reference(spec, pe[spec.tile:], params)[2]
    np.testing.assert_allclose(stats, ref_a + ref_b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["f32", "production"])
def test_bwd_matches_autodiff_of_reference(mode):
    """f32 mode pins the backward *structure* tightly (2e-4 measured);
    production mode (bf16 activations + bf16 grad matmuls) is loose: the
    oracle's autodiff rounds its cotangents to bf16 at every activation
    cast while the kernel keeps f32 cotangents between layers, so the two
    legitimately differ by bf16-rounding noise (amplified on the
    near-cancelling bias sums)."""
    dt = "float32" if mode == "f32" else "bfloat16"
    spec = pt.TrunkSpec(widths=(32, 32, 32, 16), skip_idx=2, pe_dim=16,
                        tile=64, fast_sine=True, grad_dtype=dt, act_dtype=dt)
    params = _make_params(spec)
    pe = _pe(spec)
    cot_x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (pe.shape[0], spec.enc_width)), jnp.float32) * 0.1
    cot_h = jnp.asarray(np.random.default_rng(4).standard_normal(
        (pe.shape[0], pt.HEAD_PAD)), jnp.float32) * 0.1

    def loss_kernel(*ps):
        xenc, heads, _ = pt.trunk_train(spec, True, pe, *ps)
        return (jnp.sum(xenc.astype(jnp.float32) * cot_x)
                + jnp.sum(heads * cot_h))

    def loss_ref(*ps):
        xenc, heads, _ = pt.trunk_train_reference(spec, pe, ps)
        return (jnp.sum(xenc.astype(jnp.float32) * cot_x)
                + jnp.sum(heads * cot_h))

    gk = jax.grad(loss_kernel, argnums=tuple(range(len(params))))(*params)
    gr = jax.grad(loss_ref, argnums=tuple(range(len(params))))(*params)
    assert len(gk) == len(gr)
    for a, b, p in zip(gk, gr, params):
        # the oracle's autodiff rounds each grad to its param's dtype
        # (cotangent dtype = primal dtype); the kernel keeps f32 — round
        # the kernel grad the same way before comparing
        a32 = np.asarray(jnp.asarray(a).astype(p.dtype), np.float32)
        b32 = np.asarray(b, np.float32)
        if mode == "f32":
            atol = 2e-3 * max(np.abs(b32).max(), 1.0)
        else:
            atol = 4e-2 * max(np.abs(b32).max(), 3.0)
        np.testing.assert_allclose(a32, b32, atol=atol)


def test_head_grad_unpack_shapes():
    spec = _spec()
    d_wh = jnp.ones((spec.enc_width, pt.HEAD_PAD))
    d_bh = jnp.ones((1, pt.HEAD_PAD))
    dws, dbs, dwc, dbc = pt.unpack_head_grads(d_wh, d_bh)
    assert dws.shape == (spec.enc_width, 1) and dbs.shape == (1,)
    assert dwc.shape == (spec.enc_width, 3) and dbc.shape == (3,)


# --------------------------------------------------------------------------
# production integration: fused_forward / fused_forward_solar / loss wiring
# --------------------------------------------------------------------------

def _tiny_tnerf():
    """Smallest TNeRF spec_for_model accepts (reference depth, 128-multiple
    widths, bf16, extended 10-freq PE)."""
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF
    model = TNeRF(layer_width=256, n_layers=8, dtype=jnp.bfloat16,
                  fast_sine=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    return model, variables


def test_spec_for_model_guards():
    model, _ = _tiny_tnerf()
    spec, why = pt.spec_for_model(model, 64, tile=32)
    assert spec is not None and why is None
    assert spec.widths == (256,) * 8 + (128,)
    assert spec.skip_idx == 4 and spec.fast_sine
    # indivisible batch
    spec2, why2 = pt.spec_for_model(model, 63, tile=32)
    assert spec2 is None and "divisible" in why2
    # f32 model unsupported
    from season_nerf_tpu.models.tnerf import TNeRF
    spec3, why3 = pt.spec_for_model(
        TNeRF(layer_width=256, n_layers=8, dtype=None), 64, tile=32)
    assert spec3 is None and "bfloat16" in why3


def test_fused_forward_matches_ghost_oracle():
    """fused_forward == trunk_train_reference composed with the XLA
    branches (same ghost-BN semantics, interpret-mode kernel)."""
    model, variables = _tiny_tnerf()
    spec, _ = pt.spec_for_model(model, 64, tile=32)
    rng = np.random.default_rng(7)
    flat = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    sun = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    t4 = jnp.asarray(rng.uniform(-1, 1, (64, 4)), jnp.float32)
    probs, sun_pe, sky_raw = model.apply(variables, sun, t4, train=True,
                                         method="ray_consts")
    out, updates = pt.fused_forward(model, variables, spec, flat, probs,
                                    sun_pe, sky_raw, train=True,
                                    mutable=True, interpret=True)
    # oracle: ghost trunk in plain jnp + the same XLA branches
    packed = pt.pack_params(variables, spec)
    xenc_r, heads_r, _ = pt.trunk_train_reference(
        spec, pt.encode_pe(flat), packed)

    def branches(m, x_enc, spe, skr):
        vis_raw, sky_o = m.gnerf.solar(x_enc, None, True, sun_pe=spe,
                                       sky_raw=skr)
        return vis_raw, sky_o, m.adjust_from_enc(x_enc, True)

    vis_raw_r, sky_raw_r, adj_r = model.apply(variables, xenc_r, sun_pe,
                                              sky_raw, method=branches)
    adjust_r = jnp.sum(adj_r * probs[:, :, None], axis=1)
    np.testing.assert_allclose(
        np.asarray(out["rho"]),
        np.asarray(jax.nn.softplus(heads_r[:, 0:1])), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out["col"]),
        np.asarray(jax.nn.sigmoid(heads_r[:, 1:4] + adjust_r)), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out["vis"]),
                               np.asarray(jax.nn.sigmoid(vis_raw_r)),
                               atol=2e-2)
    assert updates is not None and "batch_stats" in updates
    # running stats moved off the init values
    old = variables["batch_stats"]["gnerf"]["fc2"]["norm"]["mean"]
    new = updates["batch_stats"]["gnerf"]["fc2"]["norm"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_fused_solar_blocks_trunk_grads():
    """The fused solar pass must match forward_solar's gradient contract:
    zero grads into the trunk, live grads into the solar branch."""
    model, variables = _tiny_tnerf()
    spec, _ = pt.spec_for_model(model, 64, tile=32)
    rng = np.random.default_rng(8)
    flat = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    sun = jnp.asarray(rng.uniform(-1, 1, (64, 3)), jnp.float32)
    probs, sun_pe, sky_raw = model.apply(variables, sun, None, train=True,
                                         method="ray_consts")

    def loss(params):
        v = {**variables, "params": params}
        out, _ = pt.fused_forward_solar(model, v, spec, flat, sun_pe,
                                        sky_raw, train=True, mutable=False,
                                        interpret=True)
        return jnp.sum(out["vis"] ** 2)

    g = jax.grad(loss)(variables["params"])
    trunk_g = np.abs(np.asarray(
        g["gnerf"]["fc3"]["linear"]["kernel"], np.float32)).max()
    solar_g = np.abs(np.asarray(
        g["gnerf"]["fc_solar_2"]["linear"]["kernel"], np.float32)).max()
    assert trunk_g == 0.0
    assert solar_g > 0.0


def test_loss_with_pallas_spec_end_to_end():
    """season_nerf_loss with a pallas_spec: finite loss, live trunk +
    solar-branch gradients, batch-stats updates — the full training
    contract of the fused path at one tile."""
    from season_nerf_tpu.train.losses import LossStatics, season_nerf_loss
    model, variables = _tiny_tnerf()
    R, S = 8, 8                                    # 64 points = 2 tiles of 32
    spec, why = pt.spec_for_model(model, R * S, tile=32)
    assert spec is not None, why
    statics = LossStatics(
        n_samples=S, n_importance=0, use_prior=False, use_solar=True,
        classic_solar=False, use_mse_loss=True, sc_lambda=0.03,
        phase_len=100, pallas_spec=spec)
    rng = np.random.default_rng(9)
    batch = {
        "top": jnp.asarray(rng.uniform(-1, 1, (R, 3)), jnp.float32),
        "bot": jnp.asarray(rng.uniform(-1, 1, (R, 3)), jnp.float32),
        "sun": jnp.asarray(rng.uniform(-1, 1, (R, 3)), jnp.float32),
        "t4": jnp.asarray(rng.uniform(-1, 1, (R, 4)), jnp.float32),
        "gt_rgb": jnp.asarray(rng.uniform(0, 1, (R, 3)), jnp.float32),
    }

    def loss_fn(params):
        v = {**variables, "params": params}
        total, (losses, updates) = season_nerf_loss(
            model, v, {}, statics, batch, jax.random.PRNGKey(1),
            jnp.asarray(5), train=True, mutable=True)
        return total, (losses, updates)

    (total, (losses, updates)), g = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(total))
    assert updates is not None and "batch_stats" in updates
    trunk_g = np.abs(np.asarray(
        g["gnerf"]["fc3"]["linear"]["kernel"], np.float32)).max()
    solar_g = np.abs(np.asarray(
        g["gnerf"]["fc_solar_2"]["linear"]["kernel"], np.float32)).max()
    head_g = np.abs(np.asarray(
        g["gnerf"]["fc10_col"]["kernel"], np.float32)).max()
    assert trunk_g > 0.0 and solar_g > 0.0 and head_g > 0.0
