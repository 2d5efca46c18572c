"""Model + rendering-op tests: golden values vs numpy oracles (the same
strategy the reference uses with its `_cheat` metric oracles, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from season_nerf_tpu.models import encodings, siren, tnerf
from season_nerf_tpu.ops import sampling, rendering, robust_loss, metrics


# --- encodings -------------------------------------------------------------

def test_positional_encode_golden():
    x = jnp.array([[0.5, -0.25]])
    out = encodings.positional_encode(x, 2, extended=True)
    k0, k1 = np.pi / 2, np.pi
    expect = [0.5, -0.25,
              np.cos(k0 * 0.5), np.cos(k1 * 0.5), np.sin(k0 * 0.5), np.sin(k1 * 0.5),
              np.cos(k0 * -0.25), np.cos(k1 * -0.25), np.sin(k0 * -0.25), np.sin(k1 * -0.25)]
    assert out.shape == (1, 10)
    np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-6)


def test_encoded_sizes():
    assert encodings.encoded_size(3, 10, True) == 63   # pose PE
    assert encodings.encoded_size(3, 4, True) == 27    # solar PE
    assert encodings.encoded_size(2, 2, True) == 10    # time PE


# --- SIREN -----------------------------------------------------------------

def test_sine_layer_init_bounds():
    layer = siren.SineLayer(64, is_first=True)
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros((4, 16)))
    w = params["params"]["linear"]["kernel"]
    assert np.max(np.abs(w)) <= 1 / 16 + 1e-8
    layer2 = siren.SineLayer(64, is_first=False)
    params2 = layer2.init(jax.random.PRNGKey(0), jnp.zeros((4, 16)))
    w2 = params2["params"]["linear"]["kernel"]
    assert np.max(np.abs(w2)) <= np.sqrt(6 / 16) / 30 + 1e-8


def test_sine_layer_norm_updates_stats():
    layer = siren.SineLayer(8, use_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    variables = layer.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    y, updates = layer.apply(variables, x, True, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(updates["batch_stats"]["norm"]["mean"]), 0.0)
    # eval mode uses running stats, no mutation needed
    y_eval = layer.apply(variables, x, False)
    assert y_eval.shape == (32, 8)


# --- TNeRF -----------------------------------------------------------------

@pytest.fixture(scope="module")
def small_tnerf():
    model = tnerf.TNeRF(layer_width=64, n_classes=4)
    x = jnp.zeros((8, 3))
    sun = jnp.zeros((8, 3))
    t4 = jnp.zeros((8, 4))
    variables = model.init(jax.random.PRNGKey(0), x, sun, t4)
    return model, variables


def test_tnerf_forward_shapes_and_ranges(small_tnerf):
    model, variables = small_tnerf
    n = 16
    rng = jax.random.PRNGKey(2)
    x = jax.random.uniform(rng, (n, 3), minval=-1, maxval=1)
    sun = jnp.tile(jnp.array([[0.1, 0.1, 0.99]]), (n, 1))
    t4 = jnp.tile(jnp.array([[1.0, 0, 1, 0]]), (n, 1))
    out = model.apply(variables, x, sun, t4)
    assert out["rho"].shape == (n, 1) and np.all(np.asarray(out["rho"]) >= 0)
    assert out["col"].shape == (n, 3)
    assert np.all((np.asarray(out["col"]) > 0) & (np.asarray(out["col"]) < 1))
    assert out["vis"].shape == (n, 1)
    assert out["sky"].shape == (n, 3)
    np.testing.assert_allclose(np.sum(np.asarray(out["class_probs"]), -1), 1.0, atol=1e-5)


def test_tnerf_class_head_depends_only_on_year_pair(small_tnerf):
    model, variables = small_tnerf
    t4a = jnp.array([[0.3, 0.9, 0.1, 0.2]])
    t4b = jnp.array([[0.3, 0.9, -0.7, 0.5]])  # day-fraction pair differs
    pa = model.apply(variables, t4a, method="class_only")
    pb = model.apply(variables, t4b, method="class_only")
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-7)


def test_tnerf_forward_solar_blocks_trunk_grads(small_tnerf):
    model, variables = small_tnerf
    x = jax.random.uniform(jax.random.PRNGKey(3), (8, 3), minval=-1, maxval=1)
    sun = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, x, sun,
                          method="forward_solar")
        return jnp.sum(out["vis"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    trunk_grad = grads["gnerf"]["fc1"]["linear"]["kernel"]
    solar_grad = grads["gnerf"]["fc_solar_4"]["kernel"]
    assert np.allclose(np.asarray(trunk_grad), 0.0)
    assert not np.allclose(np.asarray(solar_grad), 0.0)


def test_supervised_sigma_plane():
    hm = jnp.zeros((16, 16))  # flat surface at z = 0
    pts = jnp.array([[0.0, 0.0, -0.5],   # below surface -> occupied
                     [0.0, 0.0, 0.5]])   # above -> empty
    delta = jnp.full((2, 1), 0.1)
    sig = tnerf.supervised_sigma(hm, pts, delta)
    assert sig[0, 0] > 10.0   # -log(1-0.99)/0.1 ~ 46
    assert sig[1, 0] == 0.0


def test_supervised_sigma_nan_is_empty():
    hm = jnp.full((8, 8), jnp.nan)
    pts = jnp.array([[0.0, 0.0, -0.5]])
    sig = tnerf.supervised_sigma(hm, pts, jnp.full((1, 1), 0.1))
    assert sig[0, 0] == 0.0


def test_supervised_sigma_matches_gather_oracle():
    """The one-hot-contraction lookup (the TPU-fast path, docs/DESIGN.md
    item 7) must stay bit-exact vs the textbook hm[ix, iy] gather it
    replaced, including NaN (no-data) cells and non-square maps."""
    rng = np.random.default_rng(3)
    for h, w in [(64, 64), (37, 53)]:
        hm = rng.uniform(-1, 1, (h, w)).astype(np.float32)
        hm[rng.random((h, w)) < 0.15] = np.nan
        pts = rng.uniform(-1.2, 1.2, (2000, 3)).astype(np.float32)
        delta = rng.uniform(0.01, 0.1, (2000, 1)).astype(np.float32)

        shape = np.array(hm.shape) - 1
        xy = np.clip(((pts[:, :2] + 1) / 2 * shape).astype(np.int32), 0, shape)
        hv = hm[xy[:, 0], xy[:, 1]]
        p = np.where(np.isnan(hv), 0.0, (hv >= pts[:, 2]).astype(np.float32))
        p = np.minimum(p, 0.99)
        want = np.asarray(-jnp.log(1.0 - jnp.asarray(p))[:, None]) / delta

        got = np.asarray(tnerf.supervised_sigma(
            jnp.asarray(hm), jnp.asarray(pts), jnp.asarray(delta)))
        assert np.array_equal(want, got)


def test_eval_rays_remat_policies_match_no_remat(small_tnerf):
    """remat='full'/'dots' (the large-batch compiler workaround,
    docs/DESIGN.md 'Compiler limits') must change memory, not math:
    same loss and same gradients as the un-rematerialized step."""
    model, variables = small_tnerf
    R, S = 8, 8
    k = jax.random.PRNGKey(11)
    xy = jax.random.uniform(k, (R, 2), minval=-1, maxval=1)
    tops = jnp.concatenate([xy, jnp.ones((R, 1))], 1)
    bots = jnp.concatenate([xy, -jnp.ones((R, 1))], 1)
    sun = jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]]), (R, 1))
    t4 = jnp.tile(jnp.asarray([[1.0, 0.0, 1.0, 0.0]]), (R, 1))
    hm = jnp.zeros((8, 8))

    def loss(params, remat):
        v = {**variables, "params": params}
        out, _ = rendering.eval_rays(
            model, v, k, tops, bots, sun, t4, n_samples=S, train=True,
            mutable=True, remat=remat, prior_hm=hm, model_trust=0.5)
        sol, _ = rendering.eval_rho_only(
            model, v, k, tops, bots, sun, None, n_samples=S, train=True,
            mutable=True, remat=remat, prior_hm=hm, model_trust=0.5)
        return jnp.sum(out["rendered"] ** 2) + jnp.sum(sol["vis"] ** 2)

    base_l, base_g = jax.value_and_grad(loss)(variables["params"], False)
    for remat in ("full", "dots"):
        l, g = jax.value_and_grad(loss)(variables["params"], remat)
        assert np.allclose(float(l), float(base_l), rtol=1e-6)
        ok = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.allclose(a, b, rtol=1e-5, atol=1e-7)),
            g, base_g)
        assert all(jax.tree_util.tree_leaves(ok)), remat


def test_eval_rays_per_ray_class_branch_bit_exact(small_tnerf):
    """eval_rays evaluates the seasonal-class branch once per ray and
    broadcasts (docs/DESIGN.md item 8); that must be bit-identical to the
    model's per-point forward — outputs AND trunk batch-stats updates —
    in both train and eval mode."""
    model, variables = small_tnerf
    R, S = 16, 8
    k = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(k, 3)
    xy = jax.random.uniform(k1, (R, 2), minval=-1, maxval=1)
    tops = jnp.concatenate([xy, jnp.ones((R, 1))], 1)
    bots = jnp.concatenate([xy + 0.05, -jnp.ones((R, 1))], 1)
    sun = jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]]), (R, 1))
    sun = sun / jnp.linalg.norm(sun, axis=1, keepdims=True)
    t4 = jax.random.uniform(k2, (R, 4), minval=-1, maxval=1)

    for train in (False, True):
        out, upd = rendering.eval_rays(
            model, variables, k3, tops, bots, sun, t4,
            n_samples=S, train=train, mutable=train)

        # per-point oracle on the same sample points
        k_coarse, _ = jax.random.split(k3)
        pts, _ = sampling.sample_coarse(k_coarse, tops, bots, S, train=train)
        flat = pts.reshape(-1, 3)
        sun_f = jnp.broadcast_to(sun[:, None, :], (R, S, 3)).reshape(-1, 3)
        t4_f = jnp.broadcast_to(t4[:, None, :], (R, S, 4)).reshape(-1, 4)
        if train:
            ref, upd_ref = model.apply(variables, flat, sun_f, t4_f,
                                       train=True, mutable=["batch_stats"])
        else:
            ref, upd_ref = model.apply(variables, flat, sun_f, t4_f,
                                       train=False), None

        for key in ("rho", "col", "vis", "class_probs", "adjust"):
            a = np.asarray(out[key]).reshape(ref[key].shape)
            assert np.array_equal(a, np.asarray(ref[key])), (key, train)
        if train:
            same = jax.tree_util.tree_map(
                lambda a, b: bool(jnp.all(a == b)),
                upd["batch_stats"], upd_ref["batch_stats"])
            assert all(jax.tree_util.tree_leaves(same))


# --- sampling --------------------------------------------------------------

def test_sample_coarse_eval_deterministic():
    tops = jnp.array([[0.0, 0, 1], [0.5, 0.5, 1]])
    bots = jnp.array([[0.0, 0, -1], [0.5, 0.5, -1]])
    pts, deltas = sampling.sample_coarse(jax.random.PRNGKey(0), tops, bots, 4,
                                         train=False)
    assert pts.shape == (2, 4, 3)
    np.testing.assert_allclose(np.asarray(pts[0, :, 2]), [1.0, 0.5, 0.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(deltas), 0.5, atol=1e-6)


def test_sample_coarse_include_end():
    tops = jnp.array([[0.0, 0, 1.0]])
    bots = jnp.array([[0.0, 0, -1.0]])
    pts, _ = sampling.sample_coarse(jax.random.PRNGKey(0), tops, bots, 5,
                                    train=False, include_end=True)
    np.testing.assert_allclose(np.asarray(pts[0, :, 2]), [1, 0.5, 0, -0.5, -1], atol=1e-6)


def test_sample_coarse_train_jitter_in_bins():
    tops = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (64, 1))
    bots = jnp.tile(jnp.array([[0.0, 0, -1.0]]), (64, 1))
    pts, _ = sampling.sample_coarse(jax.random.PRNGKey(7), tops, bots, 8, train=True)
    z = np.asarray(pts[..., 2])
    # z strictly decreasing along rays, within [-1, 1]
    assert np.all(np.diff(z, axis=1) < 0)
    assert z.min() >= -1 - 1e-6 and z.max() <= 1 + 1e-6
    # jitter differs across rays (per-ray stratification)
    assert np.std(z[:, 0]) > 0


def test_sample_fine_sorted_and_shaped():
    tops = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (4, 1))
    bots = jnp.tile(jnp.array([[0.0, 0, -1.0]]), (4, 1))
    base, _ = sampling.sample_coarse(jax.random.PRNGKey(0), tops, bots, 8, train=False)
    w = jnp.ones((4, 8))
    pts, deltas = sampling.sample_fine(jax.random.PRNGKey(1), tops, bots, base, w, 8)
    assert pts.shape == (4, 16, 3) and deltas.shape == (4, 16, 1)
    z = np.asarray(pts[..., 2])
    assert np.all(np.diff(z, axis=1) <= 1e-6)


# --- volume rendering ------------------------------------------------------

def test_transmittance_golden_numpy_oracle():
    rng = np.random.default_rng(0)
    rho = rng.random((3, 5, 1)).astype(np.float32) * 2
    deltas = np.full((3, 5, 1), 0.25, dtype=np.float32)
    pv = np.asarray(rendering.transmittance(jnp.asarray(rho), jnp.asarray(deltas)))
    # oracle: PV_i = exp(-sum_{j<i} rho_j * delta_j)
    expect = np.ones_like(rho)
    for r in range(3):
        acc = 0.0
        for s in range(5):
            expect[r, s, 0] = np.exp(-acc)
            acc += rho[r, s, 0] * deltas[r, s, 0]
    np.testing.assert_allclose(pv, expect, rtol=1e-5)


def test_ps_sums_below_one():
    rho = jnp.ones((2, 96, 1)) * 3.0
    deltas = jnp.full((2, 96, 1), 2.0 / 96)
    _, _, ps = rendering.pv_pe_ps(rho, deltas)
    total = np.sum(np.asarray(ps), axis=1)
    assert np.all(total <= 1.0 + 1e-5)
    assert np.all(total > 0.9)  # optically thick -> most mass hits


def test_composites_agree_for_full_visibility():
    R, S = 4, 16
    key = jax.random.PRNGKey(0)
    ps = jax.nn.softmax(jax.random.normal(key, (R, S, 1)), axis=1)
    col = jax.random.uniform(key, (R, S, 3))
    vis = jnp.ones((R, S, 1))
    sky = jnp.full((R, S, 3), 0.3)
    classic = rendering.composite_classic(ps, col, vis, sky)
    np.testing.assert_allclose(np.asarray(classic),
                               np.asarray(jnp.sum(ps * col, 1)), atol=1e-6)
    gated = rendering.composite_gated(ps, col, vis, sky)
    # gate saturates to 1 when all vis=1 and sum(ps)=1 -> equals albedo
    np.testing.assert_allclose(np.asarray(gated),
                               np.asarray(jnp.sum(ps * col, 1)), atol=1e-3)


def test_eval_rays_end_to_end_shapes():
    model = tnerf.TNeRF(layer_width=32, n_classes=4)
    R, S = 6, 12
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)))
    tops = jnp.concatenate([jax.random.uniform(jax.random.PRNGKey(1), (R, 2), minval=-1, maxval=1),
                            jnp.ones((R, 1))], -1)
    bots = tops.at[:, 2].set(-1.0)
    sun = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (R, 1))
    t4 = jnp.tile(jnp.array([[1.0, 0, 1, 0]]), (R, 1))
    res, _ = rendering.eval_rays(model, variables, jax.random.PRNGKey(2),
                                 tops, bots, sun, t4, n_samples=S, train=False)
    assert res["rendered"].shape == (R, 3)
    assert res["ps"].shape == (R, S, 1)
    # with a prior height map
    hm = jnp.zeros((8, 8))
    res2, _ = rendering.eval_rays(model, variables, jax.random.PRNGKey(2),
                                  tops, bots, sun, t4, n_samples=S, train=False,
                                  prior_hm=hm, model_trust=0.0)
    assert "rendered_merged" in res2 and res2["rendered_merged"].shape == (R, 3)
    # trust=0 -> merged rho is purely supervised
    np.testing.assert_allclose(np.asarray(res2["rho_merged"]),
                               np.asarray(res2["rho_sup"]), atol=1e-6)


# --- robust loss -----------------------------------------------------------

def test_general_loss_special_cases():
    x = jnp.linspace(-3, 3, 31)
    l2 = robust_loss.general_loss(x, 2.0, 1.0)
    # atol covers the float32 underflow at the near-zero linspace midpoint
    np.testing.assert_allclose(np.asarray(l2), 0.5 * np.asarray(x) ** 2,
                               rtol=1e-4, atol=1e-12)
    cauchy = robust_loss.general_loss(x, 1e-6, 1.0)
    np.testing.assert_allclose(np.asarray(cauchy),
                               np.log1p(0.5 * np.asarray(x) ** 2), rtol=1e-3)


def test_log_partition_gaussian_and_huber():
    # alpha=2: Z = sqrt(2*pi)
    lz2 = float(robust_loss.log_partition(jnp.array(2.0)))
    assert abs(lz2 - 0.5 * np.log(2 * np.pi)) < 2e-3
    # alpha=1: Z = 2*e*K_1(1) (modified Bessel)
    from scipy.special import kv
    lz1 = float(robust_loss.log_partition(jnp.array(1.0)))
    expect = np.log(2 * np.e * kv(1, 1.0))
    assert abs(lz1 - expect) < 2e-3


def test_adaptive_latents_and_carryover():
    cfg = robust_loss.AdaptiveCfg(n_channels=3, alpha_init=2.0, scale_init=0.03)
    params = robust_loss.init_adaptive(cfg)
    np.testing.assert_allclose(np.asarray(robust_loss.alpha_of(params, cfg)), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(robust_loss.scale_of(params, cfg)), 0.03, atol=1e-6)
    # nll decreases in scale-adaptivity direction: gradient flows
    x = jnp.full((16, 3), 0.5)
    g = jax.grad(lambda p: jnp.mean(robust_loss.adaptive_nll(p, cfg, x)))(params)
    assert np.any(np.asarray(g["latent_alpha"]) != 0)
    assert np.any(np.asarray(g["latent_scale"]) != 0)
    # carry-over preserves values
    params["latent_alpha"] = params["latent_alpha"] - 1.3
    params["latent_scale"] = params["latent_scale"] + 0.7
    new_params, new_cfg = robust_loss.carry_over(params, cfg, cfg)
    np.testing.assert_allclose(
        float(jnp.mean(robust_loss.alpha_of(new_params, new_cfg))),
        float(jnp.mean(robust_loss.alpha_of(params, cfg))), atol=1e-4)
    np.testing.assert_allclose(
        float(jnp.mean(robust_loss.scale_of(new_params, new_cfg))),
        float(jnp.mean(robust_loss.scale_of(params, cfg))), atol=1e-5)


def test_adaptive_nll_matches_gaussian_at_alpha2():
    cfg = robust_loss.AdaptiveCfg(n_channels=1, alpha_init=2.0, scale_init=1.0,
                                  alpha_lo=1.999, alpha_hi=2.001, scale_lo=0.5)
    params = robust_loss.init_adaptive(cfg)
    x = jnp.array([[0.7]])
    val = float(robust_loss.adaptive_nll(params, cfg, x)[0, 0])
    expect = 0.5 * 0.7 ** 2 + 0.5 * np.log(2 * np.pi)
    assert abs(val - expect) < 5e-3


# --- metrics ---------------------------------------------------------------

def test_psnr_identity_and_noise():
    img = jnp.ones((16, 16, 3)) * 0.5
    assert float(metrics.psnr(img, img)) > 100
    noisy = img + 0.1
    assert abs(float(metrics.psnr(noisy, img)) - 20.0) < 0.1


def test_psnr_masked():
    img = jnp.zeros((8, 8, 3))
    ref = img.at[0, 0].set(1.0)
    mask = jnp.ones((8, 8), bool).at[0, 0].set(False)
    assert float(metrics.psnr(img, ref, mask)) > 100


def test_ssim_identity():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    assert abs(float(metrics.ssim(img, img)) - 1.0) < 1e-5
    assert abs(float(metrics.ssim_global(img, img)) - 1.0) < 1e-5


def test_ssim_degrades_with_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32))
    noisy = jnp.clip(img + jax.random.normal(jax.random.PRNGKey(1), (32, 32)) * 0.2, 0, 1)
    assert float(metrics.ssim(img, noisy)) < 0.9


def test_pairwise_ssim_global():
    patches = jax.random.uniform(jax.random.PRNGKey(0), (5, 9, 9))
    m = np.asarray(metrics.pairwise_ssim_global(patches))
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-5)
    np.testing.assert_allclose(m, m.T, atol=1e-5)


def test_masked_ssim_bounded():
    """SSIM is mathematically <= 1; property-check the masked variant over
    random images and random masks (guards a suspected >1 regression)."""
    rng = np.random.default_rng(0)
    for trial in range(5):
        a = rng.random((40, 40, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.1 * trial, a.shape), 0, 1).astype(np.float32)
        mask = rng.random((40, 40)) > 0.35
        s = float(metrics.ssim(jnp.asarray(np.where(mask[..., None], a, 0)),
                               jnp.asarray(np.where(mask[..., None], b, 0)),
                               mask=jnp.asarray(mask)))
        assert -1.0 <= s <= 1.0 + 1e-5, s


# --- fast_math -------------------------------------------------------------

def test_fast_sin_accuracy_and_grad():
    from season_nerf_tpu.ops.fast_math import fast_sin, fast_cos
    # SIREN pre-activations are BatchNorm'd to a few sigma; cover far beyond
    x = jnp.asarray(np.linspace(-60.0, 60.0, 40001), jnp.float32)
    np.testing.assert_allclose(np.asarray(fast_sin(x)), np.sin(x),
                               atol=4e-6)
    np.testing.assert_allclose(np.asarray(fast_cos(x)), np.cos(x),
                               atol=4e-6)
    # derivative: d sin = cos (and composes to 2nd order)
    g = jax.grad(lambda v: fast_sin(v).sum())(x[::100])
    np.testing.assert_allclose(np.asarray(g), np.cos(x[::100]), atol=4e-6)
    g2 = jax.grad(jax.grad(lambda v: fast_sin(v)))(0.3)
    np.testing.assert_allclose(float(g2), -np.sin(0.3), atol=4e-6)


def test_fast_sin_degree_error_bounds():
    """Each FAST_SIN_DEGREE polynomial honors its documented error bound
    on the reduced range (the bf16 production dtype makes 9/7 usable; 11
    stays the f32-exact default)."""
    from season_nerf_tpu.ops import fast_math
    x = np.linspace(-np.pi, np.pi, 40001)
    for deg, bound in ((11, 2.5e-7), (9, 1.5e-5), (7, 6e-4)):
        p = fast_math._POLYS[deg]
        acc = np.full_like(x, p[0])
        for c in p[1:]:
            acc = acc * (x * x) + c
        assert np.abs(x * acc - np.sin(x)).max() < bound, deg


def test_fast_sine_model_matches_exact():
    """A fast_sine TNeRF agrees with the exact-sin network on identical
    params to well below training noise."""
    kw = dict(layer_width=32, n_classes=4)
    m_exact = tnerf.TNeRF(**kw)
    m_fast = tnerf.TNeRF(fast_sine=True, **kw)
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (64, 3), minval=-1, maxval=1)
    sun = jnp.tile(jnp.asarray([[0.3, 0.2, 0.93]]), (64, 1))
    t4 = jnp.tile(jnp.asarray([[0.9, 0.43, 1.0, 0.0]]), (64, 1))
    variables = m_exact.init(key, x, sun, t4, train=False)
    out_e = m_exact.apply(variables, x, sun, t4, train=False)
    out_f = m_fast.apply(variables, x, sun, t4, train=False)
    for k in ("rho", "col", "vis", "sky", "class_probs"):
        np.testing.assert_allclose(np.asarray(out_e[k]), np.asarray(out_f[k]),
                                   atol=1e-4)


def test_model_from_config_roundtrip(tmp_path):
    """opts.json round-trip reconstructs the same architecture the Trainer
    built (fast_sine / compute_dtype / fc_layers all carried)."""
    from season_nerf_tpu.config import Config
    cfg = Config(fc_units=48, fc_layers=6, number_low_frequency_cases=5,
                 fast_sine=True, compute_dtype="bfloat16")
    p = str(tmp_path / "opts.json")
    cfg.save_json(p)
    cfg2 = Config.load_json(p)
    m = tnerf.model_from_config(cfg2)
    assert m.layer_width == 48 and m.n_layers == 6
    assert m.n_classes == 5 and m.fast_sine
    assert m.dtype == jnp.bfloat16


def test_load_json_legacy_defaults(tmp_path):
    """An opts.json missing the performance knobs predates them (e.g. a
    minimal file next to a converted reference checkpoint) and must load
    with the legacy f32/exact-sin behavior it was trained under, not
    today's bf16/fast-sine defaults — otherwise the documented 1e-4
    reference output-identity silently breaks at render time."""
    import json as _json
    from season_nerf_tpu.config import Config
    p = str(tmp_path / "opts.json")
    with open(p, "w") as f:
        _json.dump({"fc_units": 48, "site_name": "OMA_281"}, f)
    cfg = Config.load_json(p)
    assert cfg.compute_dtype == "float32"
    assert cfg.fast_sine is False
    assert cfg.fc_units == 48
    # but a dir that recorded them keeps what it recorded
    with open(p, "w") as f:
        _json.dump({"compute_dtype": "bfloat16", "fast_sine": True}, f)
    cfg = Config.load_json(p)
    assert cfg.compute_dtype == "bfloat16" and cfg.fast_sine is True


def test_output_locations_match_reference():
    """Save-point schedule parity with misc.get_output_loc_lin_first
    (misc.py:35-53): log-spaced with a linear floor starting at min_gap,
    and pure-linspace when the floor fills the budget."""
    from season_nerf_tpu.train.phases import output_locations

    def ref(n_steps, n_outputs, min_gap):
        if n_outputs * min_gap >= n_steps:
            return np.linspace(1, n_steps, n_outputs + 1, dtype=int)[1:]
        alpha = np.log(n_steps) / np.log(n_outputs)
        ans = (np.arange(1, n_outputs + 1) ** alpha).astype(int)
        ans[-1] = n_steps
        return np.maximum(ans, np.arange(1, n_outputs + 1) * min_gap)

    for n_steps in (1500, 5000, 40000, 50000):
        for n_out in (1, 4, 10, 20):
            np.testing.assert_array_equal(
                output_locations(n_steps, n_out, 1000),
                np.unique(ref(n_steps, n_out, 1000)))


def test_sine_layer_bf16_z_storage_bit_exact():
    """The bf16-typed pre-activation buffer is value-identical to the old
    f32 materialization: the dense output is bf16 under a bf16 compute
    dtype and the weak-typed omega product stays bf16, so storing z as
    bf16 loses nothing — BN stats (f32 accumulation), normalize, sin, and
    the updated batch stats must all be bit-exact vs the f32-z formula."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from season_nerf_tpu.models.siren import (SineLayer, SplitDense,
                                              siren_kernel_init)
    from season_nerf_tpu.ops.fast_math import fast_sin

    class OldSineLayer(SineLayer):
        @nn.compact
        def __call__(self, x, train=False, extra=None):
            in_features = x.shape[-1]
            bound = 1.0 / float(np.sqrt(in_features))
            dense = SplitDense(
                self.features, dtype=self.dtype,
                kernel_init=siren_kernel_init(self.is_first, self.omega_0),
                bias_init=lambda key, shape, dtype=jnp.float32:
                    jax.random.uniform(key, shape, dtype,
                                       minval=-bound, maxval=bound),
                name="linear")
            z = (self.omega_0 * dense(x, extra)).astype(jnp.float32)
            if self.use_norm:
                z = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-5, name="norm")(z)
            y = fast_sin(z) if self.fast_sine else jnp.sin(z)
            return y.astype(self.dtype) if self.dtype is not None else y

    x = jax.random.normal(jax.random.PRNGKey(0), (256, 64))
    for use_norm in (False, True):
        for train in (False, True):
            kw = dict(use_norm=use_norm, dtype=jnp.bfloat16, fast_sine=True)
            new = SineLayer(128, **kw)
            old = OldSineLayer(128, **kw)
            vn = new.init(jax.random.PRNGKey(1), x, train=False)
            vo = old.init(jax.random.PRNGKey(1), x, train=False)
            mut = ["batch_stats"] if (use_norm and train) else False
            yn = new.apply(vn, x, train=train, mutable=mut)
            yo = old.apply(vo, x, train=train, mutable=mut)
            a = yn[0] if isinstance(yn, tuple) else yn
            b = yo[0] if isinstance(yo, tuple) else yo
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b, np.float32))
            if use_norm and train:
                for p, q in zip(jax.tree_util.tree_leaves(yn[1]),
                                jax.tree_util.tree_leaves(yo[1])):
                    np.testing.assert_array_equal(np.asarray(p),
                                                  np.asarray(q))
