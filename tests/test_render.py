"""Renderer tests: geometry of ray grids, component capture, compositing,
exact-solar transmittance vs a numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from season_nerf_tpu.models.tnerf import TNeRF
from season_nerf_tpu.render.renderer import (
    Renderer, encode_time, dir_grid_rays, camera_grid_rays,
    images_from_components)
from season_nerf_tpu.data.synthetic import make_scene


@pytest.fixture(scope="module")
def small_renderer():
    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    return Renderer(model, variables, n_samples=8, chunk=4096)


def test_encode_time_circle():
    t4 = encode_time(0.25, 0.5)
    np.testing.assert_allclose(t4, [0, 1, -1, 0], atol=1e-6)


def test_dir_grid_rays_nadir():
    v = np.array([0.0, 0.0, 1.0])
    tops, bots, ij = dir_grid_rays(v, (8, 8))
    assert tops.shape == (64, 3)
    np.testing.assert_allclose(tops[:, 2], 1.0)
    np.testing.assert_allclose(bots[:, 2], -1.0)
    # nadir: x/y identical top and bottom
    np.testing.assert_allclose(tops[:, :2], bots[:, :2], atol=1e-6)


def test_dir_grid_rays_oblique_direction():
    v = np.array([0.3, 0.1, 0.9])
    v = v / np.linalg.norm(v)
    tops, bots, ij = dir_grid_rays(v, (4, 4))
    d = tops - bots
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    np.testing.assert_allclose(d, np.broadcast_to(v, d.shape), atol=1e-6)


def test_camera_grid_rays():
    scene = make_scene(n_views=1, img_size=16, grid=24, seed=0)
    cam = scene.cameras[0]
    tops, bots, ij, gt_ij = camera_grid_rays(cam, (8, 8))
    assert tops.shape[0] == ij.shape[0] == gt_ij.shape[0]
    assert tops.shape[0] > 0
    # rays reproject onto the sampled pixels
    r, c = cam.project(tops[:, 0], tops[:, 1], tops[:, 2])
    np.testing.assert_allclose(np.stack([r, c], -1), gt_ij, atol=0.5)


def test_render_img_shapes(small_renderer):
    out = small_renderer.render_img((90, 0), (45, 180), 0.5, 16)
    assert out["Col_Img"].shape == (16, 16, 3)
    assert out["Shadow_Mask"].shape == (16, 16)
    assert out["Mask"].all()
    assert np.isfinite(out["Col_Img"]).all()


def test_component_render_and_composite(small_renderer):
    res = small_renderer.component_render_by_dir(
        (80, 10), (50, 200), 0.3, (8, 8), exact_solar=True)
    assert res["rho"].shape == (64, 8, 1)
    assert res["adjust_per_class"].shape == (64, 8, 4, 3)
    assert res["exact_solar"].shape == (64, 8, 1)
    assert ((res["exact_solar"] >= 0) & (res["exact_solar"] <= 1)).all()
    imgs = images_from_components(res, (8, 8))
    assert imgs["Base_Img"].shape == (8, 8, 3)
    assert len(imgs["Extreme_Imgs"]) == 4
    assert imgs["Shadow_Mask_Exact"].shape == (8, 8)
    assert np.isfinite(imgs["Season_Adj_Img"]).all()
    # probabilities
    np.testing.assert_allclose(imgs["Time_Class"].sum(), 1.0, atol=1e-5)


def test_exact_solar_oracle(small_renderer):
    """Transmittance along a vertical sun ray matches a numpy integration
    of sigma_only."""
    r = small_renderer
    sun = jnp.asarray([0.0, 0.0, 1.0])
    pts = jnp.asarray([[0.1, 0.2, -0.5], [0.0, 0.0, 0.9]])
    got = np.asarray(r._exact_solar_chunk(r.variables, pts, sun))
    S = r.n_samples
    for i, p in enumerate(np.asarray(pts)):
        k = (1 - p[2])
        top = p + k * np.array([0, 0, 1.0])
        ts = np.linspace(0, 1, S)
        spts = top[None] * (1 - ts[:, None]) + p[None] * ts[:, None]
        delta = np.linalg.norm(top - p) / S
        rho = np.asarray(r.model.apply(
            r.variables, jnp.asarray(spts), train=False,
            method="sigma_only"))[:, 0]
        want = np.exp(-np.sum(rho[:-1] * delta))
        np.testing.assert_allclose(got[i], want, rtol=1e-4)


def test_get_dsm_range(small_renderer):
    h = small_renderer.get_dsm(8)
    ok = np.isfinite(h)
    assert ok.any()
    assert (h[ok] >= -1.01).all() and (h[ok] <= 1.01).all()


def test_get_dsm_low_density_is_nan(small_renderer):
    """Rays with no accumulated hit probability are no-data (NaN), per the
    serving /dsm contract — not confident mid-cube heights."""
    all_nan = small_renderer.get_dsm(8, min_ps_sum=np.inf)
    assert not np.isfinite(all_nan).any()
    no_filter = small_renderer.get_dsm(8, min_ps_sum=0.0)
    assert np.isfinite(no_filter).all()


def test_perspective_rays_geometry():
    from season_nerf_tpu.render.renderer import perspective_rays
    # camera above the cube looking straight down (pitch -90)
    tops, bots, ij = perspective_rays((0, 0, 2.0), -90.0, 0.0, 40.0, (6, 6))
    assert tops.shape[0] == 36
    np.testing.assert_allclose(tops[:, 2], 1.0, atol=1e-9)
    np.testing.assert_allclose(bots[:, 2], -1.0, atol=1e-9)
    # directions point downward
    d = bots - tops
    assert (d[:, 2] < 0).all()


def test_render_perspective(small_renderer):
    out = small_renderer.render_perspective(
        (0.0, -1.5, 1.2), -35.0, 0.0, 60.0, 10, (50, 180), 0.4)
    assert out["Col_Img"].shape == (10, 10, 3)
    assert out["Mask"].any()


def test_render_img_exact_shadow(small_renderer):
    out = small_renderer.render_img((90, 0), (45, 180), 0.5, 8,
                                    exact_shadow=True)
    ex = out["Exact_Shadow_Mask"]
    assert ex.shape == (8, 8)
    assert ((ex >= 0) & (ex <= 1.0 + 1e-5)).all()


def test_run_chunks_compile_failure_fallback():
    """A retryable XLA compile failure (register-allocator RET_CHECK /
    remote-compile HTTP 500) halves the chunk and retries instead of
    losing the render; a non-retryable error propagates."""
    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    r = Renderer(model, variables, n_samples=8, chunk=1024)

    n = 300
    tops = np.concatenate([np.random.uniform(-1, 1, (n, 2)),
                           np.ones((n, 1))], 1).astype(np.float32)
    bots = np.concatenate([tops[:, :2], -np.ones((n, 1))], 1).astype(np.float32)
    sun = np.broadcast_to(np.array([0.3, 0.2, 0.93], np.float32), (n, 3))
    t4 = np.broadcast_to(np.array([1, 0, 1, 0], np.float32), (n, 4))

    attempts = []

    def flaky(variables, tt, bb, ss, t44):
        attempts.append(r.chunk)
        if r.chunk > 256:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: remote_compile: HTTP 500: RET_CHECK failure "
                "(regalloc/live_range_finder.cc)")
        return r._full_chunk(variables, tt, bb, ss, t44)

    with pytest.warns(UserWarning, match="retrying at chunk"):
        out = r._run_chunks(flaky, tops, bots, sun, t4, ["rendered"])
    assert out["rendered"].shape == (n, 3)
    assert r.chunk == 256                       # 1024 -> 512 -> 256
    assert attempts[:2] == [1024, 512]

    def fatal(variables, tt, bb, ss, t44):
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shapes differ")

    with pytest.raises(jax.errors.JaxRuntimeError, match="INVALID_ARGUMENT"):
        r._run_chunks(fatal, tops, bots, sun, t4, ["rendered"])


def test_run_chunks_transient_remote_flake_keeps_chunk():
    """A remote-compile failure without a RET_CHECK signature gets one
    same-size retry (a service flake must not permanently halve the
    chunk); if it persists at the same size, the chunk then shrinks."""
    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    n = 300
    tops = np.concatenate([np.random.uniform(-1, 1, (n, 2)),
                           np.ones((n, 1))], 1).astype(np.float32)
    bots = np.concatenate([tops[:, :2], -np.ones((n, 1))],
                          1).astype(np.float32)
    sun = np.broadcast_to(np.array([0.3, 0.2, 0.93], np.float32), (n, 3))
    t4 = np.broadcast_to(np.array([1, 0, 1, 0], np.float32), (n, 4))

    # one flake, then healthy: chunk must stay at its configured size
    r = Renderer(model, variables, n_samples=8, chunk=1024)
    calls = {"n": 0}

    def one_flake(variables, tt, bb, ss, t44):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: remote_compile: HTTP 500: connection reset")
        return r._full_chunk(variables, tt, bb, ss, t44)

    with pytest.warns(UserWarning, match="retrying once at the same size"):
        out = r._run_chunks(one_flake, tops, bots, sun, t4, ["rendered"])
    assert out["rendered"].shape == (n, 3)
    assert r.chunk == 1024

    # persistent at 1024: one same-size retry, then halve and succeed
    r2 = Renderer(model, variables, n_samples=8, chunk=1024)
    attempts = []

    def persistent(variables, tt, bb, ss, t44):
        attempts.append(r2.chunk)
        if r2.chunk > 512:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: remote_compile: HTTP 500: too big")
        return r2._full_chunk(variables, tt, bb, ss, t44)

    with pytest.warns(UserWarning, match="retrying at chunk"):
        out = r2._run_chunks(persistent, tops, bots, sun, t4, ["rendered"])
    assert out["rendered"].shape == (n, 3)
    assert r2.chunk == 512
    assert attempts[:3] == [1024, 1024, 512]


# ---------------------------------------------------------------------------
# depth-guided fast rendering (render_chunk_outputs_fast)
# ---------------------------------------------------------------------------

class _PeakSceneModel:
    """Deterministic stand-in for TNeRF with an analytically localized
    surface: a sharp density peak at z = z0(x, y), position-dependent
    color.  Exercises the fast path's actual guarantee — when a ray's
    density is concentrated, the windowed composite matches the uniform
    one — without training a network."""

    n_classes = 4

    def __init__(self, z0=0.15, width=0.04, amp=80.0):
        self.z0, self.width, self.amp = z0, width, amp

    def _surface_z(self, x):
        return self.z0 + 0.1 * jnp.sin(2.0 * x[:, 0]) * jnp.cos(x[:, 1])

    def _sigma(self, x):
        dz = x[:, 2:3] - self._surface_z(x)[:, None]
        return self.amp * jnp.exp(-((dz / self.width) ** 2))

    def apply(self, variables, *args, method=None, train=False, **kw):
        if method == "sigma_only":
            return self._sigma(args[0])
        if method == "forward_separate":
            return self._forward_separate(args[0])
        if method == "ray_consts":
            sun, t4 = args[0], args[1]
            R = sun.shape[0]
            return (jnp.full((R, self.n_classes), 1.0 / self.n_classes),
                    jnp.zeros((R, 2)), jnp.zeros((R, 3)))
        x = args[0]
        n = x.shape[0]
        col = jax.nn.sigmoid(jnp.stack(
            [x[:, 0], x[:, 1], x[:, 2]], axis=1) * 2.0)
        return {
            "rho": self._sigma(x),
            "col": col,
            "vis": jnp.full((n, 1), 0.9),
            "sky": jnp.full((n, 3), 0.3),
            "class_probs": jnp.full((n, self.n_classes),
                                    1.0 / self.n_classes),
            "adjust": jnp.zeros((n, 3)),
        }

    def init(self, *a, **k):
        return {}

    def _forward_separate(self, x):
        n = x.shape[0]
        col_raw = jnp.stack([x[:, 0], x[:, 1], x[:, 2]], axis=1) * 2.0
        return {
            "rho": self._sigma(x),
            "col_raw": col_raw,
            "vis": jnp.full((n, 1), 0.9),
            "sky": jnp.full((n, 3), 0.3),
            "class_probs": jnp.full((n, self.n_classes),
                                    1.0 / self.n_classes),
            "adjust_per_class": jnp.zeros((n, self.n_classes, 3)),
        }


@pytest.mark.parametrize("classic_solar", [False, True])
def test_fast_render_matches_exact_on_localized_surface(classic_solar):
    from season_nerf_tpu.render.renderer import (render_chunk_outputs,
                                                 render_chunk_outputs_fast)
    model = _PeakSceneModel()
    v = np.array([0.25, 0.1, 0.95])
    v /= np.linalg.norm(v)
    tops, bots, _ = dir_grid_rays(v, (12, 12))
    n = tops.shape[0]
    sun = jnp.broadcast_to(jnp.array([0.2, 0.2, 0.95]), (n, 3))
    t4 = jnp.broadcast_to(jnp.asarray(encode_time(0.3)), (n, 4))
    # a dense uniform reference: both paths approximate the same integral
    exact = render_chunk_outputs(model, {}, jnp.asarray(tops),
                                 jnp.asarray(bots), sun, t4, n_samples=96,
                                 classic_solar=classic_solar)
    fast = render_chunk_outputs_fast(model, {}, jnp.asarray(tops),
                                     jnp.asarray(bots), sun, t4,
                                     n_coarse=32, n_fine=32,
                                     classic_solar=classic_solar)
    np.testing.assert_allclose(np.asarray(fast["rendered"]),
                               np.asarray(exact["rendered"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(fast["height"]),
                               np.asarray(exact["height"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(fast["shadow_raw"]),
                               np.asarray(exact["shadow_raw"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(fast["ps_sum"]),
                               np.asarray(exact["ps_sum"]), atol=0.02)


def test_fast_render_empty_rays_well_formed():
    from season_nerf_tpu.render.renderer import render_chunk_outputs_fast
    model = _PeakSceneModel(amp=0.0)      # no density anywhere
    v = np.array([0.0, 0.0, 1.0])
    tops, bots, _ = dir_grid_rays(v, (4, 4))
    n = tops.shape[0]
    sun = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    t4 = jnp.broadcast_to(jnp.asarray(encode_time(0.0)), (n, 4))
    out = render_chunk_outputs_fast(model, {}, jnp.asarray(tops),
                                    jnp.asarray(bots), sun, t4,
                                    n_coarse=16, n_fine=8,
                                    classic_solar=False)
    for k in ("rendered", "height", "shadow_raw", "ps_sum"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    np.testing.assert_allclose(np.asarray(out["ps_sum"]), 0.0, atol=1e-5)


def test_fast_renderer_end_to_end_and_chunk_invariance():
    """Renderer(fast_render=...) drives the fast kernel through the chunked
    dispatch: output identical across chunk sizes, exact-shadow reshape uses
    the fine sample count."""
    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    r1 = Renderer(model, variables, n_samples=16, chunk=64,
                  fast_render=(8, 8))
    r2 = Renderer(model, variables, n_samples=16, chunk=256,
                  fast_render=(8, 8))
    out1 = r1.render_img((80, 20), (45, 180), 0.5, 12)
    out2 = r2.render_img((80, 20), (45, 180), 0.5, 12)
    np.testing.assert_allclose(out1["Col_Img"], out2["Col_Img"], atol=1e-5)
    assert np.isfinite(out1["Col_Img"]).all()
    # exact-shadow path: secondary rays cast from the n_fine window samples
    out = r1.render_img((90, 0), (45, 180), 0.5, 6, exact_shadow=True)
    assert out["Exact_Shadow_Mask"].shape == (6, 6)
    assert np.isfinite(out["Exact_Shadow_Mask"]).all()


def test_fast_component_render_matches_exact():
    """The component path (eval/serving layer renders) under fast_render
    concentrates its per-sample capture in the surface window and the
    composited images agree with the uniform-sampling composite."""
    model = _PeakSceneModel()
    r_exact = Renderer(model, {}, n_samples=96, chunk=4096)
    r_fast = Renderer(model, {}, n_samples=96, chunk=4096,
                      fast_render=(32, 32))
    kw = dict(view_el_az=(75, 30), sun_el_az=(50, 200), time_frac=0.3,
              out_size=(10, 10))
    res_e = r_exact.component_render_by_dir(**kw)
    res_f = r_fast.component_render_by_dir(**kw)
    assert res_f["rho"].shape == (100, 32, 1)
    imgs_e = images_from_components(res_e, (10, 10))
    imgs_f = images_from_components(res_f, (10, 10))
    for k in ("Base_Img", "Season_Adj_Img", "Shadow_Mask"):
        np.testing.assert_allclose(imgs_f[k], imgs_e[k], atol=0.02,
                                   err_msg=k)
