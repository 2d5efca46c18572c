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
