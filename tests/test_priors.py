"""Space-carving prior tests: graph cut (native vs oracle energies),
plane-sweep recovers the synthetic height field."""

import numpy as np
import pytest

from season_nerf_tpu.priors import graph_cut as gc
from season_nerf_tpu.priors.space_carving import (
    plane_sweep_scores, scores_to_heightmap, space_carve_dsm,
    model_grid_from_bounds)
from season_nerf_tpu.data.synthetic import make_scene, hm_lookup


def test_truncated_linear_metric():
    V = gc.truncated_linear_costs(10, height=1 / 3)
    assert np.allclose(np.diag(V), 0)
    assert np.allclose(V, V.T)
    # triangle inequality
    n = V.shape[0]
    for a in range(n):
        for b in range(n):
            for c in range(0, n, 3):
                assert V[a, b] <= V[a, c] + V[c, b] + 1e-6  # f32 roundoff


def test_aexpansion_reduces_energy_vs_argmin():
    rng = np.random.default_rng(0)
    H, W, L = 12, 10, 6
    data = rng.random((H, W, L)).astype(np.float32)
    sm = gc.truncated_linear_costs(L, height=0.5)
    init = np.argmin(data, 2).astype(np.int32)
    e0 = gc.grid_energy(data, sm, init)
    labels, e1 = gc.aexpansion_grid(data, sm)
    assert e1 <= e0 + 1e-6
    # energy reported matches recomputation
    np.testing.assert_allclose(e1, gc.grid_energy(data, sm, labels), rtol=1e-6)


def test_aexpansion_prefers_smooth_solution():
    """A noisy two-level data term with strong smoothness must collapse to
    piecewise-constant labels."""
    rng = np.random.default_rng(1)
    H, W, L = 16, 16, 5
    true = np.zeros((H, W), int)
    true[:, 8:] = 4
    data = np.ones((H, W, L), np.float32)
    data[np.arange(H)[:, None], np.arange(W)[None, :], true] = 0.0
    # flip some pixels' best label to noise
    noise = rng.random((H, W)) < 0.15
    data[noise] = np.roll(data[noise], 2, axis=-1)
    # smoothness sized so isolated noise pixels flip (4 * V(2 steps) = 1.6
    # beats the data gain of 1) while the true half/half boundary stays far
    # cheaper than mislabeling either half
    sm = gc.truncated_linear_costs(L, height=0.8).astype(np.float32)
    labels, _ = gc.aexpansion_grid(data, sm)
    # smoothing removes isolated noise pixels
    agree = (labels == true).mean()
    assert agree > 0.9


def test_model_grid_from_bounds():
    bounds = np.array([[39.0, 39.009], [-84.0, -83.99], [200.0, 260.0]])
    nx, ny, nz = model_grid_from_bounds(bounds, voxel=(2.0, 2.0, 0.25))
    assert nx > 100 and ny > 100   # ~1km/2m
    assert nz == 240


@pytest.mark.slow
def test_space_carving_recovers_heightfield():
    scene = make_scene(n_views=6, img_size=64, grid=48, seed=2)
    grid = (24, 24, 16)
    scores = plane_sweep_scores(scene.cameras, scene.images, grid, patch=5,
                                cell_chunk=512)
    assert scores.shape == grid
    hm = scores_to_heightmap(scores)
    assert hm.shape == (24, 24)
    # compare against the true height field on the score grid
    xs = (np.linspace(-1, 1, 25)[:-1] + np.linspace(-1, 1, 25)[1:]) / 2
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    true = hm_lookup(scene.hm, X, Y)
    err = np.abs(hm - true)
    # coarse grid + 16 z-steps => one step is 0.125; require the carve to be
    # far better than chance (uniform error would be ~0.7)
    assert np.median(err) < 0.25
