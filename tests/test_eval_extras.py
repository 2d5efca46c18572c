"""simple_align affine search, date helpers, advanced solar sweep."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from season_nerf_tpu.eval import hm_eval
from season_nerf_tpu.geometry.time_enc import (time_frac_to_date,
                                               date_to_time_frac)


def test_date_roundtrip():
    assert time_frac_to_date(0.0).startswith("Jan")
    assert time_frac_to_date(0.5).startswith("Jul")
    tf = date_to_time_frac(7, 19)
    assert 0.53 < tf < 0.56
    assert date_to_time_frac(1, 1) == 0.0


def test_apply_affine_identity():
    rng = np.random.default_rng(0)
    img = rng.random((20, 20))
    out = hm_eval.apply_affine(img, 0.0, (1.0, 1.0), (0.0, 0.0))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_simple_align_recovers_scale_and_shift():
    rng = np.random.default_rng(1)
    x = np.linspace(0, 4, 48)
    gt = np.sin(np.outer(x, x / 3)) * 5 + rng.normal(0, 0.05, (48, 48))
    est = hm_eval.apply_affine(gt, 0.0, (1.0, 1.0), (2.0, -1.0)) * 1.4 + 2.0
    before = np.sqrt(np.nanmean((est - gt) ** 2))
    aligned, T, (A, B) = hm_eval.simple_align(est, gt)
    after = np.sqrt(np.nanmean((aligned - gt) ** 2))
    assert after < before * 0.6
    # recovered the inverse shift (sign convention: undo the +2/-1)
    assert abs(T[3] + 2.0) <= 1.0 and abs(T[4] - 1.0) <= 1.0


def test_advanced_solar_sweep(tmp_path):
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.render.renderer import Renderer
    from season_nerf_tpu.eval.shadow_eval import advanced_solar_sweep
    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    r = Renderer(model, variables, n_samples=8, chunk=2048)
    csv_path = str(tmp_path / "solar.csv")
    rows = advanced_solar_sweep(r, [(90, 0), (70, 120)], [(45, 180)],
                                out_size=(6, 6), csv_path=csv_path)
    assert len(rows) == 2
    assert os.path.exists(csv_path)
    assert all(0 <= row["Accuracy"] <= 1 or np.isnan(row["Accuracy"])
               for row in rows)
