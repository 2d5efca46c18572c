"""Evaluation-suite tests on a tiny untrained/lightly-trained model: shapes,
metric sanity, alignment search, walks, shadow + season analysis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from season_nerf_tpu.models.tnerf import TNeRF
from season_nerf_tpu.render.renderer import Renderer
from season_nerf_tpu.data.synthetic import make_scene
from season_nerf_tpu.eval import hm_eval, img_eval, walks, shadow_eval, season_eval


@pytest.fixture(scope="module")
def setup():
    scene = make_scene(n_views=5, img_size=24, grid=32, seed=7)
    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    r = Renderer(model, variables, n_samples=8, chunk=4096)
    return scene, model, variables, r


# --- hm_eval ---------------------------------------------------------------

def test_density_surface_shapes(setup):
    scene, model, variables, r = setup
    est, ci = hm_eval.density_surface(model, variables, (12, 10),
                                      n_samples=8, chunk_cols=64)
    assert est.shape == (12, 10) and ci.shape == (12, 10)
    assert np.isfinite(est).all()
    assert (ci > 0).all() and (ci <= 1).all()


def test_hm_scores_and_alignment_recovers_shift():
    rng = np.random.default_rng(0)
    gt = rng.random((32, 32)) * 10
    est = np.roll(gt, 1, axis=0) + 0.3          # one-pixel shift + bias
    before = hm_eval.hm_scores(est, gt)
    aligned, change = hm_eval.greedy_align(est, gt)
    after = hm_eval.hm_scores(aligned, gt)
    assert after["RMSE"] < before["RMSE"]
    assert change[0] == -1                       # undid the +1 row shift


def test_shift_and_rotate_nan_pad():
    img = np.ones((8, 8))
    out = hm_eval.shift_and_rotate(img, (1, 0), 0)
    assert np.isnan(out[0]).all() and np.isfinite(out[1:]).all()


def test_eval_hm_end_to_end(setup):
    scene, model, variables, r = setup
    gt = scene.hm[:16, :16]
    imgs, before, after = hm_eval.eval_hm(model, variables, gt,
                                          (0.0, 30.0), n_samples=8,
                                          chunk_cols=64)
    for k in ("MAE", "RMSE", "Acc_1_m", "Median"):
        assert np.isfinite(before[k]) and np.isfinite(after[k])
    assert after["RMSE"] <= before["RMSE"] + 1e-6


# --- img_eval --------------------------------------------------------------

def test_gauntlet_identity_and_noise():
    rng = np.random.default_rng(1)
    img = rng.random((24, 24, 3)).astype(np.float32)
    l2, p, s, em = img_eval.image_quality_gauntlet(img, img.copy())
    assert l2 < 1e-6 and p > 60 and s > 0.999 and em < 1e-6
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    l2n, pn, sn, emn = img_eval.image_quality_gauntlet(img, noisy)
    assert l2n > l2 and pn < p and sn < s


def test_shadow_confusion_perfect_and_inverted():
    m = np.zeros((10, 10))
    m[:, 5:] = 1.0
    perfect = img_eval.shadow_confusion(m, m)
    assert perfect["Accuracy"] == 1.0
    inv = img_eval.shadow_confusion(1 - m, m)
    assert inv["Accuracy"] == 0.0


def test_eval_rendering_and_scores(setup):
    scene, model, variables, r = setup
    cam = scene.cameras[0]
    res = img_eval.eval_rendering(r, cam, (12, 12), exact_solar=False,
                                  n_align_times=24)
    assert "Season_Adj_Img" in res["Images"]
    cvec, sky, t_best = res["Aligned_Vals"]
    assert cvec.shape == (4,) and 0 <= t_best <= 1
    np.testing.assert_allclose(cvec.sum(), 1.0, atol=1e-5)
    scores = img_eval.eval_img_dict(res)
    assert "Base_Img" in scores and "Aligned_Img" in scores
    for v in scores.values():
        assert len(v) == 4


def test_full_eval_and_summary(setup):
    scene, model, variables, r = setup
    out = img_eval.full_eval_images(r, scene.cameras[:2], (10, 10),
                                    n_align_times=8)
    assert len(out) == 2
    summary = img_eval.summarize_image_scores(out)
    assert "Base_Img" in summary
    assert set(summary["Base_Img"]["PSNR"]) == {"avg", "best", "worst"}


# --- walks -----------------------------------------------------------------

def test_walking_points(setup):
    scene, *_ = setup
    wv, ws, wt = walks.get_walking_points(scene.cameras, 4, 5, 6,
                                          min_day_sep=60)
    assert wv.shape == (4, 2) and ws.shape == (5, 2)
    assert len(wt) >= 1
    assert (ws[:, 0] >= 0).all() and (ws[:, 0] <= 90).all()


def test_shadow_walk_points(setup):
    scene, *_ = setup
    d = walks.shadow_walk_points(scene.cameras[:4], scene.cameras[4:],
                                 points_in_space=4, points_across_angles=3)
    assert d["Training"].shape == (4, 2)
    assert d["Full_Walk"].shape == (9, 2)
    assert d["Ground_Points"].shape == (16, 2)
    assert len(d["Near_Walk"]) >= 9


# --- shadow eval -----------------------------------------------------------

def test_shadow_eval_pipeline(setup):
    scene, model, variables, r = setup
    summary = shadow_eval.test_shadow_points(
        model, variables, scene.cameras[:3], scene.cameras[3:],
        n_samples=8, points_in_space=3, points_across_angles=2)
    assert "Training" in summary["Stats"]
    st = summary["Stats"]["Training"]
    assert 0 <= st["Acc"] <= 1
    assert np.isfinite(st["Loss"])
    ex = summary["Results"]["Training"]["Exact_Vis"]
    assert ((ex >= 0) & (ex <= 1.0 + 1e-5)).all()


# --- season eval -----------------------------------------------------------

def test_season_eval_pipeline(setup):
    scene, model, variables, r = setup
    walk = season_eval.full_eval_seasons(r, scene.cameras, (8, 8),
                                         n_sun=2, n_view=2, n_time=2,
                                         min_day_sep=80)
    V, S, T = walk["Imgs"].shape
    assert V == 2 and S == 2
    stab = season_eval.season_stability(walk, use_sinkhorn=True)
    assert stab["EM_matrices"].shape[0] == T
    assert np.isfinite(stab["Stats"]["mean"])
    base = season_eval.prototype_baseline_em(scene.images[:3])
    assert np.isfinite(base[0, 1])


def test_eval_img_dict_extremes(setup):
    scene, model, variables, r = setup
    res = img_eval.eval_rendering(r, scene.cameras[1], (10, 10),
                                  n_align_times=8)
    scores = img_eval.eval_img_dict(res, score_extremes=True)
    assert "Class_0_Img" in scores and "Class_3_Img" in scores
