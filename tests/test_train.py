"""Training-engine tests: phase machinery, loss structure, end-to-end steps
on a tiny synthetic scene (the integration strategy from SURVEY.md §4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from season_nerf_tpu.config import Config
from season_nerf_tpu.data.synthetic import make_scene, scene_ray_tables
from season_nerf_tpu.train import phases as phase_lib
from season_nerf_tpu.train import state as state_lib
from season_nerf_tpu.train.engine import Trainer
from season_nerf_tpu.train.losses import make_solar_rays


# --- phases ----------------------------------------------------------------

def test_phase_fractions():
    ps = phase_lib.build_phases(50_000, jump_start=True)
    assert [p.index for p in ps] == [1, 4]
    assert ps[0].start == 0 and ps[0].end == 10_000
    assert ps[1].start == 10_000 and ps[1].end == 50_000
    assert ps[0].use_prior and not ps[1].use_prior


def test_phase_no_jump_start():
    ps = phase_lib.build_phases(1000, jump_start=False)
    assert not any(p.use_prior for p in ps)


def test_output_locations_monotone_min_gap():
    locs = phase_lib.output_locations(50_000, 10, min_gap=1000)
    assert locs[-1] == 50_000
    assert np.all(np.diff(locs) > 0)


def test_save_points_cover_end():
    ps = phase_lib.build_phases(10_000, True)
    pts = phase_lib.save_points(ps, 8, 10_000)
    assert pts[-1] == 10_000
    assert all(0 < p <= 10_000 for p in pts)


# --- solar rays ------------------------------------------------------------

def test_make_solar_rays_geometry():
    rng = jax.random.PRNGKey(0)
    tops, bots, sun, t4 = make_solar_rays(rng, 64)
    tops, bots, sun, t4 = map(np.asarray, (tops, bots, sun, t4))
    assert np.allclose(tops[:, 2], 1.0)
    assert np.allclose(bots[:, 2], -1.0, atol=1e-5)
    # ray direction == sun direction
    d = tops - bots
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    assert np.allclose(d, sun, atol=1e-5)
    assert np.allclose(np.linalg.norm(sun, axis=1), 1.0, atol=1e-5)
    # periodic time encodings on the unit circle
    assert np.allclose(t4[:, 0] ** 2 + t4[:, 1] ** 2, 1.0, atol=1e-5)


def test_loss_batch_stats_compose_sequentially():
    """With Use_Solar on, BatchNorm running stats must see BOTH forwards —
    camera rays then solar rays, composed like the reference's two in-place
    train-mode passes — not just the last one."""
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.ops import rendering
    from season_nerf_tpu.train.losses import LossStatics, season_nerf_loss

    model = TNeRF(layer_width=16, n_classes=2, n_layers=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    assert "batch_stats" in variables

    rng = jax.random.PRNGKey(5)
    n = 8
    kb = jax.random.split(jax.random.PRNGKey(9), 5)
    batch = {
        "top": jax.random.uniform(kb[0], (n, 3), minval=-1, maxval=1)
               .at[:, 2].set(1.0),
        "bot": jax.random.uniform(kb[1], (n, 3), minval=-1, maxval=1)
               .at[:, 2].set(-1.0),
        "sun": jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        "t4": jnp.ones((n, 4)),
        "gt_rgb": jax.random.uniform(kb[2], (n, 3)),
    }
    statics = LossStatics(
        n_samples=4, n_importance=0, use_prior=False, use_solar=True,
        classic_solar=False, use_mse_loss=True, sc_lambda=0.03, phase_len=1)
    _, (_, updates) = season_nerf_loss(
        model, variables, {}, statics, batch, rng, step=0,
        train=True, mutable=True)

    # expected: replay the loss's own rng discipline by hand, sequentially
    k_render, k_solar_rays, k_solar_samp = jax.random.split(rng, 3)
    _, u1 = rendering.eval_rays(
        model, variables, k_render, batch["top"], batch["bot"], batch["sun"],
        batch["t4"], n_samples=4, train=True, mutable=True)
    from season_nerf_tpu.train.losses import make_solar_rays
    tops_s, bots_s, sun_s, _ = make_solar_rays(k_solar_rays, n, None)
    v2 = {**variables, "batch_stats": u1["batch_stats"]}
    _, u2 = rendering.eval_rho_only(
        model, v2, k_solar_samp, tops_s, bots_s, sun_s, None,
        n_samples=4, train=True, mutable=True)

    got = jax.tree_util.tree_leaves(updates["batch_stats"])
    want = jax.tree_util.tree_leaves(u2["batch_stats"])
    only_last = jax.tree_util.tree_leaves(
        rendering.eval_rho_only(model, variables, k_solar_samp, tops_s,
                                bots_s, sun_s, None, n_samples=4, train=True,
                                mutable=True)[1]["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(want, only_last)), "composition must matter"
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


# --- end-to-end tiny training ---------------------------------------------

@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    scene = make_scene(n_views=4, img_size=24, grid=32, seed=3)
    train_tab, val_tab = scene_ray_tables(scene, testing_size=1)
    logs = str(tmp_path_factory.mktemp("logs"))
    return scene, train_tab, val_tab, logs


def _tiny_cfg(logs, **kw):
    base = dict(max_train_steps=10, n_samples=8, batch_size=64,
                fc_units=32, chunk=512, n_saves=2, logs_dir=logs,
                number_low_frequency_cases=4)
    base.update(kw)
    return Config(**base)


def test_train_adaptive_with_prior(tiny_setup):
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(logs)
    tr = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm,
                 gt_dsm=scene.hm)
    tr.run()   # crosses the phase-1 -> phase-4 boundary at step 2
    tr.finalize()
    assert tr.step == 10
    assert tr._phase.index == 4
    # Barron alpha/scale were carried over the boundary
    assert 0.001 < tr._carry_alpha < 2.99
    assert tr._carry_scale > 0.01
    assert os.path.exists(os.path.join(logs, "Final_Model.nn"))
    # all live loss values finite
    leaves = jax.tree_util.tree_leaves(tr.state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_phase4_prior_keepalive(tiny_setup):
    """phase4_prior_keepalive keeps a decaying Alpha_Adjust alive in the
    prior-off phase: present in the phase-4 loss dict, weight decaying
    linearly to 0 at the final step; keepalive=0 (the reference protocol)
    produces no such term."""
    from season_nerf_tpu.train.losses import season_nerf_loss

    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg("", n_saves=0, phase4_prior_keepalive=0.25,
                    max_train_steps=20)
    tr = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm)
    tr.run(scan_chunk=1)
    assert tr._phase.index == 4 and not tr._phase_statics.use_prior
    s = tr._phase_statics
    assert s.prior_keepalive == 0.25
    assert s.phase_start == 4 and s.phase_len == 20  # phase-4 span

    batch = {"top": jnp.asarray(train_tab.rows[:8, 2:5]),
             "bot": jnp.asarray(train_tab.rows[:8, 5:8]),
             "sun": jnp.asarray(train_tab.rows[:8, 8:11]),
             "t4": jnp.asarray(train_tab.rows[:8, 11:15]),
             "gt_rgb": jnp.asarray(train_tab.rows[:8, 19:22])}
    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}

    def loss_at(step, statics):
        _, (losses, _) = season_nerf_loss(
            tr.model, variables, tr.state.ada_params, statics, batch,
            jax.random.PRNGKey(0), step=jnp.asarray(step), train=True,
            prior_hm=tr.prior_hm, mutable=True)
        return losses

    losses_start = loss_at(s.phase_start, s)
    losses_end = loss_at(s.phase_len, s)
    assert "Alpha_Adjust" in losses_start
    w_start = float(losses_start["Alpha_Adjust"][1])
    w_end = float(losses_end["Alpha_Adjust"][1])
    assert np.isclose(w_start, 0.25), w_start   # full weight at phase entry
    assert w_end == 0.0                         # exactly 0 at the last step
    # halfway: half the weight (linear decay)
    w_mid = float(loss_at((s.phase_start + s.phase_len) // 2,
                          s)["Alpha_Adjust"][1])
    assert np.isclose(w_mid, 0.125), w_mid
    assert np.isfinite(float(losses_start["Alpha_Adjust"][0]))

    # keepalive=0: the reference protocol — no Alpha_Adjust in phase 4
    s0 = s._replace(prior_keepalive=0.0)
    assert "Alpha_Adjust" not in loss_at(s.phase_start, s0)


def test_train_mse_path(tiny_setup):
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(logs, Use_MSE_loss=True, jump_start=False,
                    max_train_steps=4)
    tr = Trainer(cfg, train_tab, val_tab)
    tr.run()
    assert tr.step == 4
    leaves = jax.tree_util.tree_leaves(tr.state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(str(tmp_path), max_train_steps=4, jump_start=False)
    tr = Trainer(cfg, train_tab, val_tab)
    tr.run(n_steps=2)
    path = str(tmp_path / "ckpt.nn")
    state_lib.save_checkpoint(path, tr.state, extra={"step": tr.step})
    restored, extra = state_lib.load_checkpoint(path, tr.state)
    assert extra["step"] == 2
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_final_artifact_restores(tiny_setup, tmp_path):
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(str(tmp_path), max_train_steps=2, jump_start=False)
    tr = Trainer(cfg, train_tab, val_tab)
    tr.run()
    tr.finalize()
    path = os.path.join(str(tmp_path), "Final_Model.nn")
    variables, meta = state_lib.restore_variables(
        tr.variables_template, path)
    assert meta["fc_units"] == cfg.fc_units
    out = tr.model.apply(
        {"params": variables["params"],
         **({"batch_stats": variables["batch_stats"]}
            if "batch_stats" in variables else {})},
        jnp.zeros((4, 3)), jnp.zeros((4, 3)), jnp.ones((4, 4)), train=False)
    assert np.isfinite(np.asarray(out["rho"])).all()


def test_best_geometry_final_model(tiny_setup, tmp_path):
    """final_model_selection='best_geometry' writes the save point with the
    lowest prior-DSM height error as Final_Model.nn (not the last step) and
    records the choice in the artifact meta."""
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(str(tmp_path), final_model_selection="best_geometry")
    tr = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm,
                 gt_dsm=scene.hm)
    tr.run()
    # every save point scored geometry vs the prior
    assert len(tr._save_geometry) == len(tr.save_steps)
    assert all(np.isfinite(m) for _, m in tr._save_geometry)
    # force a deterministic non-last winner, then finalize
    first_save = min(tr.save_steps)
    tr._save_geometry = [(s, 0.0 if s == first_save else 1.0)
                         for s, _ in tr._save_geometry]
    tr.finalize()
    variables, meta = state_lib.restore_variables(
        tr.variables_template, os.path.join(str(tmp_path), "Final_Model.nn"))
    assert meta["selection"] == "best_geometry"
    assert meta["selected_step"] == first_save
    assert meta["steps"] == first_save
    # the artifact params are the selected checkpoint's, not the last step's
    ckpt, _ = state_lib.load_checkpoint(
        os.path.join(str(tmp_path), f"Model_{first_save}.nn"), tr.state)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(ckpt.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_geometry_survives_resume(tiny_setup, tmp_path):
    """Save-point geometry scores ride the checkpoint: after a crash +
    resume, finalize() still considers the pre-crash save points (a
    watchdog restart must not silently shrink the selection pool)."""
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(str(tmp_path), final_model_selection="best_geometry")
    tr = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm,
                 gt_dsm=scene.hm)
    tr.run()
    assert len(tr._save_geometry) == len(tr.save_steps)
    last_ckpt = os.path.join(str(tmp_path), f"Model_{max(tr.save_steps)}.nn")
    tr2 = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm,
                  gt_dsm=scene.hm)
    tr2.resume(last_ckpt)
    assert tr2._save_geometry == tr._save_geometry


def test_best_geometry_falls_back_without_prior(tiny_setup, tmp_path):
    """No prior DSM -> no geometry scores -> loud fallback to last-step."""
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(str(tmp_path), max_train_steps=2, jump_start=False,
                    final_model_selection="best_geometry")
    tr = Trainer(cfg, train_tab, val_tab)
    tr.run()
    with pytest.warns(UserWarning, match="best_geometry"):
        tr.finalize()
    _, meta = state_lib.restore_variables(
        tr.variables_template, os.path.join(str(tmp_path), "Final_Model.nn"))
    assert "selection" not in meta
    assert meta["steps"] == 2


def test_validation_render(tiny_setup):
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(logs, max_train_steps=2, jump_start=False)
    tr = Trainer(cfg, train_tab, val_tab, gt_dsm=scene.hm)
    tr.run()
    report = tr.validation_report()
    assert "Mean_PSNR" in report and np.isfinite(report["Mean_PSNR"])
    assert "Mean_Height_Error" in report


def test_multi_step_scan_path(tiny_setup):
    """run() with a small scan_chunk exercises the fused multi-step scan."""
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(logs, max_train_steps=24, jump_start=False, n_saves=0)
    tr = Trainer(cfg, train_tab, val_tab)
    tr.run(scan_chunk=8)
    assert tr.step == 24
    leaves = jax.tree_util.tree_leaves(tr.state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_training_reduces_color_loss(tiny_setup):
    """Learning sanity: 150 MSE steps must cut the color loss well below
    its initial value (guards against silent optimizer/loss regressions)."""
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(logs, Use_MSE_loss=True, Use_Solar=False,
                    jump_start=False, max_train_steps=300, n_saves=0,
                    batch_size=256, lr=1e-3)
    tr = Trainer(cfg, train_tab, val_tab)
    from season_nerf_tpu.train import phases as pl
    tr._enter_phase(pl.phase_at(tr.phases, 0))
    first = None
    for i in range(300):
        tr.rng, k = jax.random.split(tr.rng)
        tr.state, sc = tr._step_fn(tr.state, k)
        if i == 0:
            first = float(jax.device_get(sc)["Color"])
    last = float(jax.device_get(sc)["Color"])
    assert last < first * 0.5, (first, last)


def test_weighted_ray_sampling(tmp_path):
    """weight_training_samples biases batch sampling toward high-weight
    images (inverse-CDF gather in the jitted step)."""
    from season_nerf_tpu.data.rays import camera_weights, build_ray_table
    scene = make_scene(n_views=4, img_size=16, grid=24, seed=11)
    w = np.array([4.0, 0.1, 0.1, 0.1])   # image 0 heavily upweighted
    table = build_ray_table(scene.cameras, scene.images, weights=w)
    cfg = _tiny_cfg(str(tmp_path), max_train_steps=4, jump_start=False,
                    weight_training_samples=True, n_saves=0)
    tr = Trainer(cfg, table, None)
    from season_nerf_tpu.train import phases as pl
    tr._enter_phase(pl.phase_at(tr.phases, 0))
    # sample a batch through the step's gather logic by stepping once and
    # checking the weighted CDF exists; then check empirical bias directly
    w_rows = np.asarray(table.rows[:, 18])
    cdf = np.cumsum(w_rows) / w_rows.sum()
    rng = np.random.default_rng(0)
    idx = np.searchsorted(cdf, rng.random(4096))
    frac_img0 = np.mean(np.asarray(table.img_ids)[np.clip(idx, 0, len(cdf)-1)] == 0)
    assert frac_img0 > 0.8          # 4/(4+0.3) ~ 0.93 expected
    tr.rng, k = jax.random.split(tr.rng)
    tr.state, sc = tr._step_fn(tr.state, k)   # runs the weighted gather
    assert np.isfinite(float(jax.device_get(sc)["Total"]))


def test_phase4_keepalive_barron(tiny_setup):
    """phase4_keepalive_barron: the keepalive term becomes the Barron
    adaptive alpha NLL (Alpha_Adjust_ada) with the same linearly-decaying
    weight, fresh alpha latents exist in phase 4, and the MSE diagnostic is
    logged detached (weight 1, stop-gradient, matching the prior-phase
    convention)."""
    from season_nerf_tpu.train.losses import season_nerf_loss

    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg("", n_saves=0, phase4_prior_keepalive=0.25,
                    phase4_keepalive_barron=True, max_train_steps=20)
    tr = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm)
    tr.run(scan_chunk=1)
    s = tr._phase_statics
    assert tr._phase.index == 4 and not s.use_prior
    assert s.alpha_cfg is not None           # fresh latents in phase 4
    assert "alpha" in tr.state.ada_params

    batch = {"top": jnp.asarray(train_tab.rows[:8, 2:5]),
             "bot": jnp.asarray(train_tab.rows[:8, 5:8]),
             "sun": jnp.asarray(train_tab.rows[:8, 8:11]),
             "t4": jnp.asarray(train_tab.rows[:8, 11:15]),
             "gt_rgb": jnp.asarray(train_tab.rows[:8, 19:22])}
    variables = {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats}

    def losses_at(step):
        _, (losses, _) = season_nerf_loss(
            tr.model, variables, tr.state.ada_params, s, batch,
            jax.random.PRNGKey(0), step=jnp.asarray(step), train=True,
            prior_hm=tr.prior_hm, mutable=True)
        return losses

    ls = losses_at(s.phase_start)
    assert "Alpha_Adjust_ada" in ls
    assert np.isclose(float(ls["Alpha_Adjust_ada"][1]), 0.25)
    assert np.isfinite(float(ls["Alpha_Adjust_ada"][0]))
    # decays to exactly 0 at the final step
    assert float(losses_at(s.phase_len)["Alpha_Adjust_ada"][1]) == 0.0
    # MSE diagnostic is detached (gradient-free): weight 1, same key shape
    # as the prior phase's logging convention
    assert float(ls["Alpha_Adjust"][1]) == 1.0

    # the adaptive term actually trains the alpha latents: grads nonzero
    def ada_loss(ada):
        total, _ = season_nerf_loss(
            tr.model, variables, ada, s, batch, jax.random.PRNGKey(0),
            step=jnp.asarray(s.phase_start), train=True,
            prior_hm=tr.prior_hm, mutable=True)
        return total

    g = jax.grad(ada_loss)(tr.state.ada_params)
    assert any(np.abs(np.asarray(leaf)).max() > 0.0
               for leaf in jax.tree_util.tree_leaves(g["alpha"]))


def test_best_geometry_on_decay_selector(tiny_setup, tmp_path):
    """best_geometry_on_decay: healthy run (drift below threshold) keeps
    the reference protocol's last-step weights; a decayed run falls back to
    the best-geometry save point — both recorded in the artifact meta."""
    scene, train_tab, val_tab, logs = tiny_setup
    cfg = _tiny_cfg(str(tmp_path),
                    final_model_selection="best_geometry_on_decay",
                    geometry_decay_threshold=0.10)
    tr = Trainer(cfg, train_tab, val_tab, prior_hm=scene.prior_hm,
                 gt_dsm=scene.hm)
    tr.run()
    assert len(tr._save_geometry) == len(tr.save_steps)
    first_save = min(tr.save_steps)

    # healthy: last == best (drift 0) -> last-step weights
    tr._save_geometry = [(s, 1.0) for s, _ in tr._save_geometry]
    tr.finalize()
    _, meta = state_lib.restore_variables(
        tr.variables_template, os.path.join(str(tmp_path), "Final_Model.nn"))
    assert meta["selection"] == "best_geometry_on_decay"
    assert meta["selected_step"] == tr.step
    assert meta["geometry_drift"] == 0.0

    # decayed: last 50% above the best -> fall back to the best save point
    tr._save_geometry = [(s, 1.0 if s == first_save else 1.5)
                         for s, _ in tr._save_geometry]
    tr.finalize()
    variables, meta = state_lib.restore_variables(
        tr.variables_template, os.path.join(str(tmp_path), "Final_Model.nn"))
    assert meta["selected_step"] == first_save
    assert meta["geometry_drift"] > 0.4
    ckpt, _ = state_lib.load_checkpoint(
        os.path.join(str(tmp_path), f"Model_{first_save}.nn"), tr.state)
    for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                    jax.tree_util.tree_leaves(ckpt.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
