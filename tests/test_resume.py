"""True training resume: the reference cannot do this (SURVEY.md §5)."""

import os

import numpy as np
import jax
import pytest

from season_nerf_tpu.config import Config
from season_nerf_tpu.data.synthetic import make_scene, scene_ray_tables
from season_nerf_tpu.train.engine import Trainer
from season_nerf_tpu.train import state as state_lib


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene = make_scene(n_views=4, img_size=20, grid=24, seed=5)
    tt, vt = scene_ray_tables(scene, testing_size=1)
    return scene, tt, vt, str(tmp_path_factory.mktemp("logs"))


def _cfg(logs, **kw):
    base = dict(max_train_steps=10, n_samples=8, batch_size=64, fc_units=32,
                n_saves=0, logs_dir=logs)
    base.update(kw)
    return Config(**base)


def test_resume_restores_full_state(setup, tmp_path):
    scene, tt, vt, logs = setup
    cfg = _cfg(logs)
    tr = Trainer(cfg, tt, vt, prior_hm=scene.prior_hm)
    tr.run(n_steps=6)                       # crosses into phase 4 at step 2
    ckpt = str(tmp_path / "mid.nn")
    state_lib.save_checkpoint(ckpt, tr.state, extra=tr._ckpt_extra())

    tr2 = Trainer(cfg, tt, vt, prior_hm=scene.prior_hm)
    tr2.resume(ckpt)
    assert tr2.step == 6
    assert tr2._phase.index == tr._phase.index == 4
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.opt_state),
                    jax.tree_util.tree_leaves(tr2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the PRNG stream continues where the first run left off — resumed
    # batches must not replay the draws from the start of training
    np.testing.assert_array_equal(np.asarray(tr2.rng), np.asarray(tr.rng))
    fresh = Trainer(cfg, tt, vt, prior_hm=scene.prior_hm)
    assert not np.array_equal(np.asarray(tr2.rng), np.asarray(fresh.rng))
    # training continues to completion
    tr2.run()
    assert tr2.step == 10
    leaves = jax.tree_util.tree_leaves(tr2.state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_resume_in_phase_one(setup, tmp_path):
    scene, tt, vt, logs = setup
    cfg = _cfg(logs, max_train_steps=20)    # phase 1 = first 4 steps
    tr = Trainer(cfg, tt, vt, prior_hm=scene.prior_hm)
    tr.run(n_steps=2)
    ckpt = str(tmp_path / "p1.nn")
    state_lib.save_checkpoint(ckpt, tr.state, extra=tr._ckpt_extra())
    tr2 = Trainer(cfg, tt, vt, prior_hm=scene.prior_hm)
    tr2.resume(ckpt)
    assert tr2._phase.index == 1
    assert "alpha" in tr2.state.ada_params   # prior-phase adaptive loss
    tr2.run(n_steps=4)                       # crosses the boundary cleanly
    assert tr2._phase.index == 4


def test_profile_trace(setup, tmp_path):
    scene, tt, vt, logs = setup
    cfg = _cfg(logs, max_train_steps=6, jump_start=False)
    tr = Trainer(cfg, tt, vt)
    d = tr.profile_steps(str(tmp_path / "trace"), n_steps=2)
    assert os.path.isdir(d)
    assert any(os.scandir(d))               # trace files were written


def test_resume_adopts_recorded_trajectory_settings(tmp_path):
    """Resuming an unfinished run keeps the run's recorded arithmetic:
    a dir trained under float32/exact-sin must not silently finish under
    newer defaults (and the new opts.json dump must carry the recorded
    values, not destroy them)."""
    logs = str(tmp_path / "run")
    os.makedirs(logs)
    old = Config(logs_dir=logs, compute_dtype="float32", fast_sine=False,
                 fc_units=64, max_train_steps=50)
    old.save_json()
    open(os.path.join(logs, "Model_30.nn"), "wb").close()

    cfg = Config(logs_dir=logs, max_train_steps=80)   # today's defaults
    with pytest.warns(UserWarning, match="recorded opts.json wins"):
        cfg.adopt_resume_settings()
    assert cfg.compute_dtype == "float32"
    assert cfg.fast_sine is False
    assert cfg.fc_units == 64
    assert cfg.max_train_steps == 80      # extending the run stays allowed

    # --no-resume: the new settings stand, no warning
    cfg2 = Config(logs_dir=logs, resume=False)
    cfg2.adopt_resume_settings()
    assert cfg2.compute_dtype == "bfloat16" and cfg2.fast_sine is True

    # a dir with opts.json but no checkpoints is a fresh run
    logs3 = str(tmp_path / "fresh")
    os.makedirs(logs3)
    Config(logs_dir=logs3, fast_sine=False).save_json()
    cfg3 = Config(logs_dir=logs3)
    cfg3.adopt_resume_settings()
    assert cfg3.fast_sine is True
