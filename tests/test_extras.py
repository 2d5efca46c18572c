"""HSLuv conversion, inverse-density weighting, fine importance sampling."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from season_nerf_tpu.utils import hsluv
from season_nerf_tpu.data.rays import inverse_density_weights, camera_weights
from season_nerf_tpu.data.synthetic import make_scene
from season_nerf_tpu.models.tnerf import TNeRF
from season_nerf_tpu.ops import rendering


# --- HSLuv -------------------------------------------------------------

def test_hsluv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.random((64, 3))
    back = hsluv.hsluv_to_rgb(hsluv.rgb_to_hsluv(rgb))
    np.testing.assert_allclose(back, rgb, atol=1e-6)


def test_hsluv_known_values():
    # white: L=100, S=0; black: L=0
    w = hsluv.rgb_to_hsluv([[1.0, 1.0, 1.0]])[0]
    assert w[2] > 99.99 and w[1] < 1e-4
    b = hsluv.rgb_to_hsluv([[0.0, 0.0, 0.0]])[0]
    assert b[2] < 1e-6
    # pure red: hue ~12.2 deg, S ~100, L ~53.2 (published HSLuv values)
    r = hsluv.rgb_to_hsluv([[1.0, 0.0, 0.0]])[0]
    np.testing.assert_allclose(r, [12.177, 100.0, 53.237], atol=0.05)


def test_hsluv_normalized_range():
    rng = np.random.default_rng(1)
    h = hsluv.rgb_to_hsluv_normalized(rng.random((32, 32, 3)))
    assert (h >= 0).all() and (h <= 1).all()
    back = hsluv.hsluv_normalized_to_rgb(h)
    assert back.shape == (32, 32, 3)


# --- weighting ----------------------------------------------------------

def test_inverse_density_weights_favor_isolated():
    # three clustered points + one isolated: the isolated one gets the
    # largest weight
    X = np.array([[0.1], [0.11], [0.12], [0.9]])
    w = inverse_density_weights(X, [0.0], [1.0], [False])
    assert w[3] == w.max()
    np.testing.assert_allclose(w.sum(), 4.0, rtol=1e-9)


def test_inverse_density_weights_circular_wrap():
    # 0.02 and 0.98 are close on the year circle: with wrap they share the
    # cluster penalty, without it the 0.98 point looks isolated
    X = np.array([[0.0], [0.02], [0.98], [0.5]])
    w_circ = inverse_density_weights(X, [0.0], [1.0], [True])
    w_lin = inverse_density_weights(X, [0.0], [1.0], [False])
    assert w_circ[3] == w_circ.max()          # 0.5 is the isolated one
    assert w_lin[2] > w_circ[2]               # wrap reduces 0.98's isolation


def test_camera_weights(tmp_path):
    scene = make_scene(n_views=5, img_size=16, grid=24, seed=0)
    w = camera_weights(scene.cameras)
    assert w.shape == (5,)
    np.testing.assert_allclose(w.sum(), 5.0, rtol=1e-9)
    assert (w > 0).all()


# --- importance sampling -------------------------------------------------

def test_eval_rays_with_importance():
    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    R = 8
    xy = jax.random.uniform(jax.random.PRNGKey(1), (R, 2), minval=-1,
                            maxval=1)
    tops = jnp.concatenate([xy, jnp.ones((R, 1))], 1)
    bots = jnp.concatenate([xy, -jnp.ones((R, 1))], 1)
    sun = jnp.broadcast_to(jnp.asarray([0.0, 0, 1.0]), (R, 3))
    t4 = jnp.ones((R, 4))
    out, _ = rendering.eval_rays(
        model, variables, jax.random.PRNGKey(2), tops, bots, sun, t4,
        n_samples=8, n_importance=4, train=True, mutable=True)
    assert out["rho"].shape == (R, 12, 1)
    assert out["rendered"].shape == (R, 3)
    assert np.isfinite(np.asarray(out["rendered"])).all()
    # per-ray sample points are sorted along the ray (z decreasing)
    z = np.asarray(out["pts"])[..., 2]
    assert (np.diff(z, axis=1) <= 1e-5).all()


def test_watchdog_restarts_stalled_run(tmp_path):
    """tools/watchdog_train.py kills a run whose heartbeat goes stale and
    relaunches it; a second attempt that exits 0 ends the loop."""
    import subprocess
    import sys
    import os
    fake = tmp_path / "fake.py"
    fake.write_text(
        "import os, sys, time\n"
        "d = sys.argv[1]\n"
        "hb = os.path.join(d, 'heartbeat')\n"
        "m = os.path.join(d, 'attempt')\n"
        "k = int(open(m).read()) if os.path.exists(m) else 0\n"
        "open(m, 'w').write(str(k + 1))\n"
        "if k >= 1:\n"
        "    sys.exit(0)\n"
        "for _ in range(5):\n"
        "    open(hb, 'w').close(); os.utime(hb); time.sleep(0.1)\n"
        "time.sleep(600)\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wd = os.path.join(root, "tools", "watchdog_train.py")
    r = subprocess.run(
        [sys.executable, wd, "--logs_dir", str(tmp_path),
         "--stall_sec", "5", "--grace_sec", "30", "--poll_sec", "1", "--",
         sys.executable, str(fake), str(tmp_path)],
        capture_output=True, text=True, timeout=180)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "[watchdog] stall" in r.stdout
    assert (tmp_path / "attempt").read_text() == "2"


def test_heartbeat_utility(tmp_path):
    from season_nerf_tpu.utils import heartbeat
    p = str(tmp_path / "hb")
    heartbeat.set_path(p)
    heartbeat.beat()
    assert os.path.exists(p)
    t0 = os.path.getmtime(p)
    import time
    time.sleep(0.05)
    heartbeat.beat()
    assert os.path.getmtime(p) >= t0
    heartbeat.set_path(None)   # leave no global state for other tests


def test_compile_cache_configured(tmp_path):
    """enable_compile_cache (called by the CLI entry, not by mere Config
    construction) points the persistent XLA compile cache at
    <IO_Location>/Cache/jax (restart/resume robustness)."""
    from season_nerf_tpu.config import Config
    import jax
    prev = jax.config.jax_compilation_cache_dir
    try:
        cfg = Config(IO_Location=str(tmp_path), exp_name="x")
        cfg.resolve_dirs()
        # resolving dirs alone must NOT mutate global jax state
        assert jax.config.jax_compilation_cache_dir == prev
        cfg.enable_compile_cache()
        assert os.path.isdir(os.path.join(str(tmp_path), "Cache", "jax"))
        assert jax.config.jax_compilation_cache_dir == os.path.join(
            str(tmp_path), "Cache", "jax")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_quality_report_parses_tables(tmp_path):
    """tools/quality_report.py turns a run dir's score tables into a
    markdown report with parsed headline numbers."""
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "quality_report", os.path.join(root, "tools", "quality_report.py"))
    qr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(qr)

    d = tmp_path / "run"
    (d / "Output").mkdir(parents=True)
    (d / "Detailed_Output").mkdir()
    (d / "opts.json").write_text(
        '{"exp_name": "t", "max_train_steps": 10, "batch_size": 64, '
        '"n_samples": 8, "fc_units": 32, "fc_layers": 8, '
        '"site_name": "SYNTH_X", "synth_views": 4}')
    (d / "Output" / "Image_scores.txt").write_text(
        "Image quality by variant\n\n"
        "Variant               PSNR avg    PSNR best    PSNR worst    SSIM avg    EM avg    L2 avg\n"
        "------------------  ----------  -----------  ------------  ----------  --------  --------\n"
        "Aligned_Shadow_Img     18.0100      19.5000       16.2000      0.7700    0.1200    0.0500\n"
        "\nLaTeX:\nAligned_Shadow_Img & 18.01 \\\\\n")
    (d / "Detailed_Output" / "HM_scores.txt").write_text(
        "Height-map accuracy (meters)\n\n"
        "Variant            MAE    RMSE    Acc<=1m    Median\n"
        "--------------  ------  ------  ---------  --------\n"
        "NeRF (aligned)  1.1800  1.6000     0.5600    0.8700\n")
    rep = qr.build_report(str(d))
    assert "PSNR 18.01" in rep
    assert "SSIM 0.770" in rep
    assert "MAE 1.18 m" in rep and "56% within 1 m" in rep
    assert "## Image quality" in rep

    # the evidence tools' shared reducer parses the same tables
    import sys
    sys.path.insert(0, root)
    try:
        from tools.report_metrics import arm_metrics
        m = arm_metrics(str(d))
    finally:
        sys.path.remove(root)
    assert m["psnr"] == 18.01 and m["ssim"] == 0.77 and m["em"] == 0.12
    assert m["dsm_mae"] == 1.18 and m["dsm_rmse"] == 1.6
    assert m["dsm_le1m"] == 0.56 and m["dsm_median"] == 0.87


def test_export_render_roundtrip(tmp_path):
    """tools/export_render.py serializes the render kernel (weights baked
    in) into a jax.export blob that a process with NO season_nerf_tpu
    import can deserialize and call, matching the live kernel."""
    import subprocess
    import sys as _sys
    import numpy as np
    import jax
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, root)
    try:
        from tools.export_render import export_render, build_render_fn
    finally:
        _sys.path.remove(root)

    model = TNeRF(layer_width=32, n_classes=4)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((2, 3)),
                           jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    chunk, n_samples = 64, 8
    blob, manifest = export_render(model, variables, n_samples, chunk)
    assert manifest["chunk"] == chunk
    path = tmp_path / "render.jaxexp"
    path.write_bytes(blob)

    rng = np.random.default_rng(0)
    tops = np.concatenate([rng.uniform(-1, 1, (chunk, 2)),
                           np.ones((chunk, 1))], 1).astype(np.float32)
    bots = np.concatenate([tops[:, :2], -np.ones((chunk, 1))],
                          1).astype(np.float32)
    sun = np.tile(np.array([[0.3, 0.2, 0.93]], np.float32), (chunk, 1))
    t4 = np.tile(np.array([[1, 0, 1, 0]], np.float32), (chunk, 1))
    want = jax.jit(build_render_fn(model, variables, n_samples, False))(
        tops, bots, sun, t4)
    np.savez(tmp_path / "io.npz", tops=tops, bots=bots, sun=sun, t4=t4,
             rendered=np.asarray(want["rendered"]),
             height=np.asarray(want["height"]))

    # a clean process (cwd != repo, no repo on sys.path) only needs jax
    check = (
        "import numpy as np\n"
        "from jax import export\n"
        "d = np.load('io.npz')\n"
        "f = export.deserialize(open('render.jaxexp','rb').read())\n"
        "out = f.call(d['tops'], d['bots'], d['sun'], d['t4'])\n"
        "np.testing.assert_allclose(np.asarray(out['rendered']),"
        " d['rendered'], rtol=2e-5, atol=2e-5)\n"
        "np.testing.assert_allclose(np.asarray(out['height']),"
        " d['height'], rtol=2e-5, atol=2e-5)\n"
        "print('clean-process ok')\n")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([_sys.executable, "-c", check], cwd=str(tmp_path),
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "clean-process ok" in r.stdout, r.stderr


def test_apply_overrides_coercion():
    from season_nerf_tpu.config import Config, apply_overrides
    cfg = Config()
    apply_overrides(cfg, ["fc_units=128", "lr=0.001", "use_HSLuv=False",
                          "fast_sine=no", "Use_Solar=1",
                          "mesh_shape=4", "exp_name=abc"])
    assert cfg.fc_units == 128 and isinstance(cfg.fc_units, int)
    assert cfg.lr == 0.001
    assert cfg.use_HSLuv is False          # bool("False") is True — the bug
    assert cfg.fast_sine is False
    assert cfg.Use_Solar is True
    assert cfg.mesh_shape == 4             # None-default int field
    assert cfg.exp_name == "abc"
    apply_overrides(cfg, ["mesh_shape=none"])
    assert cfg.mesh_shape is None
    # 'none' is only legal for Optional fields — lr=none must fail at the
    # override site, not later inside the optimizer
    with pytest.raises(ValueError, match="not Optional"):
        apply_overrides(cfg, ["lr=none"])
    with pytest.raises(ValueError, match="not Optional"):
        apply_overrides(cfg, ["exp_name=none"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["not_a_field=1"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["use_HSLuv=maybe"])
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["missing_equals"])
