"""CLI-level tests for the user-facing tools/ scripts.

The library functions behind these tools are covered elsewhere; these tests
drive the actual command lines a migrating user runs, catching argument
plumbing and artifact-contract drift:

- ``tools/convert_reference_model.py`` — reference Final_Model.nn (a torch
  state_dict) -> this framework's artifact, verified by forward parity.
- ``tools/make_movie.py`` — keyframed movie rendering from a model dir
  (mg_movie_maker.py CLI story).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _run_tool(script, *args):
    # drop PYTHONPATH: the axon site hook re-registers the TPU platform in
    # child processes, overriding JAX_PLATFORMS=cpu (see tests/conftest.py)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        capture_output=True, text=True, timeout=900, env=env)


@pytest.fixture(scope="module")
def ref_state_dict_file(tmp_path_factory):
    """A genuine reference-architecture state_dict saved the way the
    reference saves Final_Model.nn (torch.save)."""
    torch = pytest.importorskip("torch")
    from tests.conftest import reference_import_sandbox
    with reference_import_sandbox():
        if REF not in sys.path:
            sys.path.insert(0, REF)
        import types

        class _Stub(types.ModuleType):
            def __getattr__(self, name):
                if name.startswith("__"):
                    raise AttributeError(name)
                return type(name, (), {})

        for name in ("gdal", "sewar", "sewar.full_ref",
                     "image_similarity_measures",
                     "image_similarity_measures.quality_metrics",
                     "maxflow", "maxflow.fastmin", "hsluv", "rpcm", "astropy",
                     "astropy.coordinates", "astropy.time", "astropy.units",
                     "robust_loss_pytorch", "tensorboard", "pyfftw"):
            sys.modules.setdefault(name, _Stub(name))
        try:
            from T_NeRF_Full_2.T_NeRF_net_v2 import T_NeRF as RefTNeRF
        except Exception as e:
            pytest.skip(f"reference model not importable: {e}")
        torch.manual_seed(3)
        net = RefTNeRF(64, n_classes=4)
        net.eval()
        path = tmp_path_factory.mktemp("refckpt") / "Final_Model.nn"
        torch.save(net.state_dict(), str(path))
        yield torch, net, str(path)


def test_convert_reference_model_cli(ref_state_dict_file, tmp_path):
    torch, net, ckpt = ref_state_dict_file
    out = str(tmp_path / "converted" / "Final_Model.nn")
    res = _run_tool("convert_reference_model.py", "--torch_model", ckpt,
                    "--fc_units", "64", "--n_classes", "4", "--out", out)
    assert res.returncode == 0, res.stderr
    assert os.path.exists(out)

    import jax
    import jax.numpy as jnp
    from season_nerf_tpu.models.tnerf import TNeRF
    from season_nerf_tpu.train.state import restore_variables

    model = TNeRF(layer_width=64, n_classes=4)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)),
                          jnp.zeros((2, 3)), jnp.zeros((2, 4)), train=False)
    variables, meta = restore_variables(template, out)
    assert meta["fc_units"] == 64 and meta["converted_from"] == ckpt

    # forward parity through the converted artifact
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    sun = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (16, 1))
    ang = rng.uniform(0, 2 * np.pi, (16, 2))
    t4 = np.stack([np.cos(ang[:, 0]), np.sin(ang[:, 0]),
                   np.cos(ang[:, 1]), np.sin(ang[:, 1])], 1).astype(np.float32)
    ours = model.apply(variables, jnp.asarray(x), jnp.asarray(sun),
                       jnp.asarray(t4), train=False)
    with torch.no_grad():
        rho_t, col_t, vis_t, sky_t = net(torch.from_numpy(x),
                                         torch.from_numpy(sun),
                                         torch.from_numpy(t4))[:4]
    for key, t in zip(("rho", "col", "vis", "sky"),
                      (rho_t, col_t, vis_t, sky_t)):
        np.testing.assert_allclose(np.asarray(ours[key]), t.numpy(),
                                   atol=1e-4, err_msg=key)


def test_make_movie_cli_keyframes(tiny_model_dir, tmp_path):
    out = str(tmp_path / "movie.gif")
    res = _run_tool("make_movie.py", "--Model_Location", tiny_model_dir,
                    "--out", out, "--frames", "3", "--size", "16",
                    "--keyframe", "80,0,40,180,0.0",
                    "--keyframe", "70,180,50,180,1.0")
    assert res.returncode == 0, res.stderr
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_make_movie_cli_pose_keyframes(tiny_model_dir, tmp_path):
    out = str(tmp_path / "pose.gif")
    res = _run_tool("make_movie.py", "--Model_Location", tiny_model_dir,
                    "--out", out, "--frames", "3", "--size", "16",
                    "--pose_keyframe=-0.5,0.0,0.9,-60,0,35,40,180,0.0",
                    "--pose_keyframe=0.5,0.0,0.9,-60,180,35,40,180,1.0")
    assert res.returncode == 0, res.stderr
    assert os.path.exists(out) and os.path.getsize(out) > 0


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
def test_cross_eval_reference_real_branch(dfc_site):
    """tools/cross_eval_reference.py on a REAL (DFC-format) model dir: the
    round-4 tool SystemExit'ed on non-SYNTH sites; the real branch now
    re-preprocesses the cached site and scores the trained holdout with the
    reference's own eval code.  Asserts the scorer-identity bound holds on
    the real-camera path too."""
    import json
    from season_nerf_tpu.config import Config
    from season_nerf_tpu import cli

    io_root, site = dfc_site
    logs = os.path.join(io_root, "Logs", f"{site}_xeval")
    if not os.path.exists(os.path.join(logs, "Final_Model.nn")):
        cfg = Config(site_name=site, exp_name=f"{site}_xeval",
                     IO_Location=io_root, max_train_steps=6, n_samples=8,
                     batch_size=64, fc_units=32, chunk=2048, n_saves=0,
                     testing_size=1, jump_start=False,
                     img_training_downscale=16, skip_Bundle_Adjust=True)
        cfg.resolve_dirs()
        cfg.save_json()
        cli.run_test(cfg, eval_img_size=(10, 10), eval_season_size=(8, 8))
    out = os.path.join(logs, "cross_eval.json")
    res = _run_tool("cross_eval_reference.py", logs, "-o", out,
                    "--img_size", "16", "--img_samples", "16",
                    "--hm_samples", "24", "--hm_grid", "24")
    assert res.returncode == 0, res.stderr[-2000:]
    with open(out) as f:
        rep = json.load(f)
    assert rep["images"], "no test cameras scored"
    for name, tbl in rep["images"].items():
        ref_tbl = np.asarray(tbl["reference"])
        our_tbl = np.asarray(tbl["ours"])
        assert np.isfinite(ref_tbl).all() and np.isfinite(our_tbl).all()
        # scorer identity on the real-camera path: PSNR within 0.5 dB,
        # SSIM within 0.02 on every protocol row
        assert np.max(np.abs(ref_tbl[:, 1] - our_tbl[:, 1])) < 0.5, name
        assert np.max(np.abs(ref_tbl[:, 2] - our_tbl[:, 2])) < 0.02, name
    hm = rep["hm"]["MAE"]
    assert np.isfinite(hm["reference_before"])
    # before-alignment rows are the documented comparable ones
    assert abs(hm["reference_before"] - hm["ours_before"]) < 0.3
