"""Direct unit tests for the small report/logging/dataset utilities.

These modules are exercised indirectly by the e2e suites; the tests here pin
their contracts in isolation so regressions localize:

- ``data/dataset.DeviceRayDataset`` — the device-resident batch sampler that
  replaces the reference's torch DataLoader workers (mg_run_NeRF.py:74-82).
- ``eval/reports`` — the text+LaTeX table writers mirroring the reference's
  tabulate-based reports (mg_HM_Eval.py:126-340, mg_merge_HM.py:92-96).
- ``utils/logging.MetricWriter`` — TensorBoard/JSONL scalar writer with the
  reference's tag layout (mg_run_NeRF.py:288-338).
"""

import json
import os

import jax
import numpy as np

from season_nerf_tpu.data.dataset import DeviceRayDataset
from season_nerf_tpu.data.rays import RayTable
from season_nerf_tpu.eval import reports
from season_nerf_tpu.utils.logging import MetricWriter


def _tiny_table(n_rows=64, n_imgs=4, seed=0):
    rng = np.random.default_rng(seed)
    rows = rng.standard_normal((n_rows, 22)).astype(np.float32)
    img_ids = rng.integers(0, n_imgs, n_rows).astype(np.int32)
    return RayTable(
        rows=rows,
        img_ids=img_ids,
        img_names=[f"img_{i}" for i in range(n_imgs)],
        img_sizes=np.full((n_imgs, 2), 16, np.int32),
        sun_vecs=np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n_imgs, 1)),
        time_encs=rng.standard_normal((n_imgs, 4)).astype(np.float32),
    )


class TestDeviceRayDataset:
    def test_sample_shape_and_membership(self):
        table = _tiny_table()
        ds = DeviceRayDataset(table)
        batch = ds.sample(jax.random.PRNGKey(0), 16)
        assert batch.shape == (16, 22)
        # every sampled row must be an actual table row
        rows = np.asarray(ds.rows)
        got = np.asarray(batch)
        for r in got:
            assert (np.abs(rows - r).max(axis=1) < 1e-6).any()

    def test_sample_is_deterministic_in_key(self):
        ds = DeviceRayDataset(_tiny_table())
        a = np.asarray(ds.sample(jax.random.PRNGKey(7), 8))
        b = np.asarray(ds.sample(jax.random.PRNGKey(7), 8))
        c = np.asarray(ds.sample(jax.random.PRNGKey(8), 8))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_sample_dict_contract(self):
        ds = DeviceRayDataset(_tiny_table())
        d = ds.sample_dict(jax.random.PRNGKey(0), 4)
        assert set(d) == {"img_pt", "top", "bot", "view", "sun", "t4",
                          "weight", "gt_rgb"}
        assert d["top"].shape == (4, 3)
        assert d["weight"].shape == (4, 1)

    def test_epoch_batches_cover_table_once(self):
        table = _tiny_table(n_rows=50)
        ds = DeviceRayDataset(table)
        chunks = list(ds.epoch_batches(16))
        assert sum(c.shape[0] for c in chunks) == 50
        np.testing.assert_array_equal(np.concatenate(chunks), table.rows)

    def test_sample_jits(self):
        ds = DeviceRayDataset(_tiny_table())
        f = jax.jit(lambda k: ds.sample(k, 8))
        out = f(jax.random.PRNGKey(0))
        assert out.shape == (8, 22)


class TestReports:
    def test_text_table(self):
        headers = ["name", "value"]
        rows = [["a", 1.0], ["longer", 2.25]]
        txt = reports.text_table(headers, rows)
        lines = txt.splitlines()
        assert "name" in lines[0] and "value" in lines[0]
        assert any("2.25" in ln for ln in lines)

    def test_text_table_fallback_alignment(self, monkeypatch):
        # force the no-tabulate fallback path
        import builtins
        real_import = builtins.__import__

        def block_tabulate(name, *a, **k):
            if name == "tabulate":
                raise ImportError(name)
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", block_tabulate)
        txt = reports.text_table(["name", "value"],
                                 [["a", 1.0], ["longer", 2.25]])
        lines = txt.splitlines()
        assert lines[1].startswith("-")
        assert any("2.2500" in ln for ln in lines)

    def test_latex_rows(self):
        out = reports.latex_rows([["a", 1.0], ["b", 2.5]])
        assert out.splitlines() == [r"a & 1.0000 \\", r"b & 2.5000 \\"]

    def test_hm_report_with_prior(self, tmp_path):
        path = str(tmp_path / "hm.txt")
        scores = {"MAE": 1.0, "RMSE": 2.0, "Acc_1_m": 0.5, "Median": 0.9}
        reports.hm_report(path, scores, scores, prior_scores=scores)
        body = open(path).read()
        assert "Prior DSM" in body and "NeRF (aligned)" in body
        assert "LaTeX:" in body and r"\\" in body

    def test_image_and_shadow_and_season_reports(self, tmp_path):
        img_summary = {"full": {"PSNR": {"avg": 20.0, "best": 25.0,
                                         "worst": 15.0},
                                "SSIM": {"avg": 0.8}, "EM": {"avg": 1.0},
                                "L2": {"avg": 0.01}}}
        reports.image_report(str(tmp_path / "img.txt"), img_summary)
        assert "PSNR best" in open(tmp_path / "img.txt").read()

        stats = {"set0": {"Acc": 0.9, "Prec_Sun": 0.8, "Recall_Sun": 0.7,
                          "Prec_Shadow": 0.6, "Recall_Shadow": 0.5,
                          "Avg_Error": 0.1, "Avg_Offset": 0.2}}
        reports.shadow_report(str(tmp_path / "sh.txt"), stats)
        assert "Recall shadow" in open(tmp_path / "sh.txt").read()

        stability = {"Stats": {"mean": 1.0, "median": 0.9, "p95": 2.0,
                               "max": 3.0}}
        baseline = np.array([1.0, np.nan, 2.0])
        reports.season_report(str(tmp_path / "se.txt"), stability, baseline)
        body = open(tmp_path / "se.txt").read()
        assert "Prototype baseline EM" in body

    def test_season_report_all_nan_baseline(self, tmp_path):
        stability = {"Stats": {"mean": 1.0, "median": 0.9, "p95": 2.0,
                               "max": 3.0}}
        reports.season_report(str(tmp_path / "se.txt"), stability,
                              np.full(3, np.nan))
        assert "Prototype baseline EM" not in open(tmp_path / "se.txt").read()


class TestMetricWriter:
    def test_noop_writer(self):
        w = MetricWriter("")
        w.scalar("a", 1.0, 0)  # must not raise
        w.flush()
        w.close()

    def test_jsonl_scalars(self, tmp_path):
        logdir = str(tmp_path / "logs")
        w = MetricWriter(logdir, use_tensorboard=False)
        w.scalar("Training/loss", 0.5, 1)
        w.scalars("Testing", {"psnr": 20.0, "ssim": 0.8}, 2)
        w.image("val/img", np.zeros((4, 4)), 0)  # no-op without TB
        w.close()
        lines = [json.loads(ln) for ln in
                 open(os.path.join(logdir, "metrics.jsonl"))]
        tags = {(ln["tag"], ln["step"]) for ln in lines}
        assert ("Training/loss", 1) in tags
        assert ("Testing/psnr", 2) in tags and ("Testing/ssim", 2) in tags
        assert all(isinstance(ln["value"], float) for ln in lines)

    def test_append_mode_across_writers(self, tmp_path):
        logdir = str(tmp_path / "logs")
        w1 = MetricWriter(logdir, use_tensorboard=False)
        w1.scalar("a", 1.0, 0)
        w1.close()
        w2 = MetricWriter(logdir, use_tensorboard=False)
        w2.scalar("a", 2.0, 1)
        w2.close()
        lines = open(os.path.join(logdir, "metrics.jsonl")).read().splitlines()
        assert len(lines) == 2
