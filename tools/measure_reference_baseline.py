#!/usr/bin/env python
"""Measure the PyTorch reference's training-step throughput on THIS host's
CPU, and ours on the same CPU, for an auditable same-hardware ratio.

This environment has no CUDA device (torch is the +cpu wheel), so the
reference's pinned single-GPU stack (pytorch 1.9 + cudatoolkit 10.2,
Season.yml:141) cannot be timed faithfully.  What CAN be measured honestly:

  1. the reference's hot path — T_NeRF forward over 512 rays x 96 samples
     + volume composite + color loss, plus the 512-solar-ray forward_Solar
     pass + solar-correction loss, backward, two Adam steps
     (All_in_One_Eval.get_loss, Eval_Tools_2.py:340-459; step,
     Net_Tool_2.py:133-145) — on torch CPU.  The Barron adaptive NLL is
     replaced by MSE (robust_loss_pytorch is not installed); its FLOP count
     is negligible next to the 3.2M-param MLP over 98k points.
  2. our jitted train step (same budget, same losses modulo the same
     MSE substitution: Use_MSE_loss config) — on jax CPU.

Writes one JSON line with both rays/s numbers and the ratio.  See
BASELINE.md "Measured baseline" for the recorded results and how the
nominal GPU number in bench.py is derived from them.
"""

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
BATCH = 512          # reference default (opt2.py:72)
N_SAMPLES = 96       # reference default (opt2.py:68)
FC = 512             # reference default (opt2.py:79)


def _stub_reference_deps():
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


def measure_reference(steps=3, warmup=1):
    """Reference T_NeRF training step on torch CPU -> rays/s."""
    import torch
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub_reference_deps()
    from T_NeRF_Full_2.T_NeRF_net_v2 import T_NeRF

    torch.manual_seed(0)
    net = T_NeRF(FC, n_classes=4)
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=10 ** -4.86)

    g = torch.Generator().manual_seed(1)
    def rand_pts(n):
        return torch.rand((n, 3), generator=g) * 2 - 1

    def one_step():
        opt.zero_grad()
        # color pass: BATCH rays x N_SAMPLES points, full forward
        pts = rand_pts(BATCH * N_SAMPLES)
        sun = torch.nn.functional.normalize(
            torch.rand((BATCH, 3), generator=g) + 0.1, dim=1)
        sun_flat = sun[:, None, :].expand(BATCH, N_SAMPLES, 3).reshape(-1, 3)
        ang = torch.rand((BATCH, 2), generator=g) * 6.28
        t4 = torch.stack([torch.cos(ang[:, 0]), torch.sin(ang[:, 0]),
                          torch.cos(ang[:, 1]), torch.sin(ang[:, 1])], 1)
        t4_flat = t4[:, None, :].expand(BATCH, N_SAMPLES, 4).reshape(-1, 4)
        rho, col, vis, sky, _cls, _adj = net(pts, sun_flat, t4_flat)
        rho = rho.reshape(BATCH, N_SAMPLES, 1)
        col = col.reshape(BATCH, N_SAMPLES, 3)
        delta = torch.full_like(rho, 2.0 / N_SAMPLES)
        tau = torch.cumsum(rho * delta, 1)
        pv = torch.exp(-torch.cat([torch.zeros_like(tau[:, :1]),
                                   tau[:, :-1]], 1))
        ps = pv * (1 - torch.exp(-rho * delta))
        rendered = (ps * col).sum(1)
        loss = ((rendered - torch.rand((BATCH, 3), generator=g)) ** 2).mean()
        # solar pass: BATCH solar rays, frozen-trunk forward_Solar
        spts = rand_pts(BATCH * N_SAMPLES)
        ssun = sun[:, None, :].expand(BATCH, N_SAMPLES, 3).reshape(-1, 3)
        st4 = t4[:, None, :].expand(BATCH, N_SAMPLES, 4).reshape(-1, 4)
        srho, svis, _ssky = net.forward_Solar(spts, ssun, st4)
        srho = srho.reshape(BATCH, N_SAMPLES, 1)
        svis = svis.reshape(BATCH, N_SAMPLES, 1)
        stau = torch.cumsum(srho * delta, 1)
        spv = torch.exp(-torch.cat([torch.zeros_like(stau[:, :1]),
                                    stau[:, :-1]], 1)).detach()
        loss = loss + 0.03 * ((svis - spv) ** 2).sum(1).mean()
        loss.backward()
        opt.step()

    for _ in range(warmup):
        one_step()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return BATCH * steps / dt


def measure_ours(steps=8, chunk=4):
    """Our jitted train step (Use_MSE_loss config) on jax CPU -> rays/s."""
    import jax
    from season_nerf_tpu.config import Config
    from season_nerf_tpu.data.synthetic import make_scene, scene_ray_tables
    from season_nerf_tpu.train.engine import Trainer
    from season_nerf_tpu.train import phases as phase_lib

    cfg = Config(max_train_steps=50_000, n_samples=N_SAMPLES,
                 batch_size=BATCH, fc_units=FC, n_saves=0, logs_dir="",
                 jump_start=False, Use_MSE_loss=True, mesh_shape=1)
    scene = make_scene(n_views=4, img_size=32, grid=32, seed=0)
    tt, vt = scene_ray_tables(scene, testing_size=1)
    tr = Trainer(cfg, tt, vt)
    tr._enter_phase(phase_lib.phase_at(tr.phases, 0))
    tr.rng, k = jax.random.split(tr.rng)
    tr.state, _ = tr._multi_step_fn(tr.state, k, chunk)    # compile
    jax.block_until_ready(tr.state.params)
    t0 = time.perf_counter()
    for _ in range(max(steps // chunk, 1)):
        tr.rng, k = jax.random.split(tr.rng)
        tr.state, _ = tr._multi_step_fn(tr.state, k, chunk)
    jax.block_until_ready(tr.state.params)
    dt = time.perf_counter() - t0
    return BATCH * max(steps // chunk, 1) * chunk / dt


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    ref = measure_reference()
    ours = measure_ours()
    print(json.dumps({
        "hardware": "host CPU (no CUDA device in this environment)",
        "config": f"batch {BATCH} color + {BATCH} solar rays, "
                  f"{N_SAMPLES} samples, fc {FC}",
        "reference_torch_cpu_rays_per_sec": round(ref, 1),
        "ours_jax_cpu_rays_per_sec": round(ours, 1),
        "same_hardware_speedup": round(ours / ref, 2),
    }))


if __name__ == "__main__":
    main()
