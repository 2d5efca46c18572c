"""Dataset-overview and season-grid figures.

Equivalent capability to ``Generate_Summary_Images/``:
- ``angle_scatter``: satellite + sun pose scatter (gen_angle_images,
  mg_walk_through_P_imgs.py:97-195);
- ``proto_time_plot``: polar plot of capture times + prototype thumbnails
  (show_proto_images, :250-294);
- ``season_sun_grid``: season x sun render grid (gen_sum,
  mg_generate_sum_img.py:9-55);
- ``best_time_match``: EM-minimizing render time for a target image
  (get_opt_time_img, :106-156).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from season_nerf_tpu.eval.emd import color_signature, emd_exact


def angle_scatter(cams: Sequence, test_idx: Sequence[int], output_path: str,
                  walk_view: Optional[np.ndarray] = None,
                  walk_sun: Optional[np.ndarray] = None):
    """Sun + view angle scatter for the dataset (+ optional walk points)."""
    test_idx = set(test_idx)
    fig, axes = plt.subplots(1, 2, figsize=(10, 5),
                             subplot_kw={"projection": "polar"})
    for ax, kind in zip(axes, ("view", "sun")):
        for i, c in enumerate(cams):
            el, az = (c.view_el_az if kind == "view" else c.sun_el_az)
            ax.scatter(np.deg2rad(az), 90 - el,
                       c=("tab:red" if i in test_idx else "tab:blue"),
                       s=40)
        walk = walk_view if kind == "view" else walk_sun
        if walk is not None and len(walk):
            ax.scatter(np.deg2rad(walk[:, 1]), 90 - walk[:, 0], marker="x",
                       c="tab:green", s=30)
        ax.set_title(f"{kind} angles (radius = off-nadir deg)")
        ax.set_rmax(90)
    fig.tight_layout()
    fig.savefig(output_path, dpi=110)
    plt.close(fig)


def proto_time_plot(cams: Sequence, train_idx, test_idx, proto_idx,
                    walk_times: np.ndarray, output_path: str):
    """Polar year-clock of capture times + prototype image thumbnails."""
    proto_idx = list(proto_idx)
    n_extra = len(proto_idx)
    fig = plt.figure(figsize=(4 * (1 + n_extra), 4.5))
    ax = fig.add_subplot(1, n_extra + 1, 1, projection="polar")
    for idx_set, color in ((train_idx, "tab:blue"), (test_idx, "tab:red")):
        for i in idx_set:
            ax.scatter(2 * np.pi * cams[i].time_frac, 1.0, c=color, s=40)
    for t in np.atleast_1d(walk_times):
        ax.scatter(2 * np.pi * t, 0.8, marker="x", c="tab:green", s=25)
    ax.set_yticks([])
    ax.set_xticks(np.linspace(0, 2 * np.pi, 12, endpoint=False))
    ax.set_xticklabels(["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
                        "Aug", "Sep", "Oct", "Nov", "Dec"])
    ax.set_title("capture times")
    for k, i in enumerate(proto_idx):
        axi = fig.add_subplot(1, n_extra + 1, k + 2)
        if cams[i].image is not None:
            axi.imshow(np.clip(cams[i].image, 0, 1))
        axi.set_xticks([])
        axi.set_yticks([])
        axi.set_title(f"t={cams[i].time_frac:.2f}")
    fig.tight_layout()
    fig.savefig(output_path, dpi=110)
    plt.close(fig)


def season_sun_grid(renderer, times: Sequence[float],
                    sun_angles: Sequence, view_el_az, out_size: int,
                    output_path: str, angles_to_vec=None):
    """Season x sun render grid (gen_sum, mg_generate_sum_img.py:9-55)."""
    T, S = len(times), len(sun_angles)
    fig, axes = plt.subplots(S, T, figsize=(2.2 * T, 2.2 * S),
                             squeeze=False)
    for j, sun in enumerate(sun_angles):
        for i, t in enumerate(times):
            out = renderer.render_img(view_el_az, tuple(sun), float(t),
                                      out_size, angles_to_vec=angles_to_vec)
            axes[j][i].imshow(np.clip(out["Col_Img"], 0, 1))
            axes[j][i].set_xticks([])
            axes[j][i].set_yticks([])
            if j == 0:
                axes[j][i].set_title(f"t={t:.2f}")
        axes[j][0].set_ylabel(f"sun {sun[0]:.0f}/{sun[1]:.0f}")
    fig.tight_layout()
    fig.savefig(output_path, dpi=110)
    plt.close(fig)
    return output_path


def best_time_match(renderer, target_img: np.ndarray, view_el_az, sun_el_az,
                    out_size: int, n_times: int = 26, angles_to_vec=None):
    """EM-minimizing render time for a target image (get_opt_time_img,
    mg_generate_sum_img.py:106-156).  Returns (best_time, best_img, dists)."""
    target_sig = color_signature(target_img)
    ts = np.linspace(0, 1, n_times, endpoint=False)
    best = (None, None, np.inf)
    dists = []
    for t in ts:
        out = renderer.render_img(view_el_az, sun_el_az, float(t), out_size,
                                  angles_to_vec=angles_to_vec)
        sig = color_signature(out["Col_Img"])
        d = emd_exact(target_sig, sig)
        dists.append(d)
        if d < best[2]:
            best = (float(t), out["Col_Img"], d)
    return best[0], best[1], np.array(dists)
