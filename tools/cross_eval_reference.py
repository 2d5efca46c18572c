"""Score one of OUR trained model dirs with the REFERENCE's own eval code.

The quality headlines in docs/QUALITY_*.md come from our reimplemented
scorer (eval/img_eval.py, eval/hm_eval.py).  Every metric in it is
unit-tested against an oracle, but the *tables* themselves had never been
computed by the reference's actual code on a model this framework trained.
This tool closes that identity gap:

1. loads a trained model dir (opts.json + Final_Model.nn),
2. converts the weights into the reference's own torch ``T_NeRF``
   (utils/torch_convert.to_state_dict - the tested inverse of the
   torch->flax parity converter),
3. runs the REFERENCE's eval code on torch CPU:
   - ``eval_Rendering`` -> ``Grad_Descent_Seasonal_Align_v3`` ->
     ``eval_img_dict`` (mg_Img_Eval.py:354-414,479-572),
   - ``full_eval_P_img`` per-class render + masked PSNR/SSIM
     (Eval_funcs.py:103-265),
   - ``eval_HM`` incl. the +-1 px / +-5 deg alignment search
     (Eval_funcs.py:298-464),
4. runs OUR harness on the same model at the same protocol sizes,
5. diffs the two tables row by row and writes a JSON artifact.

The reference modules import heavy geo deps (gdal, rpcm, astropy,
sewar, hsluv, pymaxflow) that its pinned conda env provides and this host
lacks; they are stubbed exactly as tests/test_torch_parity.py does.  None
of the stubbed packages participate in the scoring paths exercised here
(RGB models never touch hsluv; the eval path never touches gdal/rpcm).

Run chip-free:  python tools/cross_eval_reference.py MODEL_DIR -o out.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


# --------------------------------------------------------------------------
# reference import machinery
# --------------------------------------------------------------------------

class _Stub(types.ModuleType):
    """Module stub whose attributes resolve to empty classes (the parity
    test's trick for the reference's unused heavy imports)."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return type(name, (), {})


def import_reference():
    """Import the reference eval modules without triggering the package
    __init__ circular-import chains (T_NeRF_Eval_Utils.__init__ pulls
    load.py -> T_NeRF_Full_2.__init__ -> mg_eval -> back).  Bare package
    shells with only __path__ let submodule imports through; the few
    package-level attrs the eval modules use are set explicitly from the
    modules that define them."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    # the reference pins numpy<2 (Season.yml); restore the aliases 2.0
    # removed so its code runs unmodified (process-local, tool-only shim)
    np.NaN = np.nan
    np.float = float
    np.int = int
    np.bool = bool
    np.object = object
    np.float_ = np.float64

    for name in ("gdal", "sewar", "sewar.full_ref",
                 "image_similarity_measures",
                 "image_similarity_measures.quality_metrics",
                 "maxflow", "maxflow.fastmin", "rpcm", "astropy",
                 "astropy.coordinates", "astropy.time", "astropy.units",
                 "robust_loss_pytorch", "tensorboard", "pyfftw"):
        sys.modules.setdefault(name, _Stub(name))

    # real hsluv functions (our validated implementation) in case a scored
    # model was trained with use_HSLuv; inert for RGB models
    hsluv_mod = types.ModuleType("hsluv")
    from season_nerf_tpu.utils import hsluv as our_hsluv
    hsluv_mod.hsluv_to_rgb = lambda hsl: list(
        np.asarray(our_hsluv.hsluv_to_rgb(np.asarray(hsl)[None]))[0])
    hsluv_mod.rgb_to_hsluv = lambda rgb: list(
        np.asarray(our_hsluv.rgb_to_hsluv(np.asarray(rgb)[None]))[0])
    sys.modules.setdefault("hsluv", hsluv_mod)

    # modern scipy dropped the legacy import paths the reference pins
    import scipy.ndimage
    if "scipy.ndimage.interpolation" not in sys.modules:
        legacy = types.ModuleType("scipy.ndimage.interpolation")
        legacy.rotate = scipy.ndimage.rotate
        legacy.shift = scipy.ndimage.shift
        sys.modules["scipy.ndimage.interpolation"] = legacy
    import scipy.spatial
    if not hasattr(scipy.spatial, "kdtree") or \
            "scipy.spatial.kdtree" not in sys.modules:
        legacy = types.ModuleType("scipy.spatial.kdtree")
        legacy.KDTree = scipy.spatial.KDTree
        sys.modules.setdefault("scipy.spatial.kdtree", legacy)

    for pkg in ("T_NeRF_Eval_Utils", "T_NeRF_Full_2", "all_NeRF",
                "pre_NeRF", "Generate_Summary_Images"):
        if pkg not in sys.modules:
            shell = types.ModuleType(pkg)
            shell.__path__ = [os.path.join(REF, pkg)]
            sys.modules[pkg] = shell

    # package-level attrs the eval modules import
    from all_NeRF import basic_functions as bf
    from all_NeRF import mg_unit_converter as uc
    allnerf = sys.modules["all_NeRF"]
    allnerf.show_dict_struc = bf.show_dict_struc
    allnerf.CV_reshape = bf.CV_reshape
    allnerf.world_angle_2_local_vec = uc.world_angle_2_local_vec

    from pre_NeRF.P_Img import P_img
    sys.modules["pre_NeRF"].P_img = P_img

    from T_NeRF_Full_2.Quick_Run import encode_time
    from T_NeRF_Full_2.Eval_Tools_2 import get_PV
    full2 = sys.modules["T_NeRF_Full_2"]
    full2.encode_time = encode_time
    full2.get_PV = get_PV

    from T_NeRF_Eval_Utils import Eval_funcs as ef
    tevu = sys.modules["T_NeRF_Eval_Utils"]
    tevu.mask_ssim = ef.mask_ssim
    tevu.mask_PSNR = ef.mask_PSNR

    from T_NeRF_Eval_Utils import mg_Img_Eval as ie
    from T_NeRF_Full_2.T_NeRF_net_v2 import T_NeRF as RefTNeRF
    return RefTNeRF, ef, ie


class RefPImgShim:
    """The minimal ``P_img`` surface the reference eval functions touch:
    ``.img``, ``.invert_P``, ``.sun_el_and_az_vec``, ``.get_year_frac()``,
    ``.time_obj.get_time_encode()`` (P_Img.py:7-66).  Backed by our Camera
    so both harnesses score the *same physical rays*."""

    def __init__(self, cam):
        self._cam = cam
        self.img = np.asarray(cam.image, np.float64)[..., :3]
        self.sun_el_and_az_vec = np.asarray(cam.sun_vec, np.float64)
        enc = list(np.asarray(cam.time_enc, np.float64))
        self.time_obj = types.SimpleNamespace(
            get_time_encode=lambda: [cam.time_frac] + enc)

    def invert_P(self, row, col, h):
        row, col, h = np.broadcast_arrays(
            np.asarray(row, np.float64), np.asarray(col, np.float64),
            np.asarray(h, np.float64))
        x, y, z = self._cam.backproject(row, col, h)
        return x, y, np.asarray(h, np.float64)

    def get_year_frac(self):
        return float(self._cam.time_frac)


# --------------------------------------------------------------------------
# our-side helpers
# --------------------------------------------------------------------------

def load_site(model_dir):
    """Model dir -> (LoadedModel, test cams with GT images attached,
    gt_hm [-1,1], h_range).

    SYNTH_* sites are rebuilt deterministically from opts.json; real
    (DFC-format) sites are re-preprocessed through the same cached-ingest
    path the training CLI used (cli._prepare_real semantics: the cache under
    opts.json's recorded dirs makes this cheap and split-stable)."""
    from season_nerf_tpu.render.loading import load_model_dir

    loaded = load_model_dir(model_dir)
    cfg = loaded.cfg
    with open(os.path.join(model_dir, "Testing_Imgs.txt")) as f:
        test_names = [ln.strip() for ln in f if ln.strip()]

    if cfg.site_name.upper().startswith("SYNTH"):
        from season_nerf_tpu.data.synthetic import make_scene
        scene = make_scene(n_views=cfg.synth_views,
                           img_size=cfg.synth_img_size,
                           grid=cfg.synth_grid, seed=cfg.seed)
        by_name = {c.name: i for i, c in enumerate(scene.cameras)}
        test_cams = []
        for name in test_names:
            cam = scene.cameras[by_name[name]]
            cam.image = scene.images[by_name[name]]
            test_cams.append(cam)
        return (loaded, test_cams, np.asarray(scene.hm, np.float64),
                (0.0, 30.0))

    # real branch: rebuild the site exactly as training did (preprocess_site
    # caches under cfg.cache_dir; the split comes from the model dir's
    # Testing_Imgs.txt, so the scored cameras are the trained holdout)
    from season_nerf_tpu.data.ingest import preprocess_site
    from season_nerf_tpu.data.lidar import get_gt_dsm
    from season_nerf_tpu.priors.space_carving import model_grid_from_bounds

    gt_dir = os.path.join(cfg.root_dir, "Track3-Truth")
    if not os.path.isdir(gt_dir):
        raise SystemExit(
            f"{gt_dir} not found: the reference HM table needs the lidar "
            "GT DSM (a GT-less site has nothing to cross-validate against)")
    site = preprocess_site(
        cfg.root_dir, cfg.site_name, cfg.rpc_dir, cfg.cache_dir,
        gt_dir=gt_dir,
        height_range=(tuple(cfg.height_range) if cfg.height_range else None),
        skip_bundle_adjust=cfg.skip_Bundle_Adjust,
        camera_model=cfg.camera_model)
    by_name = {c.name: i for i, c in enumerate(site.cameras)}
    missing = [n for n in test_names if n not in by_name]
    if missing:
        raise SystemExit(f"Testing_Imgs.txt names not in the site: {missing}")
    test_cams = [site.cameras[by_name[n]] for n in test_names]
    grid = model_grid_from_bounds(site.bounds_lla)
    gt_hm = get_gt_dsm(gt_dir, cfg.site_name, grid[:2], site.bounds_lla)
    h0, h1 = site.bounds_lla[2]
    return (loaded, test_cams, np.asarray(gt_hm, np.float64),
            (float(h0), float(h1)))


REF_IMG_ROWS = ["Base Image", "Season without shadow Image", "Full Image",
                "Seasonal Aligned Image"]
METRIC_COLS = ["mean_L2", "PSNR", "SSIM", "EM"]


def our_image_table(loaded, cam, out_size, n_samples):
    """Our protocol table in the reference's 4-row layout."""
    from season_nerf_tpu.eval.img_eval import (eval_rendering,
                                               image_quality_gauntlet)
    loaded.renderer.n_samples = n_samples
    res = eval_rendering(loaded.renderer, cam, out_size)
    gt = res["Ground_Truth"]
    imgs, aligned = res["Images"], res["Seasonal_Aligned_Imgs"]
    rows = [
        image_quality_gauntlet(gt, imgs["Base_Img"]),
        image_quality_gauntlet(gt, imgs["Season_Adj_Img"]),
        image_quality_gauntlet(gt, imgs["Season_Adj_Img"]
                               * imgs["Shadow_Adjust"]),
        image_quality_gauntlet(gt, aligned["Season_Adj_Img"]
                               * aligned["Shadow_Adjust"]),
    ]
    return np.asarray(rows, np.float64)


def ref_image_table(ie, net, shim, out_size, n_samples):
    """The reference's eval_Rendering -> eval_img_dict 4x4 table."""
    ans, _ = ie.eval_Rendering(net, shim, "cpu",
                               (out_size[0], out_size[1], n_samples))
    scored = ie.eval_img_dict(shim.img, ans, use_exact_shadow=False,
                              SSIM_size=13)
    return np.asarray(scored["Scores"]["Table"], np.float64)


def diff_tables(ref_tbl, our_tbl):
    return {
        "rows": REF_IMG_ROWS,
        "cols": METRIC_COLS,
        "reference": ref_tbl.tolist(),
        "ours": our_tbl.tolist(),
        "abs_diff": np.abs(ref_tbl - our_tbl).tolist(),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model_dir")
    p.add_argument("-o", "--output", default=None, help="JSON output path")
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--img_samples", type=int, default=64,
                   help="samples/ray for the image protocol")
    p.add_argument("--hm_samples", type=int, default=96,
                   help="height samples for eval_HM")
    p.add_argument("--hm_grid", type=int, default=0,
                   help="downsample the GT raster to this size for eval_HM "
                        "(0 = native)")
    p.add_argument("--full_eval_img", action="store_true",
                   help="also run the reference's full_eval_P_img per-class "
                        "protocol (slow: every pixel of the GT image)")
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")   # chip-free by construction

    loaded, test_cams, gt_hm, h_range = load_site(args.model_dir)
    cfg = loaded.cfg
    out_size = (args.img_size, args.img_size)

    print(f"[cross_eval] model={args.model_dir} fc={cfg.fc_units} "
          f"classes={cfg.number_low_frequency_cases} "
          f"test_cams={[c.name for c in test_cams]}")

    # ---- convert the weights into the reference's own network ----------
    RefTNeRF, ef, ie = import_reference()
    import torch
    from season_nerf_tpu.utils.torch_convert import load_into_reference
    net = RefTNeRF(cfg.fc_units, n_classes=cfg.number_low_frequency_cases)
    load_into_reference(net, loaded.variables["params"],
                        loaded.variables.get("batch_stats", {}))
    net.eval()

    report = {"model_dir": os.path.abspath(args.model_dir),
              "protocol": {"img_size": args.img_size,
                           "img_samples": args.img_samples,
                           "hm_samples": args.hm_samples},
              "documented_deviations": {
                  "EM": "the reference gauntlet NaNs the VALID pixels of "
                        "the GT before building its EM signature "
                        "(mg_Img_Eval.py:536 'Img_GT[mask] *= np.NaN' — "
                        "inverted mask polarity), so its EM compares the "
                        "GT's invalid-border ring against the estimate's "
                        "interior; ours compares the joint-valid regions. "
                        "Same LAB signature protocol and units, different "
                        "(deliberately corrected) masking.",
                  "HM_after_alignment": "the reference's "
                        "apply_shift_and_R +-1px shift branches are no-ops "
                        "(Eval_funcs.py:470-479 concatenates a NaN row/col "
                        "then crops it straight back off), so its "
                        "alignment search is rotation-only and each "
                        "accepted step re-resamples the estimate with an "
                        "order-5 spline (cval=mean), which smooths the "
                        "surface and lowers RMSE by itself.  Ours applies "
                        "true shifts and NaN-safe rotation; "
                        "before-alignment rows are the comparable ones.",
              },
              "images": {}, "hm": {}, "full_eval_P_img": {}}

    # ---- image protocol: eval_Rendering + seasonal alignment -----------
    for cam in test_cams:
        shim = RefPImgShim(cam)
        with torch.no_grad():
            ref_tbl = ref_image_table(ie, net, shim, out_size,
                                      args.img_samples)
        our_tbl = our_image_table(loaded, cam, out_size, args.img_samples)
        report["images"][cam.name] = diff_tables(ref_tbl, our_tbl)
        print(f"[cross_eval] {cam.name}: max |PSNR diff| = "
              f"{np.max(np.abs(ref_tbl[:, 1] - our_tbl[:, 1])):.3f} dB, "
              f"max |SSIM diff| = "
              f"{np.max(np.abs(ref_tbl[:, 2] - our_tbl[:, 2])):.4f}")

    # ---- optional: the reference's per-class full_eval_P_img -----------
    if args.full_eval_img:
        from season_nerf_tpu.eval.img_eval import image_quality_gauntlet
        cam = test_cams[0]
        shim = RefPImgShim(cam)
        step = max(1, cam.image.shape[0] // args.img_size)
        with torch.no_grad():
            _, scores, _ = ef.full_eval_P_img(
                net, shim, args.img_samples, "cpu", step_size=step)
        report["full_eval_P_img"][cam.name] = {
            k: (float(v) if np.isscalar(v) or getattr(v, "ndim", 1) == 0
                else np.asarray(v).tolist())
            for k, v in scores.items()}
        print(f"[cross_eval] full_eval_P_img[{cam.name}]: "
              f"Base PSNR={scores['Base_Img_PSNR']:.2f} "
              f"Ideal PSNR={scores['Ideal_Time_Img_PSNR']:.2f}")

    # ---- height-map protocol: eval_HM with alignment search ------------
    gt = gt_hm
    if args.hm_grid and gt.shape[0] > args.hm_grid:
        import cv2
        gt = cv2.resize(gt, (args.hm_grid, args.hm_grid),
                        interpolation=cv2.INTER_AREA)
    with torch.no_grad():
        _, ref_before, ref_after = ef.eval_HM(
            net, np.copy(gt), h_range, args.hm_samples, "cpu", 20000)
    from season_nerf_tpu.eval.hm_eval import eval_hm
    _, our_before, our_after = eval_hm(loaded.model, loaded.variables, gt,
                                       h_range, n_samples=args.hm_samples)
    hm_rows = {}
    for key in ("MAE", "RMSE", "Acc_1_m", "Median"):
        hm_rows[key] = {
            "reference_before": float(ref_before[key]),
            "ours_before": float(our_before[key]),
            "reference_after": float(ref_after[key]),
            "ours_after": float(our_after[key]),
        }
    report["hm"] = hm_rows
    print(f"[cross_eval] HM MAE before: ref={ref_before['MAE']:.3f} m "
          f"ours={our_before['MAE']:.3f} m | after: "
          f"ref={ref_after['MAE']:.3f} m ours={our_after['MAE']:.3f} m")

    out = args.output or os.path.join(args.model_dir, "cross_eval.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[cross_eval] wrote {out}")


if __name__ == "__main__":
    main()
