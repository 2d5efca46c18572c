"""Shared score-table parsing for the evidence tools.

``fast_sine_parity.py`` and ``multidevice_equality.py`` both reduce a
finished run directory to its headline quality numbers by parsing the
score tables ``regional_eval`` writes; keeping that in one place means a
format change in ``quality_report.py``'s tables can't silently skew one
tool's columns while the other is updated.
"""

import os

from tools import quality_report as qr


def arm_metrics(logs_dir):
    """Headline metrics from a completed run dir: seasonally-aligned
    (+shadow) PSNR/SSIM/EM on held-out views and the aligned-DSM accuracy
    table (the reference's scoring, main_eval_region.py:10-123)."""
    img = qr._table_rows(qr._read(
        os.path.join(logs_dir, "Output", "Image_scores.txt")))
    hm = qr._table_rows(qr._read(
        os.path.join(logs_dir, "Detailed_Output", "HM_scores.txt")))
    out = {}
    best = img.get("Aligned_Shadow_Img") or img.get("Aligned_Img")
    if best:
        out.update(psnr=best[0], ssim=best[3], em=best[4])
    al = hm.get("NeRF (aligned)")
    if al:
        out.update(dsm_mae=al[0], dsm_rmse=al[1], dsm_le1m=al[2],
                   dsm_median=al[3])
    return out
