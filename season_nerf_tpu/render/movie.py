"""Free-camera movie rendering.

Equivalent capability to ``T_NeRF_Eval_Utils/mg_movie_maker.py``: a keyframe
``MovieScript`` (view el/az, sun el/az, time-of-year per keyframe) smoothed
by natural cubic splines with constant-speed arc-length reparametrization
(script, :209-461), frames rendered through the Renderer, and export to GIF
(always, via imageio/Pillow) or MP4 when an ffmpeg backend is available
(edit_film, :463-466 shells out to ffmpeg; this environment has none, so
GIF is the default artifact).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

from season_nerf_tpu.geometry.spline import Spline3
from season_nerf_tpu.render.renderer import Renderer


@dataclass
class Keyframe:
    view_el_az: Tuple[float, float]
    sun_el_az: Tuple[float, float]
    time_frac: float
    # optional 6-DoF free-camera pose: (x, y, z, pitch_deg, yaw_deg, fov_deg)
    # in cube coordinates (the reference's camera-position/pitch/yaw keyframe
    # channels, mg_movie_maker.py:209-461); when set, the frame renders
    # through the projective camera instead of the orthographic by-direction
    # path, and view_el_az is ignored
    cam_pose: Optional[Tuple[float, ...]] = None


@dataclass
class MovieScript:
    """Keyframed camera/sun/time path with constant-speed interpolation.

    Two modes: by-direction (view el/az per keyframe) and 6-DoF free camera
    (``cam_pose`` per keyframe).  A script is one mode or the other — mixing
    raises, matching the reference's single-camera-model script semantics."""
    keyframes: List[Keyframe] = field(default_factory=list)

    def add(self, view_el_az, sun_el_az, time_frac, cam_pose=None):
        self.keyframes.append(Keyframe(
            tuple(view_el_az) if view_el_az is not None else (90.0, 0.0),
            tuple(sun_el_az), float(time_frac),
            tuple(float(v) for v in cam_pose) if cam_pose is not None
            else None))
        return self

    @property
    def six_dof(self) -> bool:
        poses = [k.cam_pose is not None for k in self.keyframes]
        if any(poses) and not all(poses):
            raise ValueError("mixed script: every keyframe needs cam_pose, "
                             "or none")
        return bool(poses) and all(poses)

    def sample(self, n_frames: int) -> List[Keyframe]:
        """n_frames keyframe states along the arc-length-parameterized
        spline through all channels (constant speed along the camera path,
        mg_movie_maker.script:209-461)."""
        assert len(self.keyframes) >= 2, "need at least 2 keyframes"
        six = self.six_dof
        if six:
            chans = np.array([[*k.cam_pose,
                               k.sun_el_az[0], k.sun_el_az[1], k.time_frac]
                              for k in self.keyframes])
        else:
            chans = np.array([[k.view_el_az[0], k.view_el_az[1],
                               k.sun_el_az[0], k.sun_el_az[1], k.time_frac]
                              for k in self.keyframes])
        sp = Spline3(chans)
        ss = np.linspace(0, 1, n_frames)
        out = []
        for s in ss:
            v = sp.at_arc(s)
            if six:
                out.append(Keyframe(
                    (90.0, 0.0),
                    (float(np.clip(v[6], 1, 90)), float(v[7])),
                    float(v[8]) % 1.0,
                    cam_pose=tuple(float(x) for x in v[:6])))
            else:
                out.append(Keyframe((float(v[0]), float(v[1])),
                                    (float(np.clip(v[2], 1, 90)), float(v[3])),
                                    float(v[4]) % 1.0))
        return out


def render_movie(renderer: Renderer, script: MovieScript, n_frames: int,
                 out_size: int, angles_to_vec=None, pipeline: int = 2):
    """-> [n_frames, H, W, 3] uint8 frames.  6-DoF scripts render through
    the projective free camera (renderer.render_perspective); by-direction
    scripts through the orthographic path (renderer.render_img).

    ``pipeline`` overlaps consecutive frames: while frame i blocks on its
    device->host fetch + uint8 conversion, frame i+1's chunk dispatches
    already queue on the device (jitted calls are thread-safe; the device
    serializes the compute, so results are order-exact and identical to
    ``pipeline=1`` — pinned in tests/test_cli_e2e.py::
    test_movie_and_summary_figs).  Two stages is the
    whole win: one frame computing, one frame draining."""
    def _one(kf: Keyframe) -> np.ndarray:
        if kf.cam_pose is not None:
            x, y, z, pitch, yaw, fov = kf.cam_pose
            out = renderer.render_perspective(
                (x, y, z), pitch, yaw, fov, out_size, kf.sun_el_az,
                kf.time_frac, angles_to_vec=angles_to_vec)
        else:
            out = renderer.render_img(kf.view_el_az, kf.sun_el_az,
                                      kf.time_frac, out_size,
                                      angles_to_vec=angles_to_vec)
        img = np.clip(np.nan_to_num(out["Col_Img"]), 0, 1)
        return (img * 255).astype(np.uint8)

    kfs = script.sample(n_frames)
    if pipeline <= 1 or len(kfs) < 2:
        return np.stack([_one(kf) for kf in kfs])
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(pipeline, 2)) as ex:
        return np.stack(list(ex.map(_one, kfs)))


def export_film(frames: np.ndarray, path: str, fps: int = 12):
    """Write frames to GIF (or MP4 when an ffmpeg backend exists).
    Returns the path actually written."""
    import imageio
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith(".mp4"):
        try:
            imageio.mimsave(path, list(frames), fps=fps)
            return path
        except Exception:
            path = path[:-4] + ".gif"
    imageio.mimsave(path, list(frames), duration=1000.0 / fps, loop=0)
    return path


def giffify(images: Sequence[np.ndarray], path: str, duration_ms: float = 200):
    """Plain image-list GIF writer (load.giffify, load.py:11-19)."""
    import imageio
    frames = [(np.clip(np.nan_to_num(np.asarray(im, float)), 0, 1) * 255)
              .astype(np.uint8) for im in images]
    imageio.mimsave(path, frames, duration=duration_ms, loop=0)
    return path
