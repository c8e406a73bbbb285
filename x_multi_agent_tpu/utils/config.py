"""Runtime configuration: YAML -> VioParams.

Behavioral spec: reference ``VIO::loadParamsFromYaml`` (``vio.cpp:576-707``)
reading the same key names via cv::FileStorage. Quaternions in the YAML are
(w, x, y, z), matching the reference loader; internally everything is xyzw.

The reference's compile-time feature flags (MULTI_UAV, PHOTOMETRIC_CALI,
REQUEST_COMM, GT_DEBUG — ``CMakeLists.txt:20-44``) become the runtime
booleans in :class:`FeatureFlags`, selecting jit-compiled program variants.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..ekf.propagator import ImuNoise
from ..ekf.state import StateDims
from ..vio.pipeline import VioConfig
from ..vio.track_manager import TrackDims
from ..vio.vio import VioParams


class FeatureFlags(NamedTuple):
    multi_uav: bool = False
    request_comm: bool = False
    photometric_cali: bool = False
    gt_debug: bool = False


class CameraParams(NamedTuple):
    """FOV-model camera (reference ``Camera``): fractional fx/fy/cx/cy are
    multiplied by image size (``camera.cpp:27-48``)."""

    fx: float = 0.5  # fraction of width
    fy: float = 0.5  # fraction of height
    cx: float = 0.5
    cy: float = 0.5
    s: float = 0.0  # FOV distortion parameter
    width: int = 640
    height: int = 480

    @property
    def fx_px(self):
        return self.fx * self.width

    @property
    def fy_px(self):
        return self.fy * self.height


class FullParams(NamedTuple):
    """Everything from the reference Params struct that the framework uses."""

    vio: VioParams = VioParams()
    camera: CameraParams = CameraParams()
    flags: FeatureFlags = FeatureFlags()
    # tracker params (used by the vision front-end)
    fast_detection_delta: int = 9
    non_max_supp: bool = True
    block_half_length: int = 20
    margin: int = 20
    n_feat_min: int = 80
    outlier_method: int = 8
    outlier_param1: float = 0.3
    outlier_param2: float = 0.99
    win_size_w: int = 31
    win_size_h: int = 31
    max_level: int = 2
    min_eig_thr: float = 0.003
    n_tiles_h: int = 1
    n_tiles_w: int = 1
    max_feat_per_tile: int = 40
    time_offset: float = 0.0
    # initial state
    p0: tuple = (0.0, 0.0, 0.0)
    v0: tuple = (0.0, 0.0, 0.0)
    q0: tuple = (0.0, 0.0, 0.0, 1.0)  # xyzw
    b_w0: tuple = (0.0, 0.0, 0.0)
    b_a0: tuple = (0.0, 0.0, 0.0)


def _wxyz_to_xyzw(q):
    q = np.asarray(q, float)
    q = q / np.linalg.norm(q)
    return (q[1], q[2], q[3], q[0])


def load_params_from_yaml(path: str, dtype: str = "float32") -> FullParams:
    """Load a reference-format YAML parameter file."""
    import yaml

    with open(path) as f:
        y = yaml.safe_load(f)

    def get(key, default):
        return y.get(key, default)

    dims = StateDims(
        n_poses=int(get("n_poses_max", 15)),
        n_features=int(get("n_slam_features_max", 15)),
        buffer_size=int(get("state_buffer_size", 250)),
    )
    cam = CameraParams(
        fx=float(get("cam1_fx", 0.5)),
        fy=float(get("cam1_fy", 0.5)),
        cx=float(get("cam1_cx", 0.5)),
        cy=float(get("cam1_cy", 0.5)),
        s=float(get("cam1_s", 0.0)),
        width=int(get("cam1_img_width", 640)),
        height=int(get("cam1_img_height", 480)),
    )
    msckf_baseline = float(get("msckf_baseline", 10.0))
    cfg = VioConfig(
        dims=dims,
        tracks=TrackDims(
            n_slam=dims.n_features,
            n_poses=dims.n_poses,
            n_opp=int(get("n_tiles_h", 1)) * int(get("n_tiles_w", 1))
            * int(get("max_feat_per_tile", 40)),
            n_matches=200,
        ),
        q_ic=_wxyz_to_xyzw(get("cam1_q_ic", [1, 0, 0, 0])),
        p_ic=tuple(np.asarray(get("cam1_p_ic", [0, 0, 0]), float)),
        sigma_img=float(get("sigma_img", 0.005)),
        sigma_range=float(get("sigma_range", 0.05)),
        rho_0=float(get("rho_0", 0.5)),
        sigma_rho_0=float(get("sigma_rho_0", 0.25)),
        min_track_length=int(get("min_track_length", 15)),
        iekf_iter=int(get("iekf_iter", 1)),
        msckf_baseline_x_n=msckf_baseline / cam.fx_px,
        msckf_baseline_y_n=msckf_baseline / cam.fy_px,
    )
    vio = VioParams(
        cfg=cfg,
        g=tuple(np.asarray(get("g", [0, 0, -9.81]), float)),
        imu_noise=ImuNoise(
            n_w=float(get("n_w", 0.0083)),
            n_bw=float(get("n_bw", 0.00083)),
            n_a=float(get("n_a", 0.0013)),
            n_ba=float(get("n_ba", 0.00013)),
        ),
        sigma_dp=tuple(np.asarray(get("sigma_dp", [0, 0, 0]), float)),
        sigma_dv=tuple(np.asarray(get("sigma_dv", [0.05] * 3), float)),
        sigma_dtheta_deg=tuple(np.asarray(get("sigma_dtheta", [3.0] * 3), float)),
        sigma_dbw_deg=tuple(np.asarray(get("sigma_dbw", [6.0] * 3), float)),
        sigma_dba=tuple(np.asarray(get("sigma_dba", [0.3] * 3), float)),
        dtype=dtype,
    )
    return FullParams(
        vio=vio,
        camera=cam,
        fast_detection_delta=int(get("fast_detection_delta", 9)),
        non_max_supp=bool(get("non_max_supp", True)),
        block_half_length=int(get("block_half_length", 20)),
        margin=int(get("margin", 20)),
        n_feat_min=int(get("n_feat_min", 80)),
        outlier_method=int(get("outlier_method", 8)),
        outlier_param1=float(get("outlier_param1", 0.3)),
        outlier_param2=float(get("outlier_param2", 0.99)),
        win_size_w=int(get("win_size_w", 31)),
        win_size_h=int(get("win_size_h", 31)),
        max_level=int(get("max_level", 2)),
        min_eig_thr=float(get("min_eig_thr", 0.003)),
        n_tiles_h=int(get("n_tiles_h", 1)),
        n_tiles_w=int(get("n_tiles_w", 1)),
        max_feat_per_tile=int(get("max_feat_per_tile", 40)),
        time_offset=float(get("cam1_time_offset", 0.0)),
        p0=tuple(np.asarray(get("p", [0, 0, 0]), float)),
        v0=tuple(np.asarray(get("v", [0, 0, 0]), float)),
        q0=_wxyz_to_xyzw(get("q", [1, 0, 0, 0])),
        b_w0=tuple(np.asarray(get("b_w", [0, 0, 0]), float)),
        b_a0=tuple(np.asarray(get("b_a", [0, 0, 0]), float)),
    )
