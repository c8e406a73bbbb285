"""Reference-format data ingestion.

Two external input surfaces of the reference are reproduced here so its
released datasets drive this framework unchanged:

1. The 10-double match-vector import (``/root/reference/src/x/vio/vio.cpp:
   372-434``; format documented ``/root/reference/README.md:259-276``)::

       block i (10 doubles):
         0: cam_id
         1: time_prev [s]   2: x_dist_prev [px]   3: y_dist_prev [px]
         4: time_curr [s]   5: x_dist_curr [px]   6: y_dist_curr [px]
         7,8,9: 3D landmark (GT_DEBUG builds only; NaN/zeros otherwise)

   The reference undistorts both features through the FOV camera model and
   associates matches to tracks by FEATURE EQUALITY (``track_manager.cpp:
   146``: a match continues the track whose last feature equals
   ``match.previous``). Our track manager is id-based, so
   :class:`MatchAssociator` reproduces the equality association on the
   host and hands stable ids to the device pipeline.

2. A dataset-directory layout loader (:func:`load_reference_dataset`): the
   EuRoC-style tree the reference's released datasets unpack to
   (``/root/reference/README.md:284-301``; imu/camera streams like the
   existing ``dataio.load_euroc_style``) plus the per-frame GT match
   stream as ``matches.csv`` (rows ``seq, <10 doubles per match...>``)
   and optional ``gt.csv`` (``t, px, py, pz, qx, qy, qz, qw``) for ATE.
"""
from __future__ import annotations

import os
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

from ..vision import camera as cam_mod

BLOCK = 10  # doubles per match (reference feature_arr_blk_sz)


class RefMatches(NamedTuple):
    """One frame of imported matches (host-side, ragged)."""

    cam_id: np.ndarray  # (J,) int
    time_prev: np.ndarray  # (J,)
    time_curr: np.ndarray  # (J,)
    prev_n: np.ndarray  # (J, 2) normalized undistorted coords
    cur_n: np.ndarray  # (J, 2)
    landmarks: np.ndarray  # (J, 3) GT landmark (NaN when absent)
    track_id: np.ndarray  # (J,) stable ids from the associator


class MatchAssociator:
    """Feature-equality track association (reference semantics).

    The reference continues a track when the new match's *previous*
    feature equals the track's last *current* feature (same timestamp and
    distorted pixel coordinates). Keys quantize the distorted coordinates
    to 1e-6 px so float round-trips through files stay stable.
    """

    def __init__(self):
        self._last: Dict[Tuple[int, int, int, int], int] = {}
        self._next_id = 0

    @staticmethod
    def _key(cam_id: float, t: float, x: float, y: float):
        return (
            int(cam_id),
            int(round(t * 1e6)),
            int(round(x * 1e6)),
            int(round(y * 1e6)),
        )

    def associate(self, vec: np.ndarray) -> np.ndarray:
        """vec: (J, 10) match blocks of ONE frame -> (J,) stable ids."""
        vec = np.asarray(vec, np.float64).reshape(-1, BLOCK)
        ids = np.empty(vec.shape[0], np.int64)
        new_last: Dict[Tuple[int, int, int, int], int] = {}
        for i, row in enumerate(vec):
            kp = self._key(row[0], row[1], row[2], row[3])
            tid = self._last.get(kp)
            if tid is None:
                tid = self._next_id
                self._next_id += 1
            ids[i] = tid
            new_last[self._key(row[0], row[4], row[5], row[6])] = tid
        # tracks not continued this frame die, exactly like the
        # reference's match-consumed-or-dead sweep
        self._last = new_last
        return ids


def import_matches(
    match_vector: np.ndarray,
    camera: cam_mod.Camera,
    assoc: Optional[MatchAssociator] = None,
) -> RefMatches:
    """Parse one frame's 10-double match vector (vio.cpp:372-434).

    Both features are undistorted through the FOV model and normalized —
    the coordinate frame every downstream update expects.
    """
    vec = np.asarray(match_vector, np.float64).reshape(-1, BLOCK)
    if vec.size and vec.shape[0] * BLOCK != np.asarray(match_vector).size:
        raise ValueError("match vector length is not a multiple of 10")
    import jax.numpy as jnp

    prev_px = jnp.asarray(vec[:, 2:4])
    cur_px = jnp.asarray(vec[:, 5:7])
    prev_n = np.asarray(
        cam_mod.normalize(camera, cam_mod.undistort(camera, prev_px))
    )
    cur_n = np.asarray(
        cam_mod.normalize(camera, cam_mod.undistort(camera, cur_px))
    )
    ids = (
        assoc.associate(vec)
        if assoc is not None
        else np.arange(vec.shape[0], dtype=np.int64)
    )
    return RefMatches(
        cam_id=vec[:, 0].astype(np.int64),
        time_prev=vec[:, 1],
        time_curr=vec[:, 4],
        prev_n=prev_n.reshape(-1, 2),
        cur_n=cur_n.reshape(-1, 2),
        landmarks=vec[:, 7:10],
        track_id=ids,
    )


def to_device_matches(ref: RefMatches, budget: int, dtype=None):
    """Pad a RefMatches frame into the fixed-budget ``tm.Matches``."""
    import jax.numpy as jnp

    from ..vio import track_manager as tm

    dtype = dtype or jnp.float32
    j = min(len(ref.track_id), budget)
    ids = np.full((budget,), -1, np.int32)
    prev = np.zeros((budget, 2), np.float64)
    cur = np.zeros((budget, 2), np.float64)
    valid = np.zeros((budget,), bool)
    ids[:j] = ref.track_id[:j]
    prev[:j] = ref.prev_n[:j]
    cur[:j] = ref.cur_n[:j]
    valid[:j] = True
    return tm.Matches.of(
        track_id=jnp.asarray(ids),
        prev_pt=jnp.asarray(prev, dtype),
        cur_pt=jnp.asarray(cur, dtype),
        valid=jnp.asarray(valid),
    )


class RefDataset(NamedTuple):
    imu_t: np.ndarray  # (Ni,) s
    imu_w: np.ndarray  # (Ni, 3)
    imu_a: np.ndarray  # (Ni, 3)
    frame_t: np.ndarray  # (Nf,) s — match-frame timestamps
    frames: List[RefMatches]  # per-frame imported matches
    gt_t: Optional[np.ndarray]  # (Ng,) s
    gt_p: Optional[np.ndarray]  # (Ng, 3)
    gt_q: Optional[np.ndarray]  # (Ng, 4) xyzw


def load_reference_dataset(
    root: str, camera: cam_mod.Camera, time_scale: float = 1.0
) -> RefDataset:
    """Load a reference-layout dataset directory.

    Expected tree (README.md:284-301 release layout, flattened)::

        root/imu.csv       # t, wx, wy, wz, ax, ay, az
        root/matches.csv   # seq, then 10 doubles per match (ragged rows)
        root/gt.csv        # optional: t, px, py, pz, qx, qy, qz, qw
    """
    from . import dataio

    imu = dataio.load_imu_csv(os.path.join(root, "imu.csv"))
    assoc = MatchAssociator()
    frame_t: List[float] = []
    frames: List[RefMatches] = []
    with open(os.path.join(root, "matches.csv")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = np.asarray([float(v) for v in line.split(",")])
            vec = vals[1:]
            if vec.size % BLOCK != 0:
                raise ValueError(
                    f"matches.csv row has {vec.size} values (not 10N)"
                )
            ref = import_matches(vec, camera, assoc)
            t = (
                float(ref.time_curr[0]) * time_scale
                if len(ref.time_curr)
                else (frame_t[-1] if frame_t else 0.0)
            )
            frame_t.append(t)
            frames.append(ref)

    gt_t = gt_p = gt_q = None
    gt_path = os.path.join(root, "gt.csv")
    if os.path.exists(gt_path):
        rows = np.loadtxt(gt_path, delimiter=",", comments="#", ndmin=2)
        gt_t = rows[:, 0] * time_scale
        gt_p = rows[:, 1:4]
        gt_q = rows[:, 4:8]
    return RefDataset(
        imu_t=imu[:, 0] * time_scale,
        imu_w=imu[:, 1:4],
        imu_a=imu[:, 4:7],
        frame_t=np.asarray(frame_t),
        frames=frames,
        gt_t=gt_t,
        gt_p=gt_p,
        gt_q=gt_q,
    )
