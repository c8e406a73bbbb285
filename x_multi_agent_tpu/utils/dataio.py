"""Dataset IO: EuRoC/ASL-style directories (IMU CSV + PGM image streams).

Host-side data path; uses the native C++ runtime (native/libxio.so — fast
mmap-style CSV parse + threaded PGM batch decode) when built, with a pure
NumPy fallback. The reference consumes rosbags via its external ROS
wrapper; the equivalent offline format here is

    dataset/
      imu.csv           # t, wx, wy, wz, ax, ay, az  ('#' comments ok)
      cam/
        data.csv        # t, filename
        <frames>.pgm
"""
from __future__ import annotations

import ctypes
import os
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

_NATIVE = None


def _native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    native_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "native")
    )
    so = os.path.join(native_dir, "libxio.so")
    if not os.path.exists(so):
        # build artifact, not checked in: compile on first use
        src = os.path.join(native_dir, "xio.cpp")
        if os.path.exists(src):
            import subprocess

            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 "-o", so, src],
                check=False, capture_output=True,
            )
    if not os.path.exists(so):
        _NATIVE = False
        return False
    lib = ctypes.CDLL(so)
    lib.xio_load_imu_csv.restype = ctypes.c_long
    lib.xio_load_imu_csv.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long,
    ]
    lib.xio_load_pgm.restype = ctypes.c_int
    lib.xio_load_pgm.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.xio_load_pgm_batch.restype = ctypes.c_int
    lib.xio_load_pgm_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _NATIVE = lib
    return lib


def load_imu_csv(path: str, max_rows: int = 2_000_000) -> np.ndarray:
    """(N, 7): t, wx, wy, wz, ax, ay, az."""
    lib = _native()
    if lib:
        out = np.empty((max_rows, 7), np.float64)
        n = lib.xio_load_imu_csv(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            max_rows,
        )
        if n < 0:
            raise IOError(f"failed to read {path}")
        return out[:n].copy()
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(",")
            if len(parts) >= 7:
                rows.append([float(x) for x in parts[:7]])
    return np.asarray(rows, np.float64)


def load_pgm(path: str) -> np.ndarray:
    lib = _native()
    if lib:
        cap = 8192 * 8192
        buf = np.empty(cap, np.uint8)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = lib.xio_load_pgm(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            cap, ctypes.byref(w), ctypes.byref(h),
        )
        if rc != 0:
            raise IOError(f"PGM read failed ({rc}): {path}")
        return buf[: w.value * h.value].reshape(h.value, w.value).copy()
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P5"):
        raise IOError(f"not a binary PGM: {path}")
    vals = []
    i = 2
    while len(vals) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while data[j : j + 1].isdigit():
            j += 1
        vals.append(int(data[i:j]))
        i = j
    i += 1
    w, h, _ = vals
    return np.frombuffer(data, np.uint8, w * h, i).reshape(h, w).copy()


def load_pgm_batch(paths: List[str], n_threads: int = 4) -> np.ndarray:
    """(N, H, W) uint8 — native threaded decode when available."""
    lib = _native()
    if lib and paths:
        first = load_pgm(paths[0])
        h, w = first.shape
        out = np.empty((len(paths), h, w), np.uint8)
        blob = b"\0".join(p.encode() for p in paths) + b"\0"
        ow = ctypes.c_int()
        oh = ctypes.c_int()
        rc = lib.xio_load_pgm_batch(
            blob, len(paths),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            h * w, ctypes.byref(ow), ctypes.byref(oh), n_threads,
        )
        if rc != 0:
            raise IOError(f"batch PGM read failed ({rc})")
        return out
    return np.stack([load_pgm(p) for p in paths])


class Dataset(NamedTuple):
    imu_t: np.ndarray  # (Ni,) seconds
    imu_w: np.ndarray  # (Ni, 3)
    imu_a: np.ndarray  # (Ni, 3)
    cam_t: np.ndarray  # (Nc,) seconds
    cam_paths: List[str]


def load_euroc_style(root: str, time_scale: float = 1e-9) -> Dataset:
    """EuRoC layout: timestamps in ns by default (time_scale converts)."""
    imu = load_imu_csv(os.path.join(root, "imu.csv"))
    cam_csv = os.path.join(root, "cam", "data.csv")
    cam_t, cam_paths = [], []
    with open(cam_csv) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            t_str, name = line.split(",")[:2]
            cam_t.append(float(t_str) * time_scale)
            cam_paths.append(os.path.join(root, "cam", name.strip()))
    return Dataset(
        imu_t=imu[:, 0] * time_scale,
        imu_w=imu[:, 1:4],
        imu_a=imu[:, 4:7],
        cam_t=np.asarray(cam_t),
        cam_paths=cam_paths,
    )
