"""Synthetic textured-scene renderer for dataset-replay evaluation.

The reference is validated on released multi-UAV datasets (Inveraray
Castle / Mars Yard, README.md:284-301) that are not vendored; this module
generates a deterministic stand-in with the same *shape*: N agents flying
a shared scene, each with an IMU stream and a camera stream of textured
images rendered from ground-truth poses, written to disk in the
EuRoC-style layout consumed by ``utils/dataio.py`` (IMU CSV + PGM frames).

Geometry matches ``utils/sim.py``'s circle world: a z-forward camera
orbiting in the z=0 plane, viewing a textured wall at z = ``wall_z``
(the sim's landmark wall sits at z in [5, 9]).
"""
from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def make_texture(seed: int = 0, size: int = 2048, octaves: int = 5) -> np.ndarray:
    """Multi-octave value-noise texture, uint8 (H, W). Has structure at
    every scale so FAST finds corners at all pyramid levels and LK has
    gradients everywhere."""
    rng = np.random.default_rng(seed)
    tex = np.zeros((size, size), np.float64)
    amp = 1.0
    for o in range(octaves):
        n = 8 << o  # 8, 16, ... control points
        coarse = rng.normal(size=(n, n))
        # bilinear upsample to full size (wrap-free: sample interior grid)
        yi = np.linspace(0, n - 1, size)
        xi = np.linspace(0, n - 1, size)
        y0 = np.floor(yi).astype(int)
        x0 = np.floor(xi).astype(int)
        y1 = np.minimum(y0 + 1, n - 1)
        x1 = np.minimum(x0 + 1, n - 1)
        fy = (yi - y0)[:, None]
        fx = (xi - x0)[None, :]
        up = (
            coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + coarse[np.ix_(y0, x1)] * (1 - fy) * fx
            + coarse[np.ix_(y1, x0)] * fy * (1 - fx)
            + coarse[np.ix_(y1, x1)] * fy * fx
        )
        tex += amp * up
        amp *= 0.55
    # high-frequency speckle for sharp corners
    tex += 0.35 * rng.normal(size=(size, size))
    # sparse distinctive blotches: descriptor matching across agents needs
    # locally UNIQUE appearance — pure value noise is self-similar and
    # produces aliased cross-agent associations
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(160):
        cx, cy = rng.uniform(0, size, 2)
        rx, ry = rng.uniform(6, 60, 2)
        th = rng.uniform(0, np.pi)
        amp = rng.uniform(1.5, 4.0) * rng.choice([-1.0, 1.0])
        dx, dy = xx - cx, yy - cy
        u = (dx * np.cos(th) + dy * np.sin(th)) / rx
        v = (-dx * np.sin(th) + dy * np.cos(th)) / ry
        tex += amp * ((u * u + v * v) < 1.0)
    tex -= tex.min()
    tex *= 255.0 / tex.max()
    return tex.astype(np.uint8)


def _bilinear(tex: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    h, w = tex.shape
    x = np.clip(x, 0.0, w - 1.001)
    y = np.clip(y, 0.0, h - 1.001)
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    fx = x - x0
    fy = y - y0
    t = tex.astype(np.float64)
    return (
        t[y0, x0] * (1 - fx) * (1 - fy)
        + t[y0, x0 + 1] * fx * (1 - fy)
        + t[y0 + 1, x0] * (1 - fx) * fy
        + t[y0 + 1, x0 + 1] * fx * fy
    )


def render_wall_frame(
    tex: np.ndarray,
    p: np.ndarray,  # (3,) camera position (world)
    rot: np.ndarray,  # (3, 3) world <- camera
    h: int,
    w: int,
    fx: float,
    fy: float,
    wall_z: float = 6.0,
    m_per_px: float = 0.004,
) -> np.ndarray:
    """Render an (h, w) uint8 view of the textured wall plane z=wall_z.

    Each pixel's camera ray is intersected with the wall; intensity is a
    bilinear texture lookup at the hit point (texture pinned to the wall
    with ``m_per_px`` meters per texel)."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    v, u = np.mgrid[0:h, 0:w].astype(np.float64)
    d_cam = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1
    )  # (h, w, 3) z-forward pinhole
    d_w = d_cam @ rot.T
    t = (wall_z - p[2]) / d_w[..., 2]
    wx = p[0] + t * d_w[..., 0]
    wy = p[1] + t * d_w[..., 1]
    th, tw = tex.shape
    px = wx / m_per_px + tw / 2.0
    py = wy / m_per_px + th / 2.0
    img = _bilinear(tex, px, py)
    return np.clip(img, 0, 255).astype(np.uint8)


def write_pgm(path: str, img: np.ndarray) -> None:
    h, w = img.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(img, np.uint8).tobytes())


def quat_to_rot(q: np.ndarray) -> np.ndarray:
    """xyzw quaternion -> rotation matrix (world <- camera)."""
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def generate_agent_dataset(
    out_dir: str,
    seed: int,
    duration: float = 30.0,
    imu_rate: float = 100.0,
    cam_rate: float = 10.0,
    h: int = 480,
    w: int = 640,
    fx_frac: float = 0.8,
    radius: float = 1.5,
    omega: float = 0.6,
    imu_noise_w: float = 2e-4,
    imu_noise_a: float = 2e-3,
    wall_z: float = 6.0,
    tex: np.ndarray = None,
    phase: float = 0.0,
) -> dict:
    """Write one agent's EuRoC-style dataset directory:

        out_dir/imu.csv, out_dir/cam/data.csv, out_dir/cam/*.pgm,
        out_dir/gt.csv (t, px, py, pz, qx, qy, qz, qw)

    Trajectory: the utils/sim.py circle (z=0 plane, identity attitude,
    z-forward camera viewing the wall) with a per-agent phase offset.
    Returns a dict of the ground-truth arrays."""
    rng = np.random.default_rng(seed)
    if tex is None:
        tex = make_texture(0)
    os.makedirs(os.path.join(out_dir, "cam"), exist_ok=True)

    def pos(t):
        a = omega * t + phase
        a0 = phase
        return np.stack(
            [
                radius * (np.sin(a) - np.sin(a0)),
                radius * (np.cos(a0) - np.cos(a)),
                0 * t,
            ],
            axis=-1,
        )

    def acc(t):
        a = omega * t + phase
        return np.stack(
            [
                -radius * omega**2 * np.sin(a),
                radius * omega**2 * np.cos(a),
                0 * t,
            ],
            axis=-1,
        )

    def vel(t):
        a = omega * t + phase
        return np.stack(
            [
                radius * omega * np.cos(a),
                radius * omega * np.sin(a),
                0 * t,
            ],
            axis=-1,
        )

    g = -9.81
    n_imu = int(duration * imu_rate) + 1
    imu_t = np.arange(n_imu) / imu_rate
    imu_w = imu_noise_w * rng.standard_normal((n_imu, 3))
    imu_a = (
        acc(imu_t)
        - np.array([0.0, 0.0, g])
        + imu_noise_a * rng.standard_normal((n_imu, 3))
    )
    with open(os.path.join(out_dir, "imu.csv"), "w") as f:
        f.write("# t, wx, wy, wz, ax, ay, az\n")
        for i in range(n_imu):
            f.write(
                f"{imu_t[i]:.6f},{imu_w[i,0]:.9f},{imu_w[i,1]:.9f},"
                f"{imu_w[i,2]:.9f},{imu_a[i,0]:.9f},{imu_a[i,1]:.9f},"
                f"{imu_a[i,2]:.9f}\n"
            )

    n_cam = int(duration * cam_rate)
    cam_t = (np.arange(n_cam) + 1) / cam_rate
    cam_p = pos(cam_t)
    cam_q = np.tile([0.0, 0.0, 0.0, 1.0], (n_cam, 1))
    fx = fx_frac * w
    fy = fx  # square pixels
    eye = np.eye(3)
    with open(os.path.join(out_dir, "cam", "data.csv"), "w") as f:
        f.write("# t, filename\n")
        for i in range(n_cam):
            name = f"{i:06d}.pgm"
            img = render_wall_frame(
                tex, cam_p[i], eye, h, w, fx, fy, wall_z=wall_z
            )
            write_pgm(os.path.join(out_dir, "cam", name), img)
            f.write(f"{cam_t[i]:.6f},{name}\n")

    with open(os.path.join(out_dir, "gt.csv"), "w") as f:
        f.write("# t, px, py, pz, qx, qy, qz, qw\n")
        for i in range(n_cam):
            f.write(
                f"{cam_t[i]:.6f},"
                + ",".join(f"{v:.9f}" for v in cam_p[i])
                + ","
                + ",".join(f"{v:.9f}" for v in cam_q[i])
                + "\n"
            )

    return dict(
        imu_t=imu_t, imu_w=imu_w, imu_a=imu_a,
        cam_t=cam_t, cam_p=cam_p, cam_q=cam_q,
        v0=vel(np.array([0.0]))[0], fx=fx, fy=fy, h=h, w=w,
    )


# --------------------------------------------------------------------------
# 6-DoF orbit trajectory (rotation included) + on-device batch renderer.
# Used by bench.py (VERDICT r2: bench frames must carry real rotation, not
# texture shifts) and the round-3 ATE replay harness.
# --------------------------------------------------------------------------


def _rot_xyz(pitch: np.ndarray, yaw: np.ndarray, roll: np.ndarray) -> np.ndarray:
    """R = Ry(yaw) @ Rx(pitch) @ Rz(roll), batched over leading dims.
    world <- camera, camera z-forward toward the wall."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    z = np.zeros_like(yaw)
    o = np.ones_like(yaw)
    ry = np.stack(
        [cy, z, sy, z, o, z, -sy, z, cy], axis=-1
    ).reshape(yaw.shape + (3, 3))
    rx = np.stack(
        [o, z, z, z, cp, -sp, z, sp, cp], axis=-1
    ).reshape(yaw.shape + (3, 3))
    rz = np.stack(
        [cr, -sr, z, sr, cr, z, z, z, o], axis=-1
    ).reshape(yaw.shape + (3, 3))
    return ry @ rx @ rz


def rot_to_quat(rot: np.ndarray) -> np.ndarray:
    """(..., 3, 3) -> xyzw quaternion (w >= 0)."""
    m = rot
    w = 0.5 * np.sqrt(np.maximum(1.0 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2], 1e-12))
    x = (m[..., 2, 1] - m[..., 1, 2]) / (4 * w)
    y = (m[..., 0, 2] - m[..., 2, 0]) / (4 * w)
    z = (m[..., 1, 0] - m[..., 0, 1]) / (4 * w)
    return np.stack([x, y, z, w], axis=-1)


def orbit_traj(
    duration: float,
    imu_rate: float,
    cam_rate: float,
    radius: float = 1.5,
    omega: float = 0.6,
    phase: float = 0.0,
    yaw_amp: float = 0.0,
    pitch_amp: float = 0.0,
    roll_amp: float = 0.0,
    rot_freq: float = 1.3,
    z_amp: float = 0.0,
    seed: int = 0,
    imu_noise_w: float = 2e-4,
    imu_noise_a: float = 2e-3,
) -> dict:
    """6-DoF orbit: the circle trajectory plus sinusoidal yaw/pitch/roll
    and optional z bobbing. Body rates come from the analytic R(t) by
    central differences at the IMU rate (exact to O(h^2)); accel is
    analytic, rotated into the body frame.

    Returns imu_t, imu_w (body rates), imu_a (specific force), cam_t,
    cam_p, cam_rot (n,3,3), cam_q (xyzw), v0, p0.
    """
    rng = np.random.default_rng(seed)
    g = np.array([0.0, 0.0, -9.81])

    def pos(t):
        a = omega * t + phase
        a0 = phase
        return np.stack(
            [
                radius * (np.sin(a) - np.sin(a0)),
                radius * (np.cos(a0) - np.cos(a)),
                z_amp * np.sin(0.9 * omega * t),
            ],
            axis=-1,
        )

    def vel(t):
        a = omega * t + phase
        return np.stack(
            [
                radius * omega * np.cos(a),
                radius * omega * np.sin(a),
                z_amp * 0.9 * omega * np.cos(0.9 * omega * t),
            ],
            axis=-1,
        )

    def acc(t):
        a = omega * t + phase
        return np.stack(
            [
                -radius * omega**2 * np.sin(a),
                radius * omega**2 * np.cos(a),
                -z_amp * (0.9 * omega) ** 2 * np.sin(0.9 * omega * t),
            ],
            axis=-1,
        )

    def rot(t):
        wt = rot_freq * omega * t + phase
        return _rot_xyz(
            pitch_amp * np.sin(0.83 * wt),
            yaw_amp * np.sin(wt),
            roll_amp * np.sin(1.19 * wt + 0.5),
        )

    n_imu = int(duration * imu_rate) + 1
    imu_t = np.arange(n_imu) / imu_rate
    h_fd = 0.5 / imu_rate
    r_m = rot(imu_t - h_fd)
    r_p = rot(imu_t + h_fd)
    # body rate: vee(log(R(t-h)^T R(t+h))) / 2h
    dr = np.einsum("nij,nik->njk", r_m, r_p)
    tr = np.clip((np.trace(dr, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    ang = np.arccos(tr)
    s = np.where(ang > 1e-12, ang / np.maximum(np.sin(ang), 1e-12), 1.0)
    w_body = (
        np.stack(
            [
                dr[:, 2, 1] - dr[:, 1, 2],
                dr[:, 0, 2] - dr[:, 2, 0],
                dr[:, 1, 0] - dr[:, 0, 1],
            ],
            axis=-1,
        )
        * (s / 2.0)[:, None]
        / (2.0 * h_fd)
    )
    r_t = rot(imu_t)
    a_body = np.einsum("nij,ni->nj", r_t, acc(imu_t) - g)  # R^T (a - g)
    imu_w = w_body + imu_noise_w * rng.standard_normal((n_imu, 3))
    imu_a = a_body + imu_noise_a * rng.standard_normal((n_imu, 3))

    n_cam = int(duration * cam_rate)
    cam_t = (np.arange(n_cam) + 1) / cam_rate
    cam_rot = rot(cam_t)
    return dict(
        imu_t=imu_t, imu_w=imu_w, imu_a=imu_a,
        cam_t=cam_t, cam_p=pos(cam_t), cam_rot=cam_rot,
        cam_q=rot_to_quat(cam_rot),
        p0=pos(np.array([0.0]))[0], v0=vel(np.array([0.0]))[0],
        q0=rot_to_quat(rot(np.array([0.0])))[0],
    )


def render_wall_frames_jax(
    tex,  # (th, tw) jnp array (float)
    p,  # (B, 3) camera positions
    rot,  # (B, 3, 3) world <- camera
    h: int,
    w: int,
    fx: float,
    fy: float,
    wall_z: float = 6.0,
    m_per_px: float = 0.004,
    wall2_x: float = None,
):
    """On-device batch port of :func:`render_wall_frame` (same geometry,
    bilinear texture lookup), with full rotation support and an optional
    second wall (plane x = wall2_x, making the scene non-planar).

    Returns (B, h, w) float32 frames.
    """
    import jax
    import jax.numpy as jnp

    from ..vision.image import bilinear_sample

    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    d_cam = jnp.asarray(
        np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1)
    )  # (h, w, 3)
    th, tw = tex.shape

    def one(p_i, rot_i):
        d_w = d_cam @ rot_i.T
        t1 = (wall_z - p_i[2]) / d_w[..., 2]
        wx = p_i[0] + t1 * d_w[..., 0]
        wy = p_i[1] + t1 * d_w[..., 1]
        px = wx / m_per_px + tw / 2.0
        py = wy / m_per_px + th / 2.0
        img = bilinear_sample(tex, jnp.stack([px, py], axis=-1))
        if wall2_x is not None:
            # side wall x = wall2_x: rays pointing toward it AND hitting it
            # before the front wall (or missing the front wall entirely)
            t2 = (wall2_x - p_i[0]) / jnp.where(
                jnp.abs(d_w[..., 0]) > 1e-6, d_w[..., 0], 1e-6
            )
            hit2 = (t2 > 0.1) & ((t2 < t1) | (t1 <= 0.0))
            w2y = p_i[1] + t2 * d_w[..., 1]
            w2z = p_i[2] + t2 * d_w[..., 2]
            px2 = w2y / m_per_px + tw / 2.0
            py2 = w2z / m_per_px + th / 2.0
            img2 = bilinear_sample(
                tex, jnp.stack([px2 + 511.0, py2 + 257.0], axis=-1)
            )
            img = jnp.where(hit2, img2, img)
        return img

    return jax.vmap(one)(jnp.asarray(p, jnp.float32), jnp.asarray(rot, jnp.float32))


def generate_agent_dataset_6dof(
    out_dir: str,
    seed: int,
    duration: float = 60.0,
    imu_rate: float = 100.0,
    cam_rate: float = 10.0,
    h: int = 480,
    w: int = 640,
    fx_frac: float = 0.8,
    radius: float = 1.5,
    omega: float = 0.6,
    imu_noise_w: float = 2e-4,
    imu_noise_a: float = 2e-3,
    wall_z: float = 6.0,
    wall2_x: float = None,
    tex: np.ndarray = None,
    phase: float = 0.0,
    yaw_amp: float = 0.12,
    pitch_amp: float = 0.08,
    roll_amp: float = 0.06,
    z_amp: float = 0.25,
    thermal: dict = None,
    chunk: int = 32,
) -> dict:
    """6-DoF dataset generator (round-3 replay-benchmark shape): full
    rotation + z-bobbing trajectory (:func:`orbit_traj`), optional second
    wall (non-planar scene), optional baked thermal degradation
    ``thermal=dict(drift_a, drift_b, noise, vignette)`` where drift_a/b
    are per-second rates, noise is a Gaussian std (normalized units) and
    vignette a peak corner offset — the degradation the online
    photometric calibration (global + spatial) must undo.

    Frames are rendered ON DEVICE in chunks (the numpy renderer would
    take ~1 s/frame at VGA). Same EuRoC-style layout as
    :func:`generate_agent_dataset`.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    if tex is None:
        tex = make_texture(0)
    os.makedirs(os.path.join(out_dir, "cam"), exist_ok=True)

    traj = orbit_traj(
        duration, imu_rate, cam_rate, radius=radius, omega=omega,
        phase=phase, yaw_amp=yaw_amp, pitch_amp=pitch_amp,
        roll_amp=roll_amp, z_amp=z_amp, seed=seed,
        imu_noise_w=imu_noise_w, imu_noise_a=imu_noise_a,
    )
    imu_t, imu_w, imu_a = traj["imu_t"], traj["imu_w"], traj["imu_a"]
    cam_t, cam_p, cam_q = traj["cam_t"], traj["cam_p"], traj["cam_q"]
    cam_rot = traj["cam_rot"]

    with open(os.path.join(out_dir, "imu.csv"), "w") as f:
        f.write("# t, wx, wy, wz, ax, ay, az\n")
        for i in range(len(imu_t)):
            f.write(
                f"{imu_t[i]:.6f},{imu_w[i,0]:.9f},{imu_w[i,1]:.9f},"
                f"{imu_w[i,2]:.9f},{imu_a[i,0]:.9f},{imu_a[i,1]:.9f},"
                f"{imu_a[i,2]:.9f}\n"
            )

    fx = fx_frac * w
    tex_j = jnp.asarray(tex.astype(np.float32))
    n_cam = len(cam_t)

    if thermal is not None:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        r2 = ((xx - w / 2) / (w / 2)) ** 2 + ((yy - h / 2) / (h / 2)) ** 2
        vignette = thermal.get("vignette", 0.0) * r2 / 2.0

    with open(os.path.join(out_dir, "cam", "data.csv"), "w") as f:
        f.write("# t, filename\n")
        for c0 in range(0, n_cam, chunk):
            c1 = min(c0 + chunk, n_cam)
            imgs = np.asarray(
                render_wall_frames_jax(
                    tex_j, cam_p[c0:c1], cam_rot[c0:c1], h, w, fx, fx,
                    wall_z=wall_z, wall2_x=wall2_x,
                )
            )
            for i in range(c0, c1):
                img = imgs[i - c0]
                if thermal is not None:
                    t = float(cam_t[i])
                    per = thermal.get("gain_period", 13.0)
                    a = (
                        1.0
                        + thermal.get("drift_a", 0.0) * t
                        + thermal.get("gain_amp", 0.0)
                        * np.sin(2 * np.pi * t / per)
                    )
                    b = (
                        thermal.get("drift_b", 0.0) * t
                        + thermal.get("bias_amp", 0.0)
                        * np.sin(2 * np.pi * t / (per * 1.7) + 0.8)
                    )
                    x = img / 255.0
                    x = x * (a - b) + b + vignette
                    x = x + thermal.get("noise", 0.0) * rng.standard_normal(
                        (h, w)
                    )
                    img = np.clip(x, 0, 1) * 255.0
                name = f"{i:06d}.pgm"
                write_pgm(
                    os.path.join(out_dir, "cam", name),
                    np.clip(img, 0, 255).astype(np.uint8),
                )
                f.write(f"{cam_t[i]:.6f},{name}\n")

    with open(os.path.join(out_dir, "gt.csv"), "w") as f:
        f.write("# t, px, py, pz, qx, qy, qz, qw\n")
        for i in range(n_cam):
            f.write(
                f"{cam_t[i]:.6f},"
                + ",".join(f"{v:.9f}" for v in cam_p[i])
                + ","
                + ",".join(f"{v:.9f}" for v in cam_q[i])
                + "\n"
            )

    return dict(
        imu_t=imu_t, imu_w=imu_w, imu_a=imu_a,
        cam_t=cam_t, cam_p=cam_p, cam_q=cam_q,
        p0=traj["p0"], v0=traj["v0"], q0=traj["q0"],
        fx=fx, fy=fx, h=h, w=w,
    )
