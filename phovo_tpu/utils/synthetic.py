"""Synthetic RGB-D frame-pair generation with exact ground-truth pose.

The reference has no tests and no fixtures (SURVEY §4); its only oracle is a
near-black warped-difference image. This module provides the stronger oracle
used throughout tests/ and bench.py: an analytically textured slanted plane
rendered from two camera poses, so alignment must recover a KNOWN state
vector — not just reduce a residual.
"""

from __future__ import annotations

import numpy as np

from phovo_tpu.ops.camera import Intrinsics


def _texture(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Smooth, non-periodic-looking intensity in [0, 1] over plane coords."""
    v = (
        0.5
        + 0.18 * np.sin(3.1 * x) * np.cos(2.3 * y)
        + 0.12 * np.sin(7.3 * x + 1.1)
        + 0.10 * np.cos(5.7 * y + 0.4)
        + 0.10 * np.sin(2.1 * (x + y))
    )
    return np.clip(v, 0.0, 1.0)


def render_plane(
    intr: Intrinsics,
    shape: tuple[int, int],
    T_cam_from_world: np.ndarray,
    plane_normal=(0.06, -0.04, 1.0),
    plane_d: float = 2.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Render (intensity, depth) of the textured plane n.p = d (world frame)
    from a camera with pose T (world -> camera)."""
    H, W = shape
    fx, fy, cx, cy = (float(np.asarray(v)) for v in intr)
    n = np.asarray(plane_normal, dtype=np.float64)
    R = np.asarray(T_cam_from_world, dtype=np.float64)[:3, :3]
    t = np.asarray(T_cam_from_world, dtype=np.float64)[:3, 3]
    # plane in camera frame: n.(R^T (p_c - t_c)) = d with p_w = R^T(p_c - t)
    # => (R n).p_c = d + (R n).t
    n_c = R @ n
    d_c = plane_d + n_c @ t

    c = np.arange(W, dtype=np.float64)
    r = np.arange(H, dtype=np.float64)
    cc, rr = np.meshgrid(c, r)
    vx = (cc - cx) / fx
    vy = (rr - cy) / fy
    denom = n_c[0] * vx + n_c[1] * vy + n_c[2]
    z = d_c / np.maximum(denom, 1e-9)
    # camera point -> world point for texturing
    pc = np.stack([vx * z, vy * z, z], axis=-1)
    pw = (pc - t) @ R  # R^T (p - t) done row-wise
    intensity = _texture(pw[..., 0], pw[..., 1])
    return intensity.astype(np.float32), z.astype(np.float32)


def render_cluttered(
    intr: Intrinsics,
    shape: tuple[int, int],
    T_cam_from_world: np.ndarray,
    objects: list[dict] | None = None,
    plane_normal=(0.06, -0.04, 1.0),
    plane_d: float = 2.6,
) -> tuple[np.ndarray, np.ndarray]:
    """Render a multi-object scene: background plane + floating textured
    rectangles at different depths, composited by nearest-hit along each
    pixel ray. Unlike render_plane, this produces depth DISCONTINUITIES and
    OCCLUSION (pixels visible in one frame and hidden in the next) — the
    photometric-violation regime real TUM sequences live in
    (PhotoconsistencyVisualOdometry.cpp:119-267 is built for such data).

    objects: list of dicts with keys normal (3,), d (plane offset), center
    (2,) in-plane xy, half_extent (2,), phase (texture offset). Defaults to
    a seeded 6-object arrangement.
    """
    H, W = shape
    fx, fy, cx, cy = (float(np.asarray(v)) for v in intr)
    R = np.asarray(T_cam_from_world, dtype=np.float64)[:3, :3]
    t = np.asarray(T_cam_from_world, dtype=np.float64)[:3, 3]

    if objects is None:
        objects = default_clutter(seed=1)

    c = np.arange(W, dtype=np.float64)
    r = np.arange(H, dtype=np.float64)
    cc, rr = np.meshgrid(c, r)
    vx = (cc - cx) / fx
    vy = (rr - cy) / fy

    def hit(normal, d):
        n = np.asarray(normal, dtype=np.float64)
        n_c = R @ n
        d_c = d + n_c @ t
        denom = n_c[0] * vx + n_c[1] * vy + n_c[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            z = d_c / denom
        z = np.where((denom > 1e-9) & (z > 0.05), z, np.inf)
        pc = np.stack([vx * z, vy * z, z], axis=-1)
        pw = (pc - t) @ R  # world point, row-wise R^T (p - t)
        return z, pw

    # background plane
    z_best, pw = hit(plane_normal, plane_d)
    intensity = _texture(pw[..., 0], pw[..., 1])

    for k, obj in enumerate(objects):
        z, pw_o = hit(obj["normal"], obj["d"])
        inb = (
            (np.abs(pw_o[..., 0] - obj["center"][0]) < obj["half_extent"][0])
            & (np.abs(pw_o[..., 1] - obj["center"][1]) < obj["half_extent"][1])
        )
        z = np.where(inb, z, np.inf)
        closer = z < z_best
        tex = _texture(
            (pw_o[..., 0] + obj["phase"]) * (1.3 + 0.2 * k),
            (pw_o[..., 1] - obj["phase"]) * (1.1 + 0.15 * k),
        )
        intensity = np.where(closer, tex, intensity)
        z_best = np.where(closer, z, z_best)

    z_best = np.where(np.isfinite(z_best), z_best, 0.0)  # misses -> invalid depth
    return intensity.astype(np.float32), z_best.astype(np.float32)


def render_room(
    intr: Intrinsics,
    shape: tuple[int, int],
    T_cam_from_world: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Render a room-interior scene: five mutually non-parallel textured
    planes (back wall, two side walls, floor, ceiling) plus two bounded
    furniture slabs at intermediate depths, composited by nearest hit.

    Unlike render_plane (a SINGLE textured plane — geometrically
    near-degenerate for joint pose+landmark photometric refinement: poses
    can slide within the photometric valley because one plane constrains
    only 1 of 3 translation directions strongly), this scene has surfaces
    at many depths and orientations, so a photometric bundle adjustment is
    well-conditioned (VERDICT r3 item 1). The camera starts at the world
    origin looking +z; the room spans roughly |x|<2, |y|<1.4, z<3.2 with
    surface depths 0.8-4.5 m (inside the presets' 0.3-5 m depth gates).
    """
    H, W = shape
    fx, fy, cx, cy = (float(np.asarray(v)) for v in intr)
    R = np.asarray(T_cam_from_world, dtype=np.float64)[:3, :3]
    t = np.asarray(T_cam_from_world, dtype=np.float64)[:3, 3]

    c = np.arange(W, dtype=np.float64)
    r = np.arange(H, dtype=np.float64)
    cc, rr = np.meshgrid(c, r)
    vx = (cc - cx) / fx
    vy = (rr - cy) / fy

    def hit(normal, d):
        """Nearest intersection with the unbounded plane n.p = d: depth z
        along the ray (vx, vy, 1) and the world-frame hit point. Unlike
        render_cluttered's hit(), side/floor planes need BOTH denominator
        signs (a left-wall ray has n_c.v < 0 with d_c < 0)."""
        n = np.asarray(normal, dtype=np.float64)
        n_c = R @ n
        d_c = d + n_c @ t
        denom = n_c[0] * vx + n_c[1] * vy + n_c[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            z = d_c / denom
        z = np.where((np.abs(denom) > 1e-9) & (z > 0.05), z, np.inf)
        # texture coordinates only matter where the hit is real; zeroing
        # the misses keeps inf/nan out of the texture trig
        z_s = np.where(np.isfinite(z), z, 0.0)
        pc = np.stack([vx * z_s, vy * z_s, z_s], axis=-1)
        pw = (pc - t) @ R  # world point, row-wise R^T (p - t)
        return z, pw

    # (normal, d, texture uv axes, frequency scale, phase) — normals are
    # deliberately tilted off-axis so no two surfaces are parallel
    surfaces = [
        ((0.02, -0.03, 1.0), 3.2, (0, 1), 1.0, 0.0),     # back wall
        ((1.0, 0.04, 0.05), -2.0, (2, 1), 1.35, 1.3),    # left wall
        ((1.0, -0.03, 0.06), 2.0, (2, 1), 0.8, 2.1),     # right wall
        ((0.03, 1.0, 0.04), 1.4, (0, 2), 1.15, 0.7),     # floor
        ((-0.02, 1.0, 0.03), -1.4, (0, 2), 0.9, 2.8),    # ceiling
    ]
    z_best = np.full((H, W), np.inf)
    intensity = np.zeros((H, W))
    for normal, d, (ua, va), freq, phase in surfaces:
        z, pw = hit(normal, d)
        closer = z < z_best
        tex = _texture(pw[..., ua] * freq + phase, pw[..., va] * freq - phase)
        intensity = np.where(closer, tex, intensity)
        z_best = np.where(closer, z, z_best)
    # bounded furniture slabs: parallax at intermediate depths + occlusion
    slabs = [
        dict(normal=(0.15, -0.1, 1.0), d=2.1, axes=(0, 1),
             center=(-0.7, 0.55), half=(0.45, 0.35), freq=1.9, phase=0.9),
        dict(normal=(0.9, 0.12, 0.45), d=1.15, axes=(2, 1),
             center=(1.45, 0.2), half=(0.5, 0.4), freq=1.6, phase=2.4),
    ]
    for s in slabs:
        z, pw = hit(s["normal"], s["d"])
        ua, va = s["axes"]
        inb = (
            (np.abs(pw[..., ua] - s["center"][0]) < s["half"][0])
            & (np.abs(pw[..., va] - s["center"][1]) < s["half"][1])
        )
        z = np.where(inb, z, np.inf)
        closer = z < z_best
        tex = _texture(
            pw[..., ua] * s["freq"] + s["phase"],
            pw[..., va] * s["freq"] - s["phase"],
        )
        intensity = np.where(closer, tex, intensity)
        z_best = np.where(closer, z, z_best)
    z_best = np.where(np.isfinite(z_best), z_best, 0.0)
    return intensity.astype(np.float32), z_best.astype(np.float32)


def forward_trajectory(n_frames: int, motion_scale: float = 1.0, seed: int = 0):
    """Drift-revealing one-way sweep (list of T_cam_from_world): steady
    translation + slow yaw, no revisits — the regime where chain odometry
    accumulates unbounded drift and a keyframe back-end must rely on its
    odometry edges alone (no loop closures)."""
    from phovo_tpu.ops import se3

    per = motion_scale / max(n_frames, 1)
    poses = []
    for k in range(n_frames):
        state = np.array(
            [1.1 * per * k, -0.5 * per * k, 0.55 * per * k,
             0.45 * per * k, -0.18 * per * k, 0.3 * per * k],
            dtype=np.float64,
        )
        poses.append(np.asarray(se3.pose_matrix(state), dtype=np.float64))
    return poses


def loop_trajectory(n_frames: int, motion_scale: float = 1.0, seed: int = 0):
    """Out-and-back path (list of T_cam_from_world) that returns to the
    start — the loop-closure regime (the final keyframes land within
    loop_radius of the first ones)."""
    from phovo_tpu.ops import se3

    half = n_frames // 2
    reach = 0.9 * motion_scale
    poses = []
    for k in range(n_frames):
        x = reach * (k / half if k <= half else (n_frames - k) / (n_frames - half))
        state = np.array(
            [x, 0.05 * motion_scale * np.sin(0.1 * k), 0.0,
             0.12 * x, 0.0, 0.0],
            dtype=np.float64,
        )
        poses.append(np.asarray(se3.pose_matrix(state), dtype=np.float64))
    return poses


def make_room_sequence(
    intr: Intrinsics,
    shape: tuple[int, int] = (480, 640),
    n_frames: int = 30,
    motion_scale: float = 1.0,
    seed: int = 0,
    trajectory: str = "forward",
) -> tuple[list[np.ndarray], list[np.ndarray], list[np.ndarray], np.ndarray]:
    """Room-interior RGB-D sequence with exact ground truth — the
    geometrically rich fixture for photometric-BA validation (VERDICT r3
    item 1). Same return convention as make_sequence. trajectory:
    'forward' | 'loop' | 'smooth' | 'rotation'."""
    traj_fn = {
        "forward": forward_trajectory,
        "loop": loop_trajectory,
        "smooth": smooth_trajectory,
        "rotation": rotation_trajectory,
    }[trajectory]
    poses_cw = traj_fn(n_frames, motion_scale, seed)
    intensities, depths, gts = [], [], []
    for T in poses_cw:
        I, D = render_room(intr, shape, T)
        intensities.append(I)
        depths.append(D)
        gts.append(np.linalg.inv(T))
    timestamps = np.arange(n_frames, dtype=np.float64) / 30.0
    return intensities, depths, gts, timestamps


def default_clutter(seed: int = 1) -> list[dict]:
    """Seeded arrangement of floating rectangles in front of the plane."""
    rng = np.random.default_rng(seed)
    objects = []
    for k in range(6):
        n = np.array([rng.uniform(-0.25, 0.25), rng.uniform(-0.25, 0.25), 1.0])
        objects.append(
            dict(
                normal=n,
                d=rng.uniform(1.0, 2.2),
                center=np.array([rng.uniform(-0.9, 0.9), rng.uniform(-0.7, 0.7)]),
                half_extent=np.array([rng.uniform(0.15, 0.45), rng.uniform(0.12, 0.4)]),
                phase=rng.uniform(0, 3.0),
            )
        )
    return objects


def degrade_frame(
    intensity: np.ndarray,
    depth: np.ndarray,
    rng: np.random.Generator,
    exposure_gain: float = 1.0,
    exposure_bias: float = 0.0,
    depth_noise: float = 0.0025,
    hole_fraction: float = 0.02,
    quantize: float = 1.0 / 5000.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Sensor-realistic degradation: exposure drift (gain+bias on intensity),
    Kinect-like depth noise growing ~z^2, 1/5000 m quantization (the TUM
    16-bit PNG step, PhotoconsistencyVisualOdometry.cpp:163), random holes,
    and dropouts at depth discontinuities (where structured-light sensors
    actually fail)."""
    I = np.clip(intensity * exposure_gain + exposure_bias, 0.0, 1.0)
    D = depth.astype(np.float64)
    valid = D > 0
    noise = rng.standard_normal(D.shape) * depth_noise * np.square(D / 2.0)
    D = np.where(valid, D + noise, 0.0)
    if quantize > 0:
        D = np.round(D / quantize) * quantize
    # random holes
    D = np.where(rng.uniform(size=D.shape) < hole_fraction, 0.0, D)
    # edge dropouts: kill pixels near strong depth gradients
    gy, gx = np.gradient(np.where(valid, depth, 0.0))
    edges = np.hypot(gx, gy) > 0.04
    D = np.where(edges & (rng.uniform(size=D.shape) < 0.6), 0.0, D)
    return I.astype(np.float32), D.astype(np.float32)


def make_cluttered_sequence(
    intr: Intrinsics,
    shape: tuple[int, int] = (480, 640),
    n_frames: int = 30,
    motion_scale: float = 1.0,
    seed: int = 0,
    degrade: bool = True,
) -> tuple[list[np.ndarray], list[np.ndarray], list[np.ndarray], np.ndarray]:
    """Hard synthetic sequence: occluding multi-object geometry, depth
    noise/holes/quantization, exposure drift, seeded and exactly
    reproducible. Same return convention as make_sequence."""
    poses_cw = smooth_trajectory(n_frames, motion_scale, seed)
    objects = default_clutter(seed=seed + 1)
    rng = np.random.default_rng(seed + 2)
    gains = 1.0 + 0.06 * np.sin(np.linspace(0, 2.5 * np.pi, n_frames) + 0.7)
    biases = 0.02 * np.sin(np.linspace(0, 1.7 * np.pi, n_frames))
    intensities, depths, gts = [], [], []
    for k, T in enumerate(poses_cw):
        I, D = render_cluttered(intr, shape, T, objects)
        if degrade:
            I, D = degrade_frame(I, D, rng, float(gains[k]), float(biases[k]))
        intensities.append(I)
        depths.append(D)
        gts.append(np.linalg.inv(T))
    timestamps = np.arange(n_frames, dtype=np.float64) / 30.0
    return intensities, depths, gts, timestamps


def smooth_trajectory(
    n_frames: int, motion_scale: float = 1.0, seed: int = 0
) -> list[np.ndarray]:
    """Smooth camera trajectory (list of T_cam_from_world, first = identity).

    Sinusoidal sway/orbit in front of the default plane with per-frame
    motion comparable to handheld TUM sequences (~1 cm translation, ~0.3 deg
    rotation per frame at motion_scale=1). A tiny seeded pseudo-random phase
    keeps different seeds from producing identical paths.
    """
    from phovo_tpu.ops import se3

    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi, 6)
    amp_t = np.array([0.12, 0.08, 0.10]) * motion_scale
    amp_r = np.array([0.05, 0.04, 0.06]) * motion_scale
    poses = []
    # fixed 60-frame (2 s at 30 Hz) period so per-frame motion (~1.3 cm,
    # ~0.3 deg at motion_scale=1) is independent of sequence length
    for k in range(n_frames):
        u = 2 * np.pi * k / 60.0
        state = np.concatenate(
            [
                amp_t * np.sin(u + phase[:3]) - amp_t * np.sin(phase[:3]),
                amp_r * np.sin(u + phase[3:]) - amp_r * np.sin(phase[3:]),
            ]
        ).astype(np.float64)
        poses.append(np.asarray(se3.pose_matrix(state), dtype=np.float64))
    return poses


def rotation_trajectory(
    n_frames: int, motion_scale: float = 1.0, seed: int = 0
) -> list[np.ndarray]:
    """Rotation-DOMINANT camera trajectory (list of T_cam_from_world).

    smooth_trajectory is translation-dominant (~0.3 deg/frame of rotation);
    this one swings ~2 deg/frame peaks of yaw/pitch/roll with only millimetre
    translation — the regime that stresses the Jacobian's rotation columns,
    the fused kernels' banded sampling window, and every documented
    rotation-coupled divergence from the reference math (VERDICT r2 item 6:
    the parity scenes were all translation-dominant)."""
    from phovo_tpu.ops import se3

    rng = np.random.default_rng(seed)
    phase = rng.uniform(0, 2 * np.pi, 6)
    amp_t = np.array([0.015, 0.010, 0.012]) * motion_scale
    amp_r = np.array([0.30, 0.24, 0.36]) * motion_scale
    poses = []
    for k in range(n_frames):
        u = 2 * np.pi * k / 60.0
        state = np.concatenate(
            [
                amp_t * np.sin(u + phase[:3]) - amp_t * np.sin(phase[:3]),
                amp_r * np.sin(u + phase[3:]) - amp_r * np.sin(phase[3:]),
            ]
        ).astype(np.float64)
        poses.append(np.asarray(se3.pose_matrix(state), dtype=np.float64))
    return poses


def make_sequence(
    intr: Intrinsics,
    shape: tuple[int, int] = (480, 640),
    n_frames: int = 30,
    motion_scale: float = 1.0,
    seed: int = 0,
    trajectory: str = "smooth",
) -> tuple[list[np.ndarray], list[np.ndarray], list[np.ndarray], np.ndarray]:
    """Synthetic RGB-D sequence with exact ground truth.

    Returns (intensities, depths, gt_world_from_cam poses, timestamps).
    gt poses are what a VO pipeline integrating pose <- pose @ Rt^-1
    (PhotoconsistencyVisualOdometry.cpp:233-234) should reproduce.
    trajectory: 'smooth' (translation-dominant handheld sway) or
    'rotation' (rotation-dominant, rotation_trajectory).
    """
    traj_fn = {
        "smooth": smooth_trajectory, "rotation": rotation_trajectory,
    }[trajectory]
    poses_cw = traj_fn(n_frames, motion_scale, seed)
    intensities, depths, gts = [], [], []
    for T in poses_cw:
        I, D = render_plane(intr, shape, T)
        intensities.append(I)
        depths.append(D)
        gts.append(np.linalg.inv(T))
    timestamps = np.arange(n_frames, dtype=np.float64) / 30.0
    return intensities, depths, gts, timestamps


def make_pair(
    intr: Intrinsics,
    shape: tuple[int, int] = (480, 640),
    state: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (I0, D0, I1, D1, gt_state).

    gt_state is the [x,y,z,yaw,pitch,roll] vector such that transforming
    source (frame 0) camera points by pose_matrix(gt_state) lands them in the
    target (frame 1) camera frame — the quantity every backend estimates.
    """
    from phovo_tpu.ops import se3

    if state is None:
        state = np.array([0.02, -0.015, 0.01, 0.008, -0.006, 0.01], dtype=np.float32)
    state = np.asarray(state, dtype=np.float32)
    T0 = np.eye(4)
    T10 = np.asarray(se3.pose_matrix(state), dtype=np.float64)  # cam0 -> cam1
    I0, D0 = render_plane(intr, shape, T0)
    I1, D1 = render_plane(intr, shape, T10 @ T0)
    return I0, D0, I1, D1, state
