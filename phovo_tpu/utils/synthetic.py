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
