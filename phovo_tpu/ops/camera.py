"""Pinhole camera intrinsics with pyramid-level scaling.

The reference scales fx, fy, cx, cy by 1/2^level when working at pyramid
level `level` (CPhotoconsistencyOdometry.h:87-92,
CPhotoconsistencyOdometryAnalytic.h:203-207). We keep that exact convention
for parity (note it is NOT the half-pixel-center-preserving convention; the
divergence at coarse levels is identical in both systems so poses match).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Pinhole intrinsics. Scalars (possibly traced)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array

    @staticmethod
    def from_matrix(K) -> "Intrinsics":
        K = jnp.asarray(K)
        return Intrinsics(K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2])

    def matrix(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )

    def at_level(self, level: int) -> "Intrinsics":
        s = 1.0 / (2.0**level)
        return Intrinsics(self.fx * s, self.fy * s, self.cx * s, self.cy * s)


import numpy as _np

# TUM RGB-D intrinsics hardcoded in the reference apps (numpy scalars so
# importing the package never initializes a device backend):
# fr1 (PhotoconsistencyVisualOdometry.cpp:170-173)
TUM_FR1 = Intrinsics(
    _np.float32(517.3), _np.float32(516.5), _np.float32(318.6), _np.float32(255.3)
)
# default/kinect (PhotoconsistencyFrameAlignment.cpp:68-71)
TUM_DEFAULT = Intrinsics(
    _np.float32(525.0), _np.float32(525.0), _np.float32(319.5), _np.float32(239.5)
)
# fr2 (standard TUM calibration; not in the reference but needed for fr2/xyz)
TUM_FR2 = Intrinsics(
    _np.float32(520.9), _np.float32(521.0), _np.float32(325.1), _np.float32(249.7)
)
# fr3
TUM_FR3 = Intrinsics(
    _np.float32(535.4), _np.float32(539.2), _np.float32(320.1), _np.float32(247.6)
)

NAMED_INTRINSICS = {
    "fr1": TUM_FR1,
    "fr2": TUM_FR2,
    "fr3": TUM_FR3,
    "default": TUM_DEFAULT,
}


def backproject(depth: jax.Array, intr: Intrinsics, row_offset=0.0) -> jax.Array:
    """Depth image (H, W) -> camera-frame points (H, W, 3).

    x = (c - cx) z / fx, y = (r - cy) z / fy (reference convention,
    CPhotoconsistencyOdometry.h:109-113: columns are x, rows are y).
    row_offset: global row index of local row 0 — nonzero when the image is
    row-sharded across devices (parallel/sharded_ne.py).
    """
    H, W = depth.shape[-2:]
    c = jnp.arange(W, dtype=depth.dtype)
    r = jnp.arange(H, dtype=depth.dtype)
    cc, rr = jnp.meshgrid(c, r)
    rr = rr + row_offset
    x = (cc - intr.cx) * depth / intr.fx
    y = (rr - intr.cy) * depth / intr.fy
    return jnp.stack([x, y, depth], axis=-1)


def project(points: jax.Array, intr: Intrinsics) -> tuple[jax.Array, jax.Array]:
    """Camera-frame points (..., 3) -> pixel coords (col, row) as two arrays."""
    z = points[..., 2]
    inv_z = 1.0 / z
    col = points[..., 0] * intr.fx * inv_z + intr.cx
    row = points[..., 1] * intr.fy * inv_z + intr.cy
    return col, row
