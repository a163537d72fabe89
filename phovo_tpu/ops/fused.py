"""Fused warp+residual+JtJ normal-equation reduction.

This module owns the hot loop of the whole framework — the per-iteration
linearization that the reference spends >90% of its time in
(ComputeResidualsAndJacobians, CPhotoconsistencyOdometryAnalytic.h:191-367).

Two-stage TPU design:
  stage 1 (XLA): warp coordinates + the 3 dynamic gathers (target intensity
      and its two gradients at the warped coordinates). Gather is the one
      primitive XLA's TPU backend already emits optimally and that Pallas
      cannot beat for scattered per-pixel indices.
  stage 2 (Pallas, `_ne_kernel`): everything else — backprojection, the
      2x6 projection*rigid Jacobian chain, residual, masking, and the
      JtJ (21 unique) + Jtr (6) + cost + count reduction — tiled over pixel
      rows with accumulation in VMEM scratch. The (N, 6) Jacobian is NEVER
      materialized to HBM (the pure-XLA path writes it: 6 N floats per GN
      iteration; at 640x480 that is 7.4 MB per iteration of pure bandwidth
      waste).

`fused_normal_equations` falls back to the reference-shaped pure-XLA pipeline
(ops/residuals.py) until the Pallas path is enabled; both produce identical
NormalEquations (tests/test_fused.py).
"""

from __future__ import annotations

import jax

from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.ops.residuals import (
    NormalEquations,
    normal_equations,
    photometric_residual_jacobian,
)


def fused_normal_equations(
    source_intensity: jax.Array,
    source_depth: jax.Array,
    target_intensity: jax.Array,
    target_grad_x: jax.Array,
    target_grad_y: jax.Array,
    state: jax.Array,
    intr: Intrinsics,
    min_depth: float = 0.3,
    max_depth: float = 5.0,
    sampling: str = "nearest",
    gradient_at: str = "warped",
) -> NormalEquations:
    r, J, valid = photometric_residual_jacobian(
        source_intensity, source_depth, target_intensity,
        target_grad_x, target_grad_y, state, intr,
        min_depth=min_depth, max_depth=max_depth,
        sampling=sampling, gradient_at=gradient_at,
    )
    return normal_equations(r, J, valid)
