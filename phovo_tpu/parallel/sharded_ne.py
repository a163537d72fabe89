"""Pixel-sharded normal equations: the reference's (dormant) OpenMP
row-parallelism (CPhotoconsistencyOdometryAnalytic.h:268-270) re-designed as
an explicit shard_map over the mesh 'pixel' axis.

Each device holds a contiguous block of SOURCE image rows (and the full
target image, which the warp gathers from arbitrary coordinates — cheap to
replicate: one 1.2 MB image vs re-communicating gathers every iteration).
A device computes the NormalEquations partials for its rows; one psum of
29 floats (21 unique JtJ + 6 Jtr + cost + count) merges them. The 6x6 solve
then happens replicated on every device — cheaper than communicating a
solution.

This is the latency-oriented decomposition (one frame, many chips); the
throughput decomposition is parallel/batch.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from phovo_tpu.models.base import AlignmentResult
from phovo_tpu.ops import pyramid as pyr
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.ops.residuals import (
    NormalEquations,
    normal_equations,
    photometric_residual_jacobian,
)
from phovo_tpu.parallel.mesh import PIXEL_AXIS
from phovo_tpu.solvers.gauss_newton import gauss_newton_level
from phovo_tpu.utils.config import PhovoConfig


def sharded_normal_equations(
    mesh: Mesh,
    source_intensity: jax.Array,  # (H, W) — rows sharded over 'pixel'
    source_depth: jax.Array,
    target_intensity: jax.Array,  # replicated
    target_grad_x: jax.Array,
    target_grad_y: jax.Array,
    state: jax.Array,
    intr: Intrinsics,
    min_depth: float,
    max_depth: float,
    sampling: str = "nearest",
) -> NormalEquations:
    """One linearization with source rows sharded; result replicated."""
    n_shards = mesh.shape[PIXEL_AXIS]
    H = source_intensity.shape[0]
    if H % n_shards != 0:
        raise ValueError(
            f"image height {H} is not divisible by the mesh '{PIXEL_AXIS}' "
            f"axis size {n_shards}; pad the image or pick a pixel_parallel "
            f"that divides every pyramid level height"
        )
    rows_per = H // n_shards

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(PIXEL_AXIS, None), P(PIXEL_AXIS, None), P(), P(), P(), P()),
        out_specs=P(),
    )
    def _ne(src_i, src_d, tgt_i, gx, gy, st):
        shard = jax.lax.axis_index(PIXEL_AXIS)
        row0 = (shard * rows_per).astype(jnp.float32)
        # Local rows index 0..rows_per-1; row_offset restores global row
        # coordinates for backprojection. The warp samples the FULL
        # (replicated) target, so projected coordinates stay global.
        r, J, valid = photometric_residual_jacobian(
            src_i, src_d, tgt_i, gx, gy, st, intr,
            min_depth=min_depth, max_depth=max_depth,
            sampling=sampling, gradient_at="warped", row_offset=row0,
        )
        ne = normal_equations(r, J, valid)
        return NormalEquations(*(jax.lax.psum(x, PIXEL_AXIS) for x in ne))

    return _ne(
        source_intensity, source_depth, target_intensity,
        target_grad_x, target_grad_y, state,
    )


def make_pixel_sharded_aligner(mesh: Mesh, config: PhovoConfig):
    """Single-pair aligner with the per-iteration linearization sharded over
    the mesh 'pixel' axis. Pyramids are built under plain GSPMD jit."""

    @jax.jit
    def align(si, sd, ti, td, intr, init_state):
        del td
        L = config.num_levels
        blur = tuple(config.blur_filter_sizes)
        int0 = pyr.build_pyramid(si, L, blur, blur_type=config.blur_type)
        dep0 = pyr.build_pyramid(sd, L, None)
        int1 = pyr.build_pyramid(ti, L, blur, blur_type=config.blur_type)
        gx1, gy1 = pyr.build_gradient_pyramid(int1, tuple(config.gradient_scales))

        state = jnp.asarray(init_state, jnp.float32)
        diags = [None] * L
        for level in range(L - 1, -1, -1):
            intr_l = intr.at_level(level)

            def linearize(s, _lvl=level):
                return sharded_normal_equations(
                    mesh, int0[_lvl], dep0[_lvl], int1[_lvl], gx1[_lvl], gy1[_lvl],
                    s, intr_l, config.min_depth, config.max_depth, config.sampling,
                )

            res = gauss_newton_level(
                linearize, state,
                max_iterations=config.max_iterations[level],
                min_gradient_norm=config.min_gradient_norms[level],
                lambda_step=config.lambda_steps[level],
            )
            state = res.state
            diags[level] = res

        return AlignmentResult(
            state=state,
            iterations=jnp.stack([d.iterations for d in diags]),
            gradient_norm=jnp.stack([d.gradient_norm for d in diags]),
            cost=jnp.stack([d.cost for d in diags]),
            num_valid=jnp.stack([d.num_valid for d in diags]),
        )

    return align
