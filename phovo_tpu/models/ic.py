"""Inverse-compositional Gauss-Newton backend (TPU-native extension).

A fourth aligner beyond the reference's three (ops/ic.py for the algorithm):
per pyramid level the Jacobian and its Cholesky factor come from the SOURCE
frame once, so each GN iteration is one single-channel sampling pass —
measured ~2x the analytic backend's throughput at identical iteration
schedules, with matching pose estimates on synthetic ground truth
(tests/test_ic.py).

Note the gradient convention: IC chains with the SOURCE image gradient, so
`gradient_scales` should approximate the true derivative (OpenCV Scharr is
unnormalized by 32; scale 0.03125 = 1/32 makes J metric). The reference's
analytic preset value 0.0625 also converges (steps are uniformly halved).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from phovo_tpu.models.base import (
    AlignmentResult,
    PhotoconsistencyOdometryBase,
    device_unit_intensity,
)
from phovo_tpu.ops import fused as fused_ops
from phovo_tpu.ops import ic as ic_ops
from phovo_tpu.ops import pyramid as pyr
from phovo_tpu.ops import se3
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.utils.config import PhovoConfig


@functools.partial(jax.jit, static_argnames=("config", "use_fused"))
def align_ic(
    source_intensity: jax.Array,
    source_depth: jax.Array,
    target_intensity: jax.Array,
    target_depth: jax.Array,  # unused (parity with the other backends)
    intr: Intrinsics,
    init_state: jax.Array,
    config: PhovoConfig,
    use_fused: bool = True,
) -> AlignmentResult:
    del target_depth
    if config.robust_loss != "none":
        # IC's speed comes from the precomputed source-frame Jacobian and its
        # frozen Cholesky factor; IRLS reweighting changes J^T W J every
        # iteration, which would silently fall back to unweighted steps here.
        # Fail loudly instead (use the analytic/biobjective/ceres backends
        # for robust losses).
        raise ValueError(
            "the IC backend does not support robust_loss="
            f"{config.robust_loss!r} (its factorization is precomputed from "
            "the source frame); use backend 'analytic', 'biobjective' or "
            "'ceres', or set robust_loss: none"
        )
    source_intensity = device_unit_intensity(source_intensity)
    target_intensity = device_unit_intensity(target_intensity)
    L = config.num_levels
    blur = tuple(config.blur_filter_sizes)
    int0 = pyr.build_pyramid(source_intensity, L, blur, blur_type=config.blur_type)
    dep0 = pyr.build_pyramid(source_depth, L, None)
    int1 = pyr.build_pyramid(target_intensity, L, blur, blur_type=config.blur_type)
    # SOURCE gradients (the defining difference from the forward backends)
    gx0, gy0 = pyr.build_gradient_pyramid(int0, tuple(config.gradient_scales))

    fused_ok = (
        use_fused and ic_ops._HAS_PALLAS and jax.default_backend() == "tpu"
    )

    T = se3.pose_matrix(jnp.asarray(init_state, jnp.float32))
    diags = [None] * L
    for level in range(L - 1, -1, -1):
        if config.max_iterations[level] <= 0:
            diags[level] = (
                jnp.int32(0), jnp.float32(0), jnp.float32(0), jnp.float32(0),
                jnp.float32(0),
            )
            continue
        intr_l = intr.at_level(level)
        H = int0[level].shape[0]
        fused_level = fused_ok and H <= fused_ops.FUSED_MAX_H
        if fused_level:
            # one-pass fused precompute (J8 rows + in-kernel Cholesky) — the
            # XLA version materializes the (H, W, 2, 6) pixel Jacobian and
            # costs ~1.8x the whole IC solve
            J8, chol = ic_ops.ic_precompute_pallas(
                int0[level], dep0[level], gx0[level], gy0[level], intr_l,
                config.min_depth, config.max_depth,
            )
            runner = ic_ops.ic_gn_level
        else:
            J8, chol = ic_ops.ic_precompute(
                int0[level], dep0[level], gx0[level], gy0[level], intr_l,
                config.min_depth, config.max_depth,
            )
            runner = ic_ops.ic_gn_level_xla
        kw = {"mix_mode": config.mix_mode} if fused_level else {}
        T, its, gnorm, cost, nvalid, masked = runner(
            T, dep0[level], J8, chol, int1[level], intr_l,
            config.max_iterations[level],
            config.min_gradient_norms[level],
            config.lambda_steps[level],
            config.sampling,
            **kw,
        )
        diags[level] = (its, gnorm, cost, nvalid, masked)

    state = se3.matrix_to_state(T)
    return AlignmentResult(
        state=state.astype(jnp.float32),
        iterations=jnp.stack([jnp.asarray(d[0], jnp.int32) for d in diags]),
        gradient_norm=jnp.stack([jnp.asarray(d[1], jnp.float32) for d in diags]),
        cost=jnp.stack([jnp.asarray(d[2], jnp.float32) for d in diags]),
        num_valid=jnp.stack([jnp.asarray(d[3], jnp.float32) for d in diags]),
        band_masked=jnp.stack([jnp.asarray(d[4], jnp.float32) for d in diags]),
    )


@functools.partial(jax.jit, static_argnames=("config", "use_fused", "warm_start"))
def align_sequence_ic(
    intensities: jax.Array,
    depths: jax.Array,
    intr: Intrinsics,
    config: PhovoConfig,
    use_fused: bool = True,
    warm_start: bool = False,
) -> AlignmentResult:
    """lax.scan over consecutive pairs with the IC aligner (see
    models/analytic.py align_sequence for the pipeline rationale)."""
    pairs = (intensities[:-1], depths[:-1], intensities[1:], depths[1:])

    def step(carry, pair):
        si, sd, ti, td = pair
        init = carry if warm_start else jnp.zeros(6, jnp.float32)
        res = align_ic(si, sd, ti, td, intr, init, config, use_fused)
        return res.state, res

    _, results = jax.lax.scan(step, jnp.zeros(6, jnp.float32), pairs)
    return results


@functools.partial(
    jax.jit,
    static_argnames=("config", "use_fused", "warm_start", "depth_scale"),
)
def align_sequence_chunk_ic(
    carry_intensity: jax.Array,
    carry_depth: jax.Array,
    intensities: jax.Array,
    depths: jax.Array,
    intr: Intrinsics,
    config: PhovoConfig,
    use_fused: bool = True,
    warm_start: bool = False,
    depth_scale: float | None = None,
):
    """IC variant of models/analytic.py align_sequence_chunk: device-resident
    carry, storage-dtype transfers, on-device conversion."""
    if depth_scale is not None and depths.dtype != jnp.float32:
        depths = depths.astype(jnp.float32) * jnp.float32(depth_scale)
    intensities = device_unit_intensity(intensities)
    # the carry may arrive in storage dtype too (u8) — route it through
    # the same unit conversion as the chunk frames
    carry_f = device_unit_intensity(carry_intensity).astype(jnp.float32)
    I = jnp.concatenate([carry_f[None], intensities])
    D = jnp.concatenate([carry_depth.astype(jnp.float32)[None], depths])
    results = align_sequence_ic(I, D, intr, config, use_fused, warm_start)
    return results, I[-1], D[-1]


class PhotoconsistencyOdometryIC(PhotoconsistencyOdometryBase):
    """Object API over `align_ic` (no reference counterpart; a TPU-native
    fourth backend)."""

    def __init__(self, config: PhovoConfig | None = None, use_fused: bool = True):
        super().__init__(config)
        self.use_fused = use_fused

    def align(self, si, sd, ti, td, intr, init_state) -> AlignmentResult:
        return align_ic(si, sd, ti, td, intr, init_state, self.config, self.use_fused)

    def align_full_band(self, si, sd, ti, td, intr, init_state):
        return align_ic(
            si, sd, ti, td, intr, init_state, self.config, use_fused=False
        )
