"""Sublane-batched inverse-compositional whole-level kernel.

The IC batched variant of ops/fused_batch.py: S independent pairs stacked
on the SUBLANE axis inside one whole-level kernel.  IC benefits even more
than the forward backend — its per-iteration payload is ONE single-channel
sampling pass (the Jacobian and its Cholesky factor are per-pair constants
from ic_precompute, ops/ic.py:57), so nearly everything else in an
iteration is amortizable elementwise/scalar work:

  - warp/projection on (S, NT) arrays — S pairs per vector op;
  - g = J0^T r as 6 lane reductions over (S, NT) products (the per-pair
    kernel's (8, NT) x (NT, 1) MXU dot, re-associated);
  - the frozen triangular solves and the matrix-form pose composition
    vectorized on (S, 1) scalars (ops/ic.py _tri_solve /
    _compose_inverse_update are written over generic scalars and
    broadcast unchanged over (S, 1) vectors);
  - only the one/two-hot sampling masks and the single-channel column-mix
    dot stay per-pair (they encode each pair's own warped coordinates).

Used by the IC level-major sequence path (models/ic.py
align_sequence_ic_levelmajor) under the same gating as the analytic one:
zero-init pair semantics, per-level VMEM-fitting tiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from phovo_tpu.ops.fused import (
    _ceil8,
    _pick_tile_pixels,
    mixed_col_dot,
)
from phovo_tpu.ops.ic import _compose_inverse_update, _tri_solve

try:  # pragma: no cover - import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_VMEM_BUDGET = 27_000_000  # calibrated in ops/fused_batch.py
_LIVE_ROWS = 22  # live (S, NT) temporaries (fewer than the forward kernel:
# no Jacobian-chain columns — J8 rows come from VMEM)


def _ic_batch_tilings(H: int, W: int):
    """(S, NT) for the batched IC kernel at an H x W level, or None.

    Per-stream inputs: geom (3, NP) + J8 (8, NP) + target (HP, W); the
    heavy J8 rows make IC's per-stream footprint ~2x the forward
    kernel's, so the fine levels run at smaller S."""
    NP, NT_def = _pick_tile_pixels(H, W)
    HP = _ceil8(H)
    nts = [
        t for t in range(128, NP + 1, 128)
        if NP % t == 0 and t <= NT_def
    ]
    for S in (32, 16, 8):
        inputs = 2 * 4 * S * (11 * NP + HP * W)
        if inputs > _VMEM_BUDGET:
            continue
        fitting = [
            t for t in nts
            if inputs + 4 * (_LIVE_ROWS * S * t + (W + 64) * t)
            <= _VMEM_BUDGET
        ]
        if fitting:
            return S, max(fitting)
    return None


def _ic_gn_batch_kernel(
    states_ref,  # (S, 16) VMEM rows [R row-major (9), t (3), pad (4)]
    const_ref,  # (1, 8) SMEM [fx fy cx cy 0...]
    L_ref,  # (S, 36) VMEM row-major per-pair Cholesky factors
    geom_ref,  # (3*S, NP) VMEM TYPE-major rows [t*S + s] ([px, py, pz])
    J8_ref,  # (8*S, NP) VMEM TYPE-major rows [t*S + s] ([J0..J5; I0; valid0])
    t_i_ref,  # (S*HP, W) VMEM stream-major padded target intensities
    state_out_ref,  # (S, 16) VMEM
    diag_out_ref,  # (S, 8) VMEM [it, ||g||, cost, nvalid, band_masked, 0..]
    *,
    S,
    H,
    W,
    NT,
    NP,
    bilinear,
    max_iterations,
    min_gradient_norm,
    lambda_step,
    mix_mode="f32",
):
    """S whole IC GN levels in lockstep, batch on the sublane axis.

    Carry: 12 pose scalars + [it, gnorm, cost, nvalid, masked], all (S, 1)
    vectors.  Per-pair freeze semantics identical to ops/ic.py
    _ic_gn_kernel (a pair below the gradient threshold stops updating)."""
    fx = const_ref[0, 0]
    fy = const_ref[0, 1]
    cx = const_ref[0, 2]
    cy_ = const_ref[0, 3]
    HP = _ceil8(H)
    n_tiles = NP // NT
    tile_rows = max(1, NT // W)
    BAND = 32 if (H > 48 and tile_rows * 2 <= 32) else H

    def level_pass(R, t):
        """One linearization over all tiles: (g [6] (S,1), cost, nvalid,
        masked) as lane reductions over (S, NT) products."""
        R00, R01, R02, R10, R11, R12, R20, R21, R22 = R
        t0, t1, t2 = t

        def tile_entries(step):
            if n_tiles == 1:
                px = geom_ref[0 * S:1 * S, :]
                py = geom_ref[1 * S:2 * S, :]
                pz = geom_ref[2 * S:3 * S, :]
                J8 = [J8_ref[k * S:(k + 1) * S, :] for k in range(8)]
            else:
                off = pl.multiple_of(step * NT, 128)
                px = geom_ref[0 * S:1 * S, pl.ds(off, NT)]
                py = geom_ref[1 * S:2 * S, pl.ds(off, NT)]
                pz = geom_ref[2 * S:3 * S, pl.ds(off, NT)]
                J8 = [
                    J8_ref[k * S:(k + 1) * S, pl.ds(off, NT)]
                    for k in range(8)
                ]
            tx = R00 * px + R01 * py + R02 * pz + t0
            ty = R10 * px + R11 * py + R12 * pz + t1
            tz = R20 * px + R21 * py + R22 * pz + t2
            safe_z = jnp.where(jnp.abs(tz) > 1e-12, tz, 1e-12)
            iz = 1.0 / safe_z
            u = tx * fx * iz + cx
            v = ty * fy * iz + cy_
            valid = (J8[7] > 0.5) & (tz > 0)

            if bilinear:
                c0 = jnp.floor(u)
                r0 = jnp.floor(v)
                fc = u - c0
                fr = v - r0
                inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
            else:
                c0 = jnp.round(u)
                r0 = jnp.round(v)
                fc = fr = None
                inb = (c0 >= 0) & (c0 <= W - 1) & (r0 >= 0) & (r0 <= H - 1)
            valid = valid & inb
            c_lo = jnp.clip(c0, 0, W - 1).astype(jnp.int32)
            r_lo = jnp.clip(r0, 0, H - 1).astype(jnp.int32)
            if bilinear:
                c_hi = jnp.clip(c0 + 1, 0, W - 1).astype(jnp.int32)
                r_hi = jnp.clip(r0 + 1, 0, H - 1).astype(jnp.int32)
            else:
                c_hi = c_lo
                r_hi = r_lo

            if BAND < H:
                rmin = jnp.min(
                    jnp.where(valid, r_lo, jnp.int32(H)), axis=1, keepdims=True
                )  # (S, 1)
                band = jnp.clip(rmin, 0, HP - BAND)
                band = (band // 8) * 8
                in_band = (r_lo >= band) & (r_hi <= band + (BAND - 1))
                masked_t = jnp.sum(
                    jnp.where(valid & ~in_band, 1.0, 0.0),
                    axis=1, keepdims=True,
                )
                valid = valid & in_band
                r_lo_loc = r_lo - band
                r_hi_loc = r_hi - band
            else:
                band = None
                masked_t = jnp.zeros((S, 1), jnp.float32)
                r_lo_loc = r_lo
                r_hi_loc = r_hi

            iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, NT), 0)
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (BAND, NT), 0)
            rows = []
            for s in range(S):
                cl_s = c_lo[s:s + 1]
                if bilinear:
                    ch_s = c_hi[s:s + 1]
                    fc_s = fc[s:s + 1]
                    colw = jnp.where(iota_w == cl_s, 1.0 - fc_s, 0.0) + jnp.where(
                        iota_w == ch_s, fc_s, 0.0
                    )
                else:
                    colw_dtype = (
                        jnp.float32 if mix_mode == "f32" else jnp.bfloat16
                    )
                    colw = (iota_w == cl_s).astype(colw_dtype)
                if BAND < H:
                    b_s = pl.multiple_of(band[s, 0], 8)
                    block = t_i_ref[pl.ds(s * HP + b_s, BAND), :]
                else:
                    block = t_i_ref[s * HP:s * HP + H, :]
                C = mixed_col_dot(block, colw, mix_mode, bilinear)
                rl_s = r_lo_loc[s:s + 1]
                if bilinear:
                    rh_s = r_hi_loc[s:s + 1]
                    fr_s = fr[s:s + 1]
                    roww = jnp.where(iota_h == rl_s, 1.0 - fr_s, 0.0) + jnp.where(
                        iota_h == rh_s, fr_s, 0.0
                    )
                else:
                    roww = jnp.where(iota_h == rl_s, 1.0, 0.0)
                rows.append(jnp.sum(C * roww, axis=0, keepdims=True))
            i1w = jnp.concatenate(rows, axis=0)  # (S, NT)

            validf = valid.astype(jnp.float32)
            r = (i1w - J8[6]) * validf

            def red(a, b):
                return jnp.sum(a * b, axis=1, keepdims=True)  # (S, 1)

            g_t = [red(J8[i], r) for i in range(6)]
            cost_t = red(r, r)
            nval_t = jnp.sum(validf, axis=1, keepdims=True)
            return g_t, cost_t, nval_t, masked_t

        if n_tiles == 1:
            return tile_entries(0)

        def acc_tile(ti, acc):
            g_a, c_a, n_a, m_a = acc
            g_t, c_t, n_t, m_t = tile_entries(ti)
            return (
                [g_a[i] + g_t[i] for i in range(6)],
                c_a + c_t, n_a + n_t, m_a + m_t,
            )

        zeros = states_ref[:, 12:13] * 0.0
        init = ([zeros] * 6, zeros, zeros, zeros)
        return jax.lax.fori_loop(0, n_tiles, acc_tile, init)

    def L_get(i, j):
        return L_ref[:, i * 6 + j:i * 6 + j + 1]  # (S, 1)

    # frozen factors: reciprocals hoisted out of the iteration loop
    inv_diag = [1.0 / L_get(i, i) for i in range(6)]

    def active(it, gnorm):
        return (it < max_iterations) & (gnorm >= min_gradient_norm)

    def cond(carry):
        return jnp.any(active(carry[12], carry[13]))

    def body(carry):
        R = carry[:9]
        t = carry[9:12]
        it, gnorm, cost_c, nval_c, mask_c = carry[12:17]
        act = active(it, gnorm)
        g, cost, nvalid, masked = level_pass(R, t)
        delta = _tri_solve(L_get, g, inv_diag)
        finite = jnp.isfinite(delta[0])
        for k in range(1, 6):
            finite = finite & jnp.isfinite(delta[k])
        newR, newt = _compose_inverse_update(R, t, delta, lambda_step)
        upd = act & finite
        R_out = tuple(jnp.where(upd, n, o) for n, o in zip(newR, R))
        t_out = tuple(jnp.where(upd, n, o) for n, o in zip(newt, t))
        gnorm_new = jnp.sqrt(sum(x * x for x in g))
        actf = act.astype(jnp.float32)
        return R_out + t_out + (
            it + actf,
            jnp.where(act, gnorm_new, gnorm),
            jnp.where(act, cost, cost_c),
            jnp.where(act, nvalid, nval_c),
            jnp.where(act, jnp.maximum(mask_c, masked), mask_c),
        )

    pose_init = tuple(states_ref[:, k:k + 1] for k in range(12))
    zero = states_ref[:, 12:13] * 0.0
    init = pose_init + (
        zero, zero + jnp.float32(jnp.inf), zero, zero, zero,
    )
    final = jax.lax.while_loop(cond, body, init)
    state_cols = list(final[:12]) + [zero] * 4
    state_out_ref[:, :] = jnp.concatenate(state_cols, axis=1)
    g = final[13]
    diag_cols = [
        final[12],
        jnp.where(jnp.isfinite(g), g, zero),
        final[14],
        final[15],
        final[16],
        zero, zero, zero,
    ]
    diag_out_ref[:, :] = jnp.concatenate(diag_cols, axis=1)


def ic_gn_level_batch(
    Ts,  # (B, 4, 4) current pose estimates
    geom,  # (B, 3, NP) hoisted source geometry (pack_geometry, no valid row)
    J8,  # (B, 8, NP) from ic_precompute (padded to NP)
    L,  # (B, 36) row-major Cholesky factors
    t_i,  # (B, HP, W) row-padded target intensities
    intr,
    max_iterations: int,
    min_gradient_norm: float,
    lambda_step: float,
    *,
    H: int,
    W: int,
    sampling: str = "nearest",
    interpret: bool = False,
    mix_mode: str = "f32",
    streams: int | None = None,
):
    """Run ONE whole IC GN level for B independent pairs, S per grid block.

    Returns (T' (B, 4, 4), iterations (B,), gradient_norm (B,), cost (B,),
    num_valid (B,), band_masked (B,)) — per-pair semantics identical to
    ops/ic.py ic_gn_level."""
    B = Ts.shape[0]
    NP, _ = _pick_tile_pixels(H, W)
    HP = _ceil8(H)
    tiling = _ic_batch_tilings(H, W)
    if tiling is None:
        raise ValueError(
            f"no VMEM-fitting IC batch tiling at {H}x{W}; use the per-pair "
            "kernel (ops/ic.py ic_gn_level)"
        )
    S, NT = tiling
    if streams:
        from phovo_tpu.ops.fused_batch import _check_streams_override

        _check_streams_override(streams, interpret)
        S = streams
    NB = -(-B // S)
    pad = NB * S - B
    state_rows = jnp.concatenate(
        [
            Ts[:, :3, :3].reshape(B, 9),
            Ts[:, :3, 3].reshape(B, 3),
            jnp.zeros((B, 4), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)  # (B, 16)
    if pad:
        def _pad(a):
            return jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)

        state_rows = _pad(state_rows)
        geom = _pad(jnp.asarray(geom))
        J8 = _pad(jnp.asarray(J8))
        L = _pad(jnp.asarray(L))
        t_i = _pad(jnp.asarray(t_i))

    geom_k = (
        jnp.asarray(geom)
        .reshape(NB, S, 3, NP)
        .transpose(0, 2, 1, 3)
        .reshape(NB * 3 * S, NP)
    )
    J8_k = (
        jnp.asarray(J8)
        .reshape(NB, S, 8, NP)
        .transpose(0, 2, 1, 3)
        .reshape(NB * 8 * S, NP)
    )
    t_k = jnp.asarray(t_i).reshape(NB * S * HP, W)
    L_k = jnp.asarray(L, jnp.float32).reshape(NB * S, 36)
    const = jnp.stack(
        [
            jnp.float32(intr.fx), jnp.float32(intr.fy),
            jnp.float32(intr.cx), jnp.float32(intr.cy),
            jnp.float32(0), jnp.float32(0), jnp.float32(0), jnp.float32(0),
        ]
    ).reshape(1, 8)

    kernel = functools.partial(
        _ic_gn_batch_kernel,
        S=S, H=H, W=W, NT=NT, NP=NP,
        bilinear=(sampling == "bilinear"),
        max_iterations=float(max_iterations),
        min_gradient_norm=float(min_gradient_norm),
        lambda_step=float(lambda_step),
        mix_mode=mix_mode,
    )
    # Mosaic's actual scoped allocation runs up to ~1.7x the plan model
    # (buffer double-use the model can't see) — measured 31 MB at a 27 MB
    # plan on the 128x160 level; the raised limit absorbs it (v5e VMEM is
    # comfortably larger: an 80 MB-limit compile succeeds on-device)
    params = pltpu.CompilerParams(vmem_limit_bytes=48_000_000)
    state_out, diag = pl.pallas_call(
        kernel,
        grid=(NB,),
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((S, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, 36), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3 * S, NP), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8 * S, NP), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (S * HP, W), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((S, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NB * S, 16), jnp.float32),
            jax.ShapeDtypeStruct((NB * S, 8), jnp.float32),
        ),
        interpret=interpret,
    )(state_rows, const, L_k, geom_k, J8_k, t_k)
    state_out = state_out[:B]
    Tn = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    Tn = Tn.at[:, :3, :3].set(state_out[:, :9].reshape(B, 3, 3))
    Tn = Tn.at[:, :3, 3].set(state_out[:, 9:12])
    return (
        Tn,
        diag[:B, 0].astype(jnp.int32),
        diag[:B, 1],
        diag[:B, 2],
        diag[:B, 3],
        diag[:B, 4],
    )
