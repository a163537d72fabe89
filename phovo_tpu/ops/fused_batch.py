"""Sublane-batched whole-level GN kernel: S independent pairs per vector op.

The per-pair whole-level kernel (ops/fused.py _fused_gn_kernel) runs the
reference's per-level loop (CPhotoconsistencyOdometryAnalytic.h:499-563) as
an in-kernel while_loop, but every per-pixel quantity lives in (1, NT) rows:
one sublane of each 8x128 vreg carries data, the other seven idle.  The r4
ablation (BASELINE.md "Per-iteration cost itemization") shows the coarse
levels are dominated by exactly this amortizable VPU/scalar work — at 30x40
only ~0.2 us of the 1.7 us iteration is sampling; the rest is elementwise
geometry/Jacobian/solve/loop overhead that does not shrink with image size.

This module re-lays the batch on the SUBLANE axis: S pairs' pixels are
(S, NT) arrays, so geometry, the 2x6 Jacobian chain, residual/column
builds, the normal-equation reductions and the 6x6 Cholesky solves all
process S pairs per vector op.  Per-pair work that encodes pair-specific
warped coordinates (the one/two-hot sampling masks and the column-mix MXU
dots, see ops/fused.py _fused_gn_multi_kernel's note on why streams cannot
share a sampling rhs) stays a per-pair loop — it is the irreducible payload.

Differences from fused_gn_level_multi (which loops S full linearizations):
here only sampling is per-pair; everything else is one batched op.  The
normal equations are computed as lane reductions over (S, NT) products
instead of an MXU Gram — same f32 math, summation order differs at ulp
level (tests pin agreement with the per-pair kernel).

The level wrapper fans a B-pair chunk over a Pallas GRID of B/S blocks;
grid pipelining double-buffers the next block's HBM->VMEM transfer behind
the current block's iterations.  Used by the level-major sequence path
(models/analytic.py align_sequence_levelmajor): the reference semantics
zero-initialize every pair (PhotoconsistencyVisualOdometry.cpp:224), so all
pairs of a chunk are independent and can advance in lockstep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from phovo_tpu.ops.fused import (
    BAND_TARGET,
    _ceil8,
    _chol_solve6,
    _pick_tile_pixels,
    _split_sample,
    mixed_col_dot,
)
from phovo_tpu.ops.robust import sqrt_weight as robust_sqrt_weight

try:  # pragma: no cover - import guard
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# VMEM plan for one grid block: Mosaic double-buffers the input blocks
# across grid steps, plus the working set of ~30 live (S, NT) f32 arrays
# and the per-pair sampling masks.  The budget is CALIBRATED on-device
# (v5e): S=16 at 120x160 (model ~26.6 MB) compiles and is the fastest
# measured tiling; S=32 there (model ~40 MB) exceeds VMEM.  The model
# reproduces the measured-best (S, NT) at every headline level
# (30x40 S=32/NT=1280, 60x80 S=32/NT=1280, 120x160 S=16/NT=2432).
_VMEM_BUDGET = 27_000_000
_LIVE_ROWS = 30  # conservative count of live (S, NT) temporaries
# minimum level height for the banded row window in the BATCH kernel
# (below it the full-band static slices win; measured at 60x80 — see
# BASELINE r5 band notes). Module constant so A/B probes can flip it.
_BAND_MIN_H = 48
# colsplit row-band floor: 24 = tile span + 8-alignment slop + >=8 rows of
# vertical-motion/parallax margin at the shipped tilings
_COLSPLIT_BAND_FLOOR = 24


def _check_streams_override(streams: int, interpret: bool) -> None:
    """The `streams` override replaces the VMEM-calibrated S AFTER
    _batch_tilings validated the budget, so it must itself respect the
    sublane constraint: Pallas block shapes need the second-to-last dim
    divisible by 8 on device. Interpret mode (CPU tests) has no such
    constraint — small S keeps those tests fast."""
    if not interpret and streams % 8 != 0:
        raise ValueError(
            f"streams override {streams} must be a multiple of 8 on device "
            "(Mosaic sublane constraint); arbitrary values are "
            "interpret-only"
        )


def _batch_tilings(
    H: int, W: int, esm: bool = False, bi: bool = False,
    shared_src: bool = False, tr: bool = False,
    colsplit: bool = False,
):
    """(S, NT) for the sublane-batched kernel at an H x W level, or None.

    S must be a sublane multiple (Pallas block shapes need the second-to-
    last dim divisible by 8); the batch tile NT is any 128-multiple divisor
    of the per-pair NP — shrinking it trades per-tile overhead for a
    smaller working set, so fine levels can keep S = 8 by tiling finer.
    Prefers the largest S, then the largest NT that fits the budget.

    shared_src: the keyframe-tracking layout — ONE source pack (intensity
    row + geometry) shared by every stream of every block, so only the
    per-stream target stacks scale with S. The shared pack is not
    double-buffered across grid steps (same block every step), hence the
    single 4-byte factor.
    """
    GR = 6 if esm else 4
    CH = 6 if bi else 3
    HP = _ceil8(H)
    if colsplit:
        # column-split layout (colsplit_ok): pixels half-major, target
        # stored as two 128-wide planes (TW = 256); tiles must divide the
        # per-half count NPH and keep the banded row span
        NP, NPH = _colsplit_pixels(H, W)
        Wh = W // 2
        TW = 256
        MW = 128  # column-mask width
        nts = [
            t for t in range(128, NPH + 1, 128)
            if NPH % t == 0 and (t // max(Wh, 1)) * 2 <= BAND_TARGET
        ]
    else:
        NP, NT_def = _pick_tile_pixels(H, W)
        TW = W
        MW = W
        nts = [
            t for t in range(128, NP + 1, 128)
            if NP % t == 0 and t <= NT_def
        ]
    # depth block temporaries (+10 bi); shared-source blocks additionally
    # MATERIALIZE (S, NT) broadcasts of the GR geometry rows that the
    # per-pair layout reads as input views (measured: S=32 at 120x160
    # shared = 28.7 MB actual vs the uncorrected 26.3 MB model -> Mosaic
    # stack OOM; with the correction the picker lands on S=16, which
    # measures within 1.5% of the raised-limit S=32 anyway)
    # tr: the trust-region kernel linearizes TWICE per body (trial step
    # accept/reject), so the two linearizations' (S, NT) temporaries
    # overlap on the Mosaic stack — measured +2.3 MB (~15 rows at the
    # GN-chosen 256-chunk VGA tiling) over the GN model, a real OOM
    live = (
        _LIVE_ROWS + (10 if bi else 0) + (GR if shared_src else 0)
        + (16 if tr else 0)
    )
    for S in (32, 16, 8):
        src_bytes = NP * (1 + GR) * (4 if shared_src else 2 * 4 * S)
        inputs = src_bytes + 2 * 4 * S * CH * HP * TW
        if inputs > _VMEM_BUDGET:
            continue
        fitting = [
            t for t in nts
            if inputs + 4 * (live * S * t + (MW + 2 * BAND_TARGET) * t)
            <= _VMEM_BUDGET
        ]
        if fitting:
            return S, max(fitting)
    return None


def colsplit_ok(H: int, W: int) -> bool:
    """True when the COLUMN-SPLIT fine-level layout applies (r4 analysis,
    BASELINE.md "column-banded fine-level sampling"; implemented r5): W
    wider than one 128-lane MXU pass but narrow enough that each
    half-image's 128-column plane keeps >= 16 px of horizontal warp
    margin. At the headline's 120x160 level the column mask and the
    column-mix dot shrink from K=W=160 (two MXU passes, the second 25%
    occupied) to ONE full K=128 pass — measured bound: a same-pixel-count
    W=128 level costs 26.0 vs 42.6 us/pair."""
    return 128 < W <= 224 and W % 2 == 0


def _colsplit_pixels(H: int, W: int) -> tuple[int, int]:
    """(NP_CS, NPH): column-split padded pixel count. Pixels are ordered
    [left-half rows..., pad][right-half rows..., pad], each half padded
    to NPH (multiple of 128); tiles never straddle halves."""
    Wh = W // 2
    NPH = -(-(H * Wh) // 128) * 128
    return 2 * NPH, NPH


def colsplit_order(H: int, W: int) -> np.ndarray:
    """(NP_CS,) int32 row-major flat source index for each column-split
    slot, -1 on padding slots (consumers zero those lanes)."""
    NP_CS, NPH = _colsplit_pixels(H, W)
    Wh = W // 2
    idx = np.arange(H * W, dtype=np.int32).reshape(H, W)
    out = np.full(NP_CS, -1, np.int32)
    left = idx[:, :Wh].reshape(-1)
    right = idx[:, Wh:].reshape(-1)
    out[: left.size] = left
    out[NPH: NPH + right.size] = right
    return out


def colsplit_gather(flat, order):
    """Gather (..., H*W) row-major flat pixel rows into the column-split
    order; padding slots (-1) become 0."""
    safe = jnp.clip(order, 0, flat.shape[-1] - 1)
    g = jnp.take(flat, safe, axis=-1)
    return jnp.where(order >= 0, g, jnp.zeros((), flat.dtype))


def pack_target_colsplit(target_intensity, target_grad_x, target_grad_y):
    """(3*HP, 256) two-plane channel stack for the column-split kernel:
    plane 0 = global columns [0, 128), plane 1 = [W-128, W). The kernel
    slices the tile's plane with a 128-aligned lane window, so the
    column-mix dot runs ONE full K=128 MXU pass instead of two partial
    W-deep passes (see colsplit_ok)."""
    from phovo_tpu.ops.fused import pack_target_colmajor

    t = pack_target_colmajor(target_intensity, target_grad_x, target_grad_y)
    W = t.shape[1]
    return jnp.concatenate([t[:, :128], t[:, W - 128:]], axis=1)


def _batch_linearize(
    s0, s1, s2, s3, s4, s5, *,
    fx, fy, cx, cy, gain,
    i0_ref, geom_ref, t_all_ref,
    S, H, W, NT, NP, bilinear, mix_mode,
    robust_loss, robust_delta, esm, bi,
    shared_src=False,
    row_mix="reduce",
    colsplit=False,
):
    """(S,1) state vectors -> normal-equation entries as (S,1) vectors.

    The shared batched linearization of the GN and trust-region batch
    kernels: the batched analog of the per-pair 8x8/16x16 Gram
    (ops/fused.py _linearize_gram), computed as lane reductions over
    (S, NT) column products.  Returns (A [6][6], b [6], cost, nvalid,
    masked).

    shared_src: i0_ref is (1, NP) and geom_ref (GR, NP) — ONE source
    frame (the keyframe) shared by all S streams; the (1, NT) source rows
    broadcast against the (S, 1) per-stream states in every vector op."""
    SS = 1 if shared_src else S  # source stream multiplicity
    HP = _ceil8(H)
    n_tiles = NP // NT
    # column-split tiles span rows of a HALF image (colsplit_ok): the
    # banded row span halves accordingly
    tile_rows = max(1, NT // (W // 2 if colsplit else W))
    if colsplit:
        # colsplit tiles span few source rows, so the row band can shrink
        # to (tile span + 8-alignment slop + >=8 rows of vertical-motion
        # margin), floored at 24: the sampling dot's M axis drops from
        # 3*32=96 to 3*24=72 rows (measured +15% headline; a BAND of 16
        # would leave ~1 row of worst-case margin — masks fire on normal
        # motion)
        BAND_w = max(_COLSPLIT_BAND_FLOOR, _ceil8(tile_rows + 8) + 8)
        BAND = BAND_w if (H > 48 and BAND_w < H) else H
    else:
        # the banded window wins down to 60x80 (in-process A/B,
        # BASELINE.md r5 band notes: banded 10.5k vs full-band 9.1k fps
        # headline — an earlier cross-process composite suggesting
        # full-band was session drift); _BAND_MIN_H stays at the r4
        # threshold and exists so the A/B remains reproducible
        BAND = (
            BAND_TARGET
            if (H > _BAND_MIN_H and tile_rows * 2 <= BAND_TARGET)
            else H
        )
    CH = 6 if bi else 3
    if colsplit and n_tiles < 2:
        raise ValueError("colsplit needs >= 2 tiles (one per half)")
    cyw, syw = jnp.cos(s3), jnp.sin(s3)
    cp, sp = jnp.cos(s4), jnp.sin(s4)
    cr, sr = jnp.cos(s5), jnp.sin(s5)
    # rotation rows (ZYX, ops/se3.pose_matrix) — all (S, 1)
    R00, R01, R02 = cyw * cp, cyw * sp * sr - syw * cr, cyw * sp * cr + syw * sr
    R10, R11, R12 = syw * cp, syw * sp * sr + cyw * cr, syw * sp * cr - cyw * sr
    R20, R21, R22 = -sp, cp * sr, cp * cr
    dY00, dY01, dY02 = -syw * cp, -syw * sp * sr - cyw * cr, -syw * sp * cr + cyw * sr
    dY10, dY11, dY12 = cyw * cp, cyw * sp * sr - syw * cr, cyw * sp * cr + syw * sr
    dP00, dP01, dP02 = -cyw * sp, cyw * cp * sr, cyw * cp * cr
    dP10, dP11, dP12 = -syw * sp, syw * cp * sr, syw * cp * cr
    dP20, dP21, dP22 = -cp, -sp * sr, -sp * cr
    dR01y, dR02y = cyw * sp * cr + syw * sr, -cyw * sp * sr + syw * cr
    dR11y, dR12y = syw * sp * cr - cyw * sr, -syw * sp * sr - cyw * cr
    dR21y, dR22y = cp * cr, -cp * sr

    def tile_entries(step):
        if n_tiles == 1:
            off = 0
            px = geom_ref[0 * SS:1 * SS, :]
            py = geom_ref[1 * SS:2 * SS, :]
            pz = geom_ref[2 * SS:3 * SS, :]
            vd = geom_ref[3 * SS:4 * SS, :]
            i0 = i0_ref[:, :]
        else:
            off = pl.multiple_of(step * NT, 128)
            px = geom_ref[0 * SS:1 * SS, pl.ds(off, NT)]
            py = geom_ref[1 * SS:2 * SS, pl.ds(off, NT)]
            pz = geom_ref[2 * SS:3 * SS, pl.ds(off, NT)]
            vd = geom_ref[3 * SS:4 * SS, pl.ds(off, NT)]
            i0 = i0_ref[:, pl.ds(off, NT)]

        tx = R00 * px + R01 * py + R02 * pz + s0
        ty = R10 * px + R11 * py + R12 * pz + s1
        tz = R20 * px + R21 * py + R22 * pz + s2
        safe_z = jnp.where(jnp.abs(tz) > 1e-12, tz, 1e-12)
        iz = 1.0 / safe_z
        u = tx * fx * iz + cx
        v = ty * fy * iz + cy
        valid = (vd > 0.5) & (tz > 0)

        ry0 = dY00 * px + dY01 * py + dY02 * pz
        ry1 = dY10 * px + dY11 * py + dY12 * pz
        rp0 = dP00 * px + dP01 * py + dP02 * pz
        rp1 = dP10 * px + dP11 * py + dP12 * pz
        rp2 = dP20 * px + dP21 * py + dP22 * pz
        rr0 = dR01y * py + dR02y * pz
        rr1 = dR11y * py + dR12y * pz
        rr2 = dR21y * py + dR22y * pz

        a0 = fx * iz
        a2 = -fx * tx * iz * iz
        b1 = fy * iz
        b2 = -fy * ty * iz * iz
        Ju0, Ju2 = a0, a2
        Ju3 = a0 * ry0
        Ju4 = a0 * rp0 + a2 * rp2
        Ju5 = a0 * rr0 + a2 * rr2
        Jv1, Jv2 = b1, b2
        Jv3 = b1 * ry1
        Jv4 = b1 * rp1 + b2 * rp2
        Jv5 = b1 * rr1 + b2 * rr2

        if bilinear:
            c0g = jnp.floor(u)
            r0 = jnp.floor(v)
            fc = u - c0g
            fr = v - r0
            inb = (u >= 0) & (u < W) & (v >= 0) & (v < H)
        else:
            c0g = jnp.round(u)
            r0 = jnp.round(v)
            fc = fr = None
            inb = (c0g >= 0) & (c0g <= W - 1) & (r0 >= 0) & (r0 <= H - 1)
        valid = valid & inb
        if colsplit:
            # column-split: this tile's pixels sample from ONE 128-wide
            # plane (left = global cols [0,128), right = [W-128, W));
            # columns localize by the plane offset. Valid pixels whose
            # warp leaves the plane's window are counted into masked_t
            # (the band_fallback observability gate), like the row band.
            plane = jnp.where(
                jnp.int32(step) * NT >= NP // 2, jnp.int32(1), jnp.int32(0)
            )
            coff = (plane * (W - 128)).astype(jnp.float32)
            c0 = c0g - coff
            CW = 128
            if bilinear:
                # interior window edges mask (observability); PLANE 1's
                # window right edge IS the image right edge, where the
                # two taps collapse onto the last column exactly like the
                # row-major path's clip. The carve-out must NOT apply to
                # plane 0 (its window edge at global col 127 is interior:
                # a left-half pixel warping to u >= W-1 would otherwise
                # silently sample col 127 instead of masking).
                win = (c0 >= 0) & (
                    (c0 + 1 <= CW - 1)
                    | ((plane == 1) & (u >= W - 1))
                )
            else:
                win = (c0 >= 0) & (c0 <= CW - 1)
        else:
            plane = None
            c0 = c0g
            CW = W
            win = None
        c_lo = jnp.clip(c0, 0, CW - 1).astype(jnp.int32)  # (S, NT)
        r_lo = jnp.clip(r0, 0, H - 1).astype(jnp.int32)
        if bilinear:
            c_hi = jnp.clip(c0 + 1, 0, CW - 1).astype(jnp.int32)
            r_hi = jnp.clip(r0 + 1, 0, H - 1).astype(jnp.int32)
        else:
            c_hi = c_lo
            r_hi = r_lo

        # Banded row window, per pair: each pair's tile lands in its own
        # narrow target-row band (see ops/fused.py _linearize_gram).
        # The band minimum is a batched lane reduction; the window
        # slices below are per-pair (they index pair s's target).
        if BAND < H:
            rmin = jnp.min(
                jnp.where(valid, r_lo, jnp.int32(H)), axis=1, keepdims=True
            )  # (S, 1)
            band = jnp.clip(rmin, 0, HP - BAND)
            band = (band // 8) * 8
            in_sel = (r_lo >= band) & (r_hi <= band + (BAND - 1))
            if win is not None:
                in_sel = in_sel & win
            masked_t = jnp.sum(
                jnp.where(valid & ~in_sel, 1.0, 0.0),
                axis=1, keepdims=True,
            )  # (S, 1)
            valid = valid & in_sel
            r_lo_loc = r_lo - band
            r_hi_loc = r_hi - band
        else:
            band = None
            if win is not None:
                masked_t = jnp.sum(
                    jnp.where(valid & ~win, 1.0, 0.0),
                    axis=1, keepdims=True,
                )
                valid = valid & win
            else:
                masked_t = jnp.zeros((S, 1), jnp.float32)
            r_lo_loc = r_lo
            r_hi_loc = r_hi

        # --- per-pair sampling: one/two-hot column mask, column-mix MXU
        # dot against pair s's banded target stack, row-mix reduce ---
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (CW, NT), 0)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (BAND, NT), 0)
        samp_rows = [[] for _ in range(CH)]
        for s in range(S):
            cl_s = c_lo[s:s + 1]  # (1, NT)
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
            base = s * CH * HP
            if colsplit:
                csl = pl.ds(pl.multiple_of(plane * 128, 128), 128)
            else:
                csl = slice(None)
            if BAND < H:
                b_s = pl.multiple_of(band[s, 0], 8)
                blocks = [
                    t_all_ref[pl.ds(base + ch * HP + b_s, BAND), csl]
                    for ch in range(CH)
                ]
            else:
                blocks = [
                    t_all_ref[base + ch * HP:base + ch * HP + H, csl]
                    for ch in range(CH)
                ]
            if mix_mode == "bf16x2g":
                C_ch = _split_sample(
                    blocks, colw, bilinear, exact=(0, 3) if bi else (0,)
                )
            else:
                C = mixed_col_dot(
                    jnp.concatenate(blocks, axis=0), colw, mix_mode,
                    bilinear,
                )
                C_ch = [C[ch * BAND:(ch + 1) * BAND] for ch in range(CH)]
            rl_s = r_lo_loc[s:s + 1]
            if bilinear:
                rh_s = r_hi_loc[s:s + 1]
                fr_s = fr[s:s + 1]
                roww = jnp.where(iota_h == rl_s, 1.0 - fr_s, 0.0) + jnp.where(
                    iota_h == rh_s, fr_s, 0.0
                )
            else:
                roww = jnp.where(iota_h == rl_s, 1.0, 0.0)
            if row_mix == "onesdot":
                # defer the reductions: collect the masked products and
                # reduce ALL streams x channels with ONE block-diagonal
                # MXU dot below (VERDICT r4 item 3a)
                for ch in range(CH):
                    samp_rows[ch].append(C_ch[ch] * roww)
            else:
                for ch in range(CH):
                    samp_rows[ch].append(
                        jnp.sum(C_ch[ch] * roww, axis=0, keepdims=True)
                    )
        if row_mix == "onesdot":
            # Pall rows ordered [ch][s][band_row]; the block-diagonal ones
            # matrix M (CH*S, CH*S*BAND) with M[r, c] = (c // BAND == r)
            # reduces every stream x channel band in ONE 2D MXU dot —
            # output row ch*S + s is stream s's channel-ch sampled row.
            NR = CH * S
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (NR, NR * BAND), 0)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (NR, NR * BAND), 1)
            M = (iota_c // BAND == iota_r).astype(jnp.float32)
            Pall = jnp.concatenate(
                [p for ch in range(CH) for p in samp_rows[ch]], axis=0
            )  # (CH*S*BAND, NT)
            R = jax.lax.dot_general(
                M, Pall, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CH*S, NT)
            i1w = R[0:S]
            gxw = R[S:2 * S]
            gyw = R[2 * S:3 * S]
            if bi:
                samp_rows = [
                    [None] * S, [None] * S, [None] * S,
                    [R[3 * S + s:3 * S + s + 1] for s in range(S)],
                    [R[4 * S + s:4 * S + s + 1] for s in range(S)],
                    [R[5 * S + s:5 * S + s + 1] for s in range(S)],
                ]
        else:
            i1w = jnp.concatenate(samp_rows[0], axis=0)  # (S, NT)
            gxw = jnp.concatenate(samp_rows[1], axis=0)
            gyw = jnp.concatenate(samp_rows[2], axis=0)
        if esm:
            # ESM: average warped-target and hoisted source gradients
            # (geom rows 4/5, ops/fused.py pack_geometry)
            if n_tiles == 1:
                sgx = geom_ref[4 * SS:5 * SS, :]
                sgy = geom_ref[5 * SS:6 * SS, :]
            else:
                sgx = geom_ref[4 * SS:5 * SS, pl.ds(off, NT)]
                sgy = geom_ref[5 * SS:6 * SS, pl.ds(off, NT)]
            gxw = 0.5 * (gxw + sgx)
            gyw = 0.5 * (gyw + sgy)

        validf = valid.astype(jnp.float32)
        resid = (i1w - i0) * validf
        if robust_loss == "none":
            s_int = validf
            r_w = resid
        else:
            s_int = validf * robust_sqrt_weight(
                resid, robust_loss, robust_delta
            )
            r_w = resid * s_int
        cols = [
            (gxw * Ju0) * s_int,
            (gyw * Jv1) * s_int,
            (gxw * Ju2 + gyw * Jv2) * s_int,
            (gxw * Ju3 + gyw * Jv3) * s_int,
            (gxw * Ju4 + gyw * Jv4) * s_int,
            (gxw * Ju5 + gyw * Jv5) * s_int,
        ]
        if bi:
            # depth block (…BiObjective.h:241-452; J_rt z-row is
            # [0, 0, 1, 0, rp2, rr2] — dR/dyaw has zero 3rd row)
            d1w = jnp.concatenate(samp_rows[3], axis=0)
            dgxw = jnp.concatenate(samp_rows[4], axis=0)
            dgyw = jnp.concatenate(samp_rows[5], axis=0)
            r_dep = gain * (d1w - tz) * validf
            if robust_loss == "none":
                s_dep = validf
                rd_w = r_dep
            else:
                s_dep = validf * robust_sqrt_weight(
                    r_dep, robust_loss, robust_delta
                )
                rd_w = r_dep * s_dep
            dcols = [
                gain * (dgxw * Ju0) * s_dep,
                gain * (dgyw * Jv1) * s_dep,
                gain * (dgxw * Ju2 + dgyw * Jv2 - 1.0) * s_dep,
                gain * (dgxw * Ju3 + dgyw * Jv3) * s_dep,
                gain * (dgxw * Ju4 + dgyw * Jv4 - rp2) * s_dep,
                gain * (dgxw * Ju5 + dgyw * Jv5 - rr2) * s_dep,
            ]

        def red(a, b):
            return jnp.sum(a * b, axis=1, keepdims=True)  # (S, 1)

        A_t = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i, 6):
                A_t[i][j] = red(cols[i], cols[j])
                if bi:
                    A_t[i][j] = A_t[i][j] + red(dcols[i], dcols[j])
                if j != i:
                    A_t[j][i] = A_t[i][j]
        b_t = [red(cols[i], r_w) for i in range(6)]
        cost_t = red(r_w, r_w)
        if bi:
            b_t = [
                b_t[i] + red(dcols[i], rd_w) for i in range(6)
            ]
            cost_t = cost_t + red(rd_w, rd_w)
        nval_t = jnp.sum(validf, axis=1, keepdims=True)
        return A_t, b_t, cost_t, nval_t, masked_t

    if n_tiles == 1:
        return tile_entries(0)

    def acc_tile(t, acc):
        A_a, b_a, c_a, n_a, m_a = acc
        A_t, b_t, c_t, n_t, m_t = tile_entries(t)
        A_n = [
            [A_a[i][j] + A_t[i][j] for j in range(6)] for i in range(6)
        ]
        b_n = [b_a[i] + b_t[i] for i in range(6)]
        return A_n, b_n, c_a + c_t, n_a + n_t, m_a + m_t

    zeros = jnp.zeros((S, 1), jnp.float32)
    init = (
        [[zeros] * 6 for _ in range(6)],
        [zeros] * 6,
        zeros, zeros, zeros,
    )
    return jax.lax.fori_loop(0, n_tiles, acc_tile, init)


def _fused_gn_batch_kernel(
    states_ref,  # (S, 8) VMEM f32 rows [x y z yaw pitch roll 0 0]
    const_ref,  # (1, 8) SMEM [fx fy cx cy minD maxD 0 0]
    i0_ref,  # (S, NP) VMEM source intensities (padded pixel rows)
    geom_ref,  # (GR*S, NP) VMEM TYPE-major: rows [t*S + s] (pack_geometry rows)
    t_all_ref,  # (S*3*HP, W) VMEM STREAM-major channel stacks
    state_out_ref,  # (S, 8) VMEM
    diag_out_ref,  # (S, 8) VMEM [it, ||g||, cost, nvalid, band_masked, 0, 0, 0]
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
    robust_loss="none",
    robust_delta=0.1,
    esm=False,
    bi=False,
    shared_src=False,
    row_mix="reduce",
    colsplit=False,
):
    """S whole GN levels advanced in lockstep, batch on the sublane axis.

    Carry: 11 (S, 1) vectors [x y z yaw pitch roll, it, gnorm, cost,
    nvalid, masked].  A pair whose gradient norm drops below the threshold
    freezes (state and diagnostics stop updating — same per-pair semantics
    as _run_gn_loop); the loop runs until every pair froze or the shared
    iteration budget is spent.

    bi=True: the bi-objective intensity+depth objective (reference
    CPhotoconsistencyOdometryBiObjective.h:241-452) — t_all carries six
    channels per stream, the per-pair depth gain rides in states slot 7,
    and the intensity/depth normal-equation blocks are summed directly
    (the per-pair kernel's 16x16 Gram block sum, re-associated as lane
    reductions)."""
    gain = states_ref[:, 7:8] if bi else None  # (S, 1), state-invariant
    linearize = functools.partial(
        _batch_linearize,
        fx=const_ref[0, 0], fy=const_ref[0, 1],
        cx=const_ref[0, 2], cy=const_ref[0, 3], gain=gain,
        i0_ref=i0_ref, geom_ref=geom_ref, t_all_ref=t_all_ref,
        S=S, H=H, W=W, NT=NT, NP=NP, bilinear=bilinear, mix_mode=mix_mode,
        robust_loss=robust_loss, robust_delta=robust_delta, esm=esm, bi=bi,
        shared_src=shared_src, row_mix=row_mix, colsplit=colsplit,
    )

    def active(it, gnorm):
        return (it < max_iterations) & (gnorm >= min_gradient_norm)

    def cond(carry):
        return jnp.any(active(carry[6], carry[7]))

    def body(carry):
        s = carry[:6]
        it, gnorm, cost_c, nval_c, mask_c = carry[6:11]
        act = active(it, gnorm)
        A, b, cost, nvalid, masked = linearize(*s)
        xs = _chol_solve6(A, b)  # vectorized: every entry is (S, 1)
        finite = jnp.isfinite(xs[0])
        for k in range(1, 6):
            finite = finite & jnp.isfinite(xs[k])
        upd = act & finite
        new_s = tuple(
            jnp.where(upd, s[k] - lambda_step * xs[k], s[k]) for k in range(6)
        )
        gnorm_new = jnp.sqrt(sum(b[k] * b[k] for k in range(6)))
        actf = act.astype(jnp.float32)
        return new_s + (
            it + actf,
            jnp.where(act, gnorm_new, gnorm),
            jnp.where(act, cost, cost_c),
            jnp.where(act, nvalid, nval_c),
            jnp.where(act, jnp.maximum(mask_c, masked), mask_c),
        )

    s_init = tuple(states_ref[:, k:k + 1] for k in range(6))
    # init vectors derived from a VMEM read, not a splat constant: Mosaic
    # pins the while_loop carry layout to the init's, and a splat's
    # replicated layout cannot absorb the body's concrete one
    zero = states_ref[:, 6:7] * 0.0
    init = s_init + (
        zero, zero + jnp.float32(jnp.inf), zero, zero, zero,
    )
    final = jax.lax.while_loop(cond, body, init)
    state_cols = list(final[:6]) + [zero, zero]
    state_out_ref[:, :] = jnp.concatenate(state_cols, axis=1)
    g = final[7]
    diag_cols = [
        final[6],
        jnp.where(jnp.isfinite(g), g, zero),
        final[8],
        final[9],
        final[10],
        zero, zero, zero,
    ]
    diag_out_ref[:, :] = jnp.concatenate(diag_cols, axis=1)


def fused_gn_level_batch(
    i0_flat,  # (B, NP) padded source intensity rows
    geom,  # (B, GR, NP) per-pair geometry packs (pack_geometry)
    t_all,  # (B, 3*HP, W) per-pair channel-major target stacks
    intr,
    init_states,  # (B, 6)
    min_depth,
    max_depth,
    max_iterations: int,
    min_gradient_norm: float,
    lambda_step: float,
    *,
    H: int,
    W: int,
    sampling: str = "nearest",
    interpret: bool = False,
    mix_mode: str = "f32",
    robust_loss: str = "none",
    robust_delta: float = 0.1,
    esm: bool = False,
    streams: int | None = None,
    depth_gains=None,  # (B,) per-pair depth gains -> bi-objective mode
    shared_source: bool = False,
    row_mix: str | None = None,
    colsplit: bool = False,
):
    """Run ONE whole GN pyramid level for B independent pairs, S pairs per
    grid block (sublane-batched kernel above).  B is padded to a multiple
    of S by repeating the first pair; padded outputs are dropped.

    depth_gains selects the bi-objective objective: t_all must then be the
    six-channel (B, 6*HP, W) stack ([I1; gx; gy; D1; dgx; dgy] per pair,
    ops/fused.py fused_gn_level's depth_cols layout).

    shared_source: the keyframe-tracking layout — i0_flat is (1, NP) and
    geom (GR, NP), ONE source frame shared by all B pairs (every grid
    block reads the same source block; only the per-pair target stacks
    scale with B). This is how a chunk of frames tracks against one
    keyframe without materializing B copies of its geometry.

    Returns (states (B, 6), iterations (B,), gradient_norm (B,), cost (B,),
    num_valid (B,), band_masked (B,)) — per-pair semantics identical to
    ops/fused.py fused_gn_level_packs.
    """
    bi = depth_gains is not None
    if bi and esm:
        raise ValueError("gradient_at='esm' is photometric-only")
    if colsplit and bi:
        raise ValueError("colsplit is photometric-only (3-channel stacks)")
    if colsplit and not colsplit_ok(H, W):
        raise ValueError(f"colsplit_ok({H}, {W}) is False")
    if row_mix is None:
        import os

        # trace-time read through jit-cached wrappers, like
        # PHOVO_LEVELMAJOR (models/base.levelmajor_enabled): set before
        # first use, or jax.clear_caches() to toggle mid-process
        row_mix = os.environ.get("PHOVO_ROWMIX", "reduce")
    if row_mix not in ("reduce", "onesdot"):
        raise ValueError(f"row_mix={row_mix!r} (expected reduce|onesdot)")
    CH = 6 if bi else 3
    B = t_all.shape[0] if shared_source else i0_flat.shape[0]
    if colsplit:
        NP, _NPH = _colsplit_pixels(H, W)
    else:
        NP, _ = _pick_tile_pixels(H, W)
    GR = 6 if esm else 4
    HP = _ceil8(H)
    tiling = _batch_tilings(
        H, W, esm, bi, shared_src=shared_source, colsplit=colsplit
    )
    if tiling is None:
        raise ValueError(
            f"no VMEM-fitting batch tiling at {H}x{W}; use the per-pair "
            "kernel (ops/fused.py fused_gn_level_packs)"
        )
    S, NT = tiling
    if streams:
        _check_streams_override(streams, interpret)
        S = streams
    NB = -(-B // S)
    pad = NB * S - B
    if pad:
        def _pad(a):
            return jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)

        if not shared_source:
            i0_flat = _pad(i0_flat)
            geom = _pad(geom)
        t_all = _pad(t_all)
        init_states = _pad(jnp.asarray(init_states, jnp.float32))
        if bi:
            depth_gains = _pad(jnp.asarray(depth_gains, jnp.float32))

    # kernel layouts: i0 (NB*S, NP); geom TYPE-major per block
    # (NB*GR*S, NP) rows [blk, t, s]; t_all STREAM-major (NB*S*3HP, W).
    # shared_source: i0 (1, NP) and geom (GR, NP) verbatim, every grid
    # block mapped to the same source block.
    if shared_source:
        i0_k = jnp.asarray(i0_flat).reshape(1, NP)
        geom_k = jnp.asarray(geom).reshape(GR, NP)
    else:
        i0_k = i0_flat.reshape(NB * S, NP)
        geom_k = (
            jnp.asarray(geom)
            .reshape(NB, S, GR, NP)
            .transpose(0, 2, 1, 3)
            .reshape(NB * GR * S, NP)
        )
    TW = 256 if colsplit else W
    t_k = jnp.asarray(t_all).reshape(NB * S * CH * HP, TW)
    # states row: [state (6), 0, gain] — slot 7 carries the per-pair
    # bi-objective depth gain (state-invariant, read once by the kernel)
    gains_col = (
        jnp.asarray(depth_gains, jnp.float32).reshape(NB * S, 1)
        if bi else jnp.zeros((NB * S, 1), jnp.float32)
    )
    st_k = jnp.concatenate(
        [
            jnp.asarray(init_states, jnp.float32).reshape(NB * S, 6),
            jnp.zeros((NB * S, 1), jnp.float32),
            gains_col,
        ],
        axis=1,
    )
    const = jnp.stack(
        [
            jnp.float32(intr.fx), jnp.float32(intr.fy),
            jnp.float32(intr.cx), jnp.float32(intr.cy),
            jnp.float32(min_depth), jnp.float32(max_depth),
            jnp.float32(0), jnp.float32(0),
        ]
    ).reshape(1, 8)

    kernel = functools.partial(
        _fused_gn_batch_kernel,
        S=S, H=H, W=W, NT=NT, NP=NP,
        bilinear=(sampling == "bilinear"),
        max_iterations=float(max_iterations),
        min_gradient_norm=float(min_gradient_norm),
        lambda_step=float(lambda_step),
        mix_mode=mix_mode, robust_loss=robust_loss,
        robust_delta=float(robust_delta), esm=esm, bi=bi,
        shared_src=shared_source, row_mix=row_mix, colsplit=colsplit,
    )
    grid = (NB,)
    if shared_source:
        i0_spec = pl.BlockSpec(
            (1, NP), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        geom_spec = pl.BlockSpec(
            (GR, NP), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    else:
        i0_spec = pl.BlockSpec(
            (S, NP), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        geom_spec = pl.BlockSpec(
            (GR * S, NP), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    # the block working set is deliberately larger than the default 16 MB
    # scoped-vmem limit (v5e VMEM is larger; the budget above is calibrated
    # on-device) — raise the per-kernel limit to match the plan
    # shared-source blocks: the (S, NT) broadcast materializations push the
    # true stack a few MB past the non-shared calibration; the scoped limit
    # is our own knob (v5e VMEM is far larger) — measured fine at +8 MB
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(_VMEM_BUDGET, 16 * 1024 * 1024)
        + (8_000_000 if shared_source else 0)
        # onesdot materializes the (CH*S*BAND, NT) masked products the
        # reduce path folds eagerly — experiment-only headroom
        + (16_000_000 if row_mix == "onesdot" else 0)
    )
    state_out, diag = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((S, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            i0_spec,
            geom_spec,
            pl.BlockSpec(
                (S * CH * HP, TW), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((S, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NB * S, 8), jnp.float32),
            jax.ShapeDtypeStruct((NB * S, 8), jnp.float32),
        ),
        interpret=interpret,
    )(st_k, const, i0_k, geom_k, t_k)
    return (
        state_out[:B, :6],
        diag[:B, 0].astype(jnp.int32),
        diag[:B, 1],
        diag[:B, 2],
        diag[:B, 3],
        diag[:B, 4],
    )


# ---------------------------------------------------------------------------
# trust-region (Ceres-semantics) batched kernel
# ---------------------------------------------------------------------------


def _fused_tr_batch_kernel(
    states_ref,  # (S, 8) VMEM rows [x y z yaw pitch roll 0 0]
    const_ref,  # (1, 8) SMEM
    i0_ref,  # (S, NP) VMEM
    geom_ref,  # (4*S, NP) VMEM type-major
    t_all_ref,  # (S*3*HP, W) VMEM stream-major
    state_out_ref,  # (S, 8) VMEM
    diag_out_ref,  # (S, 8) VMEM [it, max|g|, 0.5*cost, nvalid, radius, masked, 0, 0]
    *,
    S,
    H,
    W,
    NT,
    NP,
    bilinear,
    opts,
    mix_mode="f32",
    robust_loss="none",
    robust_delta=0.1,
    shared_src=False,
    colsplit=False,
):
    """S whole trust-region LM levels in lockstep (the batched analog of
    ops/fused.py _run_tr_loop — Ceres radius rule, Jacobi-scaled LM step,
    function/gradient/parameter/radius termination, all vectorized on
    (S, 1) scalars).  The last-ACCEPTED linearization is carried as its 36
    normal-equation entries per pair instead of an 8x8 Gram."""
    linearize = functools.partial(
        _batch_linearize,
        fx=const_ref[0, 0], fy=const_ref[0, 1],
        cx=const_ref[0, 2], cy=const_ref[0, 3], gain=None,
        i0_ref=i0_ref, geom_ref=geom_ref, t_all_ref=t_all_ref,
        S=S, H=H, W=W, NT=NT, NP=NP, bilinear=bilinear, mix_mode=mix_mode,
        robust_loss=robust_loss, robust_delta=robust_delta, esm=False,
        bi=False, shared_src=shared_src, colsplit=colsplit,
    )

    def flat(A, b, cost, nvalid):
        return tuple(A[i][j] for i in range(6) for j in range(6)) + tuple(b) + (
            cost, nvalid,
        )

    def unflat(t):
        A = [[t[i * 6 + j] for j in range(6)] for i in range(6)]
        return A, list(t[36:42]), t[42], t[43]

    def active(it, done):
        # done carried as 0/1 float: Mosaic cannot round-trip an i1 vector
        # through the while_loop carry (i8<->i1 truncation unsupported)
        return (it < opts.max_iterations) & (done < 0.5)

    def cond(carry):
        return jnp.any(active(carry[6], carry[7]))

    def body(carry):
        s = carry[:6]
        it, done, radius, mask_c = carry[6], carry[7], carry[8], carry[9]
        A, b, cost_raw, nvalid = unflat(carry[10:])
        act = active(it, done)
        cost = 0.5 * cost_raw
        diag = [jnp.clip(A[i][i], 1e-12, 1e32) for i in range(6)]
        inv_radius = 1.0 / radius
        A_lm = [
            [
                A[i][j] + (diag[i] * inv_radius if i == j else 0.0)
                for j in range(6)
            ]
            for i in range(6)
        ]
        step = _chol_solve6(A_lm, [-bi_ for bi_ in b])
        finite = jnp.isfinite(step[0])
        for k in range(1, 6):
            finite = finite & jnp.isfinite(step[k])
        step = [jnp.where(finite, st, 0.0) for st in step]

        new_s = tuple(s[k] + step[k] for k in range(6))
        A_n, b_n, cost_n_raw, nvalid_n, masked_n = linearize(*new_s)
        new_cost = 0.5 * cost_n_raw

        sb = sum(step[i] * b[i] for i in range(6))
        sAs = sum(
            step[i] * A[i][j] * step[j] for i in range(6) for j in range(6)
        )
        predicted = jnp.maximum(-sb - 0.5 * sAs, 1e-30)
        rho = (cost - new_cost) / predicted

        accept = rho > opts.min_relative_decrease
        grow = radius / jnp.maximum(
            1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3
        )
        new_radius = jnp.where(
            accept,
            jnp.minimum(grow, opts.max_trust_region_radius),
            radius * 0.5,
        )

        upd = act & accept
        s_o = tuple(jnp.where(upd, new_s[k], s[k]) for k in range(6))
        A_o = [
            [jnp.where(upd, A_n[i][j], A[i][j]) for j in range(6)]
            for i in range(6)
        ]
        b_o = [jnp.where(upd, b_n[i], b[i]) for i in range(6)]
        cost_o = jnp.where(upd, cost_n_raw, cost_raw)
        nvalid_o = jnp.where(upd, nvalid_n, nvalid)

        gnorm_o = b_o[0] * 0.0
        for k in range(6):
            gnorm_o = jnp.maximum(gnorm_o, jnp.abs(b_o[k]))
        f_done = accept & (
            jnp.abs(cost - new_cost) <= opts.function_tolerance * cost
        )
        g_done = gnorm_o <= opts.gradient_tolerance
        snorm = jnp.sqrt(sum(step[k] * step[k] for k in range(6)))
        xnorm = jnp.sqrt(sum(s[k] * s[k] for k in range(6)))
        p_done = accept & (
            snorm
            <= opts.parameter_tolerance
            * (xnorm + opts.parameter_tolerance)
        )
        r_done = new_radius < opts.min_trust_region_radius
        done_o = jnp.where(
            act,
            (f_done | g_done | p_done | r_done).astype(jnp.float32),
            done,
        )
        return s_o + (
            it + act.astype(jnp.float32),
            done_o,
            jnp.where(act, new_radius, radius),
            jnp.where(act, jnp.maximum(mask_c, masked_n), mask_c),
        ) + flat(A_o, b_o, cost_o, nvalid_o)

    s0 = tuple(states_ref[:, k:k + 1] for k in range(6))
    A0, b0, cost0, nvalid0, masked0 = linearize(*s0)
    zero = states_ref[:, 6:7] * 0.0
    gnorm0 = zero
    for k in range(6):
        gnorm0 = jnp.maximum(gnorm0, jnp.abs(b0[k]))
    done0 = (gnorm0 <= opts.gradient_tolerance).astype(jnp.float32)
    init = s0 + (
        zero,
        done0,
        zero + jnp.float32(opts.initial_trust_region_radius),
        masked0,
    ) + flat(A0, b0, cost0, nvalid0)
    final = jax.lax.while_loop(cond, body, init)
    state_cols = list(final[:6]) + [zero, zero]
    state_out_ref[:, :] = jnp.concatenate(state_cols, axis=1)
    _, b_f, cost_f, nvalid_f = unflat(final[10:])
    gnorm_f = zero
    for k in range(6):
        gnorm_f = jnp.maximum(gnorm_f, jnp.abs(b_f[k]))
    diag_cols = [
        final[6],
        gnorm_f,
        0.5 * cost_f,
        nvalid_f,
        final[8],
        final[9],
        zero, zero,
    ]
    diag_out_ref[:, :] = jnp.concatenate(diag_cols, axis=1)


def fused_tr_level_batch(
    i0_flat,  # (B, NP)
    geom,  # (B, 4, NP)
    t_all,  # (B, 3*HP, W)
    intr,
    init_states,  # (B, 6)
    min_depth,
    max_depth,
    opts,
    *,
    H: int,
    W: int,
    sampling: str = "bilinear",
    interpret: bool = False,
    mix_mode: str = "f32",
    robust_loss: str = "none",
    robust_delta: float = 0.1,
    streams: int | None = None,
    shared_source: bool = False,
    colsplit: bool = False,
):
    """Run ONE whole trust-region LM level for B independent pairs, S per
    grid block.  Per-pair semantics identical to ops/fused.py
    fused_tr_level; returns (states (B, 6), iterations, cost,
    gradient_norm, radius, num_valid, band_masked).

    shared_source: i0_flat (1, NP) + geom (4, NP) shared by all B pairs
    (keyframe tracking; see fused_gn_level_batch)."""
    B = t_all.shape[0] if shared_source else i0_flat.shape[0]
    if colsplit:
        if not colsplit_ok(H, W):
            raise ValueError(f"colsplit_ok({H}, {W}) is False")
        NP, _NPH = _colsplit_pixels(H, W)
    else:
        NP, _ = _pick_tile_pixels(H, W)
    HP = _ceil8(H)
    tiling = _batch_tilings(
        H, W, shared_src=shared_source, tr=True, colsplit=colsplit
    )
    if tiling is None:
        raise ValueError(
            f"no VMEM-fitting batch tiling at {H}x{W}; use the per-pair "
            "kernel (ops/fused.py fused_tr_level)"
        )
    S, NT = tiling
    if streams:
        _check_streams_override(streams, interpret)
        S = streams
    NB = -(-B // S)
    pad = NB * S - B
    if pad:
        def _pad(a):
            return jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)

        if not shared_source:
            i0_flat = _pad(i0_flat)
            geom = _pad(jnp.asarray(geom))
        t_all = _pad(jnp.asarray(t_all))
        init_states = _pad(jnp.asarray(init_states, jnp.float32))

    if shared_source:
        i0_k = jnp.asarray(i0_flat).reshape(1, NP)
        geom_k = jnp.asarray(geom).reshape(4, NP)
    else:
        i0_k = i0_flat.reshape(NB * S, NP)
        geom_k = (
            jnp.asarray(geom)
            .reshape(NB, S, 4, NP)
            .transpose(0, 2, 1, 3)
            .reshape(NB * 4 * S, NP)
        )
    TW = 256 if colsplit else W
    t_k = jnp.asarray(t_all).reshape(NB * S * 3 * HP, TW)
    st_k = jnp.concatenate(
        [
            jnp.asarray(init_states, jnp.float32).reshape(NB * S, 6),
            jnp.zeros((NB * S, 2), jnp.float32),
        ],
        axis=1,
    )
    const = jnp.stack(
        [
            jnp.float32(intr.fx), jnp.float32(intr.fy),
            jnp.float32(intr.cx), jnp.float32(intr.cy),
            jnp.float32(min_depth), jnp.float32(max_depth),
            jnp.float32(0), jnp.float32(0),
        ]
    ).reshape(1, 8)
    kernel = functools.partial(
        _fused_tr_batch_kernel,
        S=S, H=H, W=W, NT=NT, NP=NP,
        bilinear=(sampling == "bilinear"), opts=opts,
        mix_mode=mix_mode, robust_loss=robust_loss,
        robust_delta=float(robust_delta), shared_src=shared_source,
        colsplit=colsplit,
    )
    if shared_source:
        i0_spec = pl.BlockSpec(
            (1, NP), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        geom_spec = pl.BlockSpec(
            (4, NP), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
    else:
        i0_spec = pl.BlockSpec(
            (S, NP), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        geom_spec = pl.BlockSpec(
            (4 * S, NP), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
    # shared-source blocks: the (S, NT) broadcast materializations push the
    # true stack a few MB past the non-shared calibration; the scoped limit
    # is our own knob (v5e VMEM is far larger) — measured fine at +8 MB
    params = pltpu.CompilerParams(
        vmem_limit_bytes=max(_VMEM_BUDGET, 16 * 1024 * 1024)
        + (8_000_000 if shared_source else 0)
    )
    state_out, diag = pl.pallas_call(
        kernel,
        grid=(NB,),
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((S, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            i0_spec,
            geom_spec,
            pl.BlockSpec(
                (S * 3 * HP, TW), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((S, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NB * S, 8), jnp.float32),
            jax.ShapeDtypeStruct((NB * S, 8), jnp.float32),
        ),
        interpret=interpret,
    )(st_k, const, i0_k, geom_k, t_k)
    return (
        state_out[:B, :6],
        diag[:B, 0].astype(jnp.int32),
        diag[:B, 2],
        diag[:B, 1],
        diag[:B, 4],
        diag[:B, 3],
        diag[:B, 5],
    )
