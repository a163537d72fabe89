"""Sublane-batched whole-level kernel vs the per-pair kernel.

The batched kernel (ops/fused_batch.py) must reproduce the per-pair
whole-level kernel (ops/fused.py fused_gn_level_packs) per pair: same
math, only the normal-equation reduction order differs (lane reductions
vs MXU Gram), so states agree at the f32 reassociation level.  Validated
here in interpreter mode; the on-device equivalents are in the `-m tpu`
suite (test_tpu_device.py::test_batched_level_kernel_on_device and the
level-major sequence test).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from phovo_tpu.ops import fused as F
from phovo_tpu.ops import pyramid as pyr
from phovo_tpu.ops.fused_batch import _batch_tilings, fused_gn_level_batch
from phovo_tpu.utils.synthetic import make_pair

if not F._HAS_PALLAS:  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)


def _chain_packs(intr, level, n_frames, esm=False, shape=(120, 160)):
    """Per-frame packs for a synthetic frame chain at one pyramid level."""
    frames = []
    for k in range(n_frames):
        st = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.002]) * (k + 1)
        I0, D0, I1, D1, _ = make_pair(intr, shape=shape, state=st)
        if k == 0:
            frames.append((I0, D0))
        frames.append((I1, D1))
    frames = frames[:n_frames]
    packs = []
    Hl = Wl = None
    for I, D in frames:
        ip = pyr.build_pyramid(jnp.asarray(I, jnp.float32), level + 1, (0,) * (level + 1))
        dp = pyr.build_pyramid(jnp.asarray(D, jnp.float32), level + 1, None)
        gx, gy = pyr.build_gradient_pyramid(ip, (0.0625,) * (level + 1))
        Hl, Wl = ip[level].shape
        NP, _ = F._pick_tile_pixels(Hl, Wl)
        i0f = F._pad_flat(ip[level].reshape(1, Hl * Wl), NP)
        geom = F.pack_geometry(
            dp[level], intr.at_level(level), 0.3, 5.0, NP,
            (gx[level], gy[level]) if esm else None,
        )
        t = F.pack_target_colmajor(ip[level], gx[level], gy[level])
        packs.append((i0f, geom, t))
    return packs, Hl, Wl


@pytest.mark.parametrize(
    "level,sampling,robust,esm",
    [
        (1, "nearest", "none", False),
        (1, "bilinear", "none", False),
        (0, "nearest", "none", False),  # multi-tile level (120x160)
        (2, "nearest", "none", False),  # unbanded coarse level (30x40)
        (1, "nearest", "huber", False),
        (1, "nearest", "none", True),  # ESM Jacobian
    ],
)
def test_batch_kernel_matches_per_pair(intr, level, sampling, robust, esm):
    B = 5
    packs, Hl, Wl = _chain_packs(intr, level, B + 1, esm=esm)
    its = 3
    kw = dict(
        sampling=sampling, interpret=True, mix_mode="f32",
        robust_loss=robust, robust_delta=0.1, esm=esm,
    )
    intr_l = intr.at_level(level)

    ref_states, ref_diags = [], []
    for k in range(B):
        i0f, geom, _ = packs[k]
        _, _, t = packs[k + 1]
        out = F.fused_gn_level_packs(
            i0f, geom, t, intr_l, jnp.zeros(6), 0.3, 5.0, its, 0.0, 1.0,
            H=Hl, W=Wl, **kw,
        )
        ref_states.append(np.asarray(out[0]))
        ref_diags.append([np.asarray(o) for o in out[1:]])

    i0b = jnp.concatenate([packs[k][0] for k in range(B)], axis=0)
    geomb = jnp.stack([packs[k][1] for k in range(B)], axis=0)
    tb = jnp.stack([packs[k + 1][2] for k in range(B)], axis=0)
    # streams=2 also exercises the padding path (B=5 -> NB=3, one pad pair)
    out = fused_gn_level_batch(
        i0b, geomb, tb, intr_l, jnp.zeros((B, 6)), 0.3, 5.0, its, 0.0, 1.0,
        H=Hl, W=Wl, streams=2, **kw,
    )
    states = np.asarray(out[0])
    for k in range(B):
        np.testing.assert_allclose(
            states[k], ref_states[k], atol=2e-4,
            err_msg=f"pair {k} state",
        )
        assert int(np.asarray(out[1])[k]) == int(ref_diags[k][0])
        np.testing.assert_allclose(
            float(np.asarray(out[4])[k]), float(ref_diags[k][3]), atol=0.5,
            err_msg=f"pair {k} num_valid",
        )


def test_batch_kernel_early_exit_freezes_converged(intr):
    """With a high gradient-norm threshold, pairs freeze independently and
    the reported iteration counts match the per-pair kernel's."""
    B = 3
    packs, Hl, Wl = _chain_packs(intr, 1, B + 1)
    intr_l = intr.at_level(1)
    thresh = 50.0
    its = 10
    ref = []
    for k in range(B):
        out = F.fused_gn_level_packs(
            packs[k][0], packs[k][1], packs[k + 1][2], intr_l,
            jnp.zeros(6), 0.3, 5.0, its, thresh, 1.0,
            H=Hl, W=Wl, sampling="nearest", interpret=True, mix_mode="f32",
        )
        ref.append((np.asarray(out[0]), int(out[1])))
    outb = fused_gn_level_batch(
        jnp.concatenate([packs[k][0] for k in range(B)], axis=0),
        jnp.stack([packs[k][1] for k in range(B)], axis=0),
        jnp.stack([packs[k + 1][2] for k in range(B)], axis=0),
        intr_l, jnp.zeros((B, 6)), 0.3, 5.0, its, thresh, 1.0,
        H=Hl, W=Wl, sampling="nearest", interpret=True, mix_mode="f32",
        streams=3,
    )
    for k in range(B):
        assert int(np.asarray(outb[1])[k]) == ref[k][1], f"pair {k} iterations"
        np.testing.assert_allclose(
            np.asarray(outb[0])[k], ref[k][0], atol=2e-4
        )


def test_batch_tilings_shapes():
    """Tiling picker: sublane-multiple S, NT divides NP, VMEM-infeasible
    shapes return None."""
    for H, W in [(30, 40), (60, 80), (120, 160)]:
        t = _batch_tilings(H, W)
        assert t is not None
        S, NT = t
        assert S % 8 == 0
        NP, _ = F._pick_tile_pixels(H, W)
        assert NP % NT == 0
    assert _batch_tilings(480, 640) is None  # VGA level 0 cannot fit S=8


def test_batch_kernel_biobjective_matches_per_pair(intr):
    """Bi-objective batched mode (six channels + per-pair depth gain) vs
    the per-pair 16x16-Gram kernel."""
    from phovo_tpu.utils.config import PhovoConfig  # noqa: F401 (parity)

    level, B, its = 1, 3, 3
    shape = (120, 160)
    frames = []
    for k in range(B + 1):
        st = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.002]) * (k + 1)
        I0, D0, I1, D1, _ = make_pair(intr, shape=shape, state=st)
        if k == 0:
            frames.append((I0, D0))
        frames.append((I1, D1))
    frames = frames[:B + 1]
    max_depth = 5.0
    packs = []
    Hl = Wl = None
    for I, D in frames:
        ip = pyr.build_pyramid(jnp.asarray(I, jnp.float32), level + 1, (0, 0))
        dp = pyr.build_pyramid(jnp.asarray(D, jnp.float32), level + 1, None)
        gx, gy = pyr.build_gradient_pyramid(ip, (0.0625,) * (level + 1))
        dnorm = [d * (1.0 / max_depth) for d in dp]
        dgx, dgy = pyr.build_gradient_pyramid(dnorm, (0.0625,) * (level + 1))
        Hl, Wl = ip[level].shape
        NP, _ = F._pick_tile_pixels(Hl, Wl)
        i0f = F._pad_flat(ip[level].reshape(1, Hl * Wl), NP)
        geom = F.pack_geometry(dp[level], intr.at_level(level), 0.3, max_depth, NP)
        t3 = F.pack_target_colmajor(ip[level], gx[level], gy[level])
        t6 = jnp.concatenate(
            [t3] + [F._pad_channel_rows(c) for c in (dp[level], dgx[level], dgy[level])],
            axis=0,
        )
        gain = jnp.mean(ip[level]) / jnp.mean(dp[level])
        packs.append((i0f, geom, t6, gain, dp[level], ip[level], gx[level], gy[level], dgx[level], dgy[level]))
    intr_l = intr.at_level(level)

    refs = []
    for k in range(B):
        i0f, geom, _, _, dep, inten = packs[k][:6]
        tgt = packs[k + 1]
        out = F.fused_gn_level(
            inten, dep,
            F.pack_target_colmajor(tgt[5], tgt[6], tgt[7]),
            intr_l, jnp.zeros(6), 0.3, max_depth, its, 0.0, 1.0,
            "nearest", interpret=True,
            depth_cols=(tgt[4], tgt[8], tgt[9]), depth_gain=tgt[3],
            mix_mode="f32",
        )
        refs.append([np.asarray(o) for o in out])

    outb = fused_gn_level_batch(
        jnp.concatenate([packs[k][0] for k in range(B)], axis=0),
        jnp.stack([packs[k][1] for k in range(B)]),
        jnp.stack([packs[k + 1][2] for k in range(B)]),
        intr_l, jnp.zeros((B, 6)), 0.3, max_depth, its, 0.0, 1.0,
        H=Hl, W=Wl, sampling="nearest", interpret=True, mix_mode="f32",
        streams=2,
        depth_gains=jnp.stack([packs[k + 1][3] for k in range(B)]),
    )
    for k in range(B):
        np.testing.assert_allclose(
            np.asarray(outb[0])[k], refs[k][0], atol=2e-4,
            err_msg=f"pair {k} state",
        )
        assert int(np.asarray(outb[1])[k]) == int(refs[k][0 + 1])


def test_tr_batch_kernel_matches_per_pair(intr):
    """Batched trust-region kernel vs the per-pair whole-level TR kernel
    (Ceres radius rule, per-pair termination flags)."""
    from phovo_tpu.ops.fused_batch import fused_tr_level_batch
    from phovo_tpu.solvers.trust_region import TROptions

    B = 3
    packs, Hl, Wl = _chain_packs(intr, 1, B + 1)
    intr_l = intr.at_level(1)
    opts = TROptions(max_iterations=5)

    refs = []
    for k in range(B):
        # fused_tr_level takes raw images; rebuild from the packs' sources
        pass
    # build per-pair reference through fused_tr_level on the same packs:
    # its wrapper re-packs internally, so feed the raw level images instead
    frames = []
    for k in range(B + 1):
        st = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.002]) * (k + 1)
        I0, D0, I1, D1, _ = make_pair(intr, shape=(120, 160), state=st)
        if k == 0:
            frames.append((I0, D0))
        frames.append((I1, D1))
    frames = frames[:B + 1]
    lvl = []
    for I, D in frames:
        ip = pyr.build_pyramid(jnp.asarray(I, jnp.float32), 2, (0, 0))
        dp = pyr.build_pyramid(jnp.asarray(D, jnp.float32), 2, None)
        gx, gy = pyr.build_gradient_pyramid(ip, (0.0625, 0.0625))
        lvl.append((ip[1], dp[1], gx[1], gy[1]))
    for k in range(B):
        si, sd, _, _ = lvl[k]
        ti, _, tgx, tgy = lvl[k + 1]
        out = F.fused_tr_level(
            si, sd, F.pack_target_colmajor(ti, tgx, tgy), intr_l,
            jnp.zeros(6), 0.3, 5.0, opts,
            sampling="bilinear", interpret=True, mix_mode="f32",
        )
        refs.append([np.asarray(o) for o in out])

    outb = fused_tr_level_batch(
        jnp.concatenate([packs[k][0] for k in range(B)], axis=0),
        jnp.stack([packs[k][1] for k in range(B)]),
        jnp.stack([packs[k + 1][2] for k in range(B)]),
        intr_l, jnp.zeros((B, 6)), 0.3, 5.0, opts,
        H=Hl, W=Wl, sampling="bilinear", interpret=True, mix_mode="f32",
        streams=2,
    )
    for k in range(B):
        np.testing.assert_allclose(
            np.asarray(outb[0])[k], refs[k][0], atol=2e-4,
            err_msg=f"pair {k} state",
        )
        assert int(np.asarray(outb[1])[k]) == int(refs[k][1]), f"pair {k} its"
        np.testing.assert_allclose(
            float(np.asarray(outb[2])[k]), float(refs[k][2]), rtol=1e-4,
            err_msg=f"pair {k} cost",
        )
        np.testing.assert_allclose(
            float(np.asarray(outb[5])[k]), float(refs[k][5]), atol=0.5,
            err_msg=f"pair {k} num_valid",
        )


def test_levelmajor_sort_pairs_bit_identical(intr, small_pair, monkeypatch):
    """Difficulty-sorted block assignment (VERDICT r4 item 4) must not
    change a single bit of any pair's result: sorting only regroups which
    pairs share a grid block's while_loop, and a frozen pair's state stops
    updating regardless of how long its block keeps looping."""
    import phovo_tpu.ops.fused_batch as FB
    from phovo_tpu.models.analytic import (
        align_pairs_levelmajor,
        prep_frame_analytic,
    )
    from phovo_tpu.utils.config import PhovoConfig

    I0, D0, I1, D1, _ = small_pair
    cfg = PhovoConfig(
        num_levels=2, blur_filter_sizes=(0, 0), gradient_scales=(0.0625,) * 2,
        max_iterations=(6, 8), lambda_steps=(1.0, 1.0),
        # early exit ON with a COARSE-level threshold that actually fires
        # at different counts across these pairs — the coarsest level's
        # iterations drive the sort, so spread there makes the permutation
        # non-identity (review r5 finding: the earlier fixture had
        # all-equal coarse counts and never exercised the scatter)
        min_gradient_norms=(5.0, 10.0), sampling="nearest", mix_mode="f32",
    )
    # force tiny blocks (S=2) so B=6 spans 3 blocks even in interpret mode
    orig = FB._batch_tilings

    def tiny(H, W, esm=False, bi=False, shared_src=False, **kw):
        t = orig(H, W, esm, bi, shared_src, **kw)
        return None if t is None else (2, t[1])

    monkeypatch.setattr(FB, "_batch_tilings", tiny)

    frames_i = [I0, I1, I0 * 0.95 + 0.02, I1 * 0.9 + 0.05, I0, I1]
    frames_d = [D0, D1, D0, D1, D0, D1]
    import jax

    prep = [
        prep_frame_analytic(
            jnp.asarray(i), jnp.asarray(d, jnp.float32), intr, cfg
        )
        for i, d in zip(frames_i, frames_d)
    ]
    B = 5
    prep_pairs = {
        lvl: (
            jnp.concatenate([prep[k][lvl][0] for k in range(B)], axis=0),
            jnp.stack([prep[k][lvl][1] for k in range(B)]),
            jnp.stack([prep[k + 1][lvl][2] for k in range(B)]),
        )
        for lvl in prep[0]
    }
    shape = I0.shape
    on = jax.block_until_ready(align_pairs_levelmajor(
        prep_pairs, shape, intr, cfg, interpret=True, sort_pairs="on"
    ))
    off = jax.block_until_ready(align_pairs_levelmajor(
        prep_pairs, shape, intr, cfg, interpret=True, sort_pairs="off"
    ))
    # iteration counts must differ across pairs AT THE DRIVING (coarsest)
    # level so the sort permutation is non-identity
    assert len(set(np.asarray(off.iterations)[:, 1].tolist())) > 1
    assert len(set(np.asarray(off.iterations)[:, 0].tolist())) > 1
    for f in on._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(on, f)), np.asarray(getattr(off, f)),
            err_msg=f,
        )


@pytest.mark.parametrize("sampling", ["nearest", "bilinear"])
def test_colsplit_matches_rowmajor(intr, small_pair, sampling):
    """Column-split fine-level layout (r5): half-major pixel packing + two
    128-wide target planes must reproduce the row-major layout's results
    (same columns sampled, same math — only the MXU contraction shrinks
    to one full K=128 pass). small_pair is 96x128 (W=128, not eligible),
    so build a 120x160 pair where colsplit_ok holds."""
    import jax

    import phovo_tpu.ops.fused_batch as FB
    from phovo_tpu.ops import fused as F
    from phovo_tpu.ops import pyramid as pyr
    from phovo_tpu.ops.camera import Intrinsics
    from phovo_tpu.utils.synthetic import make_pair

    H, W = 120, 160
    intr2 = Intrinsics(
        np.float32(W), np.float32(W), np.float32(W / 2 - 0.5),
        np.float32(H / 2 - 0.5),
    )
    assert FB.colsplit_ok(H, W)
    I0, D0, I1, D1, _ = make_pair(intr2, shape=(H, W))
    NP, _ = F._pick_tile_pixels(H, W)
    i0f = F._pad_flat(jnp.asarray(I0).reshape(1, H * W), NP)
    geom = F.pack_geometry(jnp.asarray(D0), intr2, 0.3, 5.0, NP)
    I1j = jnp.asarray(I1)
    gx1 = pyr.scharr(I1j, "x", 0.0625)
    gy1 = pyr.scharr(I1j, "y", 0.0625)
    t_rm = F.pack_target_colmajor(I1j, gx1, gy1)
    order = jnp.asarray(FB.colsplit_order(H, W))
    i0_cs = FB.colsplit_gather(jnp.asarray(I0).reshape(1, H * W), order)
    g_full = F.pack_geometry(
        jnp.asarray(D0), intr2, 0.3, 5.0, -(-(H * W) // 128) * 128
    )
    g_cs = FB.colsplit_gather(g_full[:, : H * W], order)
    t_cs = FB.pack_target_colsplit(I1j, gx1, gy1)
    B = 3
    inits = jnp.asarray(
        np.array(
            [[0, 0, 0, 0, 0, 0],
             [0.01, -0.005, 0.008, 0.004, -0.003, 0.002],
             [0.02, 0, 0, 0, 0.004, 0]],
            np.float32,
        )
    )
    a = jax.block_until_ready(FB.fused_gn_level_batch(
        jnp.concatenate([i0f] * B, 0), jnp.stack([geom] * B),
        jnp.stack([t_rm] * B), intr2, inits, 0.3, 5.0, 4, 0.0, 1.0,
        H=H, W=W, sampling=sampling, interpret=True, streams=1,
        mix_mode="f32",
    ))
    b = jax.block_until_ready(FB.fused_gn_level_batch(
        jnp.concatenate([i0_cs] * B, 0), jnp.stack([g_cs] * B),
        jnp.stack([t_cs] * B), intr2, inits, 0.3, 5.0, 4, 0.0, 1.0,
        H=H, W=W, sampling=sampling, interpret=True, streams=1,
        mix_mode="f32", colsplit=True,
    ))
    np.testing.assert_allclose(
        np.asarray(a[0]), np.asarray(b[0]), atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    # identical valid-pixel counts: no pixel silently lost to the planes
    # at these (margin-respecting) motions
    np.testing.assert_allclose(np.asarray(a[4]), np.asarray(b[4]))


def test_colsplit_escape_hatch(monkeypatch):
    """PHOVO_COLSPLIT=0 must disable the column-split routing (same
    trace-time semantics as PHOVO_LEVELMAJOR: set before first use or
    clear jit caches)."""
    from phovo_tpu.models.analytic import _use_colsplit

    assert _use_colsplit(120, 160, False)
    monkeypatch.setenv("PHOVO_COLSPLIT", "0")
    assert not _use_colsplit(120, 160, False)
