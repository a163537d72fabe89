"""Sublane-batched IC whole-level kernel vs the per-pair IC kernel.

Interpreter-mode equivalence (the on-device equivalent lives in the
`-m tpu` suite, test_tpu_device.py::test_ic_batched_level_on_device).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from phovo_tpu.ops import fused as F
from phovo_tpu.ops import ic as IC
from phovo_tpu.ops import pyramid as pyr
from phovo_tpu.ops.ic_batch import _ic_batch_tilings, ic_gn_level_batch
from phovo_tpu.utils.synthetic import make_pair

if not IC._HAS_PALLAS:  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)


def _ic_chain(intr, level, n_frames, shape=(120, 160)):
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
        gx, gy = pyr.build_gradient_pyramid(ip, (0.03125,) * (level + 1))
        Hl, Wl = ip[level].shape
        NP, _ = F._pick_tile_pixels(Hl, Wl)
        intr_l = intr.at_level(level)
        J8, L = IC.ic_precompute(
            ip[level], dp[level], gx[level], gy[level], intr_l, 0.3, 5.0
        )
        J8p = jnp.pad(J8, ((0, 0), (0, NP - J8.shape[1])))
        Lr = jnp.asarray(np.asarray(L, np.float32).reshape(1, 36))
        geom = F.pack_geometry(
            dp[level], intr_l, 0.0, float("inf"), NP, include_valid=False
        )
        packs.append((geom, J8p, Lr, IC._pad_rows8(ip[level]), dp[level]))
    return packs, Hl, Wl


@pytest.mark.parametrize("sampling", ["nearest", "bilinear"])
def test_ic_batch_kernel_matches_per_pair(intr, sampling):
    level, B, its = 1, 3, 4
    packs, Hl, Wl = _ic_chain(intr, level, B + 1)
    intr_l = intr.at_level(level)

    refs = []
    for k in range(B):
        geom, J8p, Lr, _, dep = packs[k]
        out = IC.ic_gn_level(
            jnp.eye(4), dep, J8p, Lr, packs[k + 1][3][:Hl], intr_l,
            its, 0.0, 1.0, sampling, interpret=True, mix_mode="f32",
        )
        refs.append([np.asarray(o) for o in out])

    outb = ic_gn_level_batch(
        jnp.tile(jnp.eye(4), (B, 1, 1)),
        jnp.stack([packs[k][0] for k in range(B)]),
        jnp.stack([packs[k][1] for k in range(B)]),
        jnp.stack([packs[k][2][0] for k in range(B)]),
        jnp.stack([packs[k + 1][3] for k in range(B)]),
        intr_l, its, 0.0, 1.0,
        H=Hl, W=Wl, sampling=sampling, interpret=True, mix_mode="f32",
        streams=2,  # exercises padding (B=3 -> NB=2, one pad pair)
    )
    for k in range(B):
        np.testing.assert_allclose(
            np.asarray(outb[0])[k], refs[k][0], atol=1e-5,
            err_msg=f"pair {k} pose",
        )
        assert int(np.asarray(outb[1])[k]) == int(refs[k][1])
        np.testing.assert_allclose(
            float(np.asarray(outb[4])[k]), float(refs[k][4]), atol=0.5
        )


def test_ic_batch_tilings():
    for H, W in [(30, 40), (60, 80), (120, 160)]:
        t = _ic_batch_tilings(H, W)
        assert t is not None
        S, NT = t
        assert S % 8 == 0
        NP, _ = F._pick_tile_pixels(H, W)
        assert NP % NT == 0
    assert _ic_batch_tilings(480, 640) is None
