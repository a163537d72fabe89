"""CI parity bound: framework trajectory vs the reference-exact oracle.

The blueprint's headline accuracy target is "match the reference trajectory
within its ATE bound per preset". tools/parity_harness.py measures the full
12-preset VGA table (reported in PARITY.md); this test pins a fast subset in
CI — one preset per backend at 120x160 over 5 frames — asserting the
framework's trajectory stays within a tight ATE bound of the oracle's, so a
regression in any divergence (gather vs scatter indexing, corrected
Jacobian, bilinear vs nearest) that MOVES the trajectory materially fails
the build. Bounds are ~3x the measured deltas (see PARITY.md, measured at
VGA: analytic 1.2e-4, biobjective 7.5e-4, autodiff 1.3e-3).
"""

import numpy as np
import pytest

from phovo_tpu.utils.config import load_builtin
from tools import parity_harness


@pytest.fixture(scope="module")
def small_sequence():
    from phovo_tpu.ops.camera import Intrinsics
    from phovo_tpu.utils import synthetic

    H, W = 120, 160
    fx = 525.0 * W / 640.0
    intr = Intrinsics(
        np.float32(fx), np.float32(fx), np.float32((W - 1) / 2), np.float32((H - 1) / 2)
    )
    K = np.array([[fx, 0, (W - 1) / 2], [0, fx, (H - 1) / 2], [0, 0, 1.0]])
    I, D, gts, _ = synthetic.make_sequence(intr, (H, W), 5, 1.0, 0)
    I_u8 = [(img * 255).astype(np.uint8) for img in I]
    return I_u8, [d.astype(np.float64) for d in D], D, K, np.stack(gts)


# (preset, backend, ATE bound in meters over the 5-frame trajectory).
# The autodiff bound is looser because at 120x160 the oracle ITSELF is
# ~2 cm off ground truth (the reference Ceres path samples at (x-0.5, y-0.5),
# sample.h:79-98 — a half-pixel bias that dominates at coarse pyramid levels;
# measured oracle-vs-gt 0.0205 vs framework-vs-gt 0.0005 here, and 0.0020 vs
# 0.0007 at 240x320). The second assertion pins the direction: the
# framework's deliberate divergences must never make it LESS accurate than
# the reference on the same data.
CASES = [
    ("config_4_level_optimization_analytic", "analytic", 1e-3),
    ("config_4_level_optimization_analytic", "biobjective", 3e-3),
    ("config_3_level_optimization_ceres", "autodiff", 3e-2),
]


@pytest.mark.parametrize("preset,backend,bound", CASES)
def test_trajectory_matches_oracle(small_sequence, preset, backend, bound):
    from phovo_tpu.ops import se3
    from tools import reference_oracle

    I_u8, D64, D, K, gt_poses = small_sequence
    cfg = load_builtin(preset)
    oracle = parity_harness._oracle_backend(backend, cfg)
    o_poses, _ = parity_harness.run_vo(
        oracle, I_u8, D64, K, reference_oracle.pose_matrix
    )
    model = parity_harness._framework_backend(backend, cfg)
    f_poses, _ = parity_harness.run_vo(
        model, I_u8, D, K, lambda s: se3.pose_matrix(s.astype(np.float64))
    )
    ate = parity_harness.ate_rmse(f_poses, o_poses)
    assert ate < bound, f"{preset}/{backend}: fw-vs-oracle ATE {ate:.5f} >= {bound}"
    ate_fw_gt = parity_harness.ate_rmse(f_poses, gt_poses)
    ate_or_gt = parity_harness.ate_rmse(o_poses, gt_poses)
    assert ate_fw_gt <= ate_or_gt * 1.5 + 1e-4, (
        f"{preset}/{backend}: framework ATE-vs-GT {ate_fw_gt:.5f} worse than "
        f"reference oracle's {ate_or_gt:.5f}"
    )
