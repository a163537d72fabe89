"""CI parity bound: framework trajectory vs the reference-exact oracle.

The blueprint's headline accuracy target is "match the reference trajectory
within its ATE bound per preset". tools/parity_harness.py measures the full
12-preset VGA table (reported in PARITY.md); this test pins fast subsets in
CI so a regression in any divergence (gather vs scatter indexing, corrected
Jacobian, bilinear vs nearest) that MOVES the trajectory materially fails
the build. Bounds are ~3x the measured deltas (PARITY.md + the r3
measurements recorded per-case below).

Scenes (VERDICT r2 item 6): the original 120x160 translation-dominant
cases, a 240x320 (QVGA) pin where the oracle's half-pixel bias is small so
the bound is tight (analytic measured 3e-6 m here — a 0.1 mm regression
fails), and a rotation-dominant QVGA scene (the banded window and the
Jacobian divergences are most stressed by rotation; measured analytic
3.3e-3 / biobjective 5.3e-3).
"""

import numpy as np
import pytest

from phovo_tpu.utils.config import load_builtin
from tools import parity_harness

_SEQ_CACHE: dict = {}


def _sequence(shape, trajectory):
    key = (shape, trajectory)
    if key in _SEQ_CACHE:
        return _SEQ_CACHE[key]
    from phovo_tpu.ops.camera import Intrinsics
    from phovo_tpu.utils import synthetic

    H, W = shape
    fx = 525.0 * W / 640.0
    intr = Intrinsics(
        np.float32(fx), np.float32(fx), np.float32((W - 1) / 2), np.float32((H - 1) / 2)
    )
    K = np.array([[fx, 0, (W - 1) / 2], [0, fx, (H - 1) / 2], [0, 0, 1.0]])
    motion = 0.6 if trajectory == "rotation" else 1.0
    I, D, gts, _ = synthetic.make_sequence(
        intr, (H, W), 5, motion, 0, trajectory=trajectory
    )
    I_u8 = [(img * 255).astype(np.uint8) for img in I]
    out = (I_u8, [d.astype(np.float64) for d in D], D, K, np.stack(gts))
    _SEQ_CACHE[key] = out
    return out


# (shape, trajectory, preset, backend, ATE bound in meters over the 5-frame
# trajectory). The autodiff bound is looser because at 120x160 the oracle
# ITSELF is ~2 cm off ground truth (the reference Ceres path samples at
# (x-0.5, y-0.5), sample.h:79-98 — a half-pixel bias that dominates at
# coarse pyramid levels; measured oracle-vs-gt 0.0205 vs framework-vs-gt
# 0.0005 here, and 0.0020 vs 0.0007 at 240x320). The second assertion pins
# the direction: the framework's deliberate divergences must never make it
# materially LESS accurate than the reference on the same data.
CASES = [
    # translation-dominant, 120x160 (the r2 cases)
    ((120, 160), "smooth", "config_4_level_optimization_analytic", "analytic", 1e-3),
    ((120, 160), "smooth", "config_4_level_optimization_analytic", "biobjective", 3e-3),
    ((120, 160), "smooth", "config_3_level_optimization_ceres", "autodiff", 3e-2),
    # QVGA tight pin (r3: measured fw-vs-oracle 3.4e-6 / 1.8e-4)
    ((240, 320), "smooth", "config_4_level_optimization_analytic", "analytic", 5e-5),
    ((240, 320), "smooth", "config_4_level_optimization_analytic", "biobjective", 6e-4),
    # rotation-dominant QVGA, all three backends (r4 re-measure: analytic
    # 3.33e-3, biobjective 5.33e-3, autodiff 3.00e-3 — deterministic CPU
    # runs; bounds sized so a ~2 mm rotation-coupled regression FAILS,
    # VERDICT r3 item 7)
    ((240, 320), "rotation", "config_4_level_optimization_analytic", "analytic", 5e-3),
    ((240, 320), "rotation", "config_4_level_optimization_analytic", "biobjective", 7.5e-3),
    ((240, 320), "rotation", "config_3_level_optimization_ceres", "autodiff", 5e-3),
]


@pytest.mark.parametrize("shape,trajectory,preset,backend,bound", CASES)
def test_trajectory_matches_oracle(shape, trajectory, preset, backend, bound):
    from phovo_tpu.ops import se3
    from tools import reference_oracle

    I_u8, D64, D, K, gt_poses = _sequence(shape, trajectory)
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
    assert ate < bound, (
        f"{preset}/{backend}@{shape}/{trajectory}: fw-vs-oracle ATE "
        f"{ate:.6f} >= {bound}"
    )
    ate_fw_gt = parity_harness.ate_rmse(f_poses, gt_poses)
    ate_or_gt = parity_harness.ate_rmse(o_poses, gt_poses)
    assert ate_fw_gt <= ate_or_gt * 1.5 + 1e-4, (
        f"{preset}/{backend}@{shape}/{trajectory}: framework ATE-vs-GT "
        f"{ate_fw_gt:.6f} worse than reference oracle's {ate_or_gt:.6f}"
    )
