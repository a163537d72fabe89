"""Profiling, metrics, viz, and distributed helpers."""

import json

import numpy as np
import pytest

from phovo_tpu.utils import profiling, viz
from phovo_tpu.parallel import distributed


def test_stopwatch_and_timer(capsys):
    sw = profiling.Stopwatch()
    sw.start()
    dt = sw.stop()
    assert dt >= 0 and sw.count == 1
    with profiling.timer("x", sync=False):
        pass
    assert "x:" in capsys.readouterr().out


def test_metrics_logger(tmp_path):
    p = tmp_path / "m.jsonl"
    with profiling.MetricsLogger(p) as m:
        m.log(frame=1, iterations=np.array([1, 2, 3]), cost=np.float32(0.5))
        m.log(frame=2, state=np.zeros(6))
    lines = [json.loads(line) for line in p.read_text().splitlines()]
    assert lines[0]["frame"] == 1
    assert lines[0]["iterations"] == [1, 2, 3]
    assert lines[0]["cost"] == pytest.approx(0.5)
    assert len(lines[1]["state"]) == 6


def test_alignment_diff_near_zero_at_ground_truth(intr, small_pair):
    I0, D0, I1, _, gt = small_pair
    diff = viz.alignment_diff(I0, D0, I1, gt, intr)
    assert diff.shape == I0.shape
    # forward warp leaves holes (scatter); median over covered pixels is small
    assert np.median(diff[diff > 0]) < 0.1 or np.median(diff) < 0.02


def test_save_image_and_mosaic(tmp_path):
    img = np.random.default_rng(0).random((32, 40), dtype=np.float32)
    m = viz.side_by_side(img, img * 0.5)
    assert m.shape[0] == 32 and m.shape[1] == 84
    viz.save_image(tmp_path / "x.png", img)
    assert (tmp_path / "x.png").stat().st_size > 0


def test_distributed_single_process_noop():
    distributed.initialize()  # must be a no-op without a cluster
    mesh = distributed.global_mesh()
    assert mesh.devices.size == 8
    start, size = distributed.local_batch_slice(16)
    assert (start, size) == (0, 16)


def test_vo_cli_outputs(tmp_path):
    import cv2

    from phovo_tpu.apps.phovo_vo import main
    from phovo_tpu.datasets.tum import RGBDFrame
    from phovo_tpu.ops import se3
    from phovo_tpu.ops.camera import Intrinsics
    from phovo_tpu.utils.synthetic import render_plane
    from phovo_tpu.utils.trajectory import format_pose_line

    intr = Intrinsics(np.float32(128.0), np.float32(128.0), np.float32(63.5), np.float32(47.5))
    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rgb_lines, dep_lines = [], []
    for k in range(3):
        st = np.array([0.02 * k, 0, 0.005 * k, 0.004 * k, 0, 0])
        T = np.asarray(se3.pose_matrix(st))
        I, D = render_plane(intr, (96, 128), T)
        ts = 10.0 + k * 0.1
        cv2.imwrite(str(root / "rgb" / f"{k}.png"), (I * 255).astype(np.uint8))
        cv2.imwrite(str(root / "depth" / f"{k}.png"), (D * 5000).astype(np.uint16))
        rgb_lines.append(f"{ts} rgb/{k}.png")
        dep_lines.append(f"{ts} depth/{k}.png")
    (root / "rgb.txt").write_text("\n".join(rgb_lines))
    (root / "depth.txt").write_text("\n".join(dep_lines))
    cfg = tmp_path / "c.yml"
    cfg.write_text("num_levels: 1\nmax_iterations: [6]\nmin_gradient_norms: [1.0e-9]\nsampling: bilinear\n")

    out = tmp_path / "t.txt"
    metrics = tmp_path / "m.jsonl"
    diffs = tmp_path / "diffs"
    rc = main([
        "--config", str(cfg), "--dataset", str(root), "--output", str(out),
        "--intrinsics", "128,128,63.5,47.5", "--quiet",
        "--metrics", str(metrics), "--save-diff-dir", str(diffs),
    ])
    assert rc == 0
    recs = [json.loads(line) for line in metrics.read_text().splitlines()]
    assert len(recs) == 2 and "align_seconds" in recs[0]
    assert len(list(diffs.glob("*.png"))) == 2


def test_phovo_eval_cli(tmp_path, capsys):
    """phovo-eval scores a noisy trajectory against ground truth (in-tree
    equivalent of the TUM evaluate_ate/evaluate_rpe workflow)."""
    import json

    import numpy as np

    from phovo_tpu.apps.phovo_eval import main as eval_main
    from phovo_tpu.ops import se3
    from phovo_tpu.utils.trajectory import format_pose_line

    rng = np.random.default_rng(3)
    gt_lines, est_lines = ["# ground truth"], ["# estimated"]
    for k in range(20):
        state = np.array(
            [0.05 * k, 0.01 * k, 0.0, 0.02 * k, 0.0, 0.0], np.float32
        )
        T = np.asarray(se3.pose_matrix(state))
        gt_lines.append(format_pose_line(k * 0.1, T))
        Tn = T.copy()
        Tn[:3, 3] += rng.normal(scale=2e-3, size=3)
        est_lines.append(format_pose_line(k * 0.1 + 0.003, Tn))
    gt_p = tmp_path / "gt.txt"
    est_p = tmp_path / "est.txt"
    gt_p.write_text("\n".join(gt_lines) + "\n")
    est_p.write_text("\n".join(est_lines) + "\n")

    rc = eval_main([str(gt_p), str(est_p), "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ate"]["num_pairs"] == 20
    assert 0.0 < out["ate"]["rmse"] < 0.01  # ~2 mm noise
    assert out["rpe"]["trans_rmse"] < 0.02

    # human-readable mode + error path
    assert eval_main([str(gt_p), str(est_p), "--mode", "ate"]) == 0
    assert "ATE over 20" in capsys.readouterr().out
    assert eval_main([str(gt_p), str(tmp_path / "missing.txt")]) == 1


def test_associate_timestamps_full_candidate_semantics():
    """TUM associate.py keeps pairs a nearest-neighbor-per-stamp matcher
    drops: both est stamps' nearest gt is the same entry, but a second gt
    within tolerance exists (regression — the old matcher dropped est 0.010
    entirely)."""
    import numpy as np

    from phovo_tpu.utils.trajectory import associate_timestamps

    ia, ib = associate_timestamps(
        np.asarray([0.000, 0.010]), np.asarray([0.005, 0.019]), max_dt=0.02
    )
    assert ia.tolist() == [0, 1]
    assert ib.tolist() == [0, 1]


def test_associate_timestamps_matches_bruteforce():
    """The vectorized windowed matcher reproduces the naive all-pairs greedy
    algorithm exactly on random stamp sets."""
    import numpy as np

    from phovo_tpu.utils.trajectory import associate_timestamps

    rng = np.random.default_rng(0)
    for trial in range(20):
        ta = np.sort(rng.uniform(0, 10, rng.integers(1, 40)))
        tb = np.sort(rng.uniform(0, 10, rng.integers(1, 40)))
        max_dt = float(rng.uniform(0.05, 0.5))
        cands = sorted(
            (abs(x - y), i, j)
            for i, x in enumerate(ta)
            for j, y in enumerate(tb)
            if abs(x - y) <= max_dt
        )
        ua, ub, ref = set(), set(), []
        for _, i, j in cands:
            if i not in ua and j not in ub:
                ua.add(i)
                ub.add(j)
                ref.append((i, j))
        ref.sort()
        ia, ib = associate_timestamps(ta, tb, max_dt)
        assert list(zip(ia.tolist(), ib.tolist())) == ref, trial
