"""Windowed photometric bundle adjustment (parallel/photometric_ba.py).

Oracles (the reference has neither BA nor tests — SURVEY §4): synthetic
rendered keyframe windows with exact ground-truth poses (utils/synthetic.py),
pose-error contraction after refinement, finite-difference agreement of the
photometric Jacobians, and sharded-vs-single-device equality on the virtual
CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phovo_tpu.ops import se3
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.parallel.mesh import make_mesh
from phovo_tpu.parallel.photometric_ba import (
    PhotometricBAProblem,
    build_photometric_window,
    optimize_photometric_bundle,
    select_landmark_pixels,
    _linearize,
)
from phovo_tpu.utils.synthetic import render_plane

INTR = Intrinsics(
    np.float32(96.0), np.float32(96.0), np.float32(63.5), np.float32(47.5)
)
SHAPE = (96, 128)


def _render_window(gt_states, shape=SHAPE, intr=INTR):
    """Render keyframes of the textured plane at the given world<-kf poses."""
    I, D = [], []
    for s in np.asarray(gt_states, np.float64):
        T_wk = np.asarray(se3.pose_matrix(s))
        I_m, D_m = render_plane(intr, shape, np.linalg.inv(T_wk))
        I.append(I_m)
        D.append(D_m)
    return np.stack(I), np.stack(D)


def _window_problem(n_kf=4, state_noise=0.01, grid=8, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.zeros((n_kf, 6), np.float32)
    gt[:, 0] = np.linspace(0.0, 0.12, n_kf)
    gt[:, 4] = np.linspace(0.0, 0.03, n_kf)  # slight pitch
    I, D = _render_window(gt)
    init = gt + rng.normal(0.0, state_noise, gt.shape).astype(np.float32)
    init[0] = gt[0]
    problem = build_photometric_window(I, D, init, INTR, grid=grid)
    return problem, jnp.asarray(gt)


def test_landmark_selection_static_shape_and_validity():
    I, D = _render_window(np.zeros((1, 6), np.float32))
    sel = select_landmark_pixels(I[0], D[0], grid=6)
    assert sel.shape == (36, 2)
    valid = sel[sel[:, 0] >= 0]
    assert len(valid) > 30  # textured plane: nearly every cell has gradient
    H, W = SHAPE
    assert (valid[:, 0] >= 2).all() and (valid[:, 0] < H - 2).all()
    assert (valid[:, 1] >= 2).all() and (valid[:, 1] < W - 2).all()


def test_photometric_jacobians_match_finite_differences():
    problem, _ = _window_problem(n_kf=3, state_noise=0.005, grid=4, seed=1)
    r, A, B, iw, jw = _linearize(problem, INTR)
    r, A, B = np.asarray(r), np.asarray(A), np.asarray(B)

    # pick an observation with non-trivial residual rows
    k = int(np.argmax(np.abs(A).sum((1, 2))))
    i, j = int(iw[k]), int(jw[k])
    eps = 1e-3

    def residual_at(states, points):
        p2 = problem._replace(
            pose_states=jnp.asarray(states), points=jnp.asarray(points)
        )
        return np.asarray(_linearize(p2, INTR)[0][k])

    s0 = np.asarray(problem.pose_states)
    x0 = np.asarray(problem.points)
    for c in range(6):
        sp = s0.copy()
        sp[i, c] += eps
        sm = s0.copy()
        sm[i, c] -= eps
        fd = (residual_at(sp, x0) - residual_at(sm, x0)) / (2 * eps)
        np.testing.assert_allclose(A[k, :, c], fd, atol=2e-2 * max(1.0, np.abs(fd).max()))
    for c in range(3):
        xp = x0.copy()
        xp[j, c] += eps
        xm = x0.copy()
        xm[j, c] -= eps
        fd = (residual_at(s0, xp) - residual_at(s0, xm)) / (2 * eps)
        np.testing.assert_allclose(B[k, :, c], fd, atol=2e-2 * max(1.0, np.abs(fd).max()))


def test_photometric_ba_tightens_poses():
    problem, gt = _window_problem(n_kf=4, state_noise=0.01, seed=2)
    states, points, cost = optimize_photometric_bundle(
        problem, INTR, iterations=8, damping=1e-4
    )
    err_init = np.abs(np.asarray(problem.pose_states) - np.asarray(gt)).max()
    err_final = np.abs(np.asarray(states) - np.asarray(gt)).max()
    assert np.isfinite(float(cost))
    assert err_final < err_init / 3, (err_init, err_final)


def test_perfect_window_is_stationary():
    """Starting AT ground truth, refinement must not walk away."""
    gt = np.zeros((3, 6), np.float32)
    gt[:, 0] = np.linspace(0.0, 0.08, 3)
    I, D = _render_window(gt)
    problem = build_photometric_window(I, D, gt, INTR, grid=6)
    states, _, _ = optimize_photometric_bundle(
        problem, INTR, iterations=4, damping=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(states), gt, atol=2e-3
    )


def test_sharded_matches_single_device():
    problem, _ = _window_problem(n_kf=3, state_noise=0.008, grid=6, seed=3)
    mesh = make_mesh(8, pixel_parallel=2)
    s1, p1, c1 = optimize_photometric_bundle(problem, INTR, iterations=4)
    s8, p8, c8 = optimize_photometric_bundle(
        problem, INTR, mesh=mesh, iterations=4
    )
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), atol=2e-4)
    # landmarks in a 3-frame window have only 2 observations each; the
    # near-unconstrained along-ray direction amplifies f32 reduction-order
    # differences for a few points — poses (the output that matters) agree
    # to 2e-4
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=3e-2)
    np.testing.assert_allclose(float(c8), float(c1), rtol=1e-3, atol=1e-6)


def test_padding_and_out_of_view_rows_are_inert():
    problem, _ = _window_problem(n_kf=3, state_noise=0.005, grid=4, seed=4)
    padded = problem._replace(
        obs_pose=jnp.concatenate([problem.obs_pose, -jnp.ones(5, jnp.int32)]),
        obs_point=jnp.concatenate([problem.obs_point, jnp.zeros(5, jnp.int32)]),
        weights=jnp.concatenate([problem.weights, jnp.full(5, 7.0)]),
        z_weights=jnp.concatenate([problem.z_weights, jnp.full(5, 7.0)]),
    )
    s1, p1, c1 = optimize_photometric_bundle(problem, INTR, iterations=3)
    s2, p2, c2 = optimize_photometric_bundle(padded, INTR, iterations=3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-6)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-6, atol=1e-9)


def test_gauge_anchor_fixed():
    problem, _ = _window_problem(n_kf=4, state_noise=0.01, seed=5)
    states, _, _ = optimize_photometric_bundle(problem, INTR, iterations=5)
    np.testing.assert_allclose(
        np.asarray(states[0]), np.asarray(problem.pose_states[0]), atol=1e-7
    )


def test_ba_preserves_exact_poses_hard_window():
    """Regression: the LM driver must be monotone. On THIS window (8
    keyframes with rotation on all three axes — near-degenerate: co-planar
    landmarks, short baselines) plain GN took an unbounded step along a
    near-null direction from an EXACT ground-truth start and produced
    meter-scale errors; the accept/reject driver must keep it stationary."""
    M = 8
    gt = np.stack([
        np.asarray(
            se3.matrix_to_state(
                jnp.asarray(
                    np.linalg.inv(
                        np.asarray(
                            se3.pose_matrix(
                                np.array([0.12 * k, -0.08 * k, 0.06 * k,
                                          0.05 * k, -0.03 * k, 0.04 * k])
                            )
                        )
                    )
                )
            )
        )
        for k in range(M)
    ]).astype(np.float32)
    I, D = _render_window(gt)
    pb = build_photometric_window(I, D, gt.copy(), INTR, grid=8)
    refined, _, _ = optimize_photometric_bundle(
        pb, INTR, mesh=None, iterations=6, damping=1e-4, fixed_first=True
    )
    err = float(np.abs(np.asarray(refined) - gt).max())
    assert err < 1e-3, err


def test_photometric_sparse_schur_matches_dense():
    """schur='sparse' (no dense W) matches the dense path on the same
    window."""
    problem, _ = _window_problem()
    sd, pd, cd = optimize_photometric_bundle(
        problem, INTR, iterations=4, schur="dense"
    )
    ss, ps, cs = optimize_photometric_bundle(
        problem, INTR, iterations=4, schur="sparse"
    )
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sd), atol=1e-4)
    # landmarks jitter along their weakly-constrained (depth-ish) directions
    # under f32 reduction reordering; poses are the well-conditioned output
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pd), atol=5e-3)
    np.testing.assert_allclose(float(cs), float(cd), rtol=0.05, atol=1e-6)


def test_global_builder_covisibility_structure():
    """build_photometric_global: max_covis observations per landmark, host
    excluded, invalid landmarks padded, nearest-by-center selection."""
    from phovo_tpu.parallel.photometric_ba import build_photometric_global

    n_kf, grid, covis = 6, 4, 3
    gt = np.zeros((n_kf, 6), np.float32)
    gt[:, 0] = np.linspace(0.0, 0.3, n_kf)
    I, D = _render_window(gt)
    problem = build_photometric_global(
        I, D, gt, INTR, grid=grid, max_covis=covis
    )
    G = grid * grid
    Pn = n_kf * G
    assert problem.points.shape == (Pn, 3)
    obs_pose = np.asarray(problem.obs_pose).reshape(Pn, covis)
    obs_point = np.asarray(problem.obs_point).reshape(Pn, covis)
    for j in range(Pn):
        host = j // G
        row = obs_pose[j]
        if (row >= 0).any():
            assert host not in row[row >= 0]  # host never observes its own
            assert np.all(obs_point[j] == j)
            # nearest-by-center: hosts are colinear in x, so covis picks
            # index-adjacent keyframes
            assert np.all(np.abs(row[row >= 0] - host) <= covis)


def test_global_ba_tightens_poses():
    """One joint problem over all keyframes must contract pose error like
    the windowed path does (same optimizer, covis-limited observations)."""
    from phovo_tpu.parallel.photometric_ba import build_photometric_global

    rng = np.random.default_rng(5)
    n_kf = 5
    gt = np.zeros((n_kf, 6), np.float32)
    gt[:, 0] = np.linspace(0.0, 0.16, n_kf)
    gt[:, 4] = np.linspace(0.0, 0.03, n_kf)
    I, D = _render_window(gt)
    init = gt + rng.normal(0.0, 0.01, gt.shape).astype(np.float32)
    init[0] = gt[0]
    problem = build_photometric_global(
        I, D, init, INTR, grid=8, max_covis=3
    )
    states, _, cost = optimize_photometric_bundle(
        problem, INTR, iterations=8, damping=1e-4, fixed_first=True
    )
    err0 = float(np.abs(init - np.asarray(gt)).max())
    err1 = float(np.abs(np.asarray(states) - np.asarray(gt)).max())
    assert np.isfinite(float(cost))
    assert err1 < 0.5 * err0, (err0, err1)


def test_global_ba_through_keyframe_pipeline():
    """ba_scope='global' must run through KeyframeVisualOdometry.finalize
    and keep the trajectory close to the pose-graph solution (image
    evidence refines, never corrupts, on an exactly-rendered scene)."""
    from tests.test_keyframe import CFG, INTR as KINTR, _make_kvo
    from tests.test_keyframe import loop_sequence  # noqa: F401
    import tests.test_keyframe as tk
    from phovo_tpu.utils.synthetic import render_plane as _rp
    from phovo_tpu.datasets.tum import RGBDFrame

    frames = []
    gts = []
    for k, st in enumerate(tk._out_and_back_states()):
        T = np.asarray(se3.pose_matrix(st))
        I_m, D_m = _rp(tk.INTR, tk.SHAPE, T)
        frames.append(
            RGBDFrame(
                timestamp=float(k), depth_timestamp=float(k),
                intensity=(I_m * 255).astype(np.uint8), depth=D_m,
            )
        )
        gts.append(np.linalg.inv(T))

    graph_only = tk._make_kvo()
    list(graph_only.run(frames))
    t_graph = graph_only.finalize()

    kvo = tk._make_kvo()
    list(kvo.run(frames))
    tracked = kvo.finalize(ba_iterations=4, ba_scope="global", ba_covis=3)

    assert len(tracked) == len(t_graph)
    for a, b in zip(tracked, t_graph):
        assert np.all(np.isfinite(a.pose))
        # global BA polish stays in the graph solution's neighborhood
        np.testing.assert_allclose(
            a.pose[:3, 3], b.pose[:3, 3], atol=0.02
        )


@pytest.mark.parametrize(
    "traj,improvement",
    [
        # forward: measured pg 0.021 -> BA(3) 0.0065; 0.6x leaves 2x margin
        ("forward", 0.6),
        # loop (VERDICT r4 item 7 — the second geometry, so a regression
        # that only breaks loop-closure-adjacent windows is caught):
        # measured pg 0.0307 -> BA(3) 0.0209 (0.68x); bound 0.85x
        ("loop", 0.85),
    ],
)
def test_ba_improves_ate_on_room_scene(traj, improvement):
    """VERDICT r3 item 1 / r4 item 7: photometric BA must EARN its keep —
    on the geometrically rich room fixture (utils/synthetic.render_room:
    5 non-parallel surfaces + 2 slabs at varied depths) the default
    windowed BA (Huber 0.1 + occlusion gate) must materially beat the
    pose-graph-only trajectory on ATE, on BOTH trajectory families
    (forward sweep; out-and-back loop with real loop closures). The
    quadratic-cost regression this pins: unrobust BA on the same fixture
    WORSENS ATE (0.023 -> 0.042 at 6 iterations)."""
    from tools.ba_ablation import sweep, track_scene

    H, W = 96, 128
    fx = 525.0 * W / 640.0
    intr = Intrinsics(
        np.float32(fx), np.float32(fx),
        np.float32((W - 1) / 2), np.float32((H - 1) / 2),
    )
    kvo, gts = track_scene("room", traj, intr, (H, W), 48, 1.0)
    if traj == "loop":
        assert len(kvo.loop_closures) >= 3  # the loop must actually close
    res = sweep(
        kvo, gts,
        [("pg", dict(ba_iterations=0)), ("ba3", dict(ba_iterations=3))],
    )
    assert res["pg"] < 0.05, res
    assert res["ba3"] < improvement * res["pg"], res


def _room_kvo(n_kf=7, noise=0.008, seed=3, shape=(64, 96)):
    """KeyframeVisualOdometry with hand-inserted room keyframes at noisy
    poses (no tracking needed — the refine paths only read keyframes +
    intrinsics)."""
    from phovo_tpu.models.analytic import PhotoconsistencyOdometryAnalytic
    from phovo_tpu.models.keyframe import Keyframe, KeyframeVisualOdometry
    from phovo_tpu.utils.config import PhovoConfig
    from phovo_tpu.utils.synthetic import render_room

    H, W = shape
    fx = 525.0 * W / 640.0
    intr = Intrinsics(
        np.float32(fx), np.float32(fx),
        np.float32((W - 1) / 2), np.float32((H - 1) / 2),
    )
    rng = np.random.default_rng(seed)
    gt = np.zeros((n_kf, 6), np.float64)
    gt[:, 0] = np.linspace(0.0, 0.5, n_kf)
    gt[:, 3] = np.linspace(0.0, 0.2, n_kf)
    cfg = PhovoConfig(
        num_levels=1, blur_filter_sizes=(0,), gradient_scales=(0.0625,),
        max_iterations=(1,), lambda_steps=(1.0,), min_gradient_norms=(0.0,),
    )
    vo = PhotoconsistencyOdometryAnalytic(cfg)
    vo.set_intrinsic_matrix(np.asarray(intr.matrix()))
    kvo = KeyframeVisualOdometry(vo)
    for m in range(n_kf):
        T_cw = np.asarray(se3.pose_matrix(gt[m]))
        I_m, D_m = render_room(intr, shape, T_cw)
        noisy = gt[m] + np.concatenate(
            [rng.normal(0, noise, 3), rng.normal(0, noise / 2, 3)]
        )
        if m == 0:
            noisy = gt[m]
        kvo.keyframes.append(
            Keyframe(
                index=m, frame_index=m, timestamp=float(m),
                intensity=I_m, depth=D_m,
                # Keyframe.pose is world <- keyframe (the inverse of the
                # camera-from-world matrix the renderer consumes)
                pose=np.linalg.inv(se3.pose_matrix_np(noisy)),
            )
        )
    gt_world = np.stack(
        [np.linalg.inv(np.asarray(se3.pose_matrix(g))) for g in gt]
    )
    return kvo, gt_world, intr


@pytest.mark.parametrize("robust_delta", [0.1, None])
def test_scanned_windows_match_host_loop(robust_delta):
    """refine_photometric_windows (ONE scanned device program over all
    sliding windows, VERDICT r3 weak #2) must reproduce a host loop that
    drives the SAME device-side window construction + LM core window by
    window: same windows, same chaining through the overlap pose, same
    padding semantics. Damping 1.0 keeps the LM steps well-regularized so
    the comparison is EXACT (measured 0.0 here); at production damping
    1e-4 a single step on this small noisy fixture amplifies even
    last-ulp compile-context differences ~1e4x (measured: a 2.4e-7 input
    perturbation moves one step 4e-3), so scan-vs-sequential at that
    damping is asserted at OUTCOME level in
    test_scanned_windows_track_sequential_outcome."""
    import jax

    from phovo_tpu.models.base import device_unit_intensity
    from phovo_tpu.parallel.photometric_ba import (
        _optimize_photometric_jit,
        build_window_problem_device,
        refine_photometric_windows,
        window_starts,
    )

    kvo, gt, intr = _room_kvo()
    kfs = kvo.keyframes
    M = len(kfs)
    window, grid, iters = 4, 6, 3
    sel = np.stack(
        [
            select_landmark_pixels(k.intensity, k.depth, grid=grid)
            for k in kfs
        ]
    )
    dev_I = device_unit_intensity(
        jnp.stack([k.dev_intensity for k in kfs])
    ).astype(jnp.float32)
    dev_D = jnp.stack([k.dev_depth for k in kfs])
    states0 = se3.matrix_to_state_np(
        np.stack([k.pose for k in kfs])
    ).astype(np.float32)
    starts = window_starts(M, window)
    # padded windows must be no-ops
    starts_arr = np.asarray(starts + [starts[-1]] * 2, np.int32)
    apply = np.asarray([True] * len(starts) + [False] * 2)

    scanned, pts, refs, lm_valid = refine_photometric_windows(
        dev_I, dev_D, jnp.asarray(states0), jnp.asarray(sel),
        jnp.asarray(starts_arr), jnp.asarray(apply), intr,
        jnp.float32(1.0), window=window, grid=grid, iterations=iters,
        robust_delta=robust_delta,
    )

    # host-driven reference: same construction, one dispatch per window
    states = jnp.asarray(states0)
    for s in starts:
        st_w = jax.lax.dynamic_slice(states, (s, 0), (window, 6))
        problem, _ = build_window_problem_device(
            dev_I, dev_D, st_w, jnp.asarray(sel), s, intr,
            window=window, grid=grid,
        )
        refined, _, _ = _optimize_photometric_jit(
            problem, intr, jnp.float32(1.0), None, None, mesh=None,
            iterations=iters, fixed_first=True, robust_delta=robust_delta,
        )
        states = jax.lax.dynamic_update_slice(
            states, refined, (s, 0)
        )
    np.testing.assert_allclose(
        np.asarray(scanned), np.asarray(states), atol=1e-6
    )
    # padded window rows report no landmarks
    assert not np.asarray(lm_valid)[len(starts):].any()


def test_scanned_windows_improve_noisy_poses():
    """The scanned window refinement must actually contract pose error on
    the room scene (not merely match the sequential path)."""
    kvo, gt_world, intr = _room_kvo(noise=0.01)
    err0 = max(
        np.linalg.norm(k.pose[:3, 3] - g[:3, 3])
        for k, g in zip(kvo.keyframes, gt_world)
    )
    kvo._refine_photometric(None, 6, 4, 6, 1e-4, 0.1)
    err1 = max(
        np.linalg.norm(k.pose[:3, 3] - g[:3, 3])
        for k, g in zip(kvo.keyframes, gt_world)
    )
    # measured 0.033 -> 0.017 on this fixture (4-kf windows at 64x96 with
    # 36 landmarks/kf leave the tail keyframe weakly constrained)
    assert err1 < 0.65 * err0, (err0, err1)


def test_scanned_windows_track_sequential_outcome():
    """Outcome-level pin of scanned vs sequential window BA: both must
    contract pose error on the room fixture, landing within each other's
    neighborhood (bit-level equality is precluded by the f64-vs-f32
    problem construction; see test_scanned_windows_match_host_loop)."""
    kvo, gt_world, intr = _room_kvo(noise=0.01)
    snap = [k.pose.copy() for k in kvo.keyframes]

    def err():
        return float(np.mean([
            np.linalg.norm(k.pose[:3, 3] - g[:3, 3])
            for k, g in zip(kvo.keyframes, gt_world)
        ]))

    err0 = err()
    kvo._refine_photometric(None, 6, 4, 6, 1e-4, 0.1)
    err_scan = err()
    n_scan_pts = len(kvo.map_points)
    for k, p in zip(kvo.keyframes, snap):
        k.pose = p.copy()
    kvo._refine_photometric_sequential(None, 6, 4, 6, 1e-4, 0.1)
    err_seq = err()
    # measured: err0 0.0159, scan 0.0096, sequential 0.0125 (the f64-vs-
    # f32 construction rounding lands the ill-conditioned directions in
    # different spots of the same valley)
    assert err_scan < 0.7 * err0, (err0, err_scan)
    assert err_seq < 0.85 * err0, (err0, err_seq)
    assert abs(err_scan - err_seq) < 0.5 * err0, (err_scan, err_seq)
    assert n_scan_pts == len(kvo.map_points)


def test_global_ba_bucketing_padding_is_inert():
    """_refine_photometric_global pads the keyframe count to a bucket of
    16 for compile-cache reuse; padded keyframes (zero depth, 1e6-far
    poses) must not change the real keyframes' refinement. Reference: the
    unpadded joint problem solved directly. Damping 1.0 regularizes the
    steps so the comparison is tight (see
    test_scanned_windows_match_host_loop)."""
    from phovo_tpu.parallel.photometric_ba import (
        build_photometric_global,
        optimize_photometric_bundle,
    )

    kvo, gt_world, intr = _room_kvo(n_kf=7)
    kfs = kvo.keyframes
    states0 = se3.matrix_to_state_np(
        np.stack([k.pose for k in kfs])
    ).astype(np.float32)
    problem = build_photometric_global(
        np.stack([k.intensity for k in kfs]),
        np.stack([k.depth for k in kfs]).astype(np.float32),
        states0, intr, grid=6, max_covis=3, occ_gate=0.3,
    )
    ref, _, _ = optimize_photometric_bundle(
        problem, intr, iterations=3, damping=1.0, robust_delta=0.1,
        schur="auto", robust_z_delta=0.02,
    )
    kvo._refine_photometric_global(None, 3, 6, 1.0, 0.1, 3)
    refined = se3.matrix_to_state_np(
        np.stack([k.pose for k in kfs])
    )
    np.testing.assert_allclose(refined, np.asarray(ref), atol=1e-4)
