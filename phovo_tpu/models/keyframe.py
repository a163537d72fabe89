"""Keyframe-based visual odometry with loop closure and pose-graph backend.

The reference integrates pose frame-to-frame with no drift correction
(PhotoconsistencyVisualOdometry.cpp:233-234). This module adds the standard
dense-VO production structure on top of the same aligners:

  - frames are tracked against the current KEYFRAME (not the previous
    frame), which removes the per-frame integration drift of chain odometry;
  - a new keyframe is promoted when the tracked motion or the valid-pixel
    overlap crosses thresholds, adding an odometry edge to the pose graph;
  - loop closures: when a new keyframe lands near an old, non-adjacent
    keyframe, the two are aligned photometrically; if the alignment is
    well-supported (valid-pixel fraction + mean residual gates) a loop edge
    is added;
  - `finalize()` runs the (optionally mesh-sharded) pose-graph Gauss-Newton
    (parallel/pose_graph.py) and recomposes every frame pose from its
    optimized reference keyframe.

Tracking stays chip-local; only the pose-graph reduction spans devices
(SURVEY §5 north star).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator

import numpy as np

from phovo_tpu.datasets.tum import RGBDFrame
from phovo_tpu.models.base import (
    BAND_FALLBACK_DEFAULT,
    AlignmentResult,
    PhotoconsistencyOdometryBase,
    band_masked_fraction,
)
from phovo_tpu.ops import se3
from phovo_tpu.parallel.pose_graph import PoseGraph, optimize_pose_graph

import jax.numpy as jnp


@dataclasses.dataclass
class Keyframe:
    index: int  # keyframe id (0-based)
    frame_index: int  # source frame index in the stream
    timestamp: float
    intensity: np.ndarray
    depth: np.ndarray
    pose: np.ndarray  # (4, 4) world <- keyframe (current estimate)
    # device-resident copies (storage dtype): every frame tracks against the
    # CURRENT keyframe, so uploading it once at promotion instead of per
    # tracked frame removes the dominant host->device transfer on
    # remote-attached chips
    dev_intensity: object = None
    dev_depth: object = None

    def __post_init__(self):
        if self.dev_intensity is None:
            self.dev_intensity = jnp.asarray(self.intensity)
        if self.dev_depth is None:
            self.dev_depth = jnp.asarray(self.depth, jnp.float32)


@dataclasses.dataclass
class TrackedFrame:
    frame_index: int
    timestamp: float
    keyframe_index: int
    rel_to_keyframe: np.ndarray  # (4, 4): pose = kf.pose @ rel
    pose: np.ndarray  # (4, 4) world pose (pre-optimization estimate)
    align_iterations: np.ndarray
    num_valid: float


@dataclasses.dataclass
class LoopClosure:
    from_kf: int
    to_kf: int
    relative: np.ndarray  # (4, 4): T_from^{-1} T_to measured
    mean_residual: float


class KeyframeVisualOdometry:
    """Keyframe tracker + pose-graph backend over any alignment backend."""

    def __init__(
        self,
        odometry: PhotoconsistencyOdometryBase,
        kf_translation: float = 0.15,  # meters
        kf_rotation: float = 0.15,  # radians (euler norm)
        kf_min_valid_fraction: float = 0.5,
        loop_radius: float = 0.6,  # meters between keyframe positions
        loop_min_gap: int = 5,  # minimum keyframe-index separation
        loop_max_mean_residual: float = 0.05,  # intensity units (0..1)
        loop_min_valid_fraction: float = 0.4,
        loop_weight: float = 10.0,
        loop_max_translation_dev: float = 0.2,  # meters vs predicted relative
        loop_max_rotation_dev: float = 0.3,  # radians vs predicted relative
        band_fallback: float = BAND_FALLBACK_DEFAULT,
        pg_solver: str = "auto",  # pose-graph solver: auto/dense/cg
        pg_incremental: int = 0,  # re-solve the graph every N promotions
    ):
        self.odometry = odometry
        self.pg_solver = pg_solver
        # incremental back-end (VERDICT r3 item 4): a long-running system
        # should fold loop closures in as they arrive instead of once at
        # finalize(). Every N promotions the CURRENT graph is re-solved
        # (bucketed shapes reuse compiled programs) and the keyframe poses
        # rebase — subsequent closure-candidate search and emitted poses
        # then see the drift-corrected map. finalize() still runs the
        # final batch solve, which converges to the same optimum from the
        # rebased (closer) initialization.
        self.pg_incremental = pg_incremental
        self.incremental_solves = 0
        # wall seconds of each incremental re-solve (graph build + closure
        # flush + bucketed solve + rebase), for the map-scale latency bound
        # (VERDICT r4 item 2) — read after a run for per-promotion stats;
        # incremental_breakdown itemizes each as (build+flush,
        # solve+fetch, rebase)
        self.incremental_latencies: list[float] = []
        self.incremental_breakdown: list[tuple] = []
        # banded-window fallback (models/base.py band_masked_fraction): the
        # per-frame run() path inherits the gate from odometry.optimize();
        # run_chunked and the batched closure dispatches bypass the object
        # API, so they gate here. band_fallbacks counts engagements in the
        # chunked/closure paths (odometry.band_fallbacks counts the rest).
        self.band_fallback = band_fallback
        odometry.band_fallback = band_fallback
        self.band_fallbacks = 0
        self.kf_translation = kf_translation
        self.kf_rotation = kf_rotation
        self.kf_min_valid_fraction = kf_min_valid_fraction
        self.loop_radius = loop_radius
        self.loop_min_gap = loop_min_gap
        self.loop_max_mean_residual = loop_max_mean_residual
        self.loop_min_valid_fraction = loop_min_valid_fraction
        self.loop_weight = loop_weight
        self.loop_max_translation_dev = loop_max_translation_dev
        self.loop_max_rotation_dev = loop_max_rotation_dev

        self.keyframes: list[Keyframe] = []
        self.tracked: list[TrackedFrame] = []
        # BA-refined sparse map: (N, 3) world landmarks + (N,) intensities,
        # populated by finalize(ba_iterations>0) (all windows' landmarks in
        # window scope; the joint problem's in global scope)
        self.map_points: np.ndarray | None = None
        self.map_intensity: np.ndarray | None = None
        self.odometry_edges: list[tuple[int, int, np.ndarray]] = []  # (i, j, T_i^-1 T_j)
        self.loop_closures: list[LoopClosure] = []
        # in-flight batched closure alignments: (new_kf_index,
        # [(old_index, rel_pred)], device result, n_real) — JAX dispatch is
        # async, so these compute on-device while tracking continues; they
        # are gated host-side lazily (next promotion / finalize)
        self._pending_closures: list[tuple] = []

    # -- alignment helpers ---------------------------------------------------

    @staticmethod
    def _finest_stats(res) -> tuple[float, float, int]:
        """(cost, num_valid, level) at the finest pyramid level that actually
        ran (diagnostics are stacked per level, index 0 = full resolution;
        skipped levels report zeros). The level matters: num_valid counts
        pixels AT THAT LEVEL (N/4^level of the full frame), so any fraction
        computed against the full-resolution pixel count must rescale."""
        iters = np.asarray(res.iterations)
        ran = np.nonzero(iters > 0)[0]
        lvl = int(ran[0]) if len(ran) else 0
        return (
            float(np.asarray(res.cost)[lvl]),
            float(np.asarray(res.num_valid)[lvl]),
            lvl,
        )

    def _align(self, src_i, src_d, tgt_i, tgt_d, init_state=None):
        self.odometry.set_source_frame(src_i, src_d)
        self.odometry.set_target_frame(tgt_i, tgt_d)
        self.odometry.set_initial_state_vector(
            np.zeros(6, np.float32) if init_state is None else init_state
        )
        import jax

        # ONE batched device->host gather for all diagnostic fields: the
        # per-field np.asarray calls downstream would each pay a full
        # round trip on a remote-attached chip
        return jax.device_get(self.odometry.optimize())

    # -- main loop -----------------------------------------------------------

    def run(self, frames: Iterable[RGBDFrame]) -> Iterator[TrackedFrame]:
        it = iter(frames)
        try:
            first = next(it)
        except StopIteration:
            return
        self._promote(first, 0, np.eye(4))
        npix = first.intensity.size
        last_rel_state = np.zeros(6, np.float32)

        frame_index = 0
        for fr in it:
            frame_index += 1
            kf = self.keyframes[-1]
            res = self._align(
                kf.dev_intensity, kf.dev_depth, fr.intensity, fr.depth,
                last_rel_state,
            )
            state = np.asarray(res.state)
            _, nvalid, lvl = self._finest_stats(res)
            Rt = se3.pose_matrix_np(state)
            rel = np.linalg.inv(Rt)  # kf -> frame camera motion in world terms
            pose = kf.pose @ rel
            tf = TrackedFrame(
                frame_index=frame_index,
                timestamp=fr.timestamp,
                keyframe_index=kf.index,
                rel_to_keyframe=rel,
                pose=pose,
                align_iterations=np.asarray(res.iterations),
                num_valid=nvalid,
            )
            self.tracked.append(tf)
            yield tf

            trans = float(np.linalg.norm(state[:3]))
            rot = float(np.linalg.norm(state[3:]))
            # num_valid counts pixels at the finest level that RAN — with
            # level-skipping presets (e.g. the 5-level schedule's
            # [0,0,5,20,50]) that is N/4^level pixels, so the overlap
            # fraction must be taken against the same level's pixel count
            # (against the full frame it would read ~6% and promote a
            # keyframe EVERY frame)
            overlap = nvalid / (float(npix) / 4.0**lvl)
            if (
                trans > self.kf_translation
                or rot > self.kf_rotation
                or overlap < self.kf_min_valid_fraction
            ):
                new_kf = self._promote(fr, frame_index, pose)
                self.odometry_edges.append((kf.index, new_kf.index, rel.copy()))
                self._try_loop_closure(new_kf, defer=True)
                self._maybe_incremental_solve(new_kf.index)
                last_rel_state = np.zeros(6, np.float32)
            else:
                last_rel_state = state.astype(np.float32)
        self.flush_loop_closures()

    def run_chunked(
        self, frames: Iterable[RGBDFrame], chunk: int = 16,
        depth_scale: float | None = None,
        levelmajor: str = "auto",
    ) -> Iterator[TrackedFrame]:
        """run() with chunked device tracking: B frames are tracked against
        the current keyframe in ONE dispatch (models/analytic.py
        track_sequence_chunk — one host->device transfer per chunk instead of
        per frame), then the promotion walk happens on the host. When a
        frame mid-chunk triggers a promotion, the chunk tail is re-tracked
        against the new keyframe (its results against the old keyframe are
        discarded) — with promotions every ~P frames the expected dispatch
        count is (1 + B/P) per B frames. Trajectories are identical to
        run(): same warm-start carry, same triggers, same edges.

        Supported backends: analytic (serial scan or level-major) and
        ceres/trust-region (level-major only — the most accurate per-pair
        aligner driving the keyframe pipeline at chunked speed, VERDICT
        r4 item 6; config/intrinsics are read off the odometry object;
        tracking dispatches bypass its one-pair object API). A ceres
        backend whose config is not level-major eligible raises.

        depth_scale: when set, incoming frames carry STORAGE-dtype depth
        (uint16 counts, e.g. raw-replay memmap views) and conversion to
        metric float happens ON DEVICE inside the tracking dispatch — the
        host uploads 2-byte counts instead of 4-byte floats and does no
        per-pixel work. Promoted keyframes are converted once at promotion.

        levelmajor: 'auto' routes chunks through the LEVEL-major
        shared-source batch kernel — every frame initialized at the last
        SOLVED state (anchored; constant-velocity extrapolation refuted,
        see the routing note in the body) — whenever
        track_levelmajor_eligible passes (the fast path — see track_lm
        below), 'off' forces the serial warm-start scan
        (track_sequence_chunk), 'interpret' forces the level-major path in
        Pallas interpret mode (CPU tests only).
        """
        import jax

        from phovo_tpu.models.analytic import (
            prep_keyframe,
            track_chunk_levelmajor,
            track_levelmajor_eligible,
            track_sequence_chunk,
        )

        cfg = self.odometry.config
        use_fused = getattr(self.odometry, "use_fused", True)
        intr = self.odometry.intrinsics
        if intr is None:
            raise RuntimeError("set_intrinsic_matrix before run_chunked")

        def metric(fr: RGBDFrame) -> RGBDFrame:
            """Storage-dtype -> metric-depth copy (promotions and full-band
            re-tracks are rare; the bulk chunk stream stays storage dtype)."""
            d = np.asarray(fr.depth)
            if depth_scale is not None and d.dtype == np.uint16:
                return dataclasses.replace(
                    fr, depth=d.astype(np.float32) * np.float32(depth_scale)
                )
            return fr

        it = iter(frames)
        try:
            first = next(it)
        except StopIteration:
            return
        self._promote(metric(first), 0, np.eye(4))
        npix = first.intensity.size
        last_rel_state = np.zeros(6, np.float32)
        frame_index = 0
        buf: list[RGBDFrame] = []

        # LEVEL-major tracking (VERDICT r4 item 1): all frames of a chunk
        # track against the SAME keyframe, so the serial warm-start chain
        # of track_sequence_chunk is an initialization aid, not a semantic
        # requirement. When every active level has a shared-source batch
        # tiling, the chunk runs through the sublane-batched kernel with
        # EXPLICIT per-pair inits: every frame initializes at the LAST
        # SOLVED state (the serial path's chunk_init — anchored to a
        # photometric optimum). A constant-velocity extrapolation chain
        # (rel_last · vel^k) was tried first and REFUTED by measurement:
        # under the shipped early-exit presets (min_gradient_norm 300) the
        # solver runs ~1 iteration per level, so results stay within a
        # dead-zone radius of their init, and the extrapolation chain
        # correlates that bias frame-over-frame into 7x keyframe drift
        # (0.27 m vs 0.05 m anchored vs 0.04 m serial over 400 map-scale
        # frames; BASELINE.md r5 "Keyframe level-major tracking"). The
        # keyframe's source packs are prepped ONCE at promotion
        # (prep_keyframe) and shared by every chunk until the next one.
        from phovo_tpu.models.autodiff import (
            PhotoconsistencyOdometryAutodiff,
            tr_track_levelmajor_eligible,
            track_chunk_levelmajor_tr,
        )

        is_tr = isinstance(self.odometry, PhotoconsistencyOdometryAutodiff)
        lm_interp = levelmajor == "interpret"
        if is_tr:
            lm_track = levelmajor != "off" and (
                lm_interp
                or tr_track_levelmajor_eligible(
                    cfg, first.intensity.shape, self.odometry.jacobian_mode
                )
            )
            if not lm_track:
                raise RuntimeError(
                    "run_chunked with the ceres backend needs the "
                    "level-major path (TPU + linearizer mode + batch "
                    "tilings at every active level); use run() instead"
                )
            track_fn = track_chunk_levelmajor_tr
        else:
            lm_track = levelmajor != "off" and (
                lm_interp
                or track_levelmajor_eligible(
                    cfg, first.intensity.shape, use_fused
                )
            )
            track_fn = track_chunk_levelmajor
        # the TR path always samples warped-target gradients, so its
        # keyframe prep must be the 4-row pack even under esm configs
        prep_cfg = cfg
        if is_tr and cfg.gradient_at == "esm":
            prep_cfg = dataclasses.replace(cfg, gradient_at="warped")
        kf_prep = None
        kf_prep_index = -1

        # Device-resident frame buffer, aligned with `buf`: a python list of
        # per-frame (H, W) device arrays in storage dtype. Every frame is
        # uploaded exactly ONCE (device_put, no XLA program): when a
        # mid-chunk promotion forces the chunk tail to re-track against the
        # new keyframe, the re-dispatch reuses the device copies instead of
        # re-uploading — without this, promotions every ~P frames re-upload
        # each frame ~chunk/P times, which dominated map-scale tracking
        # wall on a tunnel-attached chip (6x upload inflation at chunk 32
        # with promotions every 5 frames). Buffer management stays in host
        # python lists so every device op keeps a STATIC shape: the tracked
        # chunk is one jnp.stack of exactly `chunk` (H, W) arrays, padded by
        # repeating the last list element (a first cut concatenated/sliced
        # (M, H, W) device arrays with varying M — each novel M cost a
        # ~0.4 s XLA compile, 27 s of the 160-frame profile).
        dev_I: list = []
        dev_D: list = []

        def refill():
            while len(buf) < chunk:
                fr = next(it, None)
                if fr is None:
                    break
                buf.append(fr)
                dev_I.append(jnp.asarray(np.asarray(fr.intensity)))
                if lm_track:
                    # tracked frames are TARGETS only: the level-major
                    # tracker needs no depth at all (prep_frame_targets),
                    # so the per-frame depth transfer disappears
                    continue
                if depth_scale is not None:
                    # storage dtype straight to the transfer buffer; the
                    # jitted tracker converts counts -> meters on device
                    dev_D.append(jnp.asarray(np.asarray(fr.depth)))
                else:
                    dev_D.append(
                        jnp.asarray(np.asarray(fr.depth, np.float32))
                    )

        def track(kf, init):
            # pad to the compiled chunk shape by repeating the last frame
            # (host-side list op; results discarded below)
            pad = chunk - len(buf)
            I = jnp.stack(dev_I + [dev_I[-1]] * pad)
            D = jnp.stack(dev_D + [dev_D[-1]] * pad)
            res = track_sequence_chunk(
                kf.dev_intensity, kf.dev_depth, I, D,
                intr, jnp.asarray(init), cfg, use_fused,
                depth_scale=(
                    None if depth_scale is None else float(depth_scale)
                ),
            )
            return jax.device_get(res)

        def track_lm(kf, init):
            # level-major chunk tracking; every frame inits at the last
            # solved state (see the routing note above for why not a
            # velocity extrapolation)
            nonlocal kf_prep, kf_prep_index
            if kf.index != kf_prep_index:
                # both batch kernels consume column-split packs at
                # eligible fine levels (r5)
                kf_prep = prep_keyframe(
                    kf.dev_intensity, kf.dev_depth, intr, prep_cfg,
                    colsplit=True,
                )
                kf_prep_index = kf.index
            pad = chunk - len(buf)
            I = jnp.stack(dev_I + [dev_I[-1]] * pad)
            preds = np.broadcast_to(
                np.asarray(init, np.float32), (chunk, 6)
            ).copy()
            res = track_fn(
                kf_prep, I, intr, jnp.asarray(preds), cfg,
                interpret=lm_interp,
            )
            return jax.device_get(res), preds

        while True:
            refill()
            if not buf:
                break
            kf = self.keyframes[-1]
            chunk_init = last_rel_state
            if lm_track:
                res, preds = track_lm(kf, chunk_init)
            else:
                res = track(kf, chunk_init)
            consumed = 0
            for k in range(len(buf)):
                fr = buf[k]
                frame_index += 1
                consumed += 1
                state = np.asarray(res.state[k])
                iters_k = np.asarray(res.iterations[k])
                ran = np.nonzero(iters_k > 0)[0]
                lvl = int(ran[0]) if len(ran) else 0
                nvalid = float(np.asarray(res.num_valid[k])[lvl])
                if self.band_fallback > 0 and band_masked_fraction(
                    res.band_masked[k], res.num_valid[k]
                ) > self.band_fallback:
                    # the banded kernels under-observed this frame (fast
                    # in-plane rotation): re-track it on the backend's
                    # exact full-band path with the same init it had in
                    # the chunk dispatch
                    if lm_track:
                        # the frame's anchored init (the level-major path
                        # has no warm chain)
                        init_k = preds[k]
                    else:
                        init_k = (
                            np.asarray(res.state[k - 1], np.float32)
                            if k > 0 else np.asarray(chunk_init, np.float32)
                        )
                    fr_m = metric(fr)
                    rb = jax.device_get(
                        self.odometry.align_full_band(
                            kf.dev_intensity, kf.dev_depth,
                            jnp.asarray(np.asarray(fr_m.intensity)),
                            jnp.asarray(np.asarray(fr_m.depth, np.float32)),
                            intr, jnp.asarray(init_k),
                        )
                    )
                    self.band_fallbacks += 1
                    state = np.asarray(rb.state)
                    iters_k = np.asarray(rb.iterations)
                    ran = np.nonzero(iters_k > 0)[0]
                    lvl = int(ran[0]) if len(ran) else 0
                    nvalid = float(np.asarray(rb.num_valid)[lvl])
                Rt = se3.pose_matrix_np(state)
                rel = np.linalg.inv(Rt)
                pose = kf.pose @ rel
                tf = TrackedFrame(
                    frame_index=frame_index,
                    timestamp=fr.timestamp,
                    keyframe_index=kf.index,
                    rel_to_keyframe=rel,
                    pose=pose,
                    align_iterations=iters_k,
                    num_valid=nvalid,
                )
                self.tracked.append(tf)
                yield tf

                trans = float(np.linalg.norm(state[:3]))
                rot = float(np.linalg.norm(state[3:]))
                overlap = nvalid / (float(npix) / 4.0**lvl)
                if (
                    trans > self.kf_translation
                    or rot > self.kf_rotation
                    or overlap < self.kf_min_valid_fraction
                ):
                    new_kf = self._promote(metric(fr), frame_index, pose)
                    self.odometry_edges.append(
                        (kf.index, new_kf.index, rel.copy())
                    )
                    self._try_loop_closure(new_kf, defer=True)
                    self._maybe_incremental_solve(new_kf.index)
                    last_rel_state = np.zeros(6, np.float32)
                    break  # re-track the chunk tail against the new keyframe
                last_rel_state = state.astype(np.float32)
            buf = buf[consumed:]
            del dev_I[:consumed]
            del dev_D[:consumed]
        self.flush_loop_closures()

    def _maybe_incremental_solve(self, new_index: int) -> None:
        """Every pg_incremental promotions: solve the current pose graph
        and rebase the keyframe poses (VERDICT r3 item 4). The bucketed
        shapes mean at most one compile per size bucket; per-promotion
        latency is the (ms-scale) solve plus the closure-batch flush."""
        if (
            self.pg_incremental <= 0
            or new_index < 2
            or new_index % self.pg_incremental != 0
        ):
            return
        import time as _time

        _t0 = _time.perf_counter()
        graph = self.build_pose_graph()
        _t1 = _time.perf_counter()
        states, _ = optimize_pose_graph(
            graph, iterations=10, solver=self.pg_solver, bucket=True
        )
        states = np.asarray(states, dtype=np.float64)  # blocks on device
        _t2 = _time.perf_counter()
        for k, kf in enumerate(self.keyframes):
            kf.pose = se3.pose_matrix_np(states[k])
        _t3 = _time.perf_counter()
        self.incremental_solves += 1
        self.incremental_latencies.append(_t3 - _t0)
        # (build+flush, solve+fetch, rebase) wall breakdown per re-solve
        self.incremental_breakdown.append(
            (_t1 - _t0, _t2 - _t1, _t3 - _t2)
        )

    def _promote(self, fr: RGBDFrame, frame_index: int, pose: np.ndarray) -> Keyframe:
        kf = Keyframe(
            index=len(self.keyframes),
            frame_index=frame_index,
            timestamp=fr.timestamp,
            intensity=np.asarray(fr.intensity),
            depth=np.asarray(fr.depth),
            pose=np.asarray(pose),
        )
        self.keyframes.append(kf)
        return kf

    def _closure_candidates(self, new_kf: Keyframe):
        """Candidate old keyframes within loop_radius, each with the
        PREDICTED relative pose as alignment init (the current graph
        estimates, not zero: candidates can be far apart in viewpoint, and a
        zero-init direct alignment often converges to a wrong local optimum
        that still looks photometrically plausible — a wrong edge at
        loop_weight then drags the whole graph)."""
        pos = new_kf.pose[:3, 3]
        cands = []
        for old in self.keyframes[: max(0, new_kf.index - self.loop_min_gap)]:
            if np.linalg.norm(old.pose[:3, 3] - pos) > self.loop_radius:
                continue
            rel_pred = np.linalg.inv(old.pose) @ new_kf.pose
            cands.append((old, rel_pred))
        return cands

    def _gate_closure(self, new_kf_index, old_index, rel_pred,
                      state, cost, nvalid, lvl, npix_full,
                      half_sum_sq: bool) -> None:
        """Apply the photometric-support and geometric-consistency gates to
        one candidate alignment result; append the edge if it passes."""
        npix = npix_full / 4.0**lvl  # pixels at the finest level that ran
        # normalize the backend's cost convention: the trust-region (ceres)
        # backend reports 0.5 * sum r^2 (TRLevelResult), the GN backends
        # sum r^2 — without this the gate is sqrt(2) looser for ceres
        if half_sum_sq:
            cost = 2.0 * cost
        mean_res = np.sqrt(cost / max(nvalid, 1.0))
        if (
            nvalid / npix < self.loop_min_valid_fraction
            or mean_res > self.loop_max_mean_residual
        ):
            return
        rel = np.linalg.inv(se3.pose_matrix_np(state))
        # Geometric-consistency gate: a measured relative pose that deviates
        # from the prediction by more than the plausible accumulated drift
        # is a wrong-basin alignment, not a closure.
        dev = np.linalg.inv(rel_pred) @ rel
        trans_dev = float(np.linalg.norm(dev[:3, 3]))
        rot_dev = float(
            np.arccos(np.clip((np.trace(dev[:3, :3]) - 1.0) / 2.0, -1, 1))
        )
        if (
            trans_dev > self.loop_max_translation_dev
            or rot_dev > self.loop_max_rotation_dev
        ):
            return
        self.loop_closures.append(
            LoopClosure(old_index, new_kf_index, rel, mean_res)
        )

    def _analytic_batch_context(self):
        """(config, use_fused, intr) when the backend supports the batched
        closure dispatch (analytic semantics), else None."""
        from phovo_tpu.models.analytic import PhotoconsistencyOdometryAnalytic

        if not isinstance(self.odometry, PhotoconsistencyOdometryAnalytic):
            return None
        intr = self.odometry.intrinsics
        if intr is None:
            return None
        return (
            self.odometry.config,
            getattr(self.odometry, "use_fused", True),
            intr,
        )

    def _try_loop_closure(self, new_kf: Keyframe, defer: bool = False) -> None:
        """Search for loop closures against `new_kf`.

        All candidate alignments go to the device as ONE batched dispatch
        (VERDICT r1 weak #4: the old per-candidate host loop serialized a
        full synchronous dispatch per candidate inside tracking). With
        defer=True the result is NOT fetched: JAX dispatch is asynchronous,
        so the closure alignments overlap the subsequent tracking dispatches
        and are gated lazily at the next promotion / build_pose_graph /
        flush_loop_closures. defer=False (direct calls, non-analytic
        backends) resolves immediately.
        """
        cands = self._closure_candidates(new_kf)
        if not cands:
            return
        ctx = self._analytic_batch_context() if defer else None
        if ctx is None:
            # serial fallback through the object API (any backend)
            half = getattr(self.odometry, "COST_IS_HALF_SUM_SQ", False)
            for old, rel_pred in cands:
                init = se3.matrix_to_state_np(
                    np.linalg.inv(rel_pred)
                ).astype(np.float32)
                res = self._align(
                    old.dev_intensity, old.dev_depth,
                    new_kf.dev_intensity, new_kf.dev_depth, init,
                )
                cost, nvalid, lvl = self._finest_stats(res)
                self._gate_closure(
                    new_kf.index, old.index, rel_pred,
                    np.asarray(res.state), cost, nvalid, lvl,
                    new_kf.intensity.size, half,
                )
            return

        cfg, use_fused, intr = ctx
        from phovo_tpu.parallel.batch import align_batch

        # one batched matrix->state conversion for all candidate inits
        inits = se3.matrix_to_state_np(
            np.stack([np.linalg.inv(rp) for _, rp in cands])
        ).astype(np.float32).reshape(len(cands), 6)
        B = len(cands)
        # pad to power-of-two buckets so the vmapped program compiles once
        # per bucket, not once per candidate count
        Bpad = 1 << (B - 1).bit_length()
        src_I = np.stack([np.asarray(o.intensity) for o, _ in cands])
        src_D = np.stack(
            [np.asarray(o.depth, np.float32) for o, _ in cands]
        )
        if Bpad > B:
            reps = Bpad - B
            src_I = np.concatenate([src_I, np.repeat(src_I[-1:], reps, 0)])
            src_D = np.concatenate([src_D, np.repeat(src_D[-1:], reps, 0)])
            inits = np.concatenate([inits, np.repeat(inits[-1:], reps, 0)])
        tgt_I = jnp.broadcast_to(
            new_kf.dev_intensity, (Bpad,) + new_kf.dev_intensity.shape
        )
        tgt_D = jnp.broadcast_to(
            new_kf.dev_depth, (Bpad,) + new_kf.dev_depth.shape
        )
        res = align_batch(
            jnp.asarray(src_I), jnp.asarray(src_D), tgt_I, tgt_D,
            intr, jnp.asarray(inits), cfg, use_fused,
        )
        self._pending_closures.append(
            (
                new_kf.index,
                [(o.index, rp) for o, rp in cands],
                res,
                B,
                new_kf.intensity.size,
            )
        )
        if not defer:
            self.flush_loop_closures()

    def flush_loop_closures(self) -> None:
        """Gate every in-flight batched closure alignment (blocking only on
        results whose device compute has long overlapped tracking)."""
        import jax

        pending, self._pending_closures = self._pending_closures, []
        if not pending:
            return
        # SIX transfers for every in-flight closure batch: per-batch (and
        # even per-leaf) device_get pays a host<->device round trip each —
        # ~250 deferred batches x 6 result fields at map scale accounted
        # for most of the finalize pose_graph wall on a slow tunnel
        # (measured 0.2-10 s depending on tunnel weather). Concatenating
        # per FIELD on device first makes the fetch 6 arrays total.
        sizes = [int(p[2].state.shape[0]) for p in pending]
        cat = AlignmentResult(
            *(
                jnp.concatenate([getattr(p[2], f) for p in pending])
                for f in AlignmentResult._fields
            )
        )
        host = jax.device_get(cat)
        offs = np.cumsum([0] + sizes)
        fetched = [
            AlignmentResult(
                *(getattr(host, f)[offs[k]:offs[k + 1]]
                  for f in AlignmentResult._fields)
            )
            for k in range(len(pending))
        ]
        for (new_index, cand_meta, _, B, npix_full), res in zip(
            pending, fetched
        ):
            for k, (old_index, rel_pred) in enumerate(cand_meta[:B]):
                state_k = np.asarray(res.state[k])
                cost_k = np.asarray(res.cost[k])
                nvalid_k = np.asarray(res.num_valid[k])
                iters_k = np.asarray(res.iterations[k])
                if self.band_fallback > 0 and band_masked_fraction(
                    res.band_masked[k], nvalid_k
                ) > self.band_fallback:
                    # a band-masked closure alignment would mis-gate
                    # (nvalid and cost both depressed): re-align this one
                    # candidate on the exact full-band path
                    rb = self._full_band_closure(old_index, new_index, rel_pred)
                    if rb is not None:
                        self.band_fallbacks += 1
                        state_k = np.asarray(rb.state)
                        cost_k = np.asarray(rb.cost)
                        nvalid_k = np.asarray(rb.num_valid)
                        iters_k = np.asarray(rb.iterations)
                ran = np.nonzero(iters_k > 0)[0]
                lvl = int(ran[0]) if len(ran) else 0
                self._gate_closure(
                    new_index, old_index, rel_pred,
                    state_k,
                    float(cost_k[lvl]),
                    float(nvalid_k[lvl]),
                    lvl, npix_full, half_sum_sq=False,
                )

    def _full_band_closure(self, old_index: int, new_index: int, rel_pred):
        """Full-band (use_fused=False) re-run of one closure candidate
        alignment; None when the backend context is unavailable."""
        ctx = self._analytic_batch_context()
        if ctx is None:
            return None
        cfg, _, intr = ctx
        import jax

        from phovo_tpu.models.analytic import align_analytic

        old = self.keyframes[old_index]
        new = self.keyframes[new_index]
        init = se3.matrix_to_state_np(np.linalg.inv(rel_pred)).astype(
            np.float32
        )
        return jax.device_get(
            align_analytic(
                old.dev_intensity, old.dev_depth,
                new.dev_intensity, new.dev_depth,
                intr, jnp.asarray(init), cfg, use_fused=False,
            )
        )

    # -- backend -------------------------------------------------------------

    def build_pose_graph(self) -> PoseGraph:
        self.flush_loop_closures()  # gate any in-flight closure batches
        # batched host-side matrix->state (a per-keyframe/per-edge loop
        # or a device dispatch here costs M+K host<->device round-trips).
        # The graph stays NUMPY end to end: optimize_pose_graph pads
        # host-side and its jitted solve ingests each array in one
        # transfer — eager per-array device concats each paid a round
        # trip on a congested remote link (r5 incremental measurement)
        states = se3.matrix_to_state_np(
            np.stack([k.pose for k in self.keyframes])
        ).astype(np.float32)
        ei = [i for i, _, _ in self.odometry_edges] + [
            lc.from_kf for lc in self.loop_closures
        ]
        ej = [j for _, j, _ in self.odometry_edges] + [
            lc.to_kf for lc in self.loop_closures
        ]
        rels = [rel for _, _, rel in self.odometry_edges] + [
            lc.relative for lc in self.loop_closures
        ]
        ws = [1.0] * len(self.odometry_edges) + [self.loop_weight] * len(
            self.loop_closures
        )
        if not ei:  # single-keyframe trajectory: a self-consistent null graph
            ei, ej, ws = [0], [0], [0.0]
            zs = np.zeros((1, 6), np.float32)
        else:
            zs = se3.matrix_to_state_np(np.stack(rels)).astype(np.float32)
        return PoseGraph(
            states=states,
            edges_i=np.asarray(ei, np.int32),
            edges_j=np.asarray(ej, np.int32),
            measurements=np.asarray(zs, np.float32),
            weights=np.asarray(ws, np.float32),
        )

    def finalize(
        self,
        mesh=None,
        iterations: int = 10,
        ba_iterations: int = 0,
        ba_window: int = 8,
        ba_grid: int = 8,
        ba_damping: float = 1e-4,
        ba_robust_delta: float | None = 0.1,
        ba_scope: str = "window",
        ba_covis: int = 6,
        ba_occ_gate: float | None = 0.3,
        ba_z_robust_delta: float | None = 0.02,
    ) -> list[TrackedFrame]:
        """Pose-graph optimize keyframes, optionally refine with windowed
        photometric bundle adjustment, and recompose all frame poses.

        With ba_iterations > 0, the pose-graph solution is refined by
        photometric bundle adjustment (parallel/photometric_ba.py — poses
        AND sparse landmarks against the keyframes' stored intensity/depth
        images), polishing with actual image evidence instead of only
        pairwise relative-pose measurements. ba_scope:

          'window' — sliding keyframe windows of size `ba_window` (first
            pose of each window anchored on its already-refined estimate);
            dense-Schur scale, the default.
          'global' — ONE joint problem over ALL keyframes with
            covisibility-limited observations (`ba_covis` nearest
            keyframes per landmark, build_photometric_global); at map
            scale the auto Schur router flips to the sparse segment-sum
            path (dense W would not fit), gauge anchored on keyframe 0.

        Robustness defaults (r4 room/plane ablations, tools/ba_ablation.py
        + the map-scale runs): ba_occ_gate=0.3 DROPS observations whose
        predicted-vs-measured depth disagree by > 0.3 m — an occluded
        landmark sees a different surface, and keeping such rows made
        quadratic BA actively harmful on the room scene (forward ATE
        0.023 pose-graph-only -> 0.042 after 6 BA iterations; with the
        gate -> 0.013). ba_robust_delta=0.1 applies Huber IRLS to the
        PHOTOMETRIC row only (intensity units; specular/exposure
        outliers) — a joint-norm Huber would crush the (fx/z)-weighted
        depth inliers into the L1 regime and reopen the photometric
        degeneracy on occlusion-free scenes (plane map-scale ATE 0.0134
        quadratic vs 0.0249 joint-norm). 0/None disables either.

        Returns the tracked frames with `pose` updated in place.
        """
        if ba_scope not in ("window", "global"):
            raise ValueError(f"ba_scope={ba_scope!r}")
        if not ba_robust_delta:
            ba_robust_delta = None
        if not ba_occ_gate:
            ba_occ_gate = float("inf")
        if not ba_z_robust_delta:
            ba_z_robust_delta = None
        import time as _time

        # wall itemization of the back-end finalize (VERDICT r3 weak #2:
        # the 20-48 s map-scale finalize had no breakdown) — read
        # self.finalize_timings after finalize() returns
        self.finalize_timings: dict[str, float] = {}
        _t0 = _time.perf_counter()
        if len(self.keyframes) >= 2:
            graph = self.build_pose_graph()
            self.finalize_timings["pg_build"] = _time.perf_counter() - _t0
            _t1 = _time.perf_counter()
            # bucket=True: graph sizes vary run to run; bucketed shapes
            # reuse one compiled program per size bucket (and hit the
            # persistent compilation cache across runs) instead of paying
            # a fresh ~10 s compile per novel (M, K)
            states, _ = optimize_pose_graph(
                graph, mesh=mesh, iterations=iterations,
                solver=self.pg_solver, bucket=True,
            )
            states = np.asarray(states, dtype=np.float64)
            self.finalize_timings["pg_solve"] = _time.perf_counter() - _t1
            for k, kf in enumerate(self.keyframes):
                kf.pose = se3.pose_matrix_np(states[k])
        self.finalize_timings["pose_graph"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        if ba_iterations > 0 and len(self.keyframes) >= 2:
            if ba_scope == "global":
                self._refine_photometric_global(
                    mesh, ba_iterations, ba_grid, ba_damping,
                    ba_robust_delta, ba_covis, ba_occ_gate,
                    ba_z_robust_delta,
                )
            else:
                self._refine_photometric(
                    mesh, ba_iterations, ba_window, ba_grid, ba_damping,
                    ba_robust_delta, ba_occ_gate, ba_z_robust_delta,
                )
        self.finalize_timings["photometric_ba"] = _time.perf_counter() - _t0
        kf_by_index = {k.index: k for k in self.keyframes}
        for tf in self.tracked:
            tf.pose = kf_by_index[tf.keyframe_index].pose @ tf.rel_to_keyframe
        return self.tracked

    def _refine_photometric(
        self, mesh, iterations: int, window: int, grid: int, damping: float,
        robust_delta: float | None = None, occ_gate: float = 0.3,
        robust_z_delta: float | None = 0.02,
    ) -> None:
        """Windowed photometric BA over all keyframes.

        Default path: refine_photometric_windows — EVERY sliding window in
        one scanned device program over the device-resident keyframe
        stacks (VERDICT r3 weak #2: the per-window dispatch loop cost
        tens of seconds of host wall at map scale against milliseconds of
        solve). Falls back to the sequential per-window path when a mesh
        is given (observation sharding) or a window's dense Schur W would
        not fit the budget."""
        from phovo_tpu.parallel.bundle_adjustment import dense_w_fits
        from phovo_tpu.parallel.photometric_ba import (
            refine_photometric_windows,
            select_landmark_pixels,
            window_starts,
        )

        intr = self.odometry.intrinsics
        if intr is None:
            raise RuntimeError(
                "photometric BA needs intrinsics on the odometry backend"
            )
        M = len(self.keyframes)
        window = max(2, min(window, M))
        if mesh is not None or not dense_w_fits(window, window * grid * grid):
            self._refine_photometric_sequential(
                mesh, iterations, window, grid, damping, robust_delta,
                occ_gate, robust_z_delta,
            )
            return

        import jax

        from phovo_tpu.models.base import device_unit_intensity

        kfs = self.keyframes
        starts = window_starts(M, window)
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
        states = se3.matrix_to_state_np(
            np.stack([k.pose for k in kfs])
        ).astype(np.float32)
        # bucket the program shape for persistent-cache reuse across runs:
        # keyframe count to a multiple of 16 (padding repeats the last
        # frame; no window reaches it), window count to a multiple of 8
        # (apply=False rows scatter nothing)
        Mpad = -(-M // 16) * 16
        if Mpad > M:
            reps = Mpad - M
            dev_I = jnp.concatenate([dev_I, jnp.repeat(dev_I[-1:], reps, 0)])
            dev_D = jnp.concatenate([dev_D, jnp.repeat(dev_D[-1:], reps, 0)])
            states = np.concatenate([states, np.zeros((reps, 6), np.float32)])
            sel = np.concatenate(
                [sel, np.full((reps,) + sel.shape[1:], -1, np.int32)]
            )
        Nw = len(starts)
        Nwpad = -(-Nw // 8) * 8
        starts_arr = np.asarray(
            starts + [starts[-1]] * (Nwpad - Nw), np.int32
        )
        apply = np.asarray([True] * Nw + [False] * (Nwpad - Nw))
        refined, points, refs, lm_valid = refine_photometric_windows(
            dev_I, dev_D, jnp.asarray(states), jnp.asarray(sel),
            jnp.asarray(starts_arr), jnp.asarray(apply), intr,
            jnp.float32(damping), window=window, grid=grid,
            iterations=iterations, robust_delta=robust_delta,
            occ_gate=float(occ_gate), robust_z_delta=robust_z_delta,
        )
        refined, points, refs, lm_valid = jax.device_get(
            (refined, points, refs, lm_valid)
        )
        refined = np.asarray(refined, np.float64)[:M]
        for k, kf in enumerate(kfs):
            kf.pose = se3.pose_matrix_np(refined[k])
        pts = np.asarray(points, np.float64).reshape(-1, 3)
        ref_i = np.asarray(refs).reshape(-1)
        keep = (
            np.asarray(lm_valid).reshape(-1)
            & (np.linalg.norm(pts, axis=1) > 1e-9)
        )
        self.map_points = pts[keep]
        self.map_intensity = ref_i[keep]

    def _refine_photometric_sequential(
        self, mesh, iterations: int, window: int, grid: int, damping: float,
        robust_delta: float | None = None, occ_gate: float = 0.3,
        robust_z_delta: float | None = 0.02,
    ) -> None:
        from phovo_tpu.parallel.photometric_ba import (
            build_photometric_window,
            optimize_photometric_bundle,
            window_starts,
        )

        intr = self.odometry.intrinsics
        M = len(self.keyframes)
        window = max(2, min(window, M))
        # every window is exactly `window` keyframes (the tail window slides
        # back to overlap more): identical shapes reuse ONE compiled BA
        # program across windows and runs
        starts = window_starts(M, window)
        map_pts, map_int = [], []
        for start in starts:
            stop = start + window
            kfs = self.keyframes[start:stop]
            I = np.stack([k.intensity for k in kfs])
            if I.dtype == np.uint8:  # aligner convention: intensity in 0..1
                I = I.astype(np.float32) / 255.0
            D = np.stack([k.depth for k in kfs])
            states = se3.matrix_to_state_np(
                np.stack([k.pose for k in kfs])
            ).astype(np.float32)
            problem = build_photometric_window(
                I, D, states, intr, grid=grid, occ_gate=occ_gate
            )
            refined, points, _ = optimize_photometric_bundle(
                problem, intr, mesh=mesh, iterations=iterations,
                damping=damping, fixed_first=True,
                robust_delta=robust_delta, schur="auto",
                robust_z_delta=robust_z_delta,
            )
            refined = np.asarray(refined, np.float64)
            for k, kf in enumerate(kfs):
                kf.pose = se3.pose_matrix_np(refined[k])
            pts = np.asarray(points, np.float64)
            ref_i = np.asarray(problem.ref_intensity)
            keep = np.linalg.norm(pts, axis=1) > 1e-9  # zero rows = padding
            map_pts.append(pts[keep])
            map_int.append(ref_i[keep])
        self.map_points = np.concatenate(map_pts) if map_pts else None
        self.map_intensity = np.concatenate(map_int) if map_int else None

    def _refine_photometric_global(
        self, mesh, iterations: int, grid: int, damping: float,
        robust_delta: float | None, covis: int,
        occ_gate: float = 0.3,
        robust_z_delta: float | None = 0.02,
    ) -> None:
        """ba_scope='global': one joint photometric BA over ALL keyframes
        (build_photometric_global) — the map-scale path that exercises the
        sparse segment-sum Schur through the production pipeline. The
        keyframes' device-resident image buffers are stacked on device
        (no re-upload of M full frames through the tunnel)."""
        import jax

        from phovo_tpu.models.base import device_unit_intensity
        from phovo_tpu.parallel.photometric_ba import (
            build_photometric_global,
            optimize_photometric_bundle,
        )

        intr = self.odometry.intrinsics
        if intr is None:
            raise RuntimeError(
                "photometric BA needs intrinsics on the odometry backend"
            )
        kfs = self.keyframes
        M = len(kfs)
        states = se3.matrix_to_state_np(
            np.stack([k.pose for k in kfs])
        ).astype(np.float32)
        dev_I = device_unit_intensity(
            jnp.stack([k.dev_intensity for k in kfs])
        ).astype(jnp.float32)
        dev_D = jnp.stack([k.dev_depth for k in kfs])
        host_I = np.stack([k.intensity for k in kfs])
        host_D = np.stack([k.depth for k in kfs]).astype(np.float32)
        # bucket the keyframe count to a multiple of 16 so the joint
        # problem's shapes (P = M*G landmarks, K = P*covis observations)
        # reuse one compiled program per bucket across runs. Padded
        # keyframes are INERT: zero depth yields no landmarks, and their
        # far-away pose (1e6 translation) keeps them out of every real
        # host's nearest-covisible set.
        covis = max(1, min(covis, M - 1))
        Mpad = -(-M // 16) * 16
        if Mpad > M:
            reps = Mpad - M
            far = np.zeros((reps, 6), np.float32)
            far[:, :3] = 1e6
            states = np.concatenate([states, far])
            host_I = np.concatenate(
                [host_I, np.zeros((reps,) + host_I.shape[1:], host_I.dtype)]
            )
            host_D = np.concatenate(
                [host_D, np.zeros((reps,) + host_D.shape[1:], np.float32)]
            )
            dev_I = jnp.concatenate([dev_I, jnp.repeat(dev_I[-1:], reps, 0)])
            dev_D = jnp.concatenate([dev_D, jnp.repeat(dev_D[-1:], reps, 0)])
        problem = build_photometric_global(
            host_I, host_D,
            states, intr, grid=grid, max_covis=covis, occ_gate=occ_gate,
            device_intensities=dev_I, device_depths=dev_D,
        )
        refined, points, _ = optimize_photometric_bundle(
            problem, intr, mesh=mesh, iterations=iterations,
            damping=damping, fixed_first=True,
            robust_delta=robust_delta, schur="auto",
            robust_z_delta=robust_z_delta,
        )
        refined = np.asarray(jax.device_get(refined), np.float64)
        for k, kf in enumerate(kfs):
            kf.pose = se3.pose_matrix_np(refined[k])
        pts = np.asarray(jax.device_get(points), np.float64)
        ref_i = np.asarray(jax.device_get(problem.ref_intensity))
        keep = np.linalg.norm(pts, axis=1) > 1e-9  # zero rows = padding
        self.map_points = pts[keep]
        self.map_intensity = ref_i[keep]
