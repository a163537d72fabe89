"""Backend-independent alignment API.

Mirrors the reference's abstract optimizer interface — the central API of the
whole library (CPhotoconsistencyOdometry.h:137-179: SetIntrinsicMatrix,
SetSourceFrame, SetTargetFrame, SetInitialStateVector, Optimize,
GetOptimalStateVector, GetOptimalRigidTransformationMatrix) plus
ReadConfigurationFile / SetMinDepth / SetMaxDepth from the concrete backends.

TPU-first split: the object API below is a thin host-side wrapper holding
frames; the actual work is one jitted functional `align` per
(backend, config, image shape), cached, that runs pyramids + all pyramid
levels + all solver iterations as a single XLA program. Backend selection is
a runtime string, not a compile-time #define
(cf. PhotoconsistencyVisualOdometry.cpp:34-44).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from phovo_tpu.ops import se3
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.utils.config import PhovoConfig, load_config


class AlignmentResult(NamedTuple):
    """Output of one frame-pair alignment, with per-level diagnostics.

    The structured diagnostics replace the reference's conditional stdout
    prints (…Analytic.h:394-423) — returned from the jitted solver and
    loggable host-side without recompilation.
    """

    state: jax.Array  # (6,) [x, y, z, yaw, pitch, roll]
    iterations: jax.Array  # (L,) int32 per level (level 0 first)
    gradient_norm: jax.Array  # (L,) final ||J^T r|| (GN) / inf-norm (LM)
    cost: jax.Array  # (L,) final cost per level
    num_valid: jax.Array  # (L,) valid-pixel count per level
    # (L,) max pixels dropped per iteration by the fused kernel's banded
    # sampling window (0 where the exact XLA path ran / the band was wide
    # enough). A material fraction band_masked/num_valid at a level means
    # the motion exceeded the band and that level under-observed it — the
    # production paths gate on band_masked_fraction and re-run such pairs
    # with use_fused=False (PhotoconsistencyOdometryBase.optimize,
    # models/keyframe.py run_chunked, apps/phovo_vo.py _run_chunked).
    band_masked: jax.Array | float = 0.0

    def transform(self) -> jax.Array:
        return se3.pose_matrix(self.state)


# Default production gate: re-run a pair full-band when the banded window
# dropped more than this fraction of its otherwise-valid pixels at any
# pyramid level. The band only masks under fast in-plane rotation at fine
# levels (ops/fused.py banded row window); 2% is far above the band-edge
# rounding that normal motion produces (tests pin ~0 there) and far below
# the ~30%+ masking a 0.4 rad/frame yaw produces.
BAND_FALLBACK_DEFAULT = 0.02


def levelmajor_enabled() -> bool:
    """PHOVO_LEVELMAJOR kill-switch for the level-major sequence paths.

    Read at TRACE time inside jitted sequence entry points whose jit cache
    key is only (config, shapes, flags): a signature compiled while the
    switch had one value keeps that routing until its executable is
    dropped. To toggle mid-process (A/B measurements, debugging), set the
    env var AND call jax.clear_caches() — see tests/test_tpu_device.py
    _lm_vs_scan for the pattern. Setting it before first use (or before
    process start) needs no cache flush."""
    import os

    return os.environ.get("PHOVO_LEVELMAJOR", "1") != "0"


def band_masked_fraction(band_masked, num_valid) -> float:
    """Max over levels of dropped/(dropped+kept) pixels for ONE alignment.

    band_masked counts pixels the fused kernel's banded sampling window
    dropped (max over the level's iterations); num_valid counts the pixels
    kept at that level. Inputs are (L,) host or device arrays; returns a
    Python float (blocks on device values)."""
    bm = np.asarray(band_masked, np.float64).reshape(-1)
    nv = np.asarray(num_valid, np.float64).reshape(-1)
    return float(np.max(bm / np.maximum(bm + nv, 1.0)))


def band_masked_fractions(band_masked, num_valid) -> np.ndarray:
    """Batched band_masked_fraction: (B, L) diagnostics -> (B,) max-over-
    levels masked fraction per alignment."""
    bm = np.asarray(band_masked, np.float64)
    nv = np.asarray(num_valid, np.float64)
    return np.max(bm / np.maximum(bm + nv, 1.0), axis=-1)


def as_float_intensity(img) -> np.ndarray:
    """Normalize intensity input for the aligners: uint8 passes through
    UNCHANGED (every backend converts u8 -> f32 * 1/255 on device — the
    reference SetSourceFrame conversion, …Analytic.h:470-471 — so the
    host->device transfer stays at storage size, 4x smaller than f32);
    other integer dtypes convert host-side; floats become float32. Device
    arrays pass through untouched (no eager dispatch)."""
    if isinstance(img, jax.Array):
        return img
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        return arr
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.float32) * np.float32(1.0 / 255.0)
    return arr.astype(np.float32)


def device_unit_intensity(img: jax.Array) -> jax.Array:
    """The on-device half of as_float_intensity: uint8 -> float32 * (1/255)
    inside the jitted aligner (the reference SetSourceFrame conversion,
    …Analytic.h:470-471); float inputs pass through. Every backend routes
    its intensity inputs through here so the unit convention lives in one
    place."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) * (1.0 / 255.0)
    return img


def _as_float_depth(depth) -> np.ndarray:
    if isinstance(depth, jax.Array):
        return depth.astype(jnp.float32)
    return np.asarray(depth, dtype=np.float32)


def sequence_scan(align_one, intensities, depths, warm_start: bool):
    """lax.scan over consecutive frame pairs of a buffered segment — the
    TPU-idiomatic shape of the reference VO app's frame loop
    (PhotoconsistencyVisualOdometry.cpp:212-259): one device program per
    video segment instead of one dispatch per pair.

    align_one(si, sd, ti, td, init) -> AlignmentResult. Returns batched
    results with leading dim B-1 (pair k aligns frame k -> k+1).
    warm_start initializes each pair from the previous relative state
    (the reference always starts from zero, …cpp:224)."""
    pairs = (intensities[:-1], depths[:-1], intensities[1:], depths[1:])

    def step(carry, pair):
        si, sd, ti, td = pair
        init = carry if warm_start else jnp.zeros(6, jnp.float32)
        res = align_one(si, sd, ti, td, init)
        return res.state, res

    _, results = jax.lax.scan(step, jnp.zeros(6, jnp.float32), pairs)
    return results


def chunk_device_prep(
    carry_intensity, carry_depth, intensities, depths, depth_scale
):
    """Storage-dtype conversion + device-side carry prepend shared by the
    chunked (streaming) sequence entries: per chunk the host transfers only
    the new frames in storage dtype (uint8 intensity, uint16 depth counts),
    the carry frame (last frame of the previous chunk) stays device-resident.
    Returns (I (B+1,H,W) float32, D (B+1,H,W) float32 metric)."""
    if depth_scale is not None and depths.dtype != jnp.float32:
        depths = depths.astype(jnp.float32) * jnp.float32(depth_scale)
    intensities = device_unit_intensity(intensities).astype(jnp.float32)
    carry_f = device_unit_intensity(carry_intensity).astype(jnp.float32)
    I = jnp.concatenate([carry_f[None], intensities])
    D = jnp.concatenate([carry_depth.astype(jnp.float32)[None], depths])
    return I, D


class PhotoconsistencyOdometryBase:
    """Host-side stateful wrapper over the functional aligners."""

    # AlignmentResult.cost convention: GN backends report sum r^2; the
    # trust-region backend overrides this (0.5 * sum r^2, the Ceres
    # convention). Consumers comparing costs across backends (e.g. the
    # keyframe loop-closure gate) must normalize by it.
    COST_IS_HALF_SUM_SQ = False

    def __init__(self, config: PhovoConfig | None = None):
        self.config = config or PhovoConfig()
        self.intrinsics: Intrinsics | None = None
        self._source = None  # (intensity, depth) float32 device arrays
        self._target = None
        self._init_state = jnp.zeros(6, dtype=jnp.float32)
        self._result: AlignmentResult | None = None
        # banded-window observability fallback (ops/fused.py band_masked):
        # when the fused kernels drop more than this fraction of a level's
        # valid pixels, optimize() re-runs the pair on the exact full-band
        # path. 0 disables. band_fallbacks counts engagements.
        self.band_fallback: float = BAND_FALLBACK_DEFAULT
        self.band_fallbacks: int = 0

    # -- reference API surface ------------------------------------------------
    def read_configuration_file(self, path) -> None:
        self.config = load_config(path)

    def set_intrinsic_matrix(self, K) -> None:
        self.intrinsics = Intrinsics.from_matrix(jnp.asarray(K, dtype=jnp.float32))

    def set_min_depth(self, d: float) -> None:
        import dataclasses

        self.config = dataclasses.replace(self.config, min_depth=float(d))

    def set_max_depth(self, d: float) -> None:
        import dataclasses

        self.config = dataclasses.replace(self.config, max_depth=float(d))

    def set_source_frame(self, intensity, depth) -> None:
        self._source = (as_float_intensity(intensity), _as_float_depth(depth))

    def set_target_frame(self, intensity, depth) -> None:
        self._target = (as_float_intensity(intensity), _as_float_depth(depth))

    def set_initial_state_vector(self, state) -> None:
        self._init_state = jnp.asarray(state, dtype=jnp.float32)

    def optimize(self) -> AlignmentResult:
        if self.intrinsics is None:
            raise RuntimeError("set_intrinsic_matrix must be called before optimize")
        if self._source is None or self._target is None:
            raise RuntimeError("source and target frames must be set before optimize")
        args = (
            self._source[0], self._source[1],
            self._target[0], self._target[1],
            self.intrinsics, self._init_state,
        )
        result = self.align(*args)
        if self.band_fallback > 0:
            # one batched fetch (callers gather the result host-side right
            # after optimize() anyway); gate + full-band retry on the host
            result = AlignmentResult(*jax.device_get(tuple(result)))
            if (
                band_masked_fraction(result.band_masked, result.num_valid)
                > self.band_fallback
            ):
                retry = self.align_full_band(*args)
                if retry is not None:
                    self.band_fallbacks += 1
                    result = AlignmentResult(*jax.device_get(tuple(retry)))
        self._result = result
        return self._result

    def get_optimal_state_vector(self) -> jax.Array:
        self._require_result()
        return self._result.state

    def get_optimal_rigid_transformation_matrix(self) -> jax.Array:
        self._require_result()
        return se3.pose_matrix(self._result.state)

    def _require_result(self):
        if self._result is None:
            raise RuntimeError("optimize() has not been called")

    # -- functional core (implemented by backends) ----------------------------
    def align(
        self,
        source_intensity: jax.Array,
        source_depth: jax.Array,
        target_intensity: jax.Array,
        target_depth: jax.Array,
        intr: Intrinsics,
        init_state: jax.Array,
    ) -> AlignmentResult:
        raise NotImplementedError

    def align_full_band(
        self, si, sd, ti, td, intr, init_state
    ) -> AlignmentResult | None:
        """Exact full-band re-alignment for the band_fallback gate (the
        mechanism band_masked promises): backends whose fused kernels use
        the banded sampling window override this to re-run on the
        use_fused=False path. None = no fallback available (backend never
        band-masks)."""
        return None
