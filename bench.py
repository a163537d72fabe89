"""Headline benchmark: RGB-D frame-alignment throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
     "early_exit_pairs_per_s": N}

Workload: full multi-level analytic alignment (pyramids + Scharr + coarse-to
-fine Gauss-Newton) of a synthetic 640x480 RGB-D pair using the 5-level
schedule of the reference preset (iterations [0,0,5,20,50], i.e. 75 GN
iterations across levels when the gradient-norm criterion never fires — we
pin min_gradient_norm to 0 so every run does identical work).

vs_baseline compares against the reference's CPU implementation measured by
native/baseline_bench (a faithful C++ -O3 re-execution of the analytic
backend's math — the reference publishes no numbers, SURVEY §6); the
measured figure is cached in native/baseline_cpu.json.

Two methodologies, reported side by side (VERDICT r2 item 5):
  value / vs_baseline — FIXED-ITERATION throughput (min_gradient_norm 0,
    identical work every run; the apples-to-apples baseline comparison).
  early_exit_pairs_per_s — the same chunked scan with the shipped presets'
    gradient-norm termination (min_gradient_norm 300): what the chip
    actually serves under deployment semantics, where most pairs converge
    in far fewer than 75 iterations. This is the DEPLOYMENT number; it is
    not the baseline comparison because the CPU baseline runs fixed
    iterations.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
BASELINE_JSON = REPO / "native" / "baseline_cpu.json"
# measured on this container's CPU via native/baseline_bench (see
# native/README.md); used if the cached json is absent
FALLBACK_BASELINE_FPS = None

H, W = 480, 640
REPEATS = 20


def _bench_config(min_gradient_norm: float = 0.0):
    from phovo_tpu.utils.config import PhovoConfig

    return PhovoConfig(
        num_levels=5,
        blur_filter_sizes=(0, 0, 0, 0, 0),
        gradient_scales=(0.0625,) * 5,
        max_iterations=(0, 0, 5, 20, 50),
        lambda_steps=(1.0,) * 5,
        # 0 never fires (fixed work per align, the headline methodology);
        # 300 is the shipped presets' termination (deployment semantics)
        min_gradient_norms=(min_gradient_norm,) * 5,
        sampling="nearest",
        # the production default (hi/lo bfloat16 residual channels +
        # single-pass bf16 gradient channels: one 128-row MXU pass, ~3e-5
        # relative NE agreement with exact cost/residuals; ops/fused.py)
        mix_mode="bf16x2g",
    )


def reference_cpu_fps() -> float | None:
    if BASELINE_JSON.is_file():
        try:
            return float(json.loads(BASELINE_JSON.read_text())["frames_per_second"])
        except Exception:
            pass
    return FALLBACK_BASELINE_FPS


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/phovo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from phovo_tpu.models.analytic import align_sequence
    from phovo_tpu.ops.camera import TUM_FR1
    from phovo_tpu.utils.synthetic import make_pair

    cfg = _bench_config()
    cfg_ee = _bench_config(min_gradient_norm=300.0)
    I0, D0, I1, D1, _ = make_pair(TUM_FR1, shape=(H, W))
    # A buffered video segment of alternating frames: 256 consecutive pairs
    # aligned per device dispatch (the throughput deployment shape,
    # phovo-vo --chunk 256 — the CPU baseline's tight frame loop has no
    # dispatch overhead either, so sequence throughput is the
    # apples-to-apples metric; this chip is attached through a network
    # tunnel whose ~1.5 ms per-dispatch latency the chunk amortizes).
    # Chunk-size curve measured by tools/frame_fusion_probe (r3):
    # 32 -> 297 us/frame, 64 -> 278, 128 -> 266-269, 256 -> 262 —
    # asymptoting at the ~260 us serial-iteration device floor.
    B = 257
    Is = jnp.asarray(np.stack([I0, I1] * ((B + 1) // 2))[:B])
    Ds = jnp.asarray(np.stack([D0, D1] * ((B + 1) // 2))[:B])
    n_pairs = B - 1

    # warmup / compile
    res = align_sequence(Is, Ds, TUM_FR1, cfg)
    jax.block_until_ready(res.state)
    res = align_sequence(Is, Ds, TUM_FR1, cfg)
    jax.block_until_ready(res.state)

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        res = align_sequence(Is, Ds, TUM_FR1, cfg)
    jax.block_until_ready(res.state)
    dt = (time.perf_counter() - t0) / REPEATS / n_pairs

    # deployment semantics: same scan, preset gradient-norm termination
    res = align_sequence(Is, Ds, TUM_FR1, cfg_ee)
    jax.block_until_ready(res.state)
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        res = align_sequence(Is, Ds, TUM_FR1, cfg_ee)
    jax.block_until_ready(res.state)
    dt_ee = (time.perf_counter() - t0) / REPEATS / n_pairs

    fps = 1.0 / dt
    base = reference_cpu_fps()
    vs = (fps / base) if base else None
    print(
        json.dumps(
            {
                "metric": "frame_alignment_throughput",
                "value": round(fps, 3),
                "unit": "frames/s (640x480, 5-level, 75 GN iters)",
                "vs_baseline": round(vs, 3) if vs is not None else None,
                "early_exit_pairs_per_s": round(1.0 / dt_ee, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
