"""Roofline / speed-of-light accounting for the fused alignment kernels.

The BASELINE target says the fused warp+residual+JtJ kernel should sit at
speed-of-light on the chip. This tool makes that claim checkable: it counts
the workload's bytes and flops per frame analytically (no device needed),
derives the HBM-bandwidth and compute lower bounds for one alignment, then
(optionally, with a TPU attached) measures the achieved per-frame device
time at the deployment shape and reports where the workload actually sits.

Key structural fact it surfaces: the reference's 5-level schedule
([0,0,5,20,50] iterations, coarse -> fine) is SERIAL in its 75 GN
iterations — each one consumes the state the previous produced — and the
images at the active levels (120x160 and down) are small enough that every
operand is VMEM-resident for the whole level. The workload is therefore
nowhere near HBM-bound: its floor is the serial per-iteration latency of
the in-kernel loop (VPU geometry/mask work + two MXU passes + a scalar
6x6 Cholesky), not bandwidth. See BASELINE.md "Speed-of-light analysis".
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

H, W = 480, 640
SCHEDULE = [0, 0, 5, 20, 50]  # reference 5-level iterations, fine -> coarse

# v5e per-chip paper numbers (public: jax-ml.github.io/scaling-book)
HBM_BPS = 8.1e11  # bytes/s
MXU_FLOPS_BF16 = 1.97e14  # flop/s
VPU_FLOPS_F32 = 4e12  # flop/s (8 lanes x 128 x ~2 GHz x 2)


def per_frame_model(chunked: bool = True):
    """Count bytes and flops for ONE frame alignment (5-level schedule)."""
    bytes_in = H * W * (1 + 2)  # u8 intensity + u16 depth counts (raw path)
    if not chunked:
        bytes_in = H * W * 4 * 4  # 4 f32 VGA planes host->device
    # pyramid builds: each level reads the previous, writes I, gx, gy (+D)
    pyr_bytes = 0
    for lvl in range(1, 5):
        h, w = H >> lvl, W >> lvl
        pyr_bytes += h * w * 4 * (2 + 4)  # read I,D; write I,D,gx,gy
    levels = []
    total_iter_flops = 0
    for lvl, iters in enumerate(SCHEDULE):
        if iters == 0:
            continue
        h, w = H >> lvl, W >> lvl
        n = h * w
        # per pixel per iteration: ~60 VPU flops (transform, project,
        # Jacobian chain, masks) + sampling/Gram MXU work. The sampling
        # column-mix dot is (4*BAND=128, w) x (w, NT) per tile and the Gram
        # (8, NT) x (NT, 8): ~ (128*w + 64) MACs per pixel-column.
        vpu = 60 * n
        mxu = 2 * (128 * w + 64) * n
        level_bytes = n * 4 * (3 + 4 + 1)  # t_all(3h,w) + geom(4,n) + i0
        levels.append(
            dict(level=lvl, h=h, w=w, iters=iters, vpu_flops_per_iter=vpu,
                 mxu_flops_per_iter=mxu, resident_bytes=level_bytes)
        )
        total_iter_flops += iters * (vpu + mxu)
    hbm_bytes = bytes_in + pyr_bytes + sum(l["resident_bytes"] for l in levels)
    return dict(
        hbm_bytes=hbm_bytes,
        serial_iterations=sum(SCHEDULE),
        total_flops=total_iter_flops,
        hbm_floor_us=hbm_bytes / HBM_BPS * 1e6,
        mxu_floor_us=sum(
            l["iters"] * l["mxu_flops_per_iter"] for l in levels
        ) / MXU_FLOPS_BF16 * 1e6,
        vpu_floor_us=sum(
            l["iters"] * l["vpu_flops_per_iter"] for l in levels
        ) / VPU_FLOPS_F32 * 1e6,
        levels=levels,
    )


def measure(chunk: int = 256, repeats: int = 10) -> float:
    """Achieved device-side per-frame seconds at the deployment shape."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/phovo_jax_cache")
    from phovo_tpu.models.analytic import align_sequence
    from phovo_tpu.ops.camera import TUM_FR1
    from phovo_tpu.utils.config import PhovoConfig
    from phovo_tpu.utils.synthetic import make_pair

    cfg = PhovoConfig(
        num_levels=5, blur_filter_sizes=(0,) * 5, gradient_scales=(0.0625,) * 5,
        # PhovoConfig.max_iterations is indexed by level with 0 = FINEST —
        # the same orientation as SCHEDULE (fine -> coarse), so no
        # reversal (r5 fix: reversed() ran 50 iterations at full VGA and
        # the "achieved" figure measured a schedule nobody ships)
        max_iterations=tuple(SCHEDULE), lambda_steps=(1.0,) * 5,
        min_gradient_norms=(0.0,) * 5, sampling="nearest", mix_mode="bf16x2g",
    )
    I0, D0, I1, D1, _ = make_pair(TUM_FR1, shape=(H, W))
    B = chunk + 1
    Is = jnp.asarray(np.stack([I0, I1] * ((B + 1) // 2))[:B])
    Ds = jnp.asarray(np.stack([D0, D1] * ((B + 1) // 2))[:B])
    for _ in range(2):
        jax.block_until_ready(align_sequence(Is, Ds, TUM_FR1, cfg).state)
    t0 = time.perf_counter()
    for _ in range(repeats):
        res = align_sequence(Is, Ds, TUM_FR1, cfg)
    jax.block_until_ready(res.state)
    return (time.perf_counter() - t0) / repeats / chunk


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="also time the deployment shape on the attached chip")
    args = ap.parse_args()
    m = per_frame_model()
    out = {
        "hbm_floor_us": round(m["hbm_floor_us"], 2),
        "mxu_floor_us": round(m["mxu_floor_us"], 2),
        "vpu_floor_us": round(m["vpu_floor_us"], 2),
        "serial_iterations": m["serial_iterations"],
        "hbm_bytes_per_frame": m["hbm_bytes"],
    }
    if args.measure:
        sec = measure()
        out["achieved_us"] = round(sec * 1e6, 1)
        out["fps"] = round(1.0 / sec, 1)
        floor = max(m["hbm_floor_us"], m["mxu_floor_us"], m["vpu_floor_us"])
        out["fraction_of_flat_roofline"] = round(floor / out["achieved_us"], 3)
        out["per_serial_iteration_us"] = round(
            out["achieved_us"] / m["serial_iterations"], 2
        )
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
