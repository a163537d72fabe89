"""Keyframe-tracking throughput bench: level-major shared-source vs scan.

Reproduces the BASELINE.md r5 keyframe-tracking table on the attached
chip: the analytic and trust-region keyframe trackers through the
shared-source level-major batch kernels (models/analytic.py
track_chunk_levelmajor, models/autodiff.py track_chunk_levelmajor_tr)
against the frame-chain level-major path and the old serial warm-start
scan. VGA, 256-chunk, the headline 5-level schedule.

Usage:  python -m tools.track_bench [--chunk 256] [--repeats 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/phovo_jax_cache")
    from phovo_tpu.models.analytic import (
        align_sequence,
        prep_keyframe,
        track_chunk_levelmajor,
        track_levelmajor_eligible,
        track_sequence_chunk,
    )
    from phovo_tpu.models.autodiff import (
        track_chunk_levelmajor_tr,
        tr_track_levelmajor_eligible,
    )
    from phovo_tpu.ops.camera import TUM_FR1
    from phovo_tpu.utils.config import PhovoConfig
    from phovo_tpu.utils.synthetic import make_pair

    H, W = 480, 640
    B = args.chunk
    REP = args.repeats

    def gn_cfg(mg):
        return PhovoConfig(
            num_levels=5, blur_filter_sizes=(0,) * 5,
            gradient_scales=(0.0625,) * 5, max_iterations=(0, 0, 5, 20, 50),
            lambda_steps=(1.0,) * 5, min_gradient_norms=(mg,) * 5,
            sampling="nearest", mix_mode="bf16x2g",
        )

    tr_cfg = PhovoConfig(
        num_levels=5, blur_filter_sizes=(0,) * 5,
        gradient_scales=(0.0625,) * 5, max_iterations=(0, 0, 5, 10, 50),
        function_tolerances=(1e-4,) * 5, gradient_tolerances=(1e-3,) * 5,
        parameter_tolerances=(1e-6,) * 5,
        initial_trust_region_radii=(1e4,) * 5,
        max_trust_region_radii=(1e8,) * 5,
        min_trust_region_radii=(1e-32,) * 5,
        min_relative_decreases=(1e-3,) * 5,
        sampling="bilinear",
    )

    I0, D0, I1, D1, _ = make_pair(TUM_FR1, shape=(H, W))
    Is = jnp.asarray(np.stack([I0, I1] * (B // 2)))
    Ds = jnp.asarray(np.stack([D0, D1] * (B // 2)))
    Is2 = jnp.asarray(np.stack([I0, I1] * ((B + 2) // 2))[: B + 1])
    Ds2 = jnp.asarray(np.stack([D0, D1] * ((B + 2) // 2))[: B + 1])
    kfI, kfD = jnp.asarray(I0), jnp.asarray(D0)
    rows = []

    def timed(label, fn):
        fn()
        fn()
        t0 = time.perf_counter()
        for _ in range(REP):
            out = fn()
        jax.block_until_ready(out)
        rows.append(
            {"path": label,
             "pairs_per_s": round(REP * B / (time.perf_counter() - t0), 1)}
        )
        print(json.dumps(rows[-1]))

    for name, mg in (("fixed-75", 0.0), ("early-exit", 300.0)):
        cfg = gn_cfg(mg)
        assert track_levelmajor_eligible(cfg, (H, W), True)
        kf_prep = prep_keyframe(kfI, kfD, TUM_FR1, cfg, colsplit=True)
        inits = jnp.zeros((B, 6), jnp.float32)
        timed(
            f"analytic track levelmajor {name}",
            lambda: jax.block_until_ready(
                track_chunk_levelmajor(kf_prep, Is, TUM_FR1, inits, cfg).state
            ),
        )
        timed(
            f"analytic frame chain {name}",
            lambda: jax.block_until_ready(
                align_sequence(Is2, Ds2, TUM_FR1, cfg).state
            ),
        )
        timed(
            f"analytic track serial scan {name}",
            lambda: jax.block_until_ready(
                track_sequence_chunk(
                    kfI, kfD, Is, Ds, TUM_FR1, jnp.zeros(6), cfg, True
                ).state
            ),
        )
    if tr_track_levelmajor_eligible(tr_cfg, (H, W), "linearizer"):
        kf_prep_tr = prep_keyframe(kfI, kfD, TUM_FR1, tr_cfg, colsplit=True)
        inits = jnp.zeros((B, 6), jnp.float32)
        timed(
            "tr track levelmajor",
            lambda: jax.block_until_ready(
                track_chunk_levelmajor_tr(
                    kf_prep_tr, Is, TUM_FR1, inits, tr_cfg
                ).state
            ),
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
