"""Whole-frame-fusion ablation probe (VERDICT r2 item 4).

BASELINE.md's roofline attributes the ~3.6 us/iteration serial floor to the
75-iteration schedule; the untried lever was "whole-frame fusion" — running
pyramid + Scharr + all three active level kernels as one dispatch chain
without host glue (they already ARE one XLA program; the question is the
cost of the 3 separate Pallas launches + the XLA glue between them).

This probe measures, on the chip:
  1. per-frame device time of the full chunked alignment scan (the
     headline shape) at several chunk sizes — the dispatch-amortization
     curve;
  2. the marginal cost of a Pallas kernel LAUNCH inside a scanned program:
     the same total GN iterations issued as 1 vs 3 back-to-back
     fused_gn_level calls on the same level data (iterations split
     50 = 50/0/0 vs 17/17/16). If 3 launches cost the same as 1, fusing
     the three per-frame level kernels into one kernel cannot win more
     than measurement noise — a numbers-backed refutation. If the gap is
     material, whole-frame fusion is worth building.

Usage: python -m tools.frame_fusion_probe [--repeats 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np

from phovo_tpu.apps._bootstrap import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from phovo_tpu.ops import fused as F
from phovo_tpu.ops import pyramid as pyr
from phovo_tpu.ops.camera import TUM_FR1
from phovo_tpu.utils.config import PhovoConfig
from phovo_tpu.utils.synthetic import make_pair


def bench_chunk_sizes(args):
    from phovo_tpu.models.analytic import align_sequence

    cfg = PhovoConfig(
        num_levels=5, blur_filter_sizes=(0,) * 5,
        gradient_scales=(0.0625,) * 5, max_iterations=(0, 0, 5, 20, 50),
        lambda_steps=(1.0,) * 5, min_gradient_norms=(0.0,) * 5,
        sampling="nearest", mix_mode="bf16x2g",
    )
    I0, D0, I1, D1, _ = make_pair(TUM_FR1, shape=(480, 640))
    for B in args.chunks:
        Is = jnp.asarray(np.stack([I0, I1] * ((B + 2) // 2))[: B + 1])
        Ds = jnp.asarray(np.stack([D0, D1] * ((B + 2) // 2))[: B + 1])
        res = align_sequence(Is, Ds, TUM_FR1, cfg)
        jax.block_until_ready(res.state)
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            res = align_sequence(Is, Ds, TUM_FR1, cfg)
        jax.block_until_ready(res.state)
        dt = (time.perf_counter() - t0) / args.repeats / B
        print(json.dumps({
            "probe": "chunk_size", "chunk": B,
            "us_per_frame": round(dt * 1e6, 2),
            "pairs_per_s": round(1.0 / dt, 1),
        }), flush=True)


def bench_launch_overhead(args):
    """Same 50 GN iterations on one level's data, issued as 1 vs 3 kernel
    launches, scanned REPEATS_IN times inside one jitted program so the
    per-launch cost is isolated from dispatch/tunnel latency."""
    intr = TUM_FR1
    I0, D0, I1, D1, _ = make_pair(intr, shape=(480, 640))
    # the 120x160 level (the most expensive active level of the headline
    # schedule)
    lvl = 2
    ints0 = pyr.build_pyramid(jnp.asarray(I0), 3, None)
    deps0 = pyr.build_pyramid(jnp.asarray(D0), 3, None)
    ints1 = pyr.build_pyramid(jnp.asarray(I1), 3, None)
    i0, d0, i1 = ints0[lvl], deps0[lvl], ints1[lvl]
    gx = pyr.scharr(i1, "x", 0.0625)
    gy = pyr.scharr(i1, "y", 0.0625)
    tgt = F.pack_target_colmajor(i1, gx, gy)
    intr_l = intr.at_level(lvl)
    N_IN = 32  # level-solves per jitted program

    def run_split(splits):
        @jax.jit
        def prog(state0):
            def body(carry, _):
                st = carry
                for n_it in splits:
                    st, *_ = F.fused_gn_level(
                        i0, d0, tgt, intr_l, st, 0.3, 5.0,
                        max_iterations=n_it, min_gradient_norm=0.0,
                        lambda_step=1.0, sampling="nearest",
                        mix_mode="bf16x2g",
                    )
                return st, st[0]
            return jax.lax.scan(body, state0, None, length=N_IN)

        s0 = jnp.zeros(6)
        out = prog(s0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            out = prog(s0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.repeats / N_IN
        return dt

    dt1 = run_split((50,))
    dt3 = run_split((17, 17, 16))
    dt6 = run_split((9, 8, 8, 9, 8, 8))
    print(json.dumps({
        "probe": "launch_overhead", "level_shape": list(i0.shape),
        "us_1_launch_50it": round(dt1 * 1e6, 2),
        "us_3_launches_50it": round(dt3 * 1e6, 2),
        "us_6_launches_50it": round(dt6 * 1e6, 2),
        "us_per_extra_launch": round((dt3 - dt1) / 2 * 1e6, 3),
    }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--chunks", type=int, nargs="*",
                    default=[32, 64, 96, 128])
    args = ap.parse_args()
    bench_launch_overhead(args)
    bench_chunk_sizes(args)
    return 0


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    sys.exit(main())
