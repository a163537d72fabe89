"""In-kernel cost itemization of the fused GN level kernel (VERDICT r3
item 3: the per-iteration VPU mask/geometry work dominates the headline's
serial-iteration floor; this tool measures WHERE).

For each active level of the headline schedule ([0,0,5,20,50] on VGA:
120x160 x5, 60x80 x20, 30x40 x50 iterations) the whole-level kernel runs
scanned N_IN times inside one jitted program (dispatch/tunnel amortized)
under measurement ablations (ops/fused.py _linearize_gram _ablate hook —
results numerically invalid, cost-isolating only):

  base          — the production kernel
  const_colw    — column one-hot mask build replaced by a constant
                  (isolates the (W, NT) compare/select cost)
  const_rowmix  — row-mix multiply+reduce replaced by a static row slice
                  (isolates the (BAND, NT) row mask + reduction)
  const_samples — sampling dots + row mix skipped entirely
                  (isolates MXU col-mix dot + row path together)
  const_jac     — rotation-column Jacobian chain unused (XLA DCEs the
                  ry/rp/rr builds; isolates that VPU slice)

Usage: python -m tools.kernel_ablate [--repeats 20]
"""

from __future__ import annotations

import argparse
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
from phovo_tpu.utils.synthetic import make_pair

LEVELS = [(2, 5), (3, 20), (4, 50)]  # (level, iterations) of the headline
ABLATIONS = [None, "const_colw", "const_rowmix", "const_samples", "const_jac"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--n-in", type=int, default=32)
    ap.add_argument("--mix-mode", default="bf16x2g")
    args = ap.parse_args()

    intr = TUM_FR1
    I0, D0, I1, D1, _ = make_pair(intr, shape=(480, 640))
    ints0 = pyr.build_pyramid(jnp.asarray(I0), 5, None)
    deps0 = pyr.build_pyramid(jnp.asarray(D0), 5, None)
    ints1 = pyr.build_pyramid(jnp.asarray(I1), 5, None)

    totals: dict = {}
    for lvl, iters in LEVELS:
        i0, d0, i1 = ints0[lvl], deps0[lvl], ints1[lvl]
        gx = pyr.scharr(i1, "x", 0.0625)
        gy = pyr.scharr(i1, "y", 0.0625)
        tgt = F.pack_target_colmajor(i1, gx, gy)
        intr_l = intr.at_level(lvl)
        row = {}
        for ab in ABLATIONS:
            @jax.jit
            def prog(state0, _i0=i0, _d0=d0, _tgt=tgt, _intr=intr_l,
                     _it=iters, _ab=ab):
                def body(carry, _):
                    st, *_ = F.fused_gn_level(
                        _i0, _d0, _tgt, _intr, carry, 0.3, 5.0,
                        max_iterations=_it, min_gradient_norm=0.0,
                        lambda_step=1.0, sampling="nearest",
                        mix_mode=args.mix_mode, _ablate=_ab,
                    )
                    return st, st[0]
                return jax.lax.scan(body, state0, None, length=args.n_in)

            s0 = jnp.zeros(6)
            out = prog(s0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(args.repeats):
                out = prog(s0)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.repeats / args.n_in
            row[ab or "base"] = dt * 1e6
        base = row["base"]
        print(json.dumps({
            "level": lvl, "shape": list(i0.shape), "iterations": iters,
            "us_level": {k: round(v, 2) for k, v in row.items()},
            "us_per_iter_base": round(base / iters, 3),
            "saved_us": {
                k: round(base - v, 2) for k, v in row.items() if k != "base"
            },
        }), flush=True)
        totals.setdefault("base", 0.0)
        for k, v in row.items():
            totals[k] = totals.get(k, 0.0) + v
    print(json.dumps({
        "frame_total_us": {k: round(v, 2) for k, v in totals.items()},
        "frame_saved_us": {
            k: round(totals["base"] - v, 2)
            for k, v in totals.items() if k != "base"
        },
    }), flush=True)
    return 0


if __name__ == "__main__":
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    sys.exit(main())
