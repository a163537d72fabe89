"""Data-parallel batched alignment over a device mesh.

The reference aligns one pair at a time on one core. On TPU the same math
vmaps over a batch of frame pairs (sliding-window odometry, multi-sequence
serving, relocalization candidate scoring) and shards the batch over the
mesh "data" axis — GSPMD partitions every per-pair computation with no
cross-device communication at all (each pair lives on one device).

Note the solver runs the same iteration schedule for every pair in the batch
(lax.while_loop over a batched carry: an iteration executes until EVERY
pair's termination criterion fires; converged pairs keep taking harmless
steps). Identical results to serial alignment up to that schedule difference;
tests/test_parallel.py checks agreement against the serial path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phovo_tpu.models.analytic import align_analytic
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.parallel.mesh import DATA_AXIS
from phovo_tpu.utils.config import PhovoConfig


@functools.partial(jax.jit, static_argnames=("config", "use_fused"))
def align_batch(
    source_intensity: jax.Array,  # (B, H, W)
    source_depth: jax.Array,
    target_intensity: jax.Array,
    target_depth: jax.Array,
    intr: Intrinsics,  # scalars (shared) or vectors of shape (B,)
    init_states: jax.Array,  # (B, 6)
    config: PhovoConfig,
    use_fused: bool = False,
):
    """vmapped multi-level alignment; returns batched AlignmentResult."""
    in_axes_intr = Intrinsics(
        *(0 if jnp.ndim(v) > 0 else None for v in intr)
    )
    return jax.vmap(
        lambda si, sd, ti, td, it, s0: align_analytic(
            si, sd, ti, td, it, s0, config, use_fused
        ),
        in_axes=(0, 0, 0, 0, in_axes_intr, 0),
    )(source_intensity, source_depth, target_intensity, target_depth, intr, init_states)


def make_data_parallel_aligner(mesh: Mesh, config: PhovoConfig, use_fused: bool = False):
    """Returns align(batch...) with the batch dimension sharded over the
    mesh 'data' axis. Inputs may be any (B, H, W) arrays with B divisible by
    the data-axis size; outputs are replicated (6,)-per-pair states."""
    data_sharded = NamedSharding(mesh, P(DATA_AXIS, None, None))
    state_sharded = NamedSharding(mesh, P(DATA_AXIS, None))

    @functools.partial(
        jax.jit,
        in_shardings=(data_sharded,) * 4 + (None, state_sharded),
        static_argnames=(),
    )
    def align(si, sd, ti, td, intr, init_states):
        return align_batch(si, sd, ti, td, intr, init_states, config, use_fused)

    return align
