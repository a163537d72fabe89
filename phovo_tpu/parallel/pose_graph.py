"""Distributed pose-graph optimization (net-new; SURVEY §5/§7).

The reference integrates pose chain-style with no global optimization
(PhotoconsistencyVisualOdometry.cpp:233-234), so drift is unbounded. This
module adds the standard back-end: keyframe poses optimized against
relative-pose constraints (odometry edges + loop closures) with
Gauss-Newton, constraints SHARDED over the device mesh.

Decomposition: each device holds a shard of constraints; it computes its
residuals and the dense (6M x 6M is never formed — we use per-constraint
6x6 blocks) contributions J_k^T J_k and J_k^T r_k, accumulated into block
structure with segment-sums, then psum-merged across devices. The block
system is solved with a damped dense solve on the replicated result (fine up
to hundreds of keyframes; block-sparse Schur elimination is the follow-up
for map-scale problems).

Parameterization: each pose is the same [x,y,z,yaw,pitch,roll] vector the
front-end estimates; constraint (i, j, z_ij) says pose_matrix(z_ij) should
equal T_i^{-1} T_j (measured j-in-i transform, the front-end's Rt^{-1}
convention folded in by the caller).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from phovo_tpu.ops import se3


class PoseGraph(NamedTuple):
    states: jax.Array  # (M, 6) current pose estimates (world <- keyframe)
    edges_i: jax.Array  # (K,) int32 source keyframe index
    edges_j: jax.Array  # (K,) int32 target keyframe index
    measurements: jax.Array  # (K, 6) measured state of T_i^{-1} T_j
    weights: jax.Array  # (K,) scalar information weight per edge


def edge_residual(si: jax.Array, sj: jax.Array, z: jax.Array) -> jax.Array:
    """6-vector error of one constraint: state of Z^{-1} (T_i^{-1} T_j)."""
    Ti = se3.pose_matrix(si)
    Tj = se3.pose_matrix(sj)
    Z = se3.pose_matrix(z)
    E = se3.inverse(Z) @ (se3.inverse(Ti) @ Tj)
    return se3.matrix_to_state(E)


def _edge_residual_and_jacobians(si, sj, z, w):
    """Residual + d/dsi, d/dsj via forward-mode (12 tangents, tiny)."""
    r = edge_residual(si, sj, z)
    Ji = jax.jacfwd(lambda s: edge_residual(s, sj, z))(si)
    Jj = jax.jacfwd(lambda s: edge_residual(si, s, z))(sj)
    sw = jnp.sqrt(w)
    return r * sw, Ji * sw, Jj * sw


def _accumulate_shard(states, ei, ej, z, w, M, vma_axes=()):
    """Block-structured J^T J and J^T r for one shard of edges.

    Returns H (M, M, 6, 6) block matrix and g (M, 6). Edges marked with
    i == -1 (padding) contribute zero.

    All K edges linearize in parallel (vmap over the tiny per-edge jacfwd)
    and land in H/g via four batched scatter-adds — duplicate (i, j) pairs
    accumulate correctly. The earlier form was a serial lax.scan carrying
    the dense (M, M, 6, 6) matrix through K sequential steps: with loop
    closures that is thousands of device steps each rewriting M^2 * 36
    floats; this form is O(1) device steps (same pattern as
    bundle_adjustment._accumulate_shard).
    """
    valid = ei >= 0
    iw = jnp.where(valid, ei, 0).astype(jnp.int32)
    jw = jnp.where(valid, ej, 0).astype(jnp.int32)
    r, Ji, Jj = jax.vmap(_edge_residual_and_jacobians)(
        states[iw], states[jw], z, w
    )
    zero = valid.astype(jnp.float32)
    r = r * zero[:, None]
    Ji = Ji * zero[:, None, None]
    Jj = Jj * zero[:, None, None]
    hp = jax.lax.Precision.HIGHEST
    JiTJi = jnp.einsum("kab,kac->kbc", Ji, Ji, precision=hp)
    JiTJj = jnp.einsum("kab,kac->kbc", Ji, Jj, precision=hp)
    JjTJj = jnp.einsum("kab,kac->kbc", Jj, Jj, precision=hp)
    gi = jnp.einsum("kab,ka->kb", Ji, r, precision=hp)
    gj = jnp.einsum("kab,ka->kb", Jj, r, precision=hp)
    H0 = jnp.zeros((M, M, 6, 6), jnp.float32)
    g0 = jnp.zeros((M, 6), jnp.float32)
    if vma_axes:
        # Under shard_map the edge arrays vary per device, so the scatter
        # targets must be marked device-varying too (JAX vma typing rule).
        H0 = jax.lax.pcast(H0, vma_axes, to="varying")
        g0 = jax.lax.pcast(g0, vma_axes, to="varying")
    H = H0.at[iw, iw].add(JiTJi)
    H = H.at[iw, jw].add(JiTJj)
    H = H.at[jw, iw].add(jnp.swapaxes(JiTJj, -1, -2))
    H = H.at[jw, jw].add(JjTJj)
    g = g0.at[iw].add(gi).at[jw].add(gj)
    return H, g, jnp.sum(r * r)


def optimize_pose_graph(
    graph: PoseGraph,
    mesh: Mesh | None = None,
    axis: str | None = None,
    iterations: int = 10,
    damping: float = 1e-6,
    fixed_first: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Gauss-Newton over all keyframe poses. Returns (states, final_cost).

    With a mesh, edges are padded to a multiple of the axis size and sharded;
    each device accumulates its block contributions and a psum merges them
    (DCN/ICI traffic: one (M,M,6,6)+(M,6) allreduce per GN iteration).
    """
    K = graph.edges_i.shape[0]
    ei, ej, z, w = graph.edges_i, graph.edges_j, graph.measurements, graph.weights
    if mesh is not None:
        n = 1
        for a in mesh.axis_names:
            n *= mesh.shape[a]
        pad = (-K) % n
        ei = jnp.concatenate([ei, -jnp.ones(pad, jnp.int32)])
        ej = jnp.concatenate([ej, -jnp.ones(pad, jnp.int32)])
        z = jnp.concatenate([z, jnp.zeros((pad, 6), jnp.float32)])
        w = jnp.concatenate([w, jnp.zeros(pad, jnp.float32)])
    return _optimize_pose_graph_jit(
        graph.states, ei, ej, z, w, jnp.float32(damping),
        mesh=mesh, iterations=iterations, fixed_first=fixed_first,
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "iterations", "fixed_first")
)
def _optimize_pose_graph_jit(
    states0, ei, ej, z, w, damping, *, mesh, iterations, fixed_first
):
    """Jitted core with the graph data as ARGUMENTS: a closure-captured
    graph would be baked into the program as constants, making every
    distinct graph compile (and persistent-cache-miss) its own program."""
    M = states0.shape[0]

    if mesh is not None:
        spec = P(mesh.axis_names)  # shard edges over ALL mesh axes flattened

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), spec, spec, spec, spec),
            out_specs=(P(), P(), P()),
        )
        def accumulate(states, ei_s, ej_s, z_s, w_s):
            H, g, c = _accumulate_shard(
                states, ei_s, ej_s, z_s, w_s, M, tuple(mesh.axis_names)
            )
            H = jax.lax.psum(H, mesh.axis_names)
            g = jax.lax.psum(g, mesh.axis_names)
            c = jax.lax.psum(c, mesh.axis_names)
            return H, g, c

        def build(states):
            return accumulate(states, ei, ej, z, w)

    else:

        def build(states):
            return _accumulate_shard(states, ei, ej, z, w, M)

    def gn_step(states, _):
        H, g, cost = build(states)
        Hd = jnp.transpose(H, (0, 2, 1, 3)).reshape(6 * M, 6 * M)
        gd = g.reshape(6 * M)
        if fixed_first:
            # gauge fix: clamp pose 0 by zeroing its rows/cols + unit diag
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (M - 1))])
            Hd = Hd * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            gd = gd * mask
        Hd = Hd + damping * jnp.eye(6 * M, dtype=Hd.dtype)
        step = jnp.linalg.solve(Hd, gd)
        step = jnp.where(jnp.all(jnp.isfinite(step)), step, jnp.zeros_like(step))
        return states - step.reshape(M, 6), cost

    states, costs = jax.lax.scan(gn_step, states0, None, length=iterations)
    return states, costs[-1]


def chain_to_graph(
    relative_states: jax.Array,  # (N-1, 6) front-end per-pair states
    loop_closures: list[tuple[int, int, jax.Array]] | None = None,
    odometry_weight: float = 1.0,
    loop_weight: float = 1.0,
) -> PoseGraph:
    """Build a pose graph from sequential odometry + optional loop edges.

    Front-end convention: align(source=k, target=k+1) estimates T with
    p_{k+1} = T p_k, and the global pose integrates pose_{k+1} =
    pose_k @ T^{-1} (PhotoconsistencyVisualOdometry.cpp:233-234). Hence the
    measured j-in-i transform for edge (k, k+1) is T^{-1}.
    """
    rel = jnp.asarray(relative_states, jnp.float32)
    N = rel.shape[0] + 1
    T_inv = se3.inverse(se3.pose_matrix(rel))  # (N-1, 4, 4)
    meas = se3.matrix_to_state(T_inv)

    # initial states: cumulative composition
    states = [jnp.zeros(6, jnp.float32)]
    Tw = jnp.eye(4)
    for k in range(N - 1):
        Tw = Tw @ T_inv[k]
        states.append(se3.matrix_to_state(Tw))
    states = jnp.stack(states)

    ei = list(range(N - 1))
    ej = list(range(1, N))
    zs = [meas[k] for k in range(N - 1)]
    ws = [odometry_weight] * (N - 1)
    for (i, j, z) in loop_closures or []:
        ei.append(i)
        ej.append(j)
        zs.append(jnp.asarray(z, jnp.float32))
        ws.append(loop_weight)
    return PoseGraph(
        states=states,
        edges_i=jnp.asarray(ei, jnp.int32),
        edges_j=jnp.asarray(ej, jnp.int32),
        measurements=jnp.stack(zs),
        weights=jnp.asarray(ws, jnp.float32),
    )
