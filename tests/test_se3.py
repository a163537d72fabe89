import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from phovo_tpu.ops import se3

STATES = [
    np.zeros(6, np.float32),
    np.array([0.1, -0.2, 0.3, 0.4, -0.5, 0.6], np.float32),
    np.array([1.0, 2.0, -3.0, -2.5, 1.2, 3.0], np.float32),
]


@pytest.mark.parametrize("state", STATES)
def test_pose_matrix_matches_scipy_zyx(state):
    T = np.asarray(se3.pose_matrix(state))
    R_expected = Rotation.from_euler("ZYX", state[3:6]).as_matrix()
    np.testing.assert_allclose(T[:3, :3], R_expected, atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], state[:3], atol=1e-7)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)


@pytest.mark.parametrize("state", STATES)
def test_inverse(state):
    T = se3.pose_matrix(state)
    np.testing.assert_allclose(
        np.asarray(se3.inverse(T) @ T), np.eye(4), atol=1e-5
    )


@pytest.mark.parametrize("state", STATES)
def test_matrix_to_state_roundtrip(state):
    # pitch within principal branch for all STATES except the wrap case
    T = se3.pose_matrix(state)
    back = np.asarray(se3.matrix_to_state(T))
    T2 = np.asarray(se3.pose_matrix(back))
    np.testing.assert_allclose(T2, np.asarray(T), atol=1e-5)


@pytest.mark.parametrize("state", STATES)
def test_quaternion_roundtrip(state):
    R = se3.pose_matrix(state)[:3, :3]
    q = se3.rotation_to_quaternion(R)
    # against scipy (xyzw order matches)
    q_sp = Rotation.from_matrix(np.asarray(R)).as_quat()
    if q_sp[3] < 0:
        q_sp = -q_sp
    np.testing.assert_allclose(np.asarray(q), q_sp, atol=1e-5)
    R2 = se3.quaternion_to_rotation(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_quaternion_negative_trace_branches():
    # rotations near pi exercise the non-trace-dominant branches
    for axis in ["x", "y", "z"]:
        R = Rotation.from_euler(axis, np.pi - 1e-3).as_matrix().astype(np.float32)
        q = np.asarray(se3.rotation_to_quaternion(jnp.asarray(R)))
        q_sp = Rotation.from_matrix(R).as_quat()
        if q_sp[3] < 0:
            q_sp = -q_sp
        np.testing.assert_allclose(q, q_sp, atol=1e-4)


@pytest.mark.parametrize("state", STATES)
def test_rotation_jacobian_matches_autodiff(state):
    state = jnp.asarray(state)

    def rot(angles):
        s = jnp.concatenate([state[:3], angles])
        return se3.pose_matrix(s)[:3, :3]

    J_auto = jax.jacfwd(rot)(state[3:6])  # (3, 3, 3[angle])
    J_ours = se3.rotation_jacobian_wrt_euler(state)  # (3[angle], 3, 3)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(J_auto, -1, 0)), np.asarray(J_ours), atol=1e-5
    )


def test_batched_pose_matrix():
    states = jnp.asarray(np.stack(STATES))
    T_batch = se3.pose_matrix(states)
    for i, s in enumerate(STATES):
        np.testing.assert_allclose(
            np.asarray(T_batch[i]), np.asarray(se3.pose_matrix(s)), atol=1e-6
        )


def test_integrate_trajectory_matches_host_loop():
    states = jnp.asarray(np.stack(STATES))
    poses = se3.integrate_trajectory(states)
    # reference VO app integration: pose <- pose @ Rt^-1 from identity
    pose = np.eye(4)
    for k, s in enumerate(STATES):
        pose = pose @ np.linalg.inv(np.asarray(se3.pose_matrix(s)))
        np.testing.assert_allclose(np.asarray(poses[k]), pose, atol=1e-5)


def test_numpy_twins_match_jax():
    """pose_matrix_np / matrix_to_state_np (the host-pipeline f64 twins that
    avoid per-frame device round-trips) must agree with the JAX versions and
    round-trip each other, including batch dims."""
    states = np.stack(STATES)
    T_np = se3.pose_matrix_np(states)
    T_jax = np.asarray(se3.pose_matrix(jnp.asarray(states, jnp.float32)))
    assert T_np.dtype == np.float64
    np.testing.assert_allclose(T_np, T_jax, atol=1e-6)

    s_np = se3.matrix_to_state_np(T_np)
    s_jax = np.asarray(se3.matrix_to_state(jnp.asarray(T_np, jnp.float32)))
    np.testing.assert_allclose(s_np, s_jax, atol=1e-5)
    # exact f64 round trip (states here are within the principal branch)
    np.testing.assert_allclose(s_np, states, atol=1e-12)

    # single (unbatched) input
    np.testing.assert_allclose(
        se3.pose_matrix_np(STATES[0]),
        np.asarray(se3.pose_matrix(STATES[0])), atol=1e-6,
    )


def test_quaternion_numpy_twins_match_jax():
    """The host-side f64 quaternion twins (rotation_to_quaternion_np /
    quaternion_to_rotation_np — per-pose trajectory IO must not dispatch
    to the device) must match the jitted versions."""
    rng = np.random.default_rng(11)
    states = rng.uniform(-1.0, 1.0, (16, 6))
    R = np.asarray(se3.pose_matrix(jnp.asarray(states)))[..., :3, :3]
    q_np = se3.rotation_to_quaternion_np(R)
    q_jax = np.asarray(se3.rotation_to_quaternion(jnp.asarray(R)))
    np.testing.assert_allclose(q_np, q_jax, atol=1e-6)
    R_np = se3.quaternion_to_rotation_np(q_np)
    R_jax = np.asarray(se3.quaternion_to_rotation(jnp.asarray(q_np)))
    np.testing.assert_allclose(R_np, R_jax, atol=1e-6)
    np.testing.assert_allclose(R_np, R, atol=1e-6)
