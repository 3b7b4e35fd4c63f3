import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from acezero_tpu.geometry import (
    matrix_to_quat_wxyz,
    matrix_to_rodrigues,
    quat_wxyz_to_matrix,
    rodrigues_to_matrix,
    rotation_angle,
    special_gramschmidt,
    special_procrustes,
)


def random_rotations(rng, n):
    return Rotation.random(n, random_state=np.random.RandomState(7)).as_matrix()


def test_quat_matrix_roundtrip_vs_scipy(rng):
    R = random_rotations(rng, 64)
    q_ref = Rotation.from_matrix(R).as_quat()  # xyzw
    q_ref_wxyz = np.concatenate([q_ref[:, 3:4], q_ref[:, :3]], axis=1)

    q_ours = np.asarray(matrix_to_quat_wxyz(jnp.asarray(R)))
    # quaternions are sign-ambiguous; compare up to sign
    dots = np.abs(np.sum(q_ours * q_ref_wxyz, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)

    R_back = np.asarray(quat_wxyz_to_matrix(jnp.asarray(q_ours)))
    np.testing.assert_allclose(R_back, R, atol=1e-5)


def test_rodrigues_roundtrip_vs_scipy(rng):
    rvecs = rng.normal(size=(64, 3)) * 2.0
    R_ref = Rotation.from_rotvec(rvecs).as_matrix()
    R_ours = np.asarray(rodrigues_to_matrix(jnp.asarray(rvecs, jnp.float32)))
    np.testing.assert_allclose(R_ours, R_ref, atol=1e-5)

    r_back = np.asarray(matrix_to_rodrigues(jnp.asarray(R_ref, jnp.float32)))
    # rotvec is unique for angle < pi
    mask = np.linalg.norm(rvecs, axis=1) < np.pi
    np.testing.assert_allclose(r_back[mask], rvecs[mask], atol=1e-4)


def test_rodrigues_small_angle():
    rvec = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    R = np.asarray(rodrigues_to_matrix(rvec))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-6)


def test_rotation_angle(rng):
    angles = rng.uniform(0.01, 3.1, size=32)
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    R = Rotation.from_rotvec(axes * angles[:, None]).as_matrix()
    got = np.asarray(rotation_angle(jnp.asarray(R, jnp.float32)))
    np.testing.assert_allclose(got, angles, atol=1e-3)


def test_gramschmidt_projects_to_so3(rng):
    R = random_rotations(rng, 16)
    noisy = R + rng.normal(size=R.shape) * 0.05
    out = np.asarray(special_gramschmidt(jnp.asarray(noisy, jnp.float32)))
    # output is a rotation
    np.testing.assert_allclose(
        out @ out.transpose(0, 2, 1), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-5)
    # gram-schmidt of an exact rotation is the identity map
    exact = np.asarray(special_gramschmidt(jnp.asarray(R, jnp.float32)))
    np.testing.assert_allclose(exact, R, atol=1e-5)


def test_procrustes_projects_to_so3(rng):
    R = random_rotations(rng, 16)
    noisy = R + rng.normal(size=R.shape) * 0.05
    out = np.asarray(special_procrustes(jnp.asarray(noisy, jnp.float32)))
    np.testing.assert_allclose(
        out @ out.transpose(0, 2, 1), np.tile(np.eye(3), (16, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(out), 1.0, atol=1e-5)
    # procrustes result should be closer to the noisy matrix than any other
    # rotation candidate we try (sanity: closer than the unperturbed truth or equal)
    err_out = np.linalg.norm(out - noisy, axis=(1, 2))
    err_truth = np.linalg.norm(R - noisy, axis=(1, 2))
    assert np.all(err_out <= err_truth + 1e-4)
