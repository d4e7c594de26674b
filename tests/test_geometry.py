"""Golden-value tests for the per-gaussian geometry chain.

Values pinned by the reference CUDA implementation
(test/test_projection.py, test/test_utils.py).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu.culling import frustum_visible
from tests import fixtures as fx


@pytest.fixture
def scene():
    return fx.test_scene(opacity_presigmoid=False)


def test_transform_and_project(scene):
    cam = fx.test_camera()
    pose = fx.test_camera_T_world()
    xyz_cam = geo.transform_points(scene.xyz, pose)
    np.testing.assert_allclose(
        np.asarray(xyz_cam[0]), [0.6602, -1.1849998, -1.4546999], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(xyz_cam[1]), [3.7595997, 4.5586, 7.2283], atol=1e-4
    )

    uv = geo.project_points(xyz_cam, cam.K)
    assert uv.shape == (6, 2)
    np.testing.assert_allclose(
        np.asarray(uv[0]), [124.849106, 573.9863], atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(uv[1]), [543.6526, 498.57062], atol=1e-3
    )

    # frustum culling with the projection test's settings (near 0.3, no
    # padding, far unlimited): gaussians 0..2 culled, 3..5 kept
    visible = frustum_visible(
        xyz_cam, uv, (cam.width, cam.height), 0.3, np.inf, 0.0
    )
    np.testing.assert_array_equal(
        np.asarray(visible), [False, False, False, True, True, True]
    )


def test_compute_sigma_world(scene):
    sigma = geo.compute_sigma_world(scene.quaternion, scene.scale)
    assert sigma.shape == (6, 3, 3)
    np.testing.assert_allclose(
        np.asarray(sigma[0]),
        np.diag([0.0004, 0.0009, 0.0016]),
        atol=1e-4,
    )
    expected4 = np.array(
        [
            [0.01454808, 0.01702517, 0.07868834],
            [0.01702517, 0.4389012, 1.1959752],
            [0.07868834, 1.1959752, 3.5965507],
        ]
    )
    np.testing.assert_allclose(np.asarray(sigma[4]), expected4, atol=1e-4)


def test_projection_jacobian(scene):
    cam = fx.test_camera()
    xyz_cam = geo.transform_points(scene.xyz, fx.test_camera_T_world())
    J = geo.compute_projection_jacobian(xyz_cam, cam.K)
    assert J.shape == (6, 2, 3)
    np.testing.assert_allclose(
        np.asarray(J[0]),
        [[-295.5936, 0.0, -134.1520], [0.0, -281.8451, 229.5912]],
        atol=2e-3,
    )


def test_compute_conic(scene):
    cam = fx.test_camera()
    pose = fx.test_camera_T_world()
    sigma = geo.compute_sigma_world(scene.quaternion, scene.scale)
    xyz_cam = geo.transform_points(scene.xyz, pose)
    J = geo.compute_projection_jacobian(xyz_cam, cam.K)
    conic = geo.compute_conic(sigma, J, pose)
    assert conic.shape == (6, 3)
    np.testing.assert_allclose(
        np.asarray(conic[3]), [664.28760, 254.81781, 5761.8906], rtol=2e-6
    )


def test_quaternion_to_rotation_orthonormal():
    q = jnp.array(
        [[1.0, 0, 0, 0], [0.0, math.sqrt(2) / 2, 0.0, math.sqrt(2) / 2]],
        dtype=jnp.float32,
    )
    R = geo.quaternion_to_rotation(q)
    eye = np.eye(3)[None].repeat(2, 0)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nkj->nik", R, R)), eye, atol=1e-6
    )


def test_transform_points_roundtrip():
    pts = jnp.arange(1.0, 10.0, dtype=jnp.float32).reshape(3, 3)
    q = jnp.array([[0.0, math.sqrt(2) / 2, 0.0, math.sqrt(2) / 2]])
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(
        geo.quaternion_to_rotation(q)[0].astype(jnp.float32)
    )
    T = T.at[:3, 3].set(jnp.array([1.0, 2.0, 3.0], jnp.float32))
    out = geo.transform_points(pts, T)
    expected = np.array([[4.0, 0, 4], [7, -3, 7], [10, -6, 10]])
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
    back = geo.transform_points(out, jnp.linalg.inv(T))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_compute_rays_camera_frame():
    cam = fx.test_camera()
    rays = geo.compute_rays(cam.K, cam.width, cam.height)
    assert rays.shape == (480, 640, 3)
    np.testing.assert_allclose(
        np.asarray(rays[0, 0]),
        [-0.5403921008110046, -0.4250645041465759, 0.7261518836021423],
        atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(rays[240, 320]), [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rays[0, 639]),
        [0.5391948819160461, -0.425452321767807, 0.7268144488334656],
        atol=1e-6,
    )


def test_compute_rays_world_frame():
    cam = fx.test_camera()
    rays = geo.compute_rays_in_world_frame(
        cam.K, cam.width, cam.height, fx.test_camera_T_world()
    )
    assert rays.shape == (480, 640, 3)
    np.testing.assert_allclose(
        np.asarray(rays[0, 0]),
        [-0.5390445590019226, -0.6224945187568665, 0.5673900842666626],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(rays[240, 320]),
        [-0.004399406723678112, -0.2905626893043518, 0.9568459391593933],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(rays[0, 639]),
        [0.540492832660675, -0.6134769916534424, 0.5757721662521362],
        atol=1e-6,
    )


def test_sh_basis_band0_matches_constant():
    d = jnp.array([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    b = geo.sh_basis(d, 16)
    assert b.shape == (1, 16)
    np.testing.assert_allclose(float(b[0, 0]), geo.SH_0, rtol=1e-6)


def test_rows_api_matches_reference_api():
    """The component-wise ("rows") geometry used by the training hot path
    must agree with the (N, C) reference-parity functions that carry the
    golden values: transform/project/sigma/conic."""
    import numpy as np
    import jax.numpy as jnp
    from gaussian_splatting_tpu import geometry as geo
    from tests import fixtures as fx

    scene = fx.test_scene(opacity_presigmoid=True)
    pose = fx.test_camera_T_world()
    cam = fx.test_camera()
    rng = np.random.default_rng(0)
    # extend the fixture with random gaussians incl. a dead (zero) quat
    n = 64
    xyz = jnp.concatenate(
        [scene.xyz, jnp.asarray(rng.normal(0, 3, (n, 3)), jnp.float32)]
    )
    quat = jnp.concatenate(
        [scene.quaternion, jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)]
    )
    quat = quat.at[-1].set(0.0)  # dead slot -> identity fallback
    scale = jnp.concatenate(
        [scene.scale, jnp.asarray(rng.normal(0, 0.5, (n, 3)), jnp.float32)]
    )

    xyz_cam = geo.transform_points(xyz, pose)
    xyzT = xyz.T
    xc, yc, zc = geo.transform_rows(xyzT[0], xyzT[1], xyzT[2], pose)
    np.testing.assert_allclose(
        np.stack([xc, yc, zc], 1), np.asarray(xyz_cam), rtol=1e-6, atol=1e-5
    )

    uv = geo.project_points(xyz_cam, cam.K)
    u, v = geo.project_rows(xc, yc, zc, cam.K)
    np.testing.assert_allclose(
        np.stack([u, v], 1), np.asarray(uv), rtol=1e-5, atol=1e-4
    )

    sigma = geo.compute_sigma_world(quat, scale)
    sig6 = geo.sigma_world_rows(quat, scale)
    want6 = [sigma[:, 0, 0], sigma[:, 0, 1], sigma[:, 0, 2],
             sigma[:, 1, 1], sigma[:, 1, 2], sigma[:, 2, 2]]
    for got, want in zip(sig6, want6):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5
        )

    J = geo.compute_projection_jacobian(xyz_cam, cam.K)
    conic = geo.compute_conic(sigma, J, pose)
    c0, c1, c2 = geo.conic_rows(sig6, xc, yc, zc, cam.K, pose)
    np.testing.assert_allclose(
        np.stack([c0, c1, c2], 1), np.asarray(conic), rtol=2e-4, atol=1e-4
    )

    dist = geo.camera_distance_rows(xc, yc, zc)
    np.testing.assert_allclose(
        np.asarray(dist), np.linalg.norm(np.asarray(xyz_cam), axis=1),
        rtol=1e-6, atol=1e-5,
    )
