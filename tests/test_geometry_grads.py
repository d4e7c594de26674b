"""fp64 gradient checks for the projective-geometry chain.

The reference runs float64 torch.autograd.gradcheck against each CUDA op's
hand-written VJP (test/test_cuda_autograd_functions.py:68-236) — the fp64
kernel instantiations exist solely for this.  Here the ops are closed-form
jnp functions differentiated by JAX, so check_grads compares the autodiff
VJPs against fp64 finite differences; the ``_safe_div`` masking paths (the
one place autodiff could silently zero a live gradient) get explicit
coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from gaussian_splatting_tpu import geometry as geo

# conftest enables jax_enable_x64; all inputs below are float64
K = jnp.array(
    [[430.0, 0.0, 320.0], [0.0, 410.0, 240.0], [0.0, 0.0, 1.0]], jnp.float64
)
POSE = jnp.array(
    [
        [0.9999, 0.0089, 0.0073, -0.23],
        [-0.0106, 0.9568, 0.2905, -1.61],
        [-0.0044, -0.2906, 0.9568, 2.84],
        [0.0, 0.0, 0.0, 1.0],
    ],
    jnp.float64,
)

_rng = np.random.default_rng(7)
XYZ_CAM = jnp.asarray(
    _rng.uniform(-2.0, 2.0, (5, 3)) + np.array([0.0, 0.0, 6.0]), jnp.float64
)
QUAT = jnp.asarray(_rng.normal(size=(5, 4)), jnp.float64)
SCALE = jnp.asarray(_rng.uniform(-2.0, 0.0, (5, 3)), jnp.float64)


def _check(f, args, order=1):
    check_grads(f, args, order=order, modes=("rev",), atol=1e-6, rtol=1e-6)


def test_transform_points_grads():
    _check(lambda x: geo.transform_points(x, POSE), (XYZ_CAM,))


def test_project_points_grads():
    # reference: CameraPointProjection gradcheck
    # (test_cuda_autograd_functions.py:68-86)
    _check(lambda x: geo.project_points(x, K), (XYZ_CAM,))


def test_projection_jacobian_grads():
    # reference: ComputeProjectionJacobian gradcheck
    _check(lambda x: geo.compute_projection_jacobian(x, K), (XYZ_CAM,))


def test_sigma_world_grads():
    # reference: ComputeSigmaWorld gradcheck — through exp(scale), quat
    # normalisation, and R S S^T R^T (second order covers the quadratic form)
    _check(geo.compute_sigma_world, (QUAT, SCALE), order=2)


def test_conic_grads():
    sigma = geo.compute_sigma_world(QUAT, SCALE)
    J = geo.compute_projection_jacobian(XYZ_CAM, K)
    _check(lambda s, j: geo.compute_conic(s, j, POSE), (sigma, J))


def test_full_chain_grads():
    """xyz/quat/scale -> conic + uv, the whole differentiable front half of
    rasterize (splat_py/rasterize.py:29-79 equivalent)."""

    def chain(xyz, quat, scale):
        xyz_cam = geo.transform_points(xyz, POSE)
        uv = geo.project_points(xyz_cam, K)
        sigma = geo.compute_sigma_world(quat, scale)
        J = geo.compute_projection_jacobian(xyz_cam, K)
        conic = geo.compute_conic(sigma, J, POSE)
        return uv, conic

    xyz_world = jnp.asarray(_rng.uniform(-1.0, 1.0, (5, 3)), jnp.float64)
    _check(chain, (xyz_world, QUAT, SCALE))


def test_precompute_rgb_from_sh_grads():
    # reference: PrecomputeRGBFromSH gradcheck at every band width
    # (test_cuda_autograd_functions.py:~200-236)
    center = jnp.asarray([0.1, -0.2, 0.0], jnp.float64)
    xyz = XYZ_CAM
    for n_sh in (1, 4, 9, 16):
        coeffs = jnp.asarray(
            _rng.normal(size=(5, 3, n_sh)) * 0.3, jnp.float64
        )
        _check(
            lambda c, x: geo.precompute_rgb_from_sh(c, x, center),
            (coeffs, xyz),
        )


def test_safe_div_masked_lanes_grads():
    """Degenerate lanes (z == 0, zero quaternion) must give exactly zero
    gradients, not NaN — the failure mode _safe_div exists to prevent."""
    xyz = XYZ_CAM.at[2, 2].set(0.0)

    g = jax.grad(lambda x: jnp.sum(geo.project_points(x, K) ** 2))(xyz)
    assert np.isfinite(np.asarray(g)).all()
    assert np.all(np.asarray(g)[2] == 0.0)

    g = jax.grad(
        lambda x: jnp.sum(geo.compute_projection_jacobian(x, K) ** 2)
    )(xyz)
    assert np.isfinite(np.asarray(g)).all()
    assert np.all(np.asarray(g)[2] == 0.0)

    quat0 = QUAT.at[1].set(0.0)
    g = jax.grad(
        lambda q: jnp.sum(geo.compute_sigma_world(q, SCALE) ** 2)
    )(quat0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.all(np.asarray(g)[1] == 0.0)
