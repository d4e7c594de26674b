"""Per-gaussian projective geometry as pure, differentiable jnp functions.

The reference implements these as hand-written CUDA kernels with analytic
VJPs because torch cannot differentiate through raw CUDA
(src/projection.cu, src/projection_backward.cu, derivations in MATH.md).
JAX differentiates these closed-form ops natively, so each is a plain
vectorised function; correctness of the gradients is pinned by fp64
``jax.test_util.check_grads`` in tests/test_geometry_grads.py.

All functions take the full capacity-sized arrays and are NaN-safe for
degenerate entries (z<=0, dead slots): every division is guarded with the
double-`where` trick so masked-out lanes produce zero gradients instead of
NaNs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Real spherical-harmonics constants, bands 0..3
# (reference: src/spherical_harmonics.cuh:4-24).
SH_0 = 0.28209479177387814
R_SH_0 = 3.544907701811032  # 1 / SH_0
SH_1 = (-0.4886025119029199, 0.4886025119029199, -0.4886025119029199)
SH_2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.263875515352797,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def _safe_div(num, den, eps_ok):
    """num/den with zero (value and grad) where ``eps_ok`` is False."""
    den_safe = jnp.where(eps_ok, den, 1.0)
    return jnp.where(eps_ok, num / den_safe, 0.0)


def transform_points(xyz: jax.Array, camera_T_world: jax.Array) -> jax.Array:
    """World -> camera-frame points. (N,3), (4,4) -> (N,3).

    Reference: splat_py/utils.py:60-72 ``transform_points_torch``.
    """
    return xyz @ camera_T_world[:3, :3].T + camera_T_world[:3, 3]


def quaternion_to_rotation(q: jax.Array) -> jax.Array:
    """Normalised wxyz quaternions (N,4) -> rotation matrices (N,3,3).

    Reference: splat_py/utils.py:40-57.
    """
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack(
        [
            1 - 2 * y * y - 2 * z * z,
            2 * x * y - 2 * z * w,
            2 * z * x + 2 * w * y,
            2 * x * y + 2 * z * w,
            1 - 2 * x * x - 2 * z * z,
            2 * y * z - 2 * w * x,
            2 * z * x - 2 * w * y,
            2 * y * z + 2 * w * x,
            1 - 2 * x * x - 2 * y * y,
        ],
        axis=1,
    )
    return r.reshape(-1, 3, 3)


def project_points(xyz_camera: jax.Array, K: jax.Array) -> jax.Array:
    """Pinhole projection (N,3) -> (N,2): u = fx*x/z + cx, v = fy*y/z + cy.

    Reference: src/projection.cu:8-19 ``camera_projection_kernel``.  The
    reference divides by z unguarded (z<0 gives mirrored uv used by the
    frustum cull); we guard only z==0 to stay finite.
    """
    z = xyz_camera[:, 2]
    ok = jnp.abs(z) > 1e-12
    inv_z = _safe_div(jnp.ones_like(z), z, ok)
    u = K[0, 0] * xyz_camera[:, 0] * inv_z + K[0, 2]
    v = K[1, 1] * xyz_camera[:, 1] * inv_z + K[1, 2]
    return jnp.stack([u, v], axis=1)


def compute_sigma_world(quaternion: jax.Array, scale: jax.Array) -> jax.Array:
    """World-space covariance Sigma = R S S^T R^T, (N,4),(N,3) -> (N,3,3).

    Normalises the quaternion and exponentiates the log-scale in-op, exactly
    like the reference kernel (src/projection.cu:56-112, MATH.md:46-75).
    """
    # sqrt is guarded *inside* (not just the division): sqrt'(0) = inf, and
    # 0-cotangent * inf = NaN would leak through a zero (dead-slot) quaternion
    sumsq = jnp.sum(quaternion * quaternion, axis=1, keepdims=True)
    ok = sumsq[:, 0] > 1e-24
    norm = jnp.sqrt(jnp.where(ok[:, None], sumsq, 1.0))
    q = _safe_div(quaternion, norm, ok[:, None])
    # dead/degenerate slots fall back to identity rotation
    q = jnp.where(ok[:, None], q, jnp.array([1.0, 0, 0, 0], dtype=q.dtype))
    R = quaternion_to_rotation(q)
    s_sq = jnp.exp(2.0 * scale)  # (N,3) = diag(S S^T)
    # Sigma = R diag(s^2) R^T
    return jnp.einsum("nik,nk,njk->nij", R, s_sq, R)


def compute_projection_jacobian(xyz_camera: jax.Array, K: jax.Array) -> jax.Array:
    """Jacobian of pinhole projection wrt camera-frame xyz, (N,3) -> (N,2,3).

    J = [[fx/z, 0, -fx*x/z^2], [0, fy/z, -fy*y/z^2]]
    Reference: src/projection.cu:154-211, MATH.md:77-87.
    """
    x, y, z = xyz_camera[:, 0], xyz_camera[:, 1], xyz_camera[:, 2]
    ok = jnp.abs(z) > 1e-12
    inv_z = _safe_div(jnp.ones_like(z), z, ok)
    fx, fy = K[0, 0], K[1, 1]
    zero = jnp.zeros_like(z)
    row0 = jnp.stack([fx * inv_z, zero, -fx * x * inv_z * inv_z], axis=1)
    row1 = jnp.stack([zero, fy * inv_z, -fy * y * inv_z * inv_z], axis=1)
    return jnp.stack([row0, row1], axis=1)


def compute_conic(
    sigma_world: jax.Array, J: jax.Array, camera_T_world: jax.Array
) -> jax.Array:
    """Project 3D covariance to the 2D 'conic' vector [a, 2b, c].

    sigma_image = (J W) Sigma (J W)^T with W the rotation block of
    camera_T_world; the off-diagonals are summed into element 1 exactly like
    the reference (src/projection.cu:213-256).  No gradient flows to the
    camera pose (the reference also omits it:
    src/projection_backward.cu:461-464).
    """
    W = jax.lax.stop_gradient(camera_T_world[:3, :3])
    JW = jnp.einsum("nij,jk->nik", J, W)  # (N,2,3)
    sig = jnp.einsum("nij,njk,nlk->nil", JW, sigma_world, JW)  # (N,2,2)
    return jnp.stack(
        [sig[:, 0, 0], sig[:, 0, 1] + sig[:, 1, 0], sig[:, 1, 1]], axis=1
    )


# ---------------------------------------------------------------------------
# rows API: component-wise geometry for the training hot path
# ---------------------------------------------------------------------------
# On TPU, per-gaussian data in (N, 3) / (N, 3, 3) arrays puts the tiny
# component axis on the minor (lane) dimension: every batched einsum and
# column extraction lowers to a strided relayout loop (measured at N=2M:
# the (N,3,3) sigma einsum costs ~28 ms fwd / ~70 ms fwd+bwd, vs ~7 ms
# componentwise; a single column extraction ~1.7 ms).  The rows functions
# keep N on lanes: scalars in, tuples of (N,) rows out, every small matrix
# product unrolled.  The (N, C) functions above stay as the reference-
# parity API and test surface; equivalence is pinned in tests/test_geometry
# .py::test_rows_api_matches_reference_api.


def transform_rows(x, y, z, camera_T_world):
    """World -> camera frame, component-wise: 3x(N,), (4,4) -> 3x(N,)."""
    R = camera_T_world[:3, :3]
    t = camera_T_world[:3, 3]
    xc = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0]
    yc = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1]
    zc = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2]
    return xc, yc, zc


def project_rows(xc, yc, zc, K):
    """Pinhole projection, component-wise: 3x(N,), (3,3) -> (u, v)."""
    ok = jnp.abs(zc) > 1e-12
    inv_z = _safe_div(jnp.ones_like(zc), zc, ok)
    u = K[0, 0] * xc * inv_z + K[0, 2]
    v = K[1, 1] * yc * inv_z + K[1, 2]
    return u, v


def sigma_world_rows(quaternion: jax.Array, scale: jax.Array):
    """Sigma = R S S^T R^T as its six upper-triangular components.

    (N,4), (N,3) -> (xx, xy, xz, yy, yz, zz), each (N,).  Same quaternion
    normalisation and dead-slot guards as ``compute_sigma_world``.
    """
    qT = quaternion.T  # (4, N): one relayout instead of four column pulls
    sT = scale.T
    sumsq = qT[0] * qT[0] + qT[1] * qT[1] + qT[2] * qT[2] + qT[3] * qT[3]
    ok = sumsq > 1e-24
    inv_norm = _safe_div(
        jnp.ones_like(sumsq), jnp.sqrt(jnp.where(ok, sumsq, 1.0)), ok
    )
    # dead/degenerate slots fall back to identity rotation
    w = jnp.where(ok, qT[0] * inv_norm, 1.0)
    x = qT[1] * inv_norm
    y = qT[2] * inv_norm
    z = qT[3] * inv_norm
    r00 = 1 - 2 * y * y - 2 * z * z
    r01 = 2 * x * y - 2 * z * w
    r02 = 2 * z * x + 2 * w * y
    r10 = 2 * x * y + 2 * z * w
    r11 = 1 - 2 * x * x - 2 * z * z
    r12 = 2 * y * z - 2 * w * x
    r20 = 2 * z * x - 2 * w * y
    r21 = 2 * y * z + 2 * w * x
    r22 = 1 - 2 * x * x - 2 * y * y
    s0 = jnp.exp(2.0 * sT[0])
    s1 = jnp.exp(2.0 * sT[1])
    s2 = jnp.exp(2.0 * sT[2])
    xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return xx, xy, xz, yy, yz, zz


def conic_rows(sig6, xc, yc, zc, K, camera_T_world):
    """2D conic [a, 2b, c] from Sigma_world components, folding the
    projection Jacobian in analytically.  No gradient to the camera pose
    (reference: src/projection_backward.cu:461-464)."""
    xx, xy, xz, yy, yz, zz = sig6
    W = jax.lax.stop_gradient(camera_T_world[:3, :3])
    ok = jnp.abs(zc) > 1e-12
    inv_z = _safe_div(jnp.ones_like(zc), zc, ok)
    fx, fy = K[0, 0], K[1, 1]
    j00 = fx * inv_z
    j02 = -fx * xc * inv_z * inv_z
    j11 = fy * inv_z
    j12 = -fy * yc * inv_z * inv_z
    # M = J W  (2x3 per gaussian; W row-indexed [j, k])
    m00 = j00 * W[0, 0] + j02 * W[2, 0]
    m01 = j00 * W[0, 1] + j02 * W[2, 1]
    m02 = j00 * W[0, 2] + j02 * W[2, 2]
    m10 = j11 * W[1, 0] + j12 * W[2, 0]
    m11 = j11 * W[1, 1] + j12 * W[2, 1]
    m12 = j11 * W[1, 2] + j12 * W[2, 2]
    # t = M Sigma  (Sigma symmetric)
    t00 = m00 * xx + m01 * xy + m02 * xz
    t01 = m00 * xy + m01 * yy + m02 * yz
    t02 = m00 * xz + m01 * yz + m02 * zz
    t10 = m10 * xx + m11 * xy + m12 * xz
    t11 = m10 * xy + m11 * yy + m12 * yz
    t12 = m10 * xz + m11 * yz + m12 * zz
    c0 = t00 * m00 + t01 * m01 + t02 * m02
    # the reference sums both off-diagonals (src/projection.cu:253-256)
    c1 = (t00 * m10 + t01 * m11 + t02 * m12) + (
        t10 * m00 + t11 * m01 + t12 * m02
    )
    c2 = t10 * m10 + t11 * m11 + t12 * m12
    return c0, c1, c2


def camera_distance_rows(xc, yc, zc):
    """Euclidean camera distance per gaussian (depth renderer feature)."""
    return jnp.sqrt(xc * xc + yc * yc + zc * zc)


def sh_basis(view_dir: jax.Array, n_sh: int) -> jax.Array:
    """Evaluate the real SH basis (bands 0..3) at unit directions.

    view_dir: (..., 3) normalised.  Returns (..., n_sh) for
    n_sh in {1, 4, 9, 16}.  Reference: src/spherical_harmonics.cuh:26-75.
    """
    assert n_sh in (1, 4, 9, 16), n_sh
    shape = view_dir.shape[:-1]
    out = [jnp.full(shape, SH_0, dtype=view_dir.dtype)]
    if n_sh >= 4:
        x, y, z = view_dir[..., 0], view_dir[..., 1], view_dir[..., 2]
        out += [SH_1[0] * y, SH_1[1] * z, SH_1[2] * x]
    if n_sh >= 9:
        xx, yy, zz = x * x, y * y, z * z
        out += [
            SH_2[0] * x * y,
            SH_2[1] * y * z,
            SH_2[2] * (3 * zz - 1.0),
            SH_2[3] * x * z,
            SH_2[4] * (xx - yy),
        ]
    if n_sh >= 16:
        out += [
            SH_3[0] * y * (3 * xx - yy),
            SH_3[1] * x * y * z,
            SH_3[2] * y * (5 * zz - 1.0),
            SH_3[3] * z * (5 * zz - 3.0),
            SH_3[4] * x * (5 * zz - 1.0),
            SH_3[5] * z * (xx - yy),
            SH_3[6] * x * (xx - 3 * yy),
        ]
    return jnp.stack(out, axis=-1)


def precompute_rgb_from_sh(
    sh_coeffs: jax.Array, xyz: jax.Array, camera_center: jax.Array
) -> jax.Array:
    """Per-gaussian SH -> pseudo-RGB using the centre-to-gaussian view dir.

    sh_coeffs: (N, 3, n_sh) including the DC coefficient at index 0.
    Output is scaled by 1/SH_0 so it plugs into the DC-only rasterizer path
    unchanged (reference: src/precompute_sh.cu:7-58; the rasterizer then
    multiplies by SH_0 again, see ops/render.py).
    """
    n_sh = sh_coeffs.shape[2]
    if n_sh == 1:
        return sh_coeffs[:, :, 0]
    view = xyz - camera_center
    sumsq = jnp.sum(view * view, axis=1, keepdims=True)
    ok = sumsq[:, 0] > 1e-24  # guard sqrt(0) like compute_sigma_world
    norm = jnp.sqrt(jnp.where(ok[:, None], sumsq, 1.0))
    view = _safe_div(view, norm, ok[:, None])
    basis = sh_basis(view, n_sh)  # (N, n_sh)
    return jnp.einsum("ncs,ns->nc", sh_coeffs, basis) * R_SH_0


def compute_rays(K: jax.Array, width: int, height: int) -> jax.Array:
    """Unit rays through every pixel in the camera frame, (H, W, 3).

    Reference: splat_py/utils.py:75-109.
    """
    u = jnp.arange(width, dtype=K.dtype)
    v = jnp.arange(height, dtype=K.dtype)
    vv, uu = jnp.meshgrid(v, u, indexing="ij")
    d = jnp.stack(
        [
            (uu - K[0, 2]) / K[0, 0],
            (vv - K[1, 2]) / K[1, 1],
            jnp.ones_like(uu),
        ],
        axis=-1,
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def compute_rays_in_world_frame(
    K: jax.Array, width: int, height: int, camera_T_world: jax.Array
) -> jax.Array:
    """World-frame unit rays per pixel (reference: splat_py/utils.py:112-123)."""
    rays = compute_rays(K, width, height)
    world_R_camera = jnp.linalg.inv(camera_T_world)[:3, :3]
    rays = rays @ world_R_camera.T
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


def camera_center_from_pose(camera_T_world: jax.Array) -> jax.Array:
    """World-frame camera centre = inverse(camera_T_world)[:3, 3]."""
    R = camera_T_world[:3, :3]
    t = camera_T_world[:3, 3]
    return -R.T @ t


def inverse_sigmoid(x):
    x = jnp.clip(x, 1e-4, 1 - 1e-4)
    return jnp.log(x / (1.0 - x))
