"""Dump the bench scene's per-gaussian clipped window areas to /tmp/area.npy."""
import numpy as np
import sys; sys.path.insert(0, "/root/repo")

def main():
    import jax; jax.config.update("jax_platforms", "cpu"); import jax.numpy as jnp
    from gaussian_splatting_tpu.structs import GaussianScene, TileGrid
    from gaussian_splatting_tpu import geometry as geo
    from gaussian_splatting_tpu import culling as cu

    n = 1_500_000
    H, W = 840, 1296
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32) + np.array([0, 0, 12.0], np.float32)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32) / 0.2821
    opacity = np.zeros((n, 1), np.float32)
    scale = np.log(rng.uniform(0.005, 0.03, (n, 3))).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    scene = GaussianScene.create(xyz, rgb, opacity, scale, quat, capacity=1 << 21)
    K = jnp.array([[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]], jnp.float32)
    pose = jnp.eye(4, dtype=jnp.float32)
    params = scene.params()
    xyz_cam = np.asarray(geo.transform_points(params["xyz"], pose))
    uv_p = np.asarray(geo.project_points(jnp.asarray(xyz_cam), K))
    sigma = geo.compute_sigma_world(params["quaternion"], params["scale"])
    J = geo.compute_projection_jacobian(jnp.asarray(xyz_cam), K)
    conic = np.asarray(geo.compute_conic(sigma, J, pose))
    grid = TileGrid(H, W)
    vis = np.asarray(cu.frustum_visible(jnp.asarray(xyz_cam), jnp.asarray(uv_p), (W, H), 0.3, 500.0, 100.0)) & np.asarray(scene.alive)
    a = conic[:, 0] + 0.25; b = conic[:, 1] * 0.5; c = conic[:, 2] + 0.25
    mean = (a + c) * 0.5
    half = np.sqrt((a - c) ** 2 * 0.25 + b * b)
    r_major = 3.0 * np.sqrt(np.maximum(mean + half, 0.0))
    r_minor = 3.0 * np.sqrt(np.maximum(mean - half, 0.0))
    theta = np.where(np.abs(b) < 1e-16, np.where(a >= c, 0.0, np.pi / 2), np.arctan2(mean + half - a, b))
    ext_x = r_major * np.abs(np.cos(theta)) + r_minor * np.abs(np.sin(theta))
    ext_y = r_major * np.abs(np.sin(theta)) + r_minor * np.abs(np.cos(theta))
    lo_x = np.clip(np.floor((uv_p[:, 0] - ext_x) / 16).astype(int), 0, grid.x_tiles)
    hi_x = np.clip(np.floor((uv_p[:, 0] + ext_x) / 16).astype(int) + 1, 0, grid.x_tiles)
    lo_y = np.clip(np.floor((uv_p[:, 1] - ext_y) / 16).astype(int), 0, grid.y_tiles)
    hi_y = np.clip(np.floor((uv_p[:, 1] + ext_y) / 16).astype(int) + 1, 0, grid.y_tiles)
    area = np.where(vis, np.maximum(hi_x - lo_x, 0) * np.maximum(hi_y - lo_y, 0), 0)
    np.save("/tmp/area.npy", area)
    print("saved; visible:", int((area > 0).sum()), "total cells:", int(area.sum()))

main()
