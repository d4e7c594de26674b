import time, jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from gaussian_splatting_tpu.culling import layout_with_features, frustum_visible
from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu.losses import train_loss
from gaussian_splatting_tpu.ops.render import build_chunk_meta, pad_feature_rows, render_tiles, splat_features
from gaussian_splatting_tpu.ops.reference_impl import tiles_to_image
from gaussian_splatting_tpu.structs import Camera, GaussianScene, TileGrid

n = 1_500_000; cap = 1 << 21; scap = 1 << 23; chunk = 256
H, W = 840, 1296
rng = np.random.default_rng(0)
xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32) + np.array([0, 0, 12.0], np.float32)
rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32) / 0.2821
opacity = np.zeros((n, 1), np.float32)
scale = np.log(rng.uniform(0.005, 0.03, (n, 3))).astype(np.float32)
quat = rng.normal(size=(n, 4)).astype(np.float32)
scene = GaussianScene.create(xyz, rgb, opacity, scale, quat, capacity=cap)
params = scene.params(); alive = scene.alive
K = jnp.array([[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]], jnp.float32)
pose = jnp.eye(4, dtype=jnp.float32)
gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
bg = jnp.zeros(3, jnp.float32)
camera = Camera(K=K, width=W, height=H)
grid = TileGrid(H, W)
eps0 = jnp.zeros((), jnp.float32)

def stage(which):
    def f(e, params, pose, bg):
        xyz_cam = geo.transform_points(params["xyz"] + e, pose)
        uv = geo.project_points(xyz_cam, camera.K)
        visible = frustum_visible(xyz_cam, uv, (W, H), 0.3, 500.0, 100.0) & alive
        sw = geo.compute_sigma_world(params["quaternion"], params["scale"])
        J = geo.compute_projection_jacobian(xyz_cam, camera.K)
        conic = geo.compute_conic(sw, J, pose)
        if which == "geom":
            return conic.ravel()[0] * 0 + e + 1
        opac = jax.nn.sigmoid(params["opacity"])
        feat_g = splat_features(uv, opac, conic, params["rgb"] * geo.SH_0)
        layout, feat = layout_with_features(uv, conic, xyz_cam[:, 2], visible, feat_g, grid, 3.0, scap, chunk)
        if which == "layout":
            return feat.ravel()[0] * 0 + e + 1
        meta = build_chunk_meta(layout, grid.x_tiles)
        feat = pad_feature_rows(feat)
        img_tiles, T = render_tiles(feat, meta, bg, layout.tile_has_output,
            n_tiles=grid.tile_count, x_tiles=grid.x_tiles, chunk=chunk, interpret=False)
        if which == "render":
            return img_tiles.ravel()[0] * 0 + e + 1
        image = tiles_to_image(img_tiles, grid)
        loss, _ = train_loss(image, gt, 0.2)
        return loss * 0 + e + 1
    return f

import sys
for which in sys.argv[1:]:
    f = stage(which)
    t0 = time.time()
    c = jax.jit(f).lower(eps0, params, pose, bg).compile()
    ct = time.time() - t0
    e = c(eps0, params, pose, bg); float(e)
    t0 = time.perf_counter()
    e = eps0
    for _ in range(4):
        e = c(e, params, pose, bg)
    float(e)
    print(f"{which:10s} {(time.perf_counter()-t0)/4*1e3:9.2f} ms  compile={ct:5.1f}s", flush=True)
