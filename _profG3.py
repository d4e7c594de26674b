import time, jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from gaussian_splatting_tpu.rasterize import rasterize
from gaussian_splatting_tpu.culling import layout_with_features, frustum_visible, reduce_rows_by_gid
from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu.losses import train_loss
from gaussian_splatting_tpu.ops.render import build_chunk_meta, splat_features
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

def timeit(name, f, args=(), iters=4):
    t0 = time.time()
    c = jax.jit(f).lower(eps0, *args).compile()
    ct = time.time() - t0
    e = c(eps0, *args); float(e)
    t0 = time.perf_counter()
    e = eps0
    for _ in range(iters):
        e = c(e, *args)
    float(e)
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms  compile={ct:5.1f}s", flush=True)

def geom(params, pose):
    xyz_cam = geo.transform_points(params["xyz"], pose)
    uv = geo.project_points(xyz_cam, camera.K)
    visible = frustum_visible(xyz_cam, uv, (W, H), 0.3, 500.0, 100.0) & alive
    sw = geo.compute_sigma_world(params["quaternion"], params["scale"])
    J = geo.compute_projection_jacobian(xyz_cam, camera.K)
    conic = geo.compute_conic(sw, J, pose)
    return xyz_cam, uv, visible, conic

xyz_cam, uv, visible, conic = jax.jit(geom)(params, pose)
feat_g = splat_features(uv, jax.nn.sigmoid(params["opacity"]), conic, params["rgb"] * geo.SH_0)
feat_g = jax.block_until_ready(feat_g)

def lwf(e, uv, conic, z, vis, fg):
    lay, feat = layout_with_features(uv, conic, z + e, vis, fg, grid, 3.0, scap, chunk)
    return feat.ravel()[0] * 0 + e + 1
timeit("layout+features fwd", lwf, (uv, conic, xyz_cam[:, 2], visible, feat_g))

gidx = jax.jit(lambda uv, conic, z, vis, fg: layout_with_features(uv, conic, z, vis, fg, grid, 3.0, scap, chunk)[0].gaussian_idx)(uv, conic, xyz_cam[:, 2], visible, feat_g)
grows = jnp.zeros((9, scap), jnp.float32)
def red(e, grows, gidx):
    out = reduce_rows_by_gid(grows + e, gidx, cap)
    return out.ravel()[0] * 0 + e + 1
timeit("reduce_rows_by_gid 9x8M", red, (grows, gidx))

def full_fwd(e, params, pose, bg):
    res = rasterize({**params, "xyz": params["xyz"] + e}, alive, pose, camera,
        near_thresh=0.3, far_thresh=500.0, cull_mask_padding=100.0, mh_dist=3.0,
        background_rgb=bg, n_sh_band=0, splat_capacity=scap, chunk=chunk, interpret=False)
    return train_loss(res.image, gt, 0.2)[0] * 0 + e + 1
timeit("full fwd+loss", full_fwd, (params, pose, bg))

def grad_full(e, params, pose, bg):
    def lf(p):
        res = rasterize(p, alive, pose, camera, near_thresh=0.3, far_thresh=500.0,
            cull_mask_padding=100.0, mh_dist=3.0, background_rgb=bg, n_sh_band=0,
            splat_capacity=scap, chunk=chunk, interpret=False)
        return train_loss(res.image, gt, 0.2)[0]
    g = jax.grad(lf)({**params, "xyz": params["xyz"] + e})
    return g["xyz"].ravel()[0] * 0 + e + 1
timeit("grad full", grad_full, (params, pose, bg))
