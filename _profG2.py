import time, jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from gaussian_splatting_tpu.rasterize import rasterize
from gaussian_splatting_tpu.culling import build_splat_layout, frustum_visible
from gaussian_splatting_tpu import geometry as geo
from gaussian_splatting_tpu.losses import train_loss
from gaussian_splatting_tpu.ops.render import build_chunk_meta, splat_features, _render_fwd, _render_bwd
from gaussian_splatting_tpu.ops import common as cc
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

def timeit(name, f, args, iters=4):
    t0 = time.time()
    c = jax.jit(f).lower(eps0, *args).compile()
    cs = c.memory_analysis().generated_code_size_in_bytes / 1e6
    ct = time.time() - t0
    e = c(eps0, *args); float(e)
    t0 = time.perf_counter()
    e = eps0
    for _ in range(iters):
        e = c(e, *args)
    float(e)
    print(f"{name:28s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms  code={cs:6.1f}MB  compile={ct:5.1f}s", flush=True)

def geom_parts(params, pose):
    xyz_cam = geo.transform_points(params["xyz"], pose)
    uv = geo.project_points(xyz_cam, camera.K)
    visible = frustum_visible(xyz_cam, uv, (W, H), 0.3, 500.0, 100.0) & alive
    sw = geo.compute_sigma_world(params["quaternion"], params["scale"])
    J = geo.compute_projection_jacobian(xyz_cam, camera.K)
    conic = geo.compute_conic(sw, J, pose)
    return xyz_cam, uv, visible, conic

xyz_cam, uv, visible, conic = jax.jit(geom_parts)(params, pose)
lay = jax.jit(lambda uv, conic, z, vis: build_splat_layout(uv, conic, z, vis, grid, 3.0, splat_capacity=scap, chunk=chunk))(uv, conic, xyz_cam[:, 2], visible)
print("num_splats:", int(lay.num_splats), "overflow:", bool(lay.overflow), flush=True)
meta = build_chunk_meta(lay, grid.x_tiles)
op = jax.nn.sigmoid(params["opacity"])
feat_g = jnp.pad(splat_features(uv, op, conic, params["rgb"] * geo.SH_0), ((0, 0), (0, 1)))
gidx = lay.gaussian_idx
feat = jax.jit(lambda fg, gi: fg[:, gi])(feat_g, gidx)
float(feat[0, 0])

timeit("feat gather 8M", lambda e, fg, gi: (fg + e)[:, gi].ravel()[0] * 0 + e + 1, (feat_g, gidx))
timeit("pallas fwd", lambda e, feat, toc, ti: _render_fwd(feat + e, (toc, ti), n_tiles=grid.tile_count, x_tiles=grid.x_tiles, chunk=chunk, interpret=False).ravel()[0] * 0 + e + 1, (feat, meta[0], meta[1]))
def bwdk(e, feat, toc, ti):
    gi = jnp.ones((cc.OUT_ROWS, (grid.tile_count + 1) * cc.PIXELS_PER_TILE), jnp.float32) * (1 + e)
    gf = _render_bwd(feat, (toc, ti), gi, n_tiles=grid.tile_count, x_tiles=grid.x_tiles, chunk=chunk, interpret=False)
    return gf.ravel()[0] * 0 + e + 1
timeit("pallas bwd", bwdk, (feat, meta[0], meta[1]))
def scat(e, gi):
    gfeat = jnp.ones((cc.GRAD_ROWS, scap), jnp.float32) * (1 + e)
    out = jnp.zeros((cc.GRAD_ROWS, cap + 2), jnp.float32).at[:, gi].add(gfeat)
    return out.ravel()[0] * 0 + e + 1
timeit("grad scatter 8M", scat, (gidx,))
