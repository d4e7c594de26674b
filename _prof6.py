import time, sys, jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from gaussian_splatting_tpu import trainer as T
from gaussian_splatting_tpu.config import SplatConfig
from gaussian_splatting_tpu.structs import GaussianScene

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
cap = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
scap = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 20
H, W = 840, 1296
config = SplatConfig(splat_capacity=scap, chunk=256)
rng = np.random.default_rng(0)
xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32) + np.array([0, 0, 12.0], np.float32)
rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32) / 0.2821
opacity = np.zeros((n, 1), np.float32)
scale = np.log(rng.uniform(0.005, 0.03, (n, 3))).astype(np.float32)
quat = rng.normal(size=(n, 4)).astype(np.float32)
scene = GaussianScene.create(xyz, rgb, opacity, scale, quat, capacity=cap)
state = T.init_train_state(scene, config)
K = jnp.array([[1100.0, 0, W / 2], [0, 1100.0, H / 2], [0, 0, 1]], jnp.float32)
pose = jnp.eye(4, dtype=jnp.float32)
gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
bg = jnp.zeros(3, jnp.float32)

kw = dict(config=config, camera_hw=(H, W), n_sh_band=0, use_background=False)
t0 = time.time()
compiled = T.train_step.lower(state, gt, K, pose, bg, **kw).compile()
m = compiled.memory_analysis()
print(f"compile: {time.time()-t0:.1f}s code={m.generated_code_size_in_bytes/1e6:.1f}MB temp={m.temp_size_in_bytes/2**30:.2f}GB", flush=True)
s, info = compiled(state, gt, K, pose, bg)
print("loss:", float(info["loss"]), "splats:", int(info["num_splats"]), "overflow:", bool(info["overflow"]), flush=True)
for iters in (2, 10):
    t0 = time.perf_counter()
    for _ in range(iters):
        s, info = compiled(s, gt, K, pose, bg)
    _ = float(info["loss"])
    print(f"train_step x{iters}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms/iter", flush=True)
