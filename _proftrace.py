import time, gzip, json, glob, collections, jax, numpy as np
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from gaussian_splatting_tpu import trainer as T
from gaussian_splatting_tpu.config import SplatConfig
from gaussian_splatting_tpu.structs import GaussianScene

n, cap, scap = 1_500_000, 1 << 21, 1 << 23
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
s, info = T.train_step(state, gt, K, pose, bg, **kw)
print("warm:", float(info["loss"]), flush=True)
with jax.profiler.trace("/tmp/step_trace"):
    s, info = T.train_step(s, gt, K, pose, bg, **kw)
    _ = float(info["loss"])
print("traced", flush=True)

path = sorted(glob.glob("/tmp/step_trace/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(path, "rt") as f:
    data = json.load(f)
events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
# find TPU device pids
names = {}
for e in data.get("traceEvents", []):
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name", "")
durs = collections.Counter()
for e in events:
    pname = names.get(e["pid"], "")
    if "TPU" in pname or "tpu" in pname or "/device" in pname.lower():
        durs[e["name"]] += e.get("dur", 0)
print("device pids:", {p: nm for p, nm in names.items()}, flush=True)
for nm, d in durs.most_common(30):
    print(f"{d/1e3:9.2f} ms  {nm[:110]}")
