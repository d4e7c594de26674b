#!/usr/bin/env python
"""Device-trace one train step at bench scale and print the per-op cost
breakdown (sorted, aggregated by op name).

Uses bench.build_workload so the traced scene is EXACTLY the bench.py
workload (trained-scene bootstrap when bench_scene_sample.npz exists).
"""
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import gaussian_splatting_tpu.trainer as T
    from bench import build_workload

    H, W = 840, 1296
    scene, K, pose, gt, config = build_workload(H=H, W=W)
    bg = jnp.zeros(3, jnp.float32)
    state = T.init_train_state(scene, config)

    def step(state):
        return T.train_step(
            state, gt, K, pose, bg, config=config, camera_hw=(H, W),
            n_sh_band=0, use_background=False,
        )

    state, info = step(state)
    float(info["loss"])

    tracedir = "/tmp/trace_step"
    import shutil

    shutil.rmtree(tracedir, ignore_errors=True)
    with jax.profiler.trace(tracedir):
        for _ in range(3):
            state, info = step(state)
        float(info["loss"])

    # parse the trace proto events
    files = glob.glob(f"{tracedir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace json found; files:",
              glob.glob(f"{tracedir}/**/*", recursive=True))
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = [
        e for e in trace.get("traceEvents", [])
        if e.get("ph") == "X" and "dur" in e
    ]
    agg = {}
    for e in events:
        name = e.get("name", "?")
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += e["dur"] / 1e3  # us -> ms
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    total = sum(v[1] for _, v in rows)
    print(f"total traced op time: {total:.1f} ms over 3 steps")
    print("      total  per-step")
    shown = 0.0
    for name, (cnt, ms) in rows[:90]:
        # NOTE: ms is the summed duration across ALL occurrences; per-step
        # is total/3 regardless of cnt (an op appearing once in the trace
        # ran once across the 3 steps, NOT once per step)
        print(f"{ms:9.2f}  {ms/3:9.2f} ms  x{cnt:3d}  {name[:100]}")
        shown += ms
    rest = total - shown
    print(f"rest (below top-90): {rest:.2f} total, {rest/3:.2f}/step over "
          f"{max(len(rows)-90, 0)} distinct names")


if __name__ == "__main__":
    main()
