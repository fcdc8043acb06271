"""Capture a jax.profiler device trace of one fwd+bwd render and print a
per-op time breakdown (parsed from the perfetto trace, no TensorBoard
needed).  Usage: python prof_trace.py [outdir]
"""

import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from prof import make_scene, H, W
from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.rasterize import rasterize


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    scene = make_scene()
    # matches bench.py's config of record (incl. the MXU-scan default)
    cfg = RasterConfig(tile_h=32, tile_w=32,
                       scan_sum_mm=True, scan_prod_mm=True)
    view = jnp.eye(4, dtype=jnp.float32)
    kw_full = dict(opacities=scene["opacities"], scales=scene["scales"],
                   rotations=scene["rotations"],
                   colors_precomp=scene["colors_precomp"],
                   bg=scene["bg"], gt_depth=scene["gt_depth"],
                   backend="pallas")
    probe = rasterize(scene["means3D"],
                      Camera(viewmatrix=view, tanfovx=0.82, tanfovy=0.47,
                             height=H, width=W),
                      cfg, backend="xla", max_instances=1024, **{
                          k: v for k, v in kw_full.items()
                          if k != "backend"})
    kw_full["max_instances"] = int(
        -(-int(probe.num_rendered) * 1.1 // 1024) * 1024)
    print("num_rendered", int(probe.num_rendered),
          "cap", kw_full["max_instances"], flush=True)

    def loss(means, v):
        out = rasterize(means, Camera(viewmatrix=v, tanfovx=0.82,
                                      tanfovy=0.47, height=H, width=W),
                        cfg, **kw_full)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)
                + 0.1 * jnp.sum(out.opacity_map))

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    g = grad_fn(scene["means3D"], view)
    jax.block_until_ready(g)

    with jax.profiler.trace(outdir):
        for _ in range(3):
            g = grad_fn(scene["means3D"], view)
            jax.block_until_ready(g)

    # parse the perfetto trace
    paths = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found under", outdir)
        return
    path = max(paths)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # identify device-side track pids (TPU/XLA ops lanes)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")

    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname and \
           "Device" not in pname:
            continue
        name = e.get("name", "?")
        dur_by_name[name] += e.get("dur", 0) / 1e3  # us -> ms
        cnt_by_name[name] += 1

    if not dur_by_name:
        print("no device events; process names seen:")
        for pid, n in sorted(pid_names.items()):
            print(f"  pid {pid}: {n}")
        # fall back: top-20 longest X events of any pid
        evs = [e for e in events if e.get("ph") == "X"]
        evs.sort(key=lambda e: -e.get("dur", 0))
        for e in evs[:30]:
            print(f"  {e.get('dur',0)/1e3:9.3f} ms  "
                  f"{pid_names.get(e.get('pid'),'?')}  {e.get('name','?')[:90]}")
        return

    total = sum(dur_by_name.values())
    print(f"trace: {path}\ntotal device op time: {total:.2f} ms "
          f"(3 iterations)\n")
    rows = sorted(dur_by_name.items(), key=lambda kv: -kv[1])
    for name, d in rows[:40]:
        print(f"{d/3:9.3f} ms/iter  x{cnt_by_name[name]//3:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
