"""Device-trace one first-order tracking step (24 iters) and print the
per-op breakdown.  Usage: python prof_track.py [outdir]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench_tracking import make_model, H, W
from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.models import lie
from diff_gaussian_rasterization_tpu.models.slam import (
    Frame, TrackingConfig, render_model, track_frame)
from prof_trace import __name__ as _  # noqa: F401


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrack"
    model = make_model()
    cfg = RasterConfig(tile_h=32, tile_w=32)
    cam = Camera(viewmatrix=jnp.eye(4, dtype=jnp.float32), tanfovx=0.82,
                 tanfovy=0.47, height=H, width=W)
    tcfg = TrackingConfig(method="adam", iters=24)

    gt = render_model(model, cam, cfg)
    frame = Frame(jax.lax.stop_gradient(gt.color),
                  jax.lax.stop_gradient(gt.depth[0]))
    xi = jnp.asarray([0.01, -0.008, 0.006, 0.004, -0.003, 0.005], jnp.float32)
    view0 = lie.apply_twist(cam.viewmatrix, xi)

    v, l, _ = track_frame(model, view0, frame, cfg, tcfg, cam)
    jax.block_until_ready(v)

    with jax.profiler.trace(outdir):
        for _i in range(2):
            v, l, _ = track_frame(model, view0, frame, cfg, tcfg, cam)
            jax.block_until_ready(v)

    import prof_trace
    import glob, gzip, json
    from collections import defaultdict
    paths = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(max(paths), "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dur = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        dur[e.get("name", "?")] += e.get("dur", 0) / 1e3
        cnt[e.get("name", "?")] += 1
    total = sum(dur.values())
    print(f"total device op time: {total:.2f} ms (2 tracked frames, "
          f"{tcfg.iters} iters each)\n")
    for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{d/2:9.3f} ms/frame x{cnt[name]//2:<5d} {name[:100]}")


if __name__ == "__main__":
    main()
