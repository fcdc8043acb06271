"""Scaling-efficiency report from the virtual device mesh.

The north star (BASELINE.json) asks for scaling efficiency reported at
1 chip / 1 host / N hosts.  Real multi-chip hardware is not reachable in
this environment, so this harness makes the scaling claim *falsifiable*
instead of asserted: for each device count it compiles the tile-sharded
fwd+bwd render step on a virtual CPU mesh (identical shardings and
collectives to the TPU path — XLA inserts the same all-reduce /
all-gather ops), then reports

  - per-step collective traffic (bytes by op kind, from the optimized HLO)
  - instances and tiles per shard
  - a projected N-chip renders/s from the measured single-chip stage
    split (Pallas kernels shard with the tile axis; binning/gather glue
    is replicated in the current design) and a ring-all-reduce ICI model.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python prof_scale.py
Emits one JSON line per device count plus a summary table on stderr.
"""

import json
import re
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.rasterize import rasterize
from diff_gaussian_rasterization_tpu.parallel.mesh import make_mesh

# Small shapes: the comm volume scales linearly with the instance budget
# and tile count, so the HLO collective inventory at test scale maps to
# bench scale by the ratio of budgets (reported below as both raw and
# bench-scaled bytes).
H, W, P = 128, 256, 8192
CAP = 16384
BENCH_CAP = 258048          # round-3/4 bench instance budget (1200x680/100k)
BENCH_TILES = 836

# Measured single-chip stage split at the bench point (19.49 ms/step,
# round-4 fused sort-domain path, chip trace 2026-08-19): Pallas fwd
# 3.99 + bwd 6.73 + MXU segment-sum 1.52 = 12.24 ms rides the
# tile/instance shards; the remaining sort/gather/pack glue + dispatch
# (~7.25 ms) is replicated in the current design (every chip re-bins
# the full frame).
T_TILE_MS = 12.24
T_REPL_MS = 19.49 - T_TILE_MS
# v5e ICI: ~4 links x ~50 GB/s usable per direction; ring all-reduce
# moves 2*(N-1)/N * bytes per chip.  100 GB/s effective per chip is the
# model assumption (documented, falsifiable on real hardware).
ICI_GBPS = 100.0

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
                "bf16": 2, "s8": 1, "u8": 1, "f64": 8, "s64": 8}


def collective_bytes(hlo_text):
    """Sum output bytes of collective ops in optimized HLO, by kind."""
    out = {}
    pat = re.compile(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"(?:-start)?[.\w]*\s*=\s*(\([^)]*\)|\S+)\s")
    for m in pat.finditer(hlo_text):
        kind, shapes = m.group(1), m.group(2)
        total = 0
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
        if total:
            out[kind] = out.get(kind, 0) + total
            out[kind + "_count"] = out.get(kind + "_count", 0) + 1
    return out


def make_scene(seed=0):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-2, 2, (P, 3))
    means[:, 2] = rng.uniform(0.8, 6.0, P)
    quats = rng.normal(size=(P, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return dict(
        means3D=jnp.asarray(means, jnp.float32),
        scales=jnp.asarray(np.exp(rng.uniform(np.log(0.01), np.log(0.05),
                                              (P, 3))), jnp.float32),
        rotations=jnp.asarray(quats, jnp.float32),
        opacities=jnp.asarray(rng.uniform(0.2, 0.95, (P, 1)), jnp.float32),
        colors_precomp=jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32),
        bg=jnp.zeros(3, jnp.float32),
        gt_depth=jnp.asarray(rng.uniform(0.8, 6, (H, W)), jnp.float32),
    )


def main():
    n_avail = len(jax.devices())
    scene = make_scene()
    cfg = RasterConfig(tile_h=16, tile_w=16)
    view = jnp.eye(4, dtype=jnp.float32)
    cam = Camera(viewmatrix=view, tanfovx=0.82, tanfovy=0.47,
                 height=H, width=W)
    tiles = (H // 16) * (W // 16)

    rows = []
    for n in (1, 2, 4, 8):
        if n > n_avail:
            break
        kw = dict(opacities=scene["opacities"], scales=scene["scales"],
                  rotations=scene["rotations"],
                  colors_precomp=scene["colors_precomp"],
                  bg=scene["bg"], gt_depth=scene["gt_depth"],
                  backend="xla", max_instances=CAP)
        if n > 1:
            kw["mesh"] = make_mesh(shape=(n,), axis_names=("tile",),
                                   devices=jax.devices()[:n])

        def loss(means, v):
            out = rasterize(means, Camera(
                viewmatrix=v, tanfovx=0.82, tanfovy=0.47,
                height=H, width=W), cfg, **kw)
            return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                    + 0.1 * jnp.sum(out.opacity_map))

        grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
        hlo = grad_fn.lower(scene["means3D"], view).compile().as_text()
        # execute once: the collectives must actually run, not just compile
        g = grad_fn(scene["means3D"], view)
        jax.block_until_ready(g)

        comm = collective_bytes(hlo)
        raw = sum(v for k, v in comm.items() if not k.endswith("_count"))
        # comm volume is dominated by per-instance gradient-row psums and
        # scales with the instance budget; scale to the bench point
        bench_bytes = raw * (BENCH_CAP / CAP)
        # ring all-reduce: each chip moves 2*(N-1)/N of the payload
        comm_ms = (2 * (n - 1) / max(n, 1) * bench_bytes
                   / (ICI_GBPS * 1e9) * 1e3) if n > 1 else 0.0
        t_n = T_TILE_MS / n + T_REPL_MS + comm_ms
        renders = 1e3 / t_n
        eff = (renders / (1e3 / (T_TILE_MS + T_REPL_MS))) / n
        row = {
            "metric": "scaling_projection",
            "devices": n,
            "tiles_per_shard": -(-tiles // n),
            "instances_total": CAP,
            "collectives": comm,
            "comm_bytes_per_step": raw,
            "comm_bytes_bench_scale": int(bench_bytes),
            "model": {"t_tile_ms": T_TILE_MS, "t_repl_ms": T_REPL_MS,
                      "ici_gbps": ICI_GBPS, "comm_ms": round(comm_ms, 3)},
            "projected_ms_per_render": round(t_n, 2),
            "projected_renders_per_s": round(renders, 1),
            "parallel_efficiency": round(eff, 3),
        }
        rows.append(row)
        print(json.dumps(row))

    print("\ndevices  comm(MB/step)  proj ms  proj renders/s  efficiency",
          file=sys.stderr)
    for r in rows:
        print(f"{r['devices']:7d}  "
              f"{r['comm_bytes_bench_scale'] / 1e6:12.1f}  "
              f"{r['projected_ms_per_render']:7.2f}  "
              f"{r['projected_renders_per_s']:14.1f}  "
              f"{r['parallel_efficiency']:10.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()
