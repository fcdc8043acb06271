"""Benchmark: fwd+bwd differentiable rasterizations/sec at 1200x680.

Metric of record (BASELINE.json): forward+backward rasterizations per second
per chip at 1200x680.  The reference publishes no numbers (BASELINE.md); the
baseline constant below is the commonly observed fwd+bwd rate of the
reference CUDA rasterizer class (3DGS tile rasterizer, ~100k visible
Gaussians, 1200x680) on an RTX-3090-class GPU: ~100 it/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time
import timeit

_T0 = time.time()


def _note(msg):
    # stage timestamps on stderr: the JSON line on stdout stays the only
    # stdout output, but driver-timeout forensics need to know which stage
    # (scene, instance probe, compile, timing) ate the budget
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)

sys.path.insert(0, "/root/repo")

from diff_gaussian_rasterization_tpu.utils.compile_cache import (
    enable_compile_cache,
)

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.rasterize import (
    count_instances,
    rasterize,
)

CUDA_BASELINE_FWD_BWD_PER_S = 100.0

# Overridable for validating the multi-device branch on a small virtual
# CPU mesh (e.g. DGR_BENCH_H=64 DGR_BENCH_W=128 DGR_BENCH_P=4096
# DGR_BENCH_INNER=1 XLA_FLAGS=--xla_force_host_platform_device_count=8);
# the metric of record uses the defaults.
import os
H = int(os.environ.get("DGR_BENCH_H", 680))
W = int(os.environ.get("DGR_BENCH_W", 1200))
P = int(os.environ.get("DGR_BENCH_P", 100_000))


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


def _devices_or_report():
    """Initialize the backend with a poll-retry watchdog.

    The axon relay has been observed to hang ``jax.devices()`` indefinitely
    during outages and to take minutes when slow.  Round-2 lesson: a single
    150 s probe converts "relay slow during the driver window" into a round
    with no number.  Instead, poll the (single, singleton-locked) init
    thread in 30 s windows up to DGR_INIT_BUDGET seconds (default 480 —
    most of the driver's budget), and if init raised quickly, retry with a
    fresh process up to the same budget (backend-init failure is sticky
    in-process).  On final failure emit value=null + exit nonzero so a
    consumer that ignores the error field cannot mistake an outage for a
    measured 0 renders/s.
    """
    import os
    import subprocess
    import threading

    budget = float(os.environ.get("DGR_INIT_BUDGET", 480))
    deadline = _T0 + budget
    res = {}

    def probe():
        try:
            res["d"] = jax.devices()
        except Exception as e:  # pragma: no cover - depends on env
            res["e"] = repr(e)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    while True:
        th.join(min(30.0, max(0.1, deadline - time.time())))
        if "d" in res:
            return res["d"]
        if time.time() >= deadline:
            why = res.get("e", f"device init exceeded {budget:.0f}s "
                               "(axon relay unreachable)")
            break
        if "e" in res:
            # init failed fast (not hung): in-process retry won't work
            # (backend cache is sticky) — re-probe via fresh subprocesses
            # until one succeeds, then init here (now that the relay is
            # known reachable) or run out the budget.
            _note(f"init raised {res['e']}; subprocess re-probing")
            while time.time() < deadline:
                try:
                    rc = subprocess.call(
                        [sys.executable, "-c", "import jax; jax.devices()"],
                        timeout=max(1, deadline - time.time()),
                        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
                except subprocess.TimeoutExpired:
                    rc = -1
                if rc == 0:
                    # relay back, but this process's backend-init failure is
                    # sticky — restart the bench with the remaining budget
                    _note("relay back; re-execing bench")
                    os.environ["DGR_INIT_BUDGET"] = (
                        f"{max(60.0, deadline - time.time()):.0f}")
                    sys.stdout.flush(); sys.stderr.flush()
                    os.execv(sys.executable, [sys.executable] + sys.argv)
                time.sleep(15)
            why = res["e"]
            break
        _note(f"device init still pending at +{time.time() - _T0:.0f}s "
              f"(budget {budget:.0f}s)")
    _note(f"FATAL: {why}")
    print(json.dumps({
        "metric": "fwd_bwd_rasterizations_per_sec_1200x680",
        "value": None,
        "unit": "renders/s",
        "vs_baseline": None,
        "error": why,
    }))
    sys.exit(3)


def _probe_cache_path():
    # lives beside the persistent XLA cache: both are "warm-run" state
    import os
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, "bench_probe.json")


def _cached_instance_count(key):
    try:
        with open(_probe_cache_path()) as f:
            return json.load(f).get(key)
    except Exception:
        return None


def _store_instance_count(key, n):
    path = _probe_cache_path()
    try:
        with open(path) as f:
            data = json.load(f)
    except Exception:
        data = {}
    data[key] = int(n)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f)
    os.replace(tmp, path)


def main():
    stages = {}
    _t_stage = time.time()

    def _stage(name):
        nonlocal _t_stage
        now = time.time()
        stages[name] = round(now - _t_stage, 1)
        _t_stage = now

    platform = _devices_or_report()[0].platform
    backend = "pallas" if platform in ("tpu", "axon") else "xla"
    _note(f"devices ready: platform={platform} backend={backend}")
    _stage("init_s")
    # MXU triangular-matmul prefix scans: A/B'd on the v5e chip (round 3,
    # chip_session.log stage 3): baseline 24.6 ms -> 22.7 ms with both flags
    # (each also wins alone: sum +1.42 ms, prod +1.59 ms).  The blend's
    # cumsum/cumprod ride the otherwise-idle MXU instead of log-doubling on
    # the VPU.
    def _opt_bool(name):
        v = os.environ.get(name, "")
        return None if v == "" else v == "1"

    _bc = os.environ.get("DGR_BWD_CHUNK", "")
    cfg = RasterConfig(tile_h=32, tile_w=32,
                       scan_sum_mm=True, scan_prod_mm=True,
                       bin_row_gather=os.environ.get(
                           "DGR_BIN_ROW_GATHER", "0") == "1",
                       # backward-kernel A/B knobs (round-5 campaign)
                       bwd_scan_sum_mm=_opt_bool("DGR_BWD_SCAN_SUM_MM"),
                       bwd_scan_prod_mm=_opt_bool("DGR_BWD_SCAN_PROD_MM"),
                       bwd_chunk=int(_bc) if _bc else None)
    scene = make_scene()
    kw = {k: v for k, v in scene.items() if k != "means3D"}
    view = jnp.eye(4, dtype=jnp.float32)
    cam = lambda v: Camera(viewmatrix=v, tanfovx=0.82, tanfovy=0.47,
                           height=H, width=W)

    # scale across whatever chips exist: tile-sharded rendering with
    # SHARDED BINNING over a mesh — each chip bins only its tile-row band
    # (this environment has one chip; the path is equivalence-tested on a
    # virtual 8-device mesh in tests/test_sharding.py, and this branch is
    # exercised there via DGR_BENCH_* overrides)
    n_dev = len(jax.devices())
    if n_dev > 1:
        from diff_gaussian_rasterization_tpu.parallel.mesh import make_mesh
        kw["mesh"] = make_mesh(shape=(n_dev,), axis_names=("tile",))
        kw["shard_binning"] = os.environ.get("DGR_SHARD_BINNING",
                                             "1") == "1"

    # preflight: size the static instance budget from the true count.
    # count_instances compiles only the preprocess (seconds), not a full
    # render graph — but even that probe has been observed to take >20 min
    # through a stalled relay (BENCH_r03: 1364.9 s between "probing" and
    # "compiling").  The count is a pure function of (scene seed, P, H, W,
    # cfg), so persist it beside the XLA cache and skip the probe warm.
    probe_key = f"P{P}_H{H}_W{W}_seed0_tile{cfg.tile_h}x{cfg.tile_w}"
    n_inst = _cached_instance_count(probe_key)
    if n_inst is None:
        _note("scene built; probing instance count")
        n_inst = int(count_instances(
            scene["means3D"], cam(view), cfg,
            opacities=kw["opacities"], scales=kw["scales"],
            rotations=kw["rotations"], colors_precomp=kw["colors_precomp"]))
        _store_instance_count(probe_key, n_inst)
    else:
        _note(f"scene built; probe cache hit ({n_inst} instances)")
    max_instances = int(-(-n_inst * 1.1 // 1024) * 1024)
    kw["max_instances"] = max_instances
    _stage("probe_s")
    _note(f"instances={n_inst} budget={max_instances}; compiling step graph")

    def loss(means, v):
        out = rasterize(means, cam(v), cfg, backend=backend, **kw)
        return (jnp.sum(out.color) + 0.3 * jnp.sum(out.depth)
                + 0.1 * jnp.sum(out.depth_median)
                + 0.1 * jnp.sum(out.opacity_map))

    # The single TPU chip in this environment sits behind a relay with
    # ~16-30 ms per-execution round-trip latency; a production SLAM loop
    # keeps the device busy with a stream of steps, so throughput is
    # measured by chaining INNER fwd+bwd steps inside one executable and
    # dividing.  Measured (2026-08-19): INNER=10 -> 22.88 ms/step,
    # INNER=30 -> 21.82 ms/step (dispatch ~16 ms amortized 3x better);
    # device-trace op time is 19.97 ms, so residual overhead is ~1 ms.
    INNER = int(os.environ.get("DGR_BENCH_INNER", 30))
    grad_fn = jax.grad(loss, argnums=(0, 1))

    def many(means, v):
        def body(carry, _):
            m, vv = carry
            gm, gv = grad_fn(m, vv)
            # data dependency between iterations (prevents CSE/DCE) without
            # materially changing the values
            return (m + 1e-30 * gm, vv + 1e-30 * gv), None
        (m, vv), _ = jax.lax.scan(body, (means, v), None, length=INNER)
        return m, vv

    # budget is 1.1x the true count by construction, so no overflow check
    # render is needed; one compile (the scanned grad step) is the whole
    # preflight, and the persistent cache makes it warm across processes.
    step = jax.jit(many)
    g = step(scene["means3D"], view)
    jax.block_until_ready(g)
    _stage("compile_s")
    _note("step graph compiled + first run done; timing")

    run = lambda: jax.block_until_ready(step(scene["means3D"], view)[0])
    run()
    n = 3
    t = timeit.timeit(run, number=n) / n / INNER
    _stage("measure_s")
    value = 1.0 / t
    print(json.dumps({
        "metric": "fwd_bwd_rasterizations_per_sec_1200x680",
        "value": round(value, 3),
        "unit": "renders/s",
        "vs_baseline": round(value / CUDA_BASELINE_FWD_BWD_PER_S, 3),
        "backend": backend,
        "platform": platform,
        "gaussians": P,
        "ms_per_fwd_bwd": round(t * 1e3, 3),
        "devices": len(jax.devices()),
        "stages": stages,
    }))


if __name__ == "__main__":
    main()
