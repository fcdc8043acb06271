"""Micro-profile of binning sub-stages on the live chip.

Measures *prefix pipelines* (preprocess, +expand, +sort, +ranges, +align,
+gathers) with a carry data-dependence so XLA cannot hoist work out of the
timing loop; stage costs are the successive differences.
"""

import sys
import timeit

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from diff_gaussian_rasterization_tpu.camera import Camera
from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops.binning import INSTANCE_ALIGN, aligned_size
from diff_gaussian_rasterization_tpu.ops.projection import preprocess
from diff_gaussian_rasterization_tpu.ops.tiling import grid_dims

H, W = 680, 1200
P = 100_000
INNER = 8
CAP = 675840


def chain(name, f, means):
    def many(m):
        def body(c, _):
            out = f(c)
            leaves = [l for l in jax.tree_util.tree_leaves(out)]
            s = sum(jnp.sum(l).astype(jnp.float32) * 1e-30 for l in leaves)
            return c + s, None
        r, _ = jax.lax.scan(body, m, None, length=INNER)
        return r

    jf = jax.jit(many)
    jax.block_until_ready(jf(means))
    run = lambda: jax.block_until_ready(jf(means))
    run()
    t = timeit.timeit(run, number=3) / 3 / INNER
    print(f"{name:34s} {t*1e3:8.2f} ms")
    return t


def main():
    rng = np.random.RandomState(0)
    means = rng.uniform(-2, 2, (P, 3))
    means[:, 2] = rng.uniform(0.8, 6.0, P)
    quats = rng.normal(size=(P, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    cfg = RasterConfig(tile_h=32, tile_w=32)
    cam = Camera(viewmatrix=jnp.eye(4, dtype=jnp.float32), tanfovx=0.82,
                 tanfovy=0.47, height=H, width=W)
    tiles_x, tiles_y = grid_dims(H, W, cfg.tile_h, cfg.tile_w)
    num_tiles = tiles_x * tiles_y

    args = dict(opacities=jnp.asarray(rng.uniform(0.2, 0.95, (P, 1)),
                                      jnp.float32),
                scales=jnp.asarray(np.exp(rng.uniform(np.log(0.01),
                                                      np.log(0.05), (P, 3))),
                                   jnp.float32),
                rotations=jnp.asarray(quats, jnp.float32),
                colors_precomp=jnp.asarray(rng.uniform(0, 1, (P, 3)),
                                           jnp.float32))
    means_j = jnp.asarray(means, jnp.float32)
    i = jnp.arange(CAP, dtype=jnp.int32)
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    def s1(m):
        return preprocess(m, cam, cfg, **args)

    def s2(m):
        prep = s1(m)
        tt = prep.tiles_touched.astype(jnp.int32)
        ends = jnp.cumsum(tt)
        starts = ends - tt
        g = jnp.searchsorted(ends, i, side="right").astype(jnp.int32)
        valid = i < jnp.minimum(ends[-1], CAP)
        g = jnp.clip(g, 0, P - 1)
        local = i - starts[g]
        rect_w = jnp.maximum(
            (prep.rect_max[:, 0] - prep.rect_min[:, 0])[g], 1)
        dy = local // rect_w
        dx = local - dy * rect_w
        tx = prep.rect_min[g, 0] + dx
        ty = prep.rect_min[g, 1] + dy
        tile = jnp.where(valid, ty * tiles_x + tx, num_tiles)
        return prep, g, tile, valid

    def s3(m):
        prep, g, tile, valid = s2(m)
        depth = jax.lax.stop_gradient(prep.depth)[g]
        tile_s, _, g_s, valid_s = jax.lax.sort((tile, depth, g, valid),
                                               num_keys=2, is_stable=True)
        return prep, tile_s, g_s, valid_s

    def s3b(m):
        prep, g, tile, valid = s2(m)
        depth = jax.lax.stop_gradient(prep.depth)[g]
        dq = jnp.minimum((depth * (float(1 << 22) / 10.0)).astype(jnp.uint32),
                         (1 << 22) - 1)
        key = (tile.astype(jnp.uint32) << 22) | dq
        key_s, g_s = jax.lax.sort((key, g), num_keys=1, is_stable=True)
        tile_s = (key_s >> 22).astype(jnp.int32)
        return prep, tile_s, g_s

    def s4(m):
        prep, tile_s, g_s, valid_s = s3(m)
        tile_start = jnp.searchsorted(tile_s, t_ids, side="left").astype(jnp.int32)
        tile_stop = jnp.searchsorted(tile_s, t_ids, side="right").astype(jnp.int32)
        return prep, tile_s, g_s, valid_s, tile_start, tile_stop

    def s5(m):
        prep, tile_s, g_s, valid_s, tile_start, tile_stop = s4(m)
        counts = tile_stop - tile_start
        padded = -(-counts // INSTANCE_ALIGN) * INSTANCE_ALIGN
        astart = (jnp.cumsum(padded) - padded).astype(jnp.int32)
        i_al = aligned_size(CAP, num_tiles, INSTANCE_ALIGN)
        tclip = jnp.clip(tile_s, 0, num_tiles - 1)
        rank = i - tile_start[tclip]
        ok = valid_s & (tile_s < num_tiles)
        newpos = jnp.where(ok, astart[tclip] + rank, i_al)
        g_al = jnp.zeros((i_al,), jnp.int32).at[newpos].set(g_s, mode="drop")
        return prep, g_al, astart, astart + counts

    def s6(m):
        prep, g_al, ts, tp = s5(m)
        ids = g_al
        return (prep.xy[ids], prep.conic[ids], prep.opacity[ids],
                prep.color[ids], prep.depth[ids], prep.depth_sgview[ids],
                ts, tp)

    def s6b(m):
        prep, g_al, ts, tp = s5(m)
        feat = jnp.concatenate(
            [prep.xy, prep.conic, prep.opacity[:, None], prep.color,
             prep.depth[:, None], prep.depth_sgview[:, None],
             jnp.zeros((P, 5), jnp.float32)], axis=1)
        f = feat[g_al]
        packed = jnp.transpose(f.reshape(-1, 128, 16), (0, 2, 1))
        return packed, ts, tp

    chain("s1 preprocess", s1, means_j)
    chain("s2 +expand", s2, means_j)
    chain("s3 +sort(2key)", s3, means_j)
    chain("s3b +sort(packed u32)", s3b, means_j)
    chain("s4 +ranges", s4, means_j)
    chain("s5 +align scatter x1", s5, means_j)
    chain("s6 +gathers x6", s6, means_j)
    chain("s6b +fused gather/pack", s6b, means_j)


if __name__ == "__main__":
    main()
