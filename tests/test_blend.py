"""Unit tests of the masked prefix-product blend math (ops/blend.py).

The analytic chunked backward must equal JAX autodiff of the chunked forward,
and chunking must be invariant: splitting the instance stream across chunk
boundaries changes nothing (the Pallas kernels rely on this carry contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_gaussian_rasterization_tpu.config import RasterConfig
from diff_gaussian_rasterization_tpu.ops import blend

pytestmark = pytest.mark.quick

CFG = RasterConfig()


def make_data(g=12, q=7, c=3, seed=0, opac_hi=0.95):
    rng = np.random.RandomState(seed)
    return dict(
        xy=jnp.asarray(rng.uniform(0, 4, (g, 2)), jnp.float32),
        conic=jnp.asarray(
            np.stack([np.full(g, 0.5), np.full(g, 0.05), np.full(g, 0.4)], -1),
            jnp.float32),
        opac=jnp.asarray(rng.uniform(0.3, opac_hi, g), jnp.float32),
        color=jnp.asarray(rng.uniform(0, 1, (g, c)), jnp.float32),
        depth=jnp.asarray(rng.uniform(1, 3, g), jnp.float32),
        valid=jnp.asarray(rng.uniform(size=g) < 0.9),
        px=jnp.asarray(rng.uniform(0, 4, q), jnp.float32),
        py=jnp.asarray(rng.uniform(0, 4, q), jnp.float32),
        gt=jnp.asarray(rng.uniform(1, 3, q), jnp.float32),
    )


def run_fwd(d, splits):
    g = d["xy"].shape[0]
    q = d["px"].shape[0]
    carry = blend.init_carry(q, d["color"].shape[1], jnp.float32)
    us, nps = [], []
    bounds = [0] + splits + [g]
    for a, b in zip(bounds[:-1], bounds[1:]):
        sl = slice(a, b)
        carry, u, npx = blend.blend_chunk_fwd(
            carry, d["xy"][sl], d["conic"][sl], d["opac"][sl],
            d["color"][sl], d["depth"][sl], d["depth"][sl], d["valid"][sl],
            d["px"], d["py"], d["gt"], jnp.int32(a), CFG,
        )
        us.append(u)
        nps.append(npx)
    return carry, jnp.concatenate(us), jnp.concatenate(nps)


def run_bwd(d, cot, totals, splits):
    g = d["xy"].shape[0]
    q = d["px"].shape[0]
    carry = blend.init_bwd_carry(q, d["color"].shape[1], jnp.float32)
    rows_all = []
    bounds = [0] + splits + [g]
    for a, b in zip(bounds[:-1], bounds[1:]):
        sl = slice(a, b)
        carry, rows = blend.blend_chunk_bwd(
            carry, d["xy"][sl], d["conic"][sl], d["opac"][sl],
            d["color"][sl], d["depth"][sl], d["valid"][sl],
            d["px"], d["py"], d["gt"], *totals, *cot, CFG,
        )
        rows_all.append(rows)
    return [jnp.concatenate(parts) for parts in zip(*rows_all)]


@pytest.mark.parametrize("splits", [[], [5], [3, 8]])
def test_chunk_invariance_fwd(splits):
    d = make_data()
    ref, u_ref, np_ref = run_fwd(d, [])
    got, u_got, np_got = run_fwd(d, splits)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(u_ref), np.asarray(u_got),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(np_ref), np.asarray(np_got))


@pytest.mark.parametrize("splits", [[], [5], [3, 8]])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_analytic_bwd_matches_autodiff(splits, seed):
    d = make_data(seed=seed)
    q = d["px"].shape[0]
    rng = np.random.RandomState(seed + 100)
    cot = tuple(
        jnp.asarray(rng.normal(size=s), jnp.float32)
        for s in [(3, q), q, q, q, q, q]
    )  # dL_dc, dL_dd, dL_dw, dL_dvar, dL_dmed, dL_dtf

    def loss(xy, conic, opac, color, depth, dmed):
        dd = dict(d, xy=xy, conic=conic, opac=opac, color=color, depth=depth)
        g = xy.shape[0]
        carry = blend.init_carry(q, color.shape[1], jnp.float32)
        carry, _, _ = blend.blend_chunk_fwd(
            carry, xy, conic, opac, color, depth, dmed, d["valid"],
            d["px"], d["py"], d["gt"], jnp.int32(0), CFG,
        )
        vals = (carry.color, carry.depth, carry.weight,
                blend.finish_var(carry, d["gt"]),
                carry.median, carry.t_final)
        return sum(jnp.sum(c * v) for c, v in
                   zip((cot[0], cot[1], cot[2], cot[3], cot[4], cot[5]),
                       vals))

    g_auto = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(
        d["xy"], d["conic"], d["opac"], d["color"], d["depth"], d["depth"]
    )
    carry, _, _ = run_fwd(d, [])
    totals = (carry.color, carry.depth, carry.weight,
              blend.finish_var(carry, d["gt"]), carry.t_final)
    rows = run_bwd(d, cot, totals, splits)
    d_xy, d_conic, d_opac, d_color, d_depth, d_dvar, d_dmed = rows
    pairs = [
        (d_xy, g_auto[0]), (d_conic, g_auto[1]), (d_opac, g_auto[2]),
        (d_color, g_auto[3]), (d_depth + d_dvar, g_auto[4]),
        (d_dmed, g_auto[5]),
    ]
    for got, want in pairs:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_scan_mm_matches_log_doubling():
    # MXU triangular-matmul scans (cfg.scan_sum_mm / scan_prod_mm) must
    # reproduce the log-doubling scans up to summation-order /
    # transcendental rounding
    mm = CFG.replace(scan_sum_mm=True, scan_prod_mm=True)
    d = make_data(g=30, q=9, opac_hi=0.99)
    g, q = 30, 9

    def fwd_with(cfg):
        carry = blend.init_carry(q, 3, jnp.float32)
        carry, u, npx = blend.blend_chunk_fwd(
            carry, d["xy"], d["conic"], d["opac"], d["color"], d["depth"],
            d["depth"], d["valid"], d["px"], d["py"], d["gt"],
            jnp.int32(0), cfg)
        return carry, u, npx

    ca, ua, _ = fwd_with(CFG)
    cb, ub, _ = fwd_with(mm)
    for f in ("prod", "t_final", "color", "depth", "weight", "median",
              "var_d", "var_dd"):
        np.testing.assert_allclose(
            np.asarray(getattr(ca, f)), np.asarray(getattr(cb, f)),
            rtol=2e-5, atol=2e-6, err_msg=f)
    np.testing.assert_allclose(np.asarray(ua), np.asarray(ub),
                               rtol=1e-4, atol=1e-5)

    rng = np.random.RandomState(7)
    cot = tuple(jnp.asarray(rng.normal(size=s), jnp.float32)
                for s in [(3, q), q, q, q, q, q])
    totals = (ca.color, ca.depth, ca.weight,
              blend.finish_var(ca, d["gt"]), ca.t_final)

    def bwd_with(cfg):
        carry = blend.init_bwd_carry(q, 3, jnp.float32)
        _, rows = blend.blend_chunk_bwd(
            carry, d["xy"], d["conic"], d["opac"], d["color"], d["depth"],
            d["valid"], d["px"], d["py"], d["gt"], *totals, *cot, cfg)
        return rows

    for ra, rb in zip(bwd_with(CFG), bwd_with(mm)):
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                                   rtol=1e-3, atol=1e-5)


def test_telescoping_identity():
    # sum of blend weights == 1 - final transmittance (backward.cu:477
    # reconstructs T from the saved alpha map via this identity)
    d = make_data(g=30, q=9, opac_hi=0.99)
    carry, _, _ = run_fwd(d, [])
    np.testing.assert_allclose(
        np.asarray(carry.weight), 1.0 - np.asarray(carry.t_final), atol=1e-5
    )


@pytest.mark.parametrize("splits", [[], [13], [7, 20]])
def test_jvp_chunk_matches_autodiff_jvp(splits):
    """blend_chunk_fwd_jvp's analytic pose tangents (through xy and depth,
    the light variant's pose-Jacobian surface) must equal jax.jvp of
    blend_chunk_fwd — including across chunk boundaries via the carry."""
    g, q, k_t = 30, 9, 3
    d = make_data(g=g, q=q, seed=2, opac_hi=0.99)
    rng = np.random.RandomState(5)
    tan_xy = jnp.asarray(rng.normal(size=(k_t, g, 2)), jnp.float32)
    tan_d = jnp.asarray(rng.normal(size=(k_t, g)), jnp.float32)

    def run_primal(xy, depth):
        carry = blend.init_carry(q, 3, jnp.float32)
        bounds = [0] + splits + [g]
        for a, b in zip(bounds[:-1], bounds[1:]):
            sl = slice(a, b)
            carry, _, _ = blend.blend_chunk_fwd(
                carry, xy[sl], d["conic"][sl], d["opac"][sl],
                d["color"][sl], depth[sl], depth[sl], d["valid"][sl],
                d["px"], d["py"], d["gt"], jnp.int32(a), CFG,
            )
        return (carry.color, carry.depth, carry.weight, carry.median,
                carry.t_final)

    def run_jvp():
        carry = blend.init_jvp_carry(q, k_t, 3, jnp.float32)
        bounds = [0] + splits + [g]
        for a, b in zip(bounds[:-1], bounds[1:]):
            sl = slice(a, b)
            carry, _, _ = blend.blend_chunk_fwd_jvp(
                carry, d["xy"][sl], d["conic"][sl], d["opac"][sl],
                d["color"][sl], d["depth"][sl], d["depth"][sl],
                tuple(t[sl] for t in tan_xy),
                tuple(t[sl] for t in tan_d),
                d["valid"][sl], d["px"], d["py"], d["gt"], jnp.int32(a), CFG,
                tan_depth_med=tuple(t[sl] for t in tan_d),
            )
        return carry

    jc = run_jvp()
    dtf = blend.finish_t_final_tangent(jc)
    # primal parity
    p = run_primal(d["xy"], d["depth"])
    for a, b, n in zip(p, (jc.primal.color, jc.primal.depth,
                           jc.primal.weight, jc.primal.median,
                           jc.primal.t_final),
                       ("color", "depth", "weight", "median", "t_final")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=n)
    # tangent parity vs jax.jvp, per tangent direction
    for k in range(k_t):
        _, tans = jax.jvp(run_primal, (d["xy"], d["depth"]),
                          (tan_xy[k], tan_d[k]))
        got = (jc.color[k], jc.depth[k], jc.weight[k], jc.median[k], dtf[k])
        for a, b, n in zip(tans, got,
                           ("color", "depth", "weight", "median",
                            "t_final")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5, err_msg=n)
