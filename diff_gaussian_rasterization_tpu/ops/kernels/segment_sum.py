"""Deterministic per-Gaussian gradient reduction as MXU one-hot matmuls.

The reference accumulates per-Gaussian gradients with float ``atomicAdd``
from thousands of pixels (backward.cu:593-680) — nondeterministic and
unavailable on TPU.  The XLA fallback (``.at[ids].add``) lowers to a
sort + serialized scatter that costs ~14 ms at ~1M instances.  This kernel
exploits the structure the binning already guarantees: in *pre-sort*
(Gaussian-major) instance order, every Gaussian's instances form one
contiguous run ``[gauss_start[p], gauss_stop[p])`` (the inverse of
``duplicateWithKeys``'s write offsets, rasterizer_impl.cu:89-105).  So the
reduction is a segmented sum over a contiguous stream, computed as

    acc[p, :] += onehot[p, i] @ rows[i, :]

where ``onehot[p, i] = (start_p <= i < stop_p)`` — an MXU contraction per
128-instance block.  One-hot entries are exactly representable, so each
output is a clean f32 dot product: deterministic and more accurate than
atomic accumulation order.

Layout: gradient rows travel as feature-planar blocks [nb, FEAT, 128]
(matching render_pallas's DMA layout); Gaussians are processed in chunks of
``pcap`` per grid step, each scanning only the instance blocks its chunk's
runs overlap (ranges are monotone since starts/stops are sorted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
FEAT = 16


def _is_cpu():
    return jax.devices()[0].platform == "cpu"


def _kernel(blo_ref, nblk_ref, rows_hbm, start_ref, stop_ref, out_ref,
            data_scr, acc_ref, sems, *, pcap: int):
    c = pl.program_id(0)
    blo = blo_ref[c]
    n_blk = nblk_ref[c]
    st = start_ref[0]                                             # [pcap, 1]
    en = stop_ref[0]                                              # [pcap, 1]

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def read_dma(k):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(blo + k, 1)],
            data_scr.at[pl.ds(jax.lax.rem(k, 2), 1)],
            sems.at[jax.lax.rem(k, 2)],
        )

    @pl.when(n_blk > 0)
    def _():
        read_dma(0).start()

    def body(k, _):
        @pl.when(k + 1 < n_blk)
        def _():
            read_dma(k + 1).start()

        read_dma(k).wait()
        block = data_scr[jax.lax.rem(k, 2)]                       # [FEAT, B]
        ii = (blo + k) * BLOCK + jax.lax.broadcasted_iota(
            jnp.int32, (1, BLOCK), 1)                             # [1, B]
        oh = ((ii >= st) & (ii < en)).astype(block.dtype)         # [pcap, B]
        acc_ref[...] += jax.lax.dot_general(
            oh, block, (((1,), (1,)), ((), ())),
            preferred_element_type=block.dtype)                   # [pcap, F]
        return 0

    jax.lax.fori_loop(0, n_blk, body, 0)
    out_ref[0] = acc_ref[...]


def segment_sum_rows(rows, gauss_start, gauss_stop, *, pcap: int = 1024,
                     interpret=None):
    """Sum [nb*BLOCK, F] row blocks into per-Gaussian [P, F] totals.

    rows: [nb, FEAT, BLOCK] feature-planar gradient rows in pre-sort
      (Gaussian-major) instance order (HBM lane tiling requires the trailing
      DMA dimension be 128-aligned).
    gauss_start/gauss_stop: [P] int32 contiguous run per Gaussian.
    """
    if interpret is None:
        interpret = _is_cpu()
    p = gauss_start.shape[0]
    nb = rows.shape[0]
    n_chunks = -(-p // pcap)
    p_pad = n_chunks * pcap
    cap = nb * BLOCK
    st = jnp.full((p_pad,), cap, jnp.int32).at[:p].set(gauss_start)
    en = jnp.full((p_pad,), cap, jnp.int32).at[:p].set(gauss_stop)
    stc = st.reshape(n_chunks, pcap)
    enc = en.reshape(n_chunks, pcap)
    # block range each chunk's runs overlap (starts/stops are nondecreasing)
    blo = jnp.clip(stc[:, 0] // BLOCK, 0, jnp.maximum(nb - 1, 0))
    bhi = jnp.clip(-(-jnp.max(enc, axis=1) // BLOCK), blo, nb)
    nblk = jnp.where(jnp.max(enc, axis=1) > stc[:, 0], bhi - blo, 0)

    chunk_spec = pl.BlockSpec((1, pcap, 1), lambda c, *_: (c, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # rows
            chunk_spec,                              # gauss_start
            chunk_spec,                              # gauss_stop
        ],
        out_specs=pl.BlockSpec((1, pcap, FEAT), lambda c, *_: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, BLOCK), rows.dtype),
            pltpu.VMEM((pcap, FEAT), rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, pcap=pcap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks, pcap, FEAT), rows.dtype),
        interpret=interpret,
    )(blo, nblk, rows, stc.reshape(n_chunks, pcap, 1),
      enc.reshape(n_chunks, pcap, 1))
    return out.reshape(p_pad, FEAT)[:p]


def make_segmented_gather(src, inv, gauss_sorted, gauss_start, gauss_stop,
                          *, cap: int, interpret=None):
    """A two-stage ``feat[gauss_sorted][src]`` instance-feature gather whose
    VJP is the deterministic MXU segment reduction.

    Staging through the sorted order keeps every index operand a plain
    payload of the binning sort — no per-slot Gaussian-id gather on the hot
    path.  ``src`` maps aligned slots to sorted positions (padding slots
    repeat a valid position; downstream kernels mask them), ``inv`` maps
    pre-sort instances to aligned slots, ``gauss_start``/``gauss_stop`` are
    the [P] pre-sort runs.  All are constants w.r.t. differentiation (like
    the reference's saved binning buffers).
    """
    i_al = src.shape[0]

    @jax.custom_vjp
    def gather(feat):
        return feat[gauss_sorted][src]

    def fwd(feat):
        return feat[gauss_sorted][src], feat.shape

    def bwd(feat_shape, cot):                                     # [i_al, F]
        p, f = feat_shape
        cotp = jnp.concatenate(
            [cot, jnp.zeros((i_al, FEAT - f), cot.dtype)], axis=1)
        rows_u = cotp[inv]                                        # [cap, FEAT]
        blocks = jnp.transpose(
            rows_u.reshape(cap // BLOCK, BLOCK, FEAT), (0, 2, 1))
        grad = segment_sum_rows(blocks, gauss_start, gauss_stop,
                                interpret=interpret)
        return (grad[:, :f],)

    gather.defvjp(fwd, bwd)
    return gather
