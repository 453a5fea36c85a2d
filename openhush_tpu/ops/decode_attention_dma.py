"""Decode attention with hand-rolled double-buffered DMA (v2 kernel).

Addresses the v1 kernel's suspected grid-step overhead
(ops/decode_attention.py): grid is (B,) only; each program streams its K/V
through a 2-slot VMEM scratch with explicit `make_async_copy` prefetch
(pallas_guide.md §Double Buffering), overlapping HBM reads with the
flash-attention update. Same math as v1.

MEASURED (v5e, 32-layer int8 sweep, B=8, T=1536): 6.35 ms = identical to
v1 at block 768 — so DMA pipelining was NOT the limiter; per-block
VPU/MXU overheads (convert, exp, 128-col-padded matmuls) dominate at
~12 µs/block vs ~4 µs ideal. XLA's einsum remains the fastest path for
single-query attention on this stack; both kernels stay EXPERIMENTAL as
the starting point for a future fused decoder-layer kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openhush_tpu.ops.decode_attention import _selectors

LANE = 128


def _kernel(qbd_ref, k_hbm, v_hbm, maskt_ref, out_ref,
            kbuf, vbuf, acc_scr, sems, *, t_actual: int, block_t: int,
            n_t: int, total_t: int):
    b = pl.program_id(0)
    DEF = jax.lax.Precision.DEFAULT

    def k_dma(slot, idx):
        return pltpu.make_async_copy(
            k_hbm.at[pl.ds(b * total_t + idx * block_t, block_t), :],
            kbuf.at[slot], sems.at[0, slot])

    def v_dma(slot, idx):
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(b * total_t + idx * block_t, block_t), :],
            vbuf.at[slot], sems.at[1, slot])

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    qbd = qbd_ref[:].astype(jnp.bfloat16)

    def body(t, carry):
        m_run, l_run, acc_flag = carry
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < n_t)
        def _():
            k_dma(nxt, t + 1).start()
            v_dma(nxt, t + 1).start()

        k_dma(slot, t).wait()
        v_dma(slot, t).wait()

        k = kbuf[slot].astype(jnp.bfloat16)
        scores = jnp.dot(k, qbd, precision=DEF,
                         preferred_element_type=jnp.float32)
        base = t * block_t
        row_ok = (jax.lax.broadcasted_iota(jnp.int32, (block_t, LANE), 0)
                  + base) < t_actual
        scores = jnp.where(row_ok, scores, -1e30)

        m_new = jnp.maximum(m_run, jnp.max(scores, axis=0, keepdims=True))
        scale_old = jnp.exp(m_run - m_new)
        e = jnp.exp(scores - m_new)
        l_new = l_run * scale_old + jnp.sum(e, axis=0, keepdims=True)

        v = vbuf[slot].astype(jnp.bfloat16)
        out_blk = jax.lax.dot_general(
            e.astype(jnp.bfloat16), v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=DEF, preferred_element_type=jnp.float32)
        acc_scr[:] = acc_scr[:] * jnp.transpose(scale_old) + out_blk
        return m_new, l_new, acc_flag

    m0 = jnp.full((1, LANE), -1e30, jnp.float32)
    l0 = jnp.zeros((1, LANE), jnp.float32)
    acc_scr[:] = jnp.zeros_like(acc_scr)
    m_f, l_f, _ = jax.lax.fori_loop(0, n_t, body, (m0, l0, jnp.int32(0)))

    final = acc_scr[:] / jnp.maximum(jnp.transpose(l_f), 1e-30)
    collapsed = jnp.sum(final * maskt_ref[:], axis=0, keepdims=True)
    out_ref[:] = jnp.broadcast_to(collapsed,
                                  (8, collapsed.shape[1])
                                  ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "t_actual",
                                             "block_t"))
def decode_cross_attend_dma(q: jax.Array, k_flat: jax.Array,
                            v_flat: jax.Array, *, n_heads: int,
                            t_actual: int | None = None,
                            block_t: int = 768) -> jax.Array:
    """q [B, H*D]; k/v [B, T, H*D] int8/bf16 → [B, H*D] bf16."""
    B, hd = q.shape
    T = k_flat.shape[1]
    head_dim = hd // n_heads
    mask, maskt = _selectors(n_heads, head_dim)
    while T % block_t:
        block_t //= 2
    n_t = T // block_t
    qbd = (q.astype(jnp.float32)[:, :, None]
           * jnp.asarray(mask)[None]).astype(jnp.bfloat16)
    kernel = functools.partial(_kernel, t_actual=t_actual or T,
                               block_t=block_t, n_t=n_t, total_t=T)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((hd, LANE), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, hd), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * 8, hd), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, block_t, hd), k_flat.dtype),
            pltpu.VMEM((2, block_t, hd), v_flat.dtype),
            pltpu.VMEM((LANE, hd), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(qbd.reshape(B * hd, LANE), k_flat.reshape(B * T, hd),
      v_flat.reshape(B * T, hd), jnp.asarray(maskt))[::8]
