"""Pallas decode-attention kernel: single-query attention over long K/V.

FUSED-LAYER DECISION (round 3, 2026-08-17, measured on v5e): the
round-1 ask — one fused Pallas kernel per decoder layer (self + cross +
MLP) to amortize invocation overhead — is NOT worth building. Evidence
from tools/bench_phases.py across the quantization rungs (large-v3,
B=16, cache 256, full 1500 cross ctx):

    bf16              4.57 GB/step  10.93 ms  (418 GB/s effective)
    int8 weights      3.74 GB/step  10.08 ms
    int8 w + cache    3.42 GB/step   8.53 ms  (401 GB/s effective)

Fitting t = fixed + bytes/BW over the rungs gives MARGINAL bandwidth
~480 GB/s (≈60% of v5e peak — realistic streaming efficiency) and a
fixed per-step component of ~1.4 ms (~13-16%): the XLA step is
essentially read-time plus a bounded fusion/launch floor. A perfect
fused-layer kernel could at best recover that ~13% floor, while every
hand-written kernel below achieved HALF of XLA's bandwidth — so the
shipped levers are the ones that cut BYTES instead: int8 rungs (249 →
295x combined, bench.py), audio_ctx (cuts the dominant 2.1 GB cross-KV
read 3-4x for streaming), and speculative verify blocks (amortize the
whole read set over K tokens — batcher.spec_step).

STATUS: EXPERIMENTAL — numerically correct (tested), not yet wired into the
decode path. Measured on v5e: the (B, T-block) grid pays per-grid-step
kernel overhead (~770 invocations per 32-layer sweep → 103 GB/s), so it
currently loses to XLA's einsum (358 GB/s bf16 / 219 GB/s-effective int8).
The planned fix is a single-(B,)-grid variant that loops layers × T-blocks
inside the kernel with hand-rolled double-buffered DMA from HBM refs
(pallas_guide.md §Double Buffering) — that removes the per-step overhead
and should reach ~700 GB/s. Kept here because the math (block-diagonal
multi-head trick, flash accumulation, in-register int8 convert) is the hard
part and is validated.

The decode step is HBM-bound and XLA's einsum path reads the cross-KV at
~360 GB/s (bf16) / ~220 GB/s effective (int8 + fused convert). This kernel
streams K/V per batch row through VMEM once, does the int8→bf16 convert in
registers, and keeps the whole QK→softmax→PV chain on-chip.

Math (per batch row, q_len = 1):
- K/V stored flat [T, H*D] (lane-perfect 1280 lanes for large-v3), int8
  with per-(layer, batch, head) scales folded into q (for K) and into the
  output (for V) by the caller — the kernel is scale-free.
- Block-diagonal trick: scores for all H heads in ONE matmul. The caller
  builds Qbd [H*D, 128] where column h holds q_h in rows h*D..(h+1)*D
  (tiny: 0.3 MB/row), then scores[t, h] = K_flat[t] · Qbd[:, h].
- softmax over T per column with a static row-validity mask (audio_ctx).
- out128 [128, H*D] = probsᵀ @ V_flat; the transposed selector collapses it
  to out_flat[j] = out128[j // D, j].

Per (row, layer): reads T·HD bytes of K and V (int8) + 0.6 MB of Qbd/out,
~1 GFLOP of (padded) MXU work — DMA-bound by design.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


@functools.lru_cache(maxsize=8)
def _selectors(n_heads: int, head_dim: int):
    """(mask [H*D, 128], maskT [128, H*D]) block-diagonal selectors."""
    hd = n_heads * head_dim
    m = np.zeros((hd, LANE), np.float32)
    for h in range(n_heads):
        m[h * head_dim:(h + 1) * head_dim, h] = 1.0
    return m, np.ascontiguousarray(m.T)


def _kernel(qbd_ref, k_ref, v_ref, maskt_ref, out_ref,
            m_scr, l_scr, acc_scr, *, t_actual: int, block_t: int):
    """Flash-style accumulation over T blocks (grid dim 1).

    qbd_ref [HD, 128]; k_ref/v_ref [block_t, HD] int8/bf16;
    scratch: m/l [8, 128] f32 (running max / normalizer per head column),
    acc [128, HD] f32; out [8, HD] (8 identical rows, strided by caller)."""
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    k = k_ref[:].astype(jnp.bfloat16)
    # Pin precision: a global jax_default_matmul_precision=highest (used by
    # CPU parity tests) makes Mosaic reject bf16 operands ("Bad lhs type").
    scores = jnp.dot(k, qbd_ref[:].astype(jnp.bfloat16),
                     precision=jax.lax.Precision.DEFAULT,
                     preferred_element_type=jnp.float32)   # [Tb, 128]
    base = t * block_t
    row_ok = (jax.lax.broadcasted_iota(jnp.int32, (block_t, LANE), 0)
              + base) < t_actual
    scores = jnp.where(row_ok, scores, -1e30)

    m_old = m_scr[0:1, :]                                  # [1, 128]
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=0, keepdims=True))
    scale_old = jnp.exp(m_old - m_new)                     # [1, 128]
    e = jnp.exp(scores - m_new)                            # [Tb, 128]
    l_new = l_scr[0:1, :] * scale_old + jnp.sum(e, axis=0, keepdims=True)

    v = v_ref[:].astype(jnp.bfloat16)
    out_blk = jax.lax.dot_general(
        e.astype(jnp.bfloat16), v,
        dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)                # [128, HD]
    scale_col = jnp.transpose(scale_old)                   # [128, 1]
    acc_scr[:] = acc_scr[:] * scale_col + out_blk
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(t == n_t - 1)
    def _():
        l_col = jnp.transpose(l_scr[0:1, :])               # [128, 1]
        final = acc_scr[:] / jnp.maximum(l_col, 1e-30)
        collapsed = jnp.sum(final * maskt_ref[:], axis=0, keepdims=True)
        out_ref[:] = jnp.broadcast_to(
            collapsed, (8, collapsed.shape[1])).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "t_actual",
                                             "interpret"))
def decode_cross_attend(q: jax.Array, k_flat: jax.Array, v_flat: jax.Array,
                        *, n_heads: int, t_actual: int | None = None,
                        interpret: bool = False) -> jax.Array:
    """q [B, H*D] (scales and 1/sqrt(D) pre-folded), k/v [B, T, H*D]
    int8/bf16 → attention output [B, H*D] bf16."""
    B, hd = q.shape
    T = k_flat.shape[1]
    head_dim = hd // n_heads
    mask, maskt = _selectors(n_heads, head_dim)
    # Largest block ≤768 that divides T (bigger blocks amortize grid-step
    # overhead: 512→768 measured 9.8→6.3 ms per 32-layer sweep).
    block_t = T
    for cand in (768, 512, 384, 256, 128):
        if T % cand == 0:
            block_t = min(T, cand)
            break
    n_t = T // block_t
    # Block-diagonal Q built in XLA (0.3 MB/row — negligible next to K/V).
    qbd = (q.astype(jnp.float32)[:, :, None]
           * jnp.asarray(mask)[None]).astype(jnp.bfloat16)  # [B, HD, 128]
    kernel = functools.partial(_kernel, t_actual=t_actual or T,
                               block_t=block_t)
    return pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec((hd, LANE), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, hd), lambda b, t: (b * n_t + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, hd), lambda b, t: (b * n_t + t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, hd), lambda b, t: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * 8, hd), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((8, LANE), jnp.float32),
            pltpu.VMEM((8, LANE), jnp.float32),
            pltpu.VMEM((LANE, hd), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(qbd.reshape(B * hd, LANE), k_flat.reshape(B * T, hd),
      v_flat.reshape(B * T, hd), jnp.asarray(maskt))[::8]
