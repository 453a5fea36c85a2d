"""Fused per-head int8 quantization kernel (TPU Pallas).

`_quantize_heads` (models/whisper/model.py) computes per-(position, head)
int8 values + fp32 scales for the cross-KV cache. The XLA lowering of
that formulation reshapes [B, T, H*Dh] → [B, T, H, Dh] with Dh = 64 on
the minor dimension — half a lane register — which forces relayout
passes: measured 1.47 ms per [16, 1500, 1280] tensor on v5e (~60 GB/s
effective), ×64 tensors = ~94 ms of the 121 ms cross-KV phase
(tools/encoder_phases.py).

This kernel does it in ONE VMEM-resident pass per [1, T_BLK, H*Dh]
block: an unrolled static loop over heads takes the abs-max of each
contiguous Dh slice (no reshape, no relayout), then writes the int8
block and a lane-padded fp32 scale block. The arithmetic is the same
fp32 max / divide / round / clip sequence: scales are bit-identical to
the XLA path, and quantized values agree everywhere except inputs that
sit EXACTLY on a .5 rounding tie, where the two lowerings' division
ULP can differ by one quantization level (~1e-4 of elements on random
data; both answers are equally valid at a tie). Asserted in
tests/test_quantize_pallas.py via interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SCALE_LANES = 128     # fp32 scale block padded to a full lane register


ROW_BLOCK = 512       # rows per grid step (multiple of the 8-sublane tile)


def _kernel(x_ref, q_ref, s_ref, *, n_head: int, head_dim: int):
    x = x_ref[0].astype(jnp.float32)              # [ROW_BLOCK, H*Dh]
    qs, ss = [], []
    inv127 = jnp.float32(1.0 / 127.0)   # explicit reciprocal-multiply so
    # the kernel and the XLA formulation round the scale identically
    # (XLA's simplifier rewrites /127 to *(1/127) only sometimes).
    for h in range(n_head):                       # static unroll
        seg = x[:, h * head_dim:(h + 1) * head_dim]
        scale = jnp.max(jnp.abs(seg), axis=-1) * inv127
        safe = jnp.maximum(scale, 1e-10)
        qs.append(jnp.clip(jnp.round(seg / safe[:, None]), -127, 127))
        ss.append(safe)
    q_ref[0] = jnp.concatenate(qs, axis=1).astype(jnp.int8)
    s = jnp.stack(ss, axis=1)                     # [T_BLK, H]
    s_ref[0] = jnp.pad(s, ((0, 0), (0, SCALE_LANES - n_head)))


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def quantize_heads_pallas(x: jax.Array, n_head: int,
                          interpret: bool = False
                          ) -> tuple[jax.Array, jax.Array]:
    """x [B, T, H*Dh] → (int8 [B, T, H*Dh], fp32 scales [B, T, H]).
    Matches models.whisper.model._quantize_heads (see module docstring
    for the exact-tie caveat). Rows are flattened and padded to ROW_BLOCK
    so the Mosaic 8-sublane tiling constraint holds for any (B, T)."""
    B, T, HD = x.shape
    head_dim = HD // n_head
    rows = B * T
    # Rows per grid step: halve from 512 while the block's VMEM footprint
    # (bf16 in + fp32 working copy + int8 out ≈ 7 bytes/elem) would blow
    # the 16 MB scoped-vmem budget — the encoder rung quantizes the
    # [*, 4d]-wide GELU output (HD = 5120 for large-v3) through the same
    # kernel that was sized for HD ≤ 1280 caches.
    row_block = ROW_BLOCK
    while row_block > 8 and row_block * HD * 7 > 12 * 2 ** 20:
        row_block //= 2
    rows_p = -(-rows // row_block) * row_block
    xr = x.reshape(rows, HD)
    if rows_p != rows:
        xr = jnp.pad(xr, ((0, rows_p - rows), (0, 0)))
    xr = xr.reshape(rows_p // row_block, row_block, HD)
    kern = functools.partial(_kernel, n_head=n_head, head_dim=head_dim)
    q, s = pl.pallas_call(
        kern,
        grid=(rows_p // row_block,),
        in_specs=[pl.BlockSpec((1, row_block, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, row_block, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_block, SCALE_LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_p // row_block, row_block, HD),
                                 jnp.int8),
            jax.ShapeDtypeStruct((rows_p // row_block, row_block,
                                  SCALE_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(xr)
    q = q.reshape(rows_p, HD)[:rows].reshape(B, T, HD)
    s = s.reshape(rows_p, SCALE_LANES)[:rows, :n_head].reshape(B, T,
                                                               n_head)
    return q, s


def quantize_ok(x: jax.Array, n_head: int) -> bool:
    """Kernel applicability: TPU backend, 3D, head-aligned, 128-lane-
    aligned rows, and a head dim the unrolled loop handles."""
    import os
    if os.environ.get("OPENHUSH_NO_QUANT_KERNEL") == "1":
        return False
    if jax.default_backend() != "tpu" or x.ndim != 3:
        return False
    # Same posture as the flash encoder (model._flash_ok): pallas_call
    # under plain GSPMD is unvalidated — multi-device processes take the
    # XLA path unless the caller runs inside shard_map.
    if jax.device_count() > 1:
        return False
    B, T, HD = x.shape
    if T < 64:      # decode-step quantize-at-write (T=1) stays on XLA
        return False
    if HD % n_head or HD % 128 or n_head > SCALE_LANES:
        return False
    return (HD // n_head) % 8 == 0
