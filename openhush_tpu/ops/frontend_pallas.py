"""Fused Pallas audio-frontend kernel: framing → windowed real-DFT → power →
mel projection → log, in one VMEM-resident pass.

This is the TPU-native replacement for whisper.cpp's mel stage plus the
reference's host DSP hand-off (north star: frontend fused into a single
kernel streaming host audio → HBM features).

Design notes
- Framing without gathers: with hop=160 and a 480-sample frame span
  (n_fft=400 zero-padded into the DFT bases), frames r ≡ f (mod 3) start at
  f*160 + q*480 — i.e. each of the 3 "families" is a *contiguous reshape* of
  the audio shifted by f*160. The wrapper builds [3*q, 480] family-major
  frames with two XLA reshapes (fused into one copy), the kernel is then a
  pure blocked matmul chain, and a final transpose interleaves families back
  into time order. No unaligned sublane slicing anywhere (Mosaic requires
  dim-0 offsets ≡ 0 mod 8).
- The DFT is two MXU matmuls ([BLOCK,480] @ [480,256]) + one mel projection
  ([BLOCK,256] @ [256,n_mels]); 201 rfft bins pad to 256 lanes with zero
  filter rows. Precision HIGHEST: low mel bins suffer catastrophic
  cancellation at MXU-default bf16.
- Whisper's global `max(log)-8` clamp needs a full-spectrogram reduction, so
  the kernel emits log10 mel energies and a 3-op XLA epilogue normalizes.

Parity: golden-tested against ops/mel.py (itself golden vs transformers'
WhisperFeatureExtractor).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openhush_tpu.ops import mel as mel_ref

BLOCK = 512          # frame rows per grid step
N_FREQ_PAD = 256     # 201 rfft bins padded to 2 lane widths
FRAME_SPAN = 480     # 3 hop lengths per frame (covers n_fft=400)
HOP = mel_ref.HOP_LENGTH


@functools.lru_cache(maxsize=4)
def _padded_bases(n_mels: int):
    """(cos [480, 256], sin [480, 256], fb [256, n_mels]) fp32, zero-padded."""
    cos_b, sin_b = mel_ref._dft_bases()          # [400, 201]
    fb = mel_ref.mel_filter_bank(n_mels)         # [201, n_mels]
    cos_p = np.zeros((FRAME_SPAN, N_FREQ_PAD), np.float32)
    sin_p = np.zeros((FRAME_SPAN, N_FREQ_PAD), np.float32)
    cos_p[:400, :201] = cos_b
    sin_p[:400, :201] = sin_b
    fb_p = np.zeros((N_FREQ_PAD, n_mels), np.float32)
    fb_p[:201] = fb
    return cos_p, sin_p, fb_p


def _frontend_kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref):
    """frames_ref block [BLOCK, 480] → out block [BLOCK, n_mels]."""
    hi = jax.lax.Precision.HIGHEST
    frames = frames_ref[:]
    re = jnp.dot(frames, cos_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], precision=hi,
                 preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], precision=hi,
                  preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


def _use_interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu",)


@functools.partial(jax.jit, static_argnames=("n_mels", "n_frames",
                                             "interpret"))
def log_mel_pallas(audio: jax.Array, n_mels: int = 80,
                   n_frames: int = mel_ref.N_FRAMES,
                   interpret: bool = False) -> jax.Array:
    """Whisper log-mel via the fused kernel. audio: [n_frames*160] fp32 at
    16 kHz. Returns [n_mels, n_frames], identical scale to
    mel_ref.log_mel_spectrogram."""
    pad = mel_ref.N_FFT // 2
    # q_pad: family rows rounded to a BLOCK multiple, so total rows 3*q_pad
    # are always divisible by BLOCK.
    q_pad = pl.cdiv(pl.cdiv(n_frames, 3), BLOCK) * BLOCK
    total = 2 * HOP + q_pad * FRAME_SPAN   # worst family needs f*160+q*480
    padded = jnp.pad(audio.astype(jnp.float32), (pad, pad), mode="reflect")
    padded = jnp.pad(padded, (0, max(0, total - padded.shape[0])))
    fams = jnp.stack([
        jax.lax.dynamic_slice(padded, (f * HOP,),
                              (q_pad * FRAME_SPAN,)).reshape(q_pad,
                                                             FRAME_SPAN)
        for f in range(3)])                       # [3, q_pad, 480]
    frames = fams.reshape(3 * q_pad, FRAME_SPAN)  # family-major rows

    n_rows = 3 * q_pad
    cos_p, sin_p, fb_p = _padded_bases(n_mels)
    log_mel = pl.pallas_call(
        _frontend_kernel,
        grid=(n_rows // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK, FRAME_SPAN), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_mels), jnp.float32),
        interpret=interpret,
    )(frames, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(fb_p))

    # Interleave families back to time order: frame 3q+f = fam[f, q].
    log_mel = (log_mel.reshape(3, q_pad, n_mels)
               .transpose(1, 0, 2).reshape(3 * q_pad, n_mels)[:n_frames])
    # Whisper's global dynamic-range clamp + scale (tiny; XLA fuses it).
    log_mel = jnp.maximum(log_mel, jnp.max(log_mel) - 8.0)
    return ((log_mel + 4.0) / 4.0).T


def log_mel(audio: jax.Array, n_mels: int = 80,
            n_frames: int = mel_ref.N_FRAMES) -> jax.Array:
    """Dispatch: fused Pallas kernel on TPU, interpreter elsewhere (tests)."""
    return log_mel_pallas(audio, n_mels, n_frames,
                          interpret=_use_interpret())
