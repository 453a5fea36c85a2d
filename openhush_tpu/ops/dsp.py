"""Audio DSP chain: RMS measure/normalize, compressor, limiter.

Behavioral parity with the reference's AudioBuffer DSP methods
(src/input/audio.rs:56-341): rms_db, apply_gain, normalize_rms,
compress (envelope follower, instant per-sample attack/release smoothing),
limit (brick-wall with smooth release).

TPU-first: the envelope followers are first-order IIRs, expressed with
`lax.scan` so the whole preprocessing chain jits into the device graph that
feeds the mel frontend. All functions take/return [n] float32 and are
shape-polymorphic under jit (one compile per bucketed length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_db(x: jax.Array) -> jax.Array:
    """20*log10(rms); -inf for silence. Parity: src/input/audio.rs:86-101."""
    rms = jnp.sqrt(jnp.mean(x * x))
    return jnp.where(rms > 0.0, 20.0 * jnp.log10(jnp.maximum(rms, 1e-30)),
                     -jnp.inf)


def apply_gain(x: jax.Array, gain_db) -> jax.Array:
    return x * (10.0 ** (jnp.asarray(gain_db) / 20.0))


def normalize_rms(x: jax.Array, target_db: float = -20.0) -> jax.Array:
    """Gain to reach target RMS; no-op on silence.
    Parity: src/input/audio.rs:103-119."""
    current = rms_db(x)
    gain_db = jnp.where(jnp.isfinite(current), target_db - current, 0.0)
    return apply_gain(x, gain_db)


def _follow_envelope(x_abs: jax.Array, attack_coeff, release_coeff) -> jax.Array:
    """First-order attack/release envelope follower via lax.scan."""
    def step(env, a):
        coeff = jnp.where(a > env, attack_coeff, release_coeff)
        env = coeff * env + (1.0 - coeff) * a
        return env, env
    _, env = jax.lax.scan(step, jnp.float32(0.0), x_abs)
    return env


def compress(x: jax.Array, threshold_db: float = -20.0, ratio: float = 4.0,
             attack_ms: float = 5.0, release_ms: float = 50.0,
             makeup_gain_db: float = 0.0,
             sample_rate: int = 16_000) -> jax.Array:
    """Dynamic range compression. Parity: src/input/audio.rs:131-196."""
    if ratio <= 1.0:
        return x
    threshold = 10.0 ** (threshold_db / 20.0)
    attack_coeff = jnp.exp(-1.0 / (attack_ms * sample_rate / 1000.0))
    release_coeff = jnp.exp(-1.0 / (release_ms * sample_rate / 1000.0))
    env = _follow_envelope(jnp.abs(x), attack_coeff, release_coeff)
    over_db = 20.0 * jnp.log10(jnp.maximum(env / threshold, 1e-30))
    reduction_db = over_db - over_db / ratio
    gain = jnp.where(env > threshold, 10.0 ** (-reduction_db / 20.0), 1.0)
    y = x * gain
    if makeup_gain_db != 0.0:
        y = apply_gain(y, makeup_gain_db)
    return y


def limit(x: jax.Array, ceiling_db: float = -1.0, release_ms: float = 50.0,
          sample_rate: int = 16_000) -> jax.Array:
    """Brick-wall limiter: instant attack, smooth release.
    Parity: src/input/audio.rs:198-247."""
    ceiling = 10.0 ** (ceiling_db / 20.0)
    release_coeff = jnp.exp(-1.0 / (release_ms * sample_rate / 1000.0))
    x_abs = jnp.abs(x)
    target_gain = jnp.where(x_abs > ceiling, ceiling / jnp.maximum(x_abs, 1e-30), 1.0)

    def step(g, tg):
        g = jnp.where(tg < g, tg, release_coeff * g + (1.0 - release_coeff) * tg)
        return g, g
    _, gains = jax.lax.scan(step, jnp.float32(1.0), target_gain)
    return x * gains


def preprocess_chain(x: jax.Array, *, normalize: bool = True,
                     target_db: float = -20.0, compress_enabled: bool = False,
                     threshold_db: float = -20.0, ratio: float = 4.0,
                     attack_ms: float = 5.0, release_ms: float = 50.0,
                     makeup_gain_db: float = 0.0, limiter: bool = True,
                     ceiling_db: float = -1.0, limiter_release_ms: float = 50.0,
                     sample_rate: int = 16_000) -> jax.Array:
    """The worker's per-job preprocess order: denoise → normalize → compress →
    limit (src/queue/worker.rs:196-240). Denoise (RNNoise) is applied by the
    frontend kernel; this covers the rest."""
    y = x
    if normalize:
        y = normalize_rms(y, target_db)
    if compress_enabled:
        y = compress(y, threshold_db, ratio, attack_ms, release_ms,
                     makeup_gain_db, sample_rate)
    if limiter:
        y = limit(y, ceiling_db, limiter_release_ms, sample_rate)
    return y
