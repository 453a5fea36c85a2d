"""Speaker-model training recipes on synthetic voices.

Closes the "diarization that can work" gap: the embedder and the
segmentation net ship architecture-only (no pretrained weights reachable
offline), so this module *trains* them — on fully synthetic "speakers"
(distinct glottal f0 + formant-like spectral envelopes) — far enough that
clustering is demonstrably voice-discriminative and segmentation finds
speech regions/overlap. The same recipes scale to real data (LibriSpeech
mixtures) on a networked machine; docs/RUNBOOK.md has the command path.

Parity context: the reference gets this for free from pretrained ONNX
(segmentation-3.0 + wespeaker CAM++, src/diarization/mod.rs:266-299);
here trained checkpoints come from `python -m openhush_tpu.training.speaker`
or from ONNX conversion (models/onnx2jax.py) when checkpoints exist.

Everything trains through the EXACT inference functions
(diarization.embed_batch / segmentation_activities), so checkpoints are
drop-in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openhush_tpu.models.diarization import (EMB_DIM, N_MELS, SEG_K,
                                             embed_batch,
                                             init_embedder_params,
                                             init_segmentation_params,
                                             segmentation_activities)
from openhush_tpu.ops import mel as mel_ops

SR = 16000


# ---------------------------------------------------------------------------
# Synthetic voices
# ---------------------------------------------------------------------------

def synth_speaker_bank(rng: np.random.Generator, n: int) -> list[dict]:
    """n synthetic speakers: fundamental f0 (85-280 Hz) + a smooth random
    log-spectral envelope (the "vocal tract")."""
    out = []
    for _ in range(n):
        out.append({
            "f0": float(rng.uniform(85.0, 280.0)),
            "ctrl": rng.normal(0.0, 1.4, 8),    # envelope control points
            "am_hz": float(rng.uniform(2.0, 4.5)),
        })
    return out


def _envelope(ctrl: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    xs = np.linspace(0.0, 8000.0, len(ctrl))
    return np.exp(np.interp(freqs, xs, ctrl))


def synth_utterance(rng: np.random.Generator, spk: dict,
                    n_samples: int) -> np.ndarray:
    """Harmonic stack shaped by the speaker envelope, with vibrato and
    syllabic amplitude modulation + noise floor."""
    t = np.arange(n_samples) / SR
    f0 = spk["f0"] * (1.0
                      + 0.03 * np.sin(2 * np.pi * rng.uniform(4, 7) * t)
                      + 0.03 * rng.standard_normal())
    phase = 2 * np.pi * np.cumsum(f0) / SR
    kmax = max(3, int(7600.0 / spk["f0"]))
    ks = np.arange(1, kmax + 1)
    amps = _envelope(spk["ctrl"], spk["f0"] * ks) / ks
    x = (np.sin(phase[:, None] * ks[None, :]) @ amps).astype(np.float64)
    am = 0.55 + 0.45 * np.sin(2 * np.pi * spk["am_hz"] * t
                              + rng.uniform(0, 2 * np.pi))
    x = x * am + 0.01 * rng.standard_normal(n_samples)
    return (x / (np.abs(x).max() + 1e-9) * 0.3).astype(np.float32)


def _mel_batch(audio: np.ndarray, n_frames: int) -> jax.Array:
    """[B, n_frames*160] → [B, n_frames, N_MELS]."""
    fn = jax.jit(jax.vmap(
        lambda a: mel_ops.log_mel_spectrogram(
            a, n_mels=N_MELS, n_frames=n_frames).T),
        static_argnames=())
    return fn(jnp.asarray(audio))


# ---------------------------------------------------------------------------
# Embedder training (classification proxy: softmax over training speakers,
# head discarded — standard x-vector recipe)
# ---------------------------------------------------------------------------

def train_embedder(seed: int = 0, n_speakers: int = 12, steps: int = 300,
                   batch: int = 32, secs: float = 1.0, lr: float = 3e-3,
                   width: int = 128, utts_per_speaker: int = 6,
                   log_every: int = 0) -> dict:
    """Returns trained embedder params (drop-in for DiarizationEngine)."""
    rng = np.random.default_rng(seed)
    bank = synth_speaker_bank(rng, n_speakers)
    n_frames = int(secs * 100)
    n_samp = n_frames * mel_ops.HOP_LENGTH

    # Pre-synthesize a pool (synthesis dominates step time otherwise).
    pool_audio = np.stack([
        synth_utterance(rng, bank[s], n_samp)
        for s in range(n_speakers) for _ in range(utts_per_speaker)])
    pool_label = np.repeat(np.arange(n_speakers), utts_per_speaker)
    pool_mel = np.asarray(_mel_batch(pool_audio, n_frames))

    params = init_embedder_params(jax.random.PRNGKey(seed), width=width)
    head = jax.random.normal(jax.random.PRNGKey(seed + 1),
                             (EMB_DIM, n_speakers)) * EMB_DIM ** -0.5
    opt = optax.adam(lr)
    opt_state = opt.init((params, head))

    @jax.jit
    def step(ph, opt_state, mel, labels):
        def loss_fn(ph):
            p, h = ph
            logits = embed_batch(p, mel) @ h * 10.0   # scaled-cosine-ish
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(ph)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(ph, updates), opt_state, loss

    ph = (params, head)
    for i in range(steps):
        idx = rng.integers(0, len(pool_mel), batch)
        # Augment: gain + noise jitter keeps the embedder off energy cues.
        mel = jnp.asarray(pool_mel[idx]) + \
            0.1 * jax.random.normal(jax.random.PRNGKey(i), ())
        ph, opt_state, loss = step(ph, opt_state, mel,
                                   jnp.asarray(pool_label[idx]))
        if log_every and i % log_every == 0:
            print(f"embedder step {i}: loss {float(loss):.4f}")
    return ph[0]


# ---------------------------------------------------------------------------
# Segmentation training (BCE on per-frame local-speaker activity over
# synthetic 2-speaker mixtures incl. overlap)
# ---------------------------------------------------------------------------

def synth_mixture(rng: np.random.Generator, bank: list[dict],
                  secs: float = 4.0) -> tuple[np.ndarray, np.ndarray]:
    """One mixture + frame labels [T_act, SEG_K] (40 ms frames).
    Channels are order-of-appearance (pyannote local-speaker convention)."""
    n_frames = int(secs * 100)
    n_samp = n_frames * mel_ops.HOP_LENGTH
    n_act = n_frames // 4
    audio = np.zeros(n_samp, np.float32)
    labels = np.zeros((n_act, SEG_K), np.float32)
    spk_ids = rng.choice(len(bank), size=2, replace=False)
    appearance: list[int] = []
    for sid in spk_ids:
        n_int = rng.integers(1, 3)
        for _ in range(n_int):
            dur = rng.uniform(0.6, 1.8)
            start = rng.uniform(0, max(0.05, secs - dur))
            s0, s1 = int(start * SR), min(int((start + dur) * SR), n_samp)
            if s1 - s0 < SR // 5:
                continue
            seg = synth_utterance(rng, bank[sid], s1 - s0)
            fade = np.minimum(1.0, np.arange(s1 - s0) / (0.02 * SR))
            audio[s0:s1] += seg * fade * fade[::-1]
            if sid not in appearance:
                appearance.append(sid)
            ch = appearance.index(sid)
            if ch < SEG_K:
                a0, a1 = s0 // (4 * 160), max(s0 // (4 * 160) + 1,
                                              s1 // (4 * 160))
                labels[a0:min(a1, n_act), ch] = 1.0
    peak = np.abs(audio).max()
    if peak > 1e-6:
        audio *= min(1.0, 0.5 / peak)
    audio += 0.003 * rng.standard_normal(n_samp).astype(np.float32)
    return audio, labels


def train_segmentation(seed: int = 0, steps: int = 300, batch: int = 16,
                       secs: float = 4.0, lr: float = 3e-3,
                       n_speakers: int = 8, pool_size: int = 96,
                       hidden: int = 64, log_every: int = 0) -> dict:
    """Returns trained segmentation params."""
    rng = np.random.default_rng(seed)
    bank = synth_speaker_bank(rng, n_speakers)
    n_frames = int(secs * 100)

    auds, labs = zip(*(synth_mixture(rng, bank, secs)
                       for _ in range(pool_size)))
    pool_mel = np.asarray(_mel_batch(np.stack(auds), n_frames))
    pool_lab = np.stack(labs)

    params = init_segmentation_params(jax.random.PRNGKey(seed),
                                      hidden=hidden)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mel, labels):
        def loss_fn(p):
            acts = segmentation_activities(p, mel)
            acts = jnp.clip(acts, 1e-6, 1 - 1e-6)
            bce = -(labels * jnp.log(acts)
                    + (1 - labels) * jnp.log(1 - acts))
            return bce.mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        idx = rng.integers(0, pool_size, batch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(pool_mel[idx]),
                                       jnp.asarray(pool_lab[idx]))
        if log_every and i % log_every == 0:
            print(f"segmentation step {i}: loss {float(loss):.4f}")
    return params


# ---------------------------------------------------------------------------
# CLI: produce npz checkpoints for the daemon/record pipeline
# ---------------------------------------------------------------------------

def main(argv=None) -> int:
    import argparse

    from openhush_tpu.models.whisper.convert import save_npz

    p = argparse.ArgumentParser(
        description="Train speaker embedder + segmentation on synthetic "
                    "voices (or bootstrap before real-data fine-tune)")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-speakers", type=int, default=16)
    args = p.parse_args(argv)

    emb = train_embedder(seed=args.seed, n_speakers=args.n_speakers,
                         steps=args.steps, log_every=50)
    save_npz(jax.tree.map(np.asarray, emb),
             f"{args.out_dir}/speaker_embedder.npz")
    seg = train_segmentation(seed=args.seed, steps=args.steps,
                             n_speakers=args.n_speakers, log_every=50)
    save_npz(jax.tree.map(np.asarray, seg),
             f"{args.out_dir}/segmentation.npz")
    print(f"wrote {args.out_dir}/speaker_embedder.npz and "
          f"{args.out_dir}/segmentation.npz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
