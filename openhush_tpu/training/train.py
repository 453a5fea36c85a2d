"""Fine-tuning step for Whisper models, sharded over the (data, model) mesh.

The reference is inference-only; this extends the rebuild with training
capability (the "training step" surface the multi-chip dry-run validates):
teacher-forced cross-entropy over decoder tokens, AdamW via optax, dp over
batch + tp over heads/MLP from parallel/sharding.py. Gradients sync with
XLA-inserted collectives (psum over 'data' for dp grads, 'model' for
row-parallel partials) — no hand-written NCCL analogue.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from openhush_tpu.models.whisper import model as whisper
from openhush_tpu.models.whisper.config import WhisperConfig

IGNORE_ID = -100


def loss_fn(cfg: WhisperConfig, params, mel, tokens, targets):
    """Cross-entropy; targets==IGNORE_ID masked out. Shapes:
    mel [B, n_mels, F], tokens [B, S], targets [B, S]."""
    logits = whisper.forward(cfg, params, mel, tokens)  # [B, S, Vp] fp32
    valid = targets != IGNORE_ID
    safe_targets = jnp.where(valid, targets, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_targets[..., None],
                               axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(valid.sum(), 1)
    return nll.sum() / denom


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01,
                   warmup_steps: int = 100, total_steps: int = 10_000):
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "optimizer"),
                   donate_argnames=("params", "opt_state"))
def train_step(cfg: WhisperConfig, optimizer, params, opt_state,
               mel, tokens, targets):
    """One sharded training step. Under a mesh with dp/tp param+input
    shardings, XLA GSPMD partitions this program across chips."""
    loss, grads = jax.value_and_grad(
        lambda p: loss_fn(cfg, p, mel, tokens, targets))(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def init_train_state(cfg: WhisperConfig, optimizer, key,
                     dtype=jnp.float32) -> tuple[Any, Any]:
    params = whisper.init_params(cfg, key, dtype=dtype)
    opt_state = optimizer.init(params)
    return params, opt_state
