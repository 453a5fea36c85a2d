"""Timestamp-grammar parity vs openai-whisper's logit filters.

`_openai_apply` below is a line-for-line numpy transcription of
openai/whisper's ApplyTimestampRules + SuppressBlank (decoding.py), the
same heuristics whisper.cpp embeds and the reference consumes
(src/engine/whisper.rs:204-305). The test drives random greedy
trajectories through both implementations — openai's recomputes from the
full sampled sequence each step, ours carries vectorized per-row state —
and demands identical blocked-token masks and identical sampled tokens
at every step, including per-row decode clocks (the continuous batcher's
regime, where rows are at different steps).
"""

import numpy as np
import pytest

from openhush_tpu.models.whisper import decoding
from tests.openai_filters import openai_apply

V = 64
EOT = 50
NO_TS = 51
TS_BEGIN = 52
BLANK = 5
MAX_INITIAL_INDEX = 6
NEG = decoding.NEG_INF


def _openai_apply(logits: np.ndarray, seqs: list[list[int]],
                  suppress_blank: bool) -> np.ndarray:
    return openai_apply(logits, seqs, eot=EOT, no_ts=NO_TS,
                        ts_begin=TS_BEGIN, blank=BLANK,
                        max_initial_index=MAX_INITIAL_INDEX,
                        suppress_blank=suppress_blank)


def _ours_apply(logits: np.ndarray, state, steps: np.ndarray,
                suppress_blank: bool) -> np.ndarray:
    import jax.numpy as jnp
    lg = jnp.asarray(logits)
    ids = jnp.arange(V)
    lg = jnp.where((ids == NO_TS)[None, :], NEG, lg)
    if suppress_blank:
        first = (jnp.asarray(steps) == 0)[:, None]
        blank_mask = (ids == BLANK) | (ids == EOT)
        lg = jnp.where(first & blank_mask[None, :], NEG, lg)
    lg = decoding._timestamp_filter(lg, (TS_BEGIN, EOT), state,
                                    jnp.asarray(steps), MAX_INITIAL_INDEX)
    return np.asarray(lg)


@pytest.mark.parametrize("suppress_blank", [True, False])
@pytest.mark.parametrize("stagger", [False, True])
def test_trajectories_match_openai(suppress_blank, stagger):
    import jax.numpy as jnp
    rng = np.random.default_rng(42 if stagger else 7)
    B, T = 4, 24
    seqs: list[list[int]] = [[] for _ in range(B)]
    # stagger: rows start at different clocks (continuous-batching regime)
    # by pre-running some rows alone for a few steps.
    state = (jnp.zeros(B, bool), jnp.zeros(B, bool),
             jnp.full(B, TS_BEGIN, jnp.int32))
    done = np.zeros(B, bool)

    start_at = rng.integers(0, 4, size=B) if stagger else np.zeros(B, int)

    for t in range(T):
        logits = rng.standard_normal((B, V)).astype(np.float32) * 3.0
        steps = np.asarray([len(s) for s in seqs], np.int32)
        ref = _openai_apply(logits, seqs, suppress_blank)
        ours = _ours_apply(logits, state, steps, suppress_blank)

        active = ~done & (t >= start_at)
        for k in range(B):
            if not active[k]:
                continue
            ref_blocked = ref[k] <= NEG / 2
            ours_blocked = ours[k] <= NEG / 2
            np.testing.assert_array_equal(
                ref_blocked, ours_blocked,
                err_msg=f"row {k} step {len(seqs[k])} (t={t})")
            nxt_ref = int(np.argmax(ref[k]))
            nxt_ours = int(np.argmax(ours[k]))
            assert nxt_ref == nxt_ours, (k, len(seqs[k]))

        # advance only active rows, with per-row state updates
        nxt = np.asarray([int(np.argmax(ref[k])) if active[k] else EOT
                          for k in range(B)], np.int32)
        new_state = decoding._update_ts_state(
            state, jnp.asarray(nxt), (TS_BEGIN, EOT),
            jnp.asarray(steps))
        keep = jnp.asarray(active)
        state = tuple(jnp.where(keep, n, o)
                      for n, o in zip(new_state, state))
        for k in range(B):
            if active[k]:
                if nxt[k] == EOT:
                    done[k] = True
                else:
                    seqs[k].append(int(nxt[k]))


def test_initial_step_forces_bounded_timestamp():
    import jax.numpy as jnp
    state = (jnp.zeros(1, bool), jnp.zeros(1, bool),
             jnp.full(1, TS_BEGIN, jnp.int32))
    logits = np.zeros((1, V), np.float32)
    out = _ours_apply(logits, state, np.asarray([0]), True)
    blocked = out[0] <= NEG / 2
    # everything below timestamp_begin blocked (EOT included), timestamps
    # beyond max_initial blocked
    assert blocked[:TS_BEGIN].all()
    assert not blocked[TS_BEGIN:TS_BEGIN + MAX_INITIAL_INDEX + 1].any()
    assert blocked[TS_BEGIN + MAX_INITIAL_INDEX + 1:].all()


def test_after_initial_timestamp_text_is_forced():
    """The openai len<2 rule: <|t0|> must be followed by text, not a
    second timestamp."""
    import jax.numpy as jnp
    state = (jnp.zeros(1, bool), jnp.zeros(1, bool),
             jnp.full(1, TS_BEGIN, jnp.int32))
    first_tok = jnp.asarray([TS_BEGIN + 2], jnp.int32)
    state = decoding._update_ts_state(state, first_tok, (TS_BEGIN, EOT),
                                      jnp.asarray([0]))
    logits = np.zeros((1, V), np.float32)
    logits[0, :TS_BEGIN] = -5.0   # make text unattractive but legal
    out = _ours_apply(logits, state, np.asarray([1]), True)
    blocked = out[0] <= NEG / 2
    assert blocked[TS_BEGIN:].all()          # timestamps blocked
    assert not blocked[:TS_BEGIN - 14].all()  # text available
