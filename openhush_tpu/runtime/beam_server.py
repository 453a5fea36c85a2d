"""Beam-search serving: EngineServer with beam GROUPS instead of slots.

whisper.cpp exposes beam search per job for offline quality
(/root/reference/src/engine/whisper.rs:204-305: beam_size/patience in the
full params); the repo's one-shot `models/whisper/beam.py` covers single
windows, but batch-file transcription through the server used to degrade
to greedy. This server keeps the whole EngineServer surface — sessions,
prep thread, batched encode, admission, quality ladder, peek — and swaps
the device state for `runtime/beam_batcher` groups: G concurrent windows,
each a K-beam search, advanced by ONE compiled step.

Temperature-ladder parity with openai/whisper's DecodingTask: T=0 runs
beam search; fallback retries (compression-ratio/logprob failures) re-run
at T>0 as BEST-OF-K independent sampling over the cross-KV the group
already holds on device (beam_batcher.readmit — no re-encode).
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.runtime import beam_batcher
from openhush_tpu.runtime.server import EngineServer, WindowResult, _SlotInfo

log = logging.getLogger(__name__)


class BeamEngineServer(EngineServer):
    """Continuous-batching server whose unit of work is a K-beam group.

    `n_slots` counts GROUPS (concurrent windows); the device batch is
    n_slots * beam_size rows. The greedy path's serving machinery applies
    here too (VERDICT r4 #3): the int8 self-cache quantizes each beam's
    K/V at write time (scale rows ride the same ancestry mask,
    model.decode_beam_step), and deep stepping runs deep_factor× longer
    group scans when every group is occupied. Speculative drafting stays
    greedy-only (a draft proposes ONE chain per window; a K-beam frontier
    has no single chain to verify).
    """

    supports_deep = True

    def __init__(self, cfg, params, *, beam_size: int = 5,
                 length_penalty: Optional[float] = None, **kw):
        if kw.pop("draft", None) is not None:
            log.warning("speculative drafting is unsupported with beam "
                        "serving; ignoring draft model")
        self.beam_size = max(1, int(beam_size))
        self.length_penalty = length_penalty
        super().__init__(cfg, params, draft=None, **kw)

    # -- device state -----------------------------------------------------------

    def _init_device_state(self, *, dtype, max_len, int8_self_cache) -> None:
        import functools
        self._check_hbm_budget(functools.partial(
            beam_batcher.state_bytes, self.cfg,
            beam_size=self.beam_size, dtype=dtype, max_len=max_len,
            audio_ctx=self.audio_ctx,
            int8_self_cache=int8_self_cache), unit="beam-group")
        self.state = beam_batcher.init_state(
            self.cfg, self.n_slots, self.beam_size, dtype=dtype,
            max_len=max_len, audio_ctx=self.audio_ctx,
            int8_self_cache=int8_self_cache)

    def _step_state(self, deep: bool = False) -> None:
        inner = self.inner_steps * (self.deep_factor if deep else 1)
        self.state = beam_batcher.step(
            self.cfg, self.params, self.state, self._suppress,
            inner_steps=inner,
            blank_token=self._blank_token,
            length_penalty=self.length_penalty)

    # -- admission --------------------------------------------------------------

    def _group_rng(self, info: _SlotInfo) -> np.ndarray:
        """Per-row sampling keys [K, 2] for the best-of retry rungs —
        split from the shared slot_seed stream (server.py)."""
        from openhush_tpu.runtime.server import slot_seed
        keys = jax.random.split(jax.random.PRNGKey(slot_seed(info)),
                                self.beam_size)
        return np.asarray(jax.random.key_data(keys), np.uint32)

    def _install(self, slot: int, info: _SlotInfo, xkv=None,
                 row: int = 0, dxkv=None) -> None:
        prompt = self.tokenizer.sot_sequence(info.language, info.task,
                                             timestamps=info.timestamps)
        info.prompt_len = len(prompt)
        temp = float(self.temperatures[info.temp_idx])
        max_new = max(1, self.room_cap - len(prompt))
        if xkv is not None:
            self.state = beam_batcher.admit(
                self.cfg, self.params, self.state, jnp.int32(slot), xkv,
                jnp.asarray([prompt], jnp.int32),
                jnp.asarray(info.timestamps), prompt_len=len(prompt),
                max_new=jnp.int32(max_new), temperature=jnp.float32(temp),
                rng=jnp.asarray(self._group_rng(info)), row=jnp.int32(row))
        else:
            self.state = beam_batcher.readmit(
                self.cfg, self.params, self.state, jnp.int32(slot),
                jnp.asarray([prompt], jnp.int32),
                jnp.asarray(info.timestamps), prompt_len=len(prompt),
                max_new=jnp.int32(max_new), temperature=jnp.float32(temp),
                rng=jnp.asarray(self._group_rng(info)))
        with self._lock:
            self._slots[slot] = info

    def _install_many(self, group) -> None:
        # Beam admission prefills one row per group; per-group installs
        # (no fused multi-group admit — group counts are small).
        for slot, info, xkv, row, dxkv in group:
            self._install(slot, info, xkv=xkv, row=row, dxkv=dxkv)

    # -- observation ------------------------------------------------------------

    def peek(self, session_id: int) -> Optional[list[int]]:
        """Partial content tokens of the current TOP alive beam (row 0 —
        rows are score-sorted by each expansion). Same donation contract
        as the greedy server: `tokens`/`step` are never donated."""
        with self._lock:
            slot = next((s for s, info in self._slots.items()
                         if info.session_id == session_id), None)
            if slot is None:
                return None
            info = self._slots[slot]
        state = self.state
        n = int(np.asarray(state.step[slot]))
        tokens = np.asarray(state.tokens[slot, 0])
        return [int(t) for t in tokens[info.prompt_len:info.prompt_len + n]
                if t != self.tokenizer.special.eot]

    # -- harvest ----------------------------------------------------------------

    def _harvest(self) -> None:
        finished, steps = jax.device_get((self.state.finished,
                                          self.state.step))
        if not finished.any():
            with self._lock:
                for slot, info in self._slots.items():
                    if info.first_token_at is None and steps[slot] > 0:
                        info.first_token_at = time.monotonic()
            return
        (tokens, alive_lp, alive_len, fin_scores, fin_tokens, fin_lens,
         temperature, done_row, no_speech) = jax.device_get(
            (self.state.tokens, self.state.alive_lp, self.state.alive_len,
             self.state.fin_scores, self.state.fin_tokens,
             self.state.fin_lens, self.state.temperature,
             self.state.done_row, self.state.no_speech))
        eot = self.tokenizer.special.eot
        done_mask = np.zeros(self.n_slots, bool)
        retries: list[tuple[int, _SlotInfo]] = []
        now = time.monotonic()
        with self._lock:
            done = [(s, i) for s, i in self._slots.items() if finished[s]]
            for slot, info in done:
                row, length, score = beam_batcher.best_hypothesis(
                    tokens[slot], alive_lp[slot], alive_len[slot],
                    fin_scores[slot], fin_tokens[slot], fin_lens[slot],
                    temperature[slot], done_row[slot],
                    length_penalty=self.length_penalty)
                content = [int(t) for t in
                           row[info.prompt_len:info.prompt_len + length]
                           if t != eot]
                text = self.tokenizer.decode(content)
                # With the default length_penalty=None the hypothesis
                # score IS the average logprob (beam._length_score), so
                # the greedy ladder's logprob_threshold applies as-is.
                avg_lp = float(score)
                ns = float(no_speech[slot])
                verdict, cr = self._quality_verdict(text, avg_lp, ns,
                                                    False)
                temp = float(self.temperatures[info.temp_idx])
                if (verdict == "fallback"
                        and info.temp_idx + 1 < len(self.temperatures)):
                    info.temp_idx += 1
                    log.info("group %d window %d degenerate (cr=%.2f, "
                             "lp=%.2f); retrying best-of-%d at T=%.1f",
                             slot, info.window_id, cr, avg_lp,
                             self.beam_size,
                             self.temperatures[info.temp_idx])
                    retries.append((slot, info))
                    del self._slots[slot]
                    continue
                skipped = verdict == "skip"
                result = WindowResult(
                    session_id=info.session_id, window_id=info.window_id,
                    tokens=[] if skipped else content,
                    text="" if skipped else text,
                    avg_logprob=avg_lp, no_speech_prob=ns,
                    first_token_latency=(info.first_token_at
                                         or now) - info.submitted_at,
                    latency=now - info.submitted_at,
                    temperature=temp, compression_ratio=cr,
                    skipped_silence=skipped, language=info.language)
                q = self._results.get(info.session_id)
                if q is not None:
                    q.put(result)
                del self._slots[slot]
                done_mask[slot] = True
        if done_mask.any():
            self.state = beam_batcher.release(self.state,
                                              jnp.asarray(done_mask))
        for slot, info in retries:
            self._install(slot, info)
