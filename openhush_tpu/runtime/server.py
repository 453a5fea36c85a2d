"""Engine server: session-multiplexed continuous batching over one device.

Replaces the reference's single worker thread + mpsc queue
(src/queue/worker.rs:255-267) with a persistent device loop: sessions submit
30 s (or shorter, padded) windows; admission encodes the window and installs
it into a free batch slot; one compiled step advances every active slot by
`inner_steps` tokens; finished slots are harvested into per-session queues.
Partial results (`peek`) read the token buffer mid-decode — the mechanism
behind sub-second first-partial latency.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
import queue
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from openhush_tpu.models.whisper import decoding, model as whisper
from openhush_tpu.models.whisper.config import WhisperConfig
from openhush_tpu.ops import frontend_pallas, mel as mel_ops
from openhush_tpu.runtime import batcher
from openhush_tpu.text.tokenizer import WhisperTokenizer

log = logging.getLogger(__name__)


@dataclasses.dataclass
class WindowResult:
    session_id: int
    window_id: int
    tokens: list[int]             # content tokens (prompt stripped, pre-EOT)
    text: str
    avg_logprob: float
    no_speech_prob: float
    first_token_latency: float    # seconds from submit to first content token
    latency: float                # seconds from submit to completion
    temperature: float = 0.0      # ladder temperature the window finished at
    compression_ratio: float = 0.0
    skipped_silence: bool = False  # no_speech gate fired → empty result
    language: str = "en"           # resolved (possibly auto-detected)


def compression_ratio(text: str) -> float:
    """zlib compression ratio of the UTF-8 text — whisper's repetition
    metric (>2.4 = degenerate)."""
    import zlib
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def device_hbm_limit() -> Optional[int]:
    """Device 0's HBM capacity in bytes: OPENHUSH_HBM_BYTES override, else
    the runtime's memory_stats. None = unknown (e.g. the CPU test backend),
    which disables the slot budgeter."""
    env = os.environ.get("OPENHUSH_HBM_BYTES")
    if env:
        return int(env) or None
    try:
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return None
        stats = dev.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
        return _hbm_by_device_kind(getattr(dev, "device_kind", ""))
    except Exception:  # noqa: BLE001 — budgeting is best-effort
        pass
    return None


def _hbm_by_device_kind(kind: str) -> Optional[int]:
    """Published per-device HBM capacities, the fallback when the runtime
    exposes no memory_stats (the axon tunnel returns None — observed
    round 4, which silently disabled the budgeter exactly where it
    matters). Substring match on jax's device_kind."""
    kind = (kind or "").lower()
    table = [
        ("v5 lite", 16 << 30),   # v5e: 16 GiB
        ("v5e", 16 << 30),
        ("v5p", 95 << 30),
        ("v6 lite", 32 << 30),   # Trillium / v6e: 32 GiB
        ("v6e", 32 << 30),
        ("v4", 32 << 30),
        ("v3", 16 << 30),
        ("v2", 8 << 30),
    ]
    for needle, cap in table:
        if needle in kind:
            return cap
    return None


# Fraction of HBM the budgeter hands to weights + slot state; the rest
# covers encode activations, prep buffers, logits and XLA workspace.
HBM_BUDGET_FRACTION = 0.85


def hbm_fit_count(params, state_bytes_at, draft_params=None
                  ) -> Optional[int]:
    """Largest slot/group count whose device state fits next to the
    weights under HBM_BUDGET_FRACTION, or None when the HBM capacity is
    unknown (CPU test backend). state_bytes_at(n) → exact bytes of the
    batch state at n slots/groups (batcher.state_bytes /
    beam_batcher.state_bytes partials)."""
    limit = device_hbm_limit()
    if limit is None:
        return None
    nbytes = lambda tree: sum(int(np.prod(p.shape)) * p.dtype.itemsize
                              for p in jax.tree.leaves(tree))
    weights = nbytes(params)
    if draft_params is not None:
        weights += nbytes(draft_params)
    budget = int(limit * HBM_BUDGET_FRACTION) - weights
    per = max(1, state_bytes_at(1))
    fits = max(0, budget // per)
    while fits > 0 and state_bytes_at(fits) > budget:
        fits -= 1
    return fits


def slot_seed(info) -> int:
    """Deterministic per-(session, window, temperature-rung) PRNG seed —
    the SINGLE source of truth for plain installs, batched installs, and
    beam groups (beam_server splits this key); retry determinism depends
    on all paths deriving the same stream."""
    return (info.session_id * 1000003 + info.window_id * 101
            + info.temp_idx) & 0x7FFFFFFF


@dataclasses.dataclass
class _Pending:
    session_id: int
    window_id: int
    audio: np.ndarray
    language: str
    task: str
    timestamps: bool
    submitted_at: float
    first: bool = False     # session's first window → priority admission


@dataclasses.dataclass
class _SlotInfo:
    session_id: int
    window_id: int
    prompt_len: int
    submitted_at: float
    admitted_at: float
    first_token_at: Optional[float] = None
    # Fallback-ladder state: the resolved language/task stay here; the
    # encoded cross-KV does NOT — a retry re-prefills from the copy the
    # slot already holds on device (batcher.readmit), so no host-side
    # xkv reference pins memory for the window's lifetime.
    language: str = "en"
    task: str = "transcribe"
    timestamps: bool = True
    temp_idx: int = 0


class EngineServer:
    # Whether _step_state honors deep scans (BeamEngineServer keeps
    # fixed-length group scans and must not pay per-turn harvests).
    supports_deep = True
    """One model, one device loop, many sessions."""

    def __init__(self, cfg: WhisperConfig, params, *, n_slots: int = 8,
                 inner_steps: int = 8, dtype=jnp.bfloat16,
                 tokenizer: Optional[WhisperTokenizer] = None,
                 audio_ctx: Optional[int] = None,
                 max_decode_len: Optional[int] = None,
                 preprocess=None,
                 temperatures: tuple = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                 compression_ratio_threshold: float = 2.4,
                 logprob_threshold: float = -1.0,
                 no_speech_threshold: float = 0.6,
                 rep_threshold: int = 12,
                 max_admissions_per_turn: int = 1,
                 int8_self_cache: Optional[bool] = None,
                 draft: Optional[tuple] = None,
                 k_spec: int = 4,
                 spec_policy: str = "auto",
                 spec_force_accept: bool = False,
                 harvest_every: int = 1,
                 deep_factor: int = 4,
                 reserve_first_window: Optional[bool] = None):
        self.cfg = cfg
        self.params = params
        self.n_slots = n_slots
        self.inner_steps = inner_steps
        # Deep stepping: when EVERY slot is occupied, admission is
        # impossible until a harvest frees one — so the step dispatch
        # runs deep_factor× longer scans (one compiled variant per size)
        # and harvests every turn, keeping the token cadence between
        # harvests identical while cutting host dispatches ~2.5x in the
        # fully-batched steady state. Token-exact: the scan is just run
        # further; finished rows stay masked. deep_factor=1 disables.
        self.deep_factor = max(1, int(deep_factor))
        self.spec_iters = 0   # spec iterations dispatched (accounting)
        self.tokenizer = tokenizer or WhisperTokenizer(cfg.n_langs)
        # Speculative serving: draft=(draft_cfg, draft_params) switches
        # the device loop to batcher.spec_step — the shared shallow draft
        # proposes k_spec-token blocks, the big model verifies each in
        # one pass (token-identical to the plain step; speed-only).
        self.draft_cfg = self.draft_params = None
        self.k_spec = max(2, int(k_spec))
        # Spec policy (measured crossover, docs/STATUS.md round 3): the
        # batch path is HBM-amortized, so speculation LOSES whenever >1
        # slot decodes together (accept-1.0 endpoint 190x vs plain 250x)
        # and wins ~2x single-stream. "auto" (default) re-picks the mode
        # every time the batcher drains empty: spec iff exactly one window
        # is waiting. "always"/"never" pin it (bench measures endpoints
        # with "always"). Mode switches only at occupancy 0 — the two step
        # kernels leave different cache-fill conventions (spec keeps the
        # tip OUT of the cache), so switching mid-decode would corrupt
        # attention for in-flight slots.
        if spec_policy not in ("auto", "always", "never"):
            raise ValueError(f"spec_policy {spec_policy!r} not in "
                             "('auto', 'always', 'never')")
        self.spec_policy = spec_policy
        self._spec_mode = spec_policy == "always"
        # BENCH-ONLY: accept=1.0 endpoint (breaks token-exactness — the
        # accept chain never re-checks the draft). Constructor-only by
        # design: no env var can reach this (VERDICT r3 weak #3).
        self.spec_force_accept = bool(spec_force_accept)
        if draft is not None:
            dcfg, dparams = draft
            compatible = (dcfg.n_text_state == cfg.n_text_state
                          and dcfg.n_vocab == cfg.n_vocab
                          and dcfg.n_text_head == cfg.n_text_head
                          and dcfg.n_audio_state == cfg.n_audio_state)
            if compatible:
                self.draft_cfg, self.draft_params = dcfg, dparams
            else:
                log.warning("draft model %s incompatible with %s; "
                            "speculative serving disabled",
                            dcfg.name, cfg.name)
        # audio_ctx: whisper.cpp-style encoder-context restriction. A
        # streaming daemon with chunk_secs-long windows needs only
        # ~chunk_secs*50 encoder positions (+margin) — 3-4x less cross-KV
        # traffic per decode step than the full 30 s context.
        self.audio_ctx = min(audio_ctx or cfg.n_audio_ctx, cfg.n_audio_ctx)
        if int8_self_cache is None:
            env = os.environ.get("OPENHUSH_INT8_SELF_CACHE")
            if env is not None:
                int8_self_cache = env == "1"
            else:
                # The combined int8 rung (utils/quant_flags.py) or the
                # standalone self-cache marker — both dropped by
                # tools/checkpoint_gate.py after a real-weight WER run
                # shows <0.1 abs drift (gated default-flip).
                from openhush_tpu.runtime.engine import default_model_dir
                from openhush_tpu.utils.quant_flags import int8_rung_enabled
                int8_self_cache = (int8_rung_enabled()
                                   or os.path.exists(os.path.join(
                                       default_model_dir(),
                                       "int8_self_cache.ok")))
        self.room_cap = (max_decode_len or cfg.n_text_ctx) - 1
        self._init_device_state(dtype=dtype, max_len=max_decode_len,
                                int8_self_cache=int8_self_cache)
        # Per-window preprocessing (denoise/normalize/compress/limit —
        # the reference worker's preprocess_audio, src/queue/worker.rs:196).
        self.preprocess = preprocess
        # Streaming quality guards — the whisper heuristic ladder applied
        # per window (parity: src/engine/whisper.rs:204-305 runs these on
        # every chunk; round-1 only had them in the one-shot engine).
        self.temperatures = tuple(temperatures) or (0.0,)
        self.compression_ratio_threshold = compression_ratio_threshold
        self.logprob_threshold = logprob_threshold
        self.no_speech_threshold = no_speech_threshold
        self.rep_threshold = rep_threshold
        self.max_admissions_per_turn = max(1, max_admissions_per_turn)
        # Harvest (a host sync) every N step dispatches. 1 = every turn
        # (latency-first streaming default); batch/offline throughput
        # paths use larger values so consecutive step dispatches overlap
        # instead of serializing on a device→host read per turn.
        self.harvest_every = max(1, harvest_every)
        self._turn = 0
        self._suppress = jnp.asarray(decoding.build_suppress_mask(
            self.tokenizer, cfg, decoding.DecodingOptions()))
        blank = self.tokenizer.encode(" ")
        self._blank_token = int(blank[0]) if blank else 220
        self._act_dtype = params["decoder"]["pos_emb"].dtype
        self._encode = jax.jit(lambda p, m: whisper.encode(cfg, p, m))
        # Slots store int8 cross-KV (see batcher.init_state).
        self._xkv = jax.jit(
            lambda p, f: whisper.compute_cross_kv_quant(cfg, p, f))
        # Joiners are encoded in BATCHES (one fused dispatch: mel → encode
        # → int8 cross-KV → language logits) at a few bucket sizes — far
        # fewer dispatches and much better MXU utilization than per-window
        # B=1 encodes when several sessions join at once.
        n_frames = self.audio_ctx * 2

        def _prep(p, dp, windows):
            mel = jax.vmap(lambda a: frontend_pallas.log_mel(
                a, n_mels=cfg.n_mels, n_frames=n_frames))(windows)
            feats = whisper.encode(cfg, p, mel.astype(self._act_dtype))
            xkv = whisper.compute_cross_kv_quant(cfg, p, feats)
            lang_probs = decoding.detect_language_logits(cfg, p, xkv)
            if self.draft_cfg is not None:
                # The draft shares the big model's ENCODER: its cross-KV
                # is just a second projection of the same features.
                dxkv = whisper.compute_cross_kv_quant(self.draft_cfg, dp,
                                                      feats)
            else:
                dxkv = None
            return xkv, lang_probs, dxkv

        self._prep_fn = jax.jit(_prep)
        self._prep_buckets = tuple(
            b for b in (1, 2, 4, 8) if b <= max(1, n_slots))

        self._pending: queue.Queue[_Pending] = queue.Queue()
        # Prepared windows (encoded + language-resolved) awaiting a slot.
        # A dedicated prep thread fills this so the step loop never stalls
        # on admission work (mel → encode → cross-KV → language detect,
        # which includes a host sync): the scheduler turn only installs.
        # Entries: (job, info, batched_xkv, row).
        self._ready: queue.Queue[tuple] = queue.Queue()
        # First-window QoS (round-4 gap: saturation first-partial p50
        # 1632 ms with no admission lever): a session's FIRST window —
        # the one behind the product's first-partial promise (the daemon
        # opens a fresh session per recording interaction,
        # runtime/daemon.py:242) — lands on this priority queue, is
        # admitted ahead of resubmissions and outside
        # max_admissions_per_turn, and (reserve) one slot is held back
        # from non-first windows WHILE such a window is in flight, so a
        # joiner under saturation waits at most one harvest, never a
        # full drain. The reserve is dynamic — it costs nothing at
        # steady state with no joiners (occupancy returns to n_slots the
        # moment every first window is admitted) and nothing for
        # all-first traffic (batch transcription: first windows may fill
        # every slot).
        if reserve_first_window is None:
            reserve_first_window = n_slots >= 4
        self.reserve_first_window = bool(reserve_first_window)
        self._ready_first: queue.Queue[tuple] = queue.Queue()
        self._served: set[int] = set()   # sessions with ≥1 admitted window
        # Sessions whose first window is submitted but not yet admitted:
        # while nonempty, the occupancy reserve is active and deep
        # stepping is suspended (a deep scan would stall the joiner's
        # admission by deep_factor× one dispatch).
        self._first_pending: set[int] = set()
        # Windows submitted but not yet landed on _ready (in _pending OR
        # mid-prep). Incremented in submit_window BEFORE the _pending.put
        # and decremented only after _prepare_many finishes, so the
        # spec-policy waiting count can never catch a window in the gap
        # between a _pending pop and a separate in-prep increment (that
        # gap read waiting==0 and spuriously cleared _spec_blocked). The
        # transient where a window counts here AND in _ready.qsize()
        # (after its _ready.put, before the decrement) only ever
        # OVERcounts, which at worst delays spec adoption one turn.
        self._unlanded = 0
        self._count_lock = threading.Lock()
        # Concurrency evidence for the auto spec policy: set when a
        # window arrives while a spec decode is in flight (the admission
        # cap made it wait out the whole decode), cleared on a fully idle
        # drain. While set, re-picks choose the plain step even for a
        # lone waiting window — otherwise two ALTERNATING streaming
        # sessions each see "exactly 1 waiting" at every drain point and
        # serialize forever on single-stream speculation instead of
        # batching.
        self._spec_blocked = False
        self._slots: dict[int, _SlotInfo] = {}
        self._results: dict[int, queue.Queue] = {}
        self._lock = threading.Lock()
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._prep_thread: Optional[threading.Thread] = None
        self._seq = 0

    # -- public API -----------------------------------------------------------

    def open_session(self) -> int:
        with self._lock:
            self._seq += 1
            sid = self._seq
            self._results[sid] = queue.Queue()
        return sid

    def close_session(self, session_id: int) -> None:
        with self._lock:
            self._results.pop(session_id, None)
            self._served.discard(session_id)
            self._first_pending.discard(session_id)

    def submit_window(self, session_id: int, audio: np.ndarray,
                      window_id: int = 0, language: str = "en",
                      task: str = "transcribe",
                      timestamps: bool = True) -> None:
        """Queue one ≤30 s audio window for transcription."""
        with self._lock:
            first = (session_id not in self._served
                     and session_id not in self._first_pending)
            if first:
                self._first_pending.add(session_id)
        with self._count_lock:
            self._unlanded += 1
        self._pending.put(_Pending(session_id, window_id,
                                   np.asarray(audio, np.float32), language,
                                   task, timestamps, time.monotonic(),
                                   first=first))

    def poll(self, session_id: int, timeout: Optional[float] = None
             ) -> Optional[WindowResult]:
        q = self._results.get(session_id)
        if q is None:
            return None
        try:
            return q.get(timeout=timeout) if timeout else q.get_nowait()
        except queue.Empty:
            return None

    def peek(self, session_id: int) -> Optional[list[int]]:
        """Partial content tokens of the session's in-flight window.

        Deterministic: `tokens` and `pos` are excluded from buffer donation
        in the step kernel (batcher._PEEK_FIELDS), so the snapshot reference
        taken here can never be deleted under us by the device loop."""
        with self._lock:
            slot = next((s for s, info in self._slots.items()
                         if info.session_id == session_id), None)
            if slot is None:
                return None
            info = self._slots[slot]
        state = self.state
        # Read pos first: tokens[:pos] is always fully written for that pos,
        # so a step landing between the two reads only under-reports.
        pos = int(np.asarray(state.pos[slot]))
        tokens = np.asarray(state.tokens[slot])
        return [int(t) for t in tokens[info.prompt_len:pos]
                if t != self.tokenizer.special.eot]

    def queue_depth(self) -> int:
        return (self._unlanded + self._ready.qsize()
                + self._ready_first.qsize() + len(self._slots))

    def warmup(self) -> None:
        """Compile every admission shape up front: one synchronous round
        of exactly-bucket-size silent windows per prep bucket, so the
        batched mel→encode→cross-KV→detect program AND that bucket's
        admit/install programs are all built before live traffic.

        Without this, the first live window hitting a cold bucket pays
        its compile in user-visible latency — a burst warmup compiles
        only the largest bucket, and the round-4 loaded latency probe
        measured p95 24,011 ms (vs p50 507 ms) from exactly one such
        size-1 resubmit compile. Must run before start(): the
        synchronous run_once prep path guarantees batch size == bucket,
        while the prep thread batches opportunistically."""
        if self._running:
            raise RuntimeError("warmup() must be called before start()")
        n_samples = self.audio_ctx * 2 * mel_ops.HOP_LENGTH
        silence = np.zeros(n_samples, np.float32)
        for b in reversed(self._prep_buckets):
            sids = [self.open_session() for _ in range(b)]
            for j, sid in enumerate(sids):
                self.submit_window(sid, silence, window_id=10 ** 9 + j,
                                   language="en", timestamps=False)
            pending = set(sids)
            while pending:
                self.run_once()
                for sid in list(pending):
                    if self.poll(sid) is not None:
                        pending.discard(sid)
            for sid in sids:
                self.close_session(sid)

    # -- device loop ------------------------------------------------------------

    def start(self) -> None:
        self._running = True
        self._prep_thread = threading.Thread(target=self._prep_loop,
                                             daemon=True,
                                             name="engine-server-prep")
        self._prep_thread.start()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="engine-server")
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread:
            self._thread.join(timeout=30)
        if self._prep_thread:
            self._prep_thread.join(timeout=30)

    def _loop(self) -> None:
        while self._running:
            if not self.run_once():
                time.sleep(0.002)

    def _prep_loop(self) -> None:
        """Encode pending windows concurrently with the step loop. One
        thread keeps per-session FIFO order; the device interleaves the
        encode with decode steps on its own queue. Windows waiting
        together are encoded in one batched dispatch."""
        while self._running:
            jobs = []
            try:
                jobs.append(self._pending.get(timeout=0.05))
            except queue.Empty:
                continue
            while len(jobs) < self._prep_buckets[-1]:
                try:
                    jobs.append(self._pending.get_nowait())
                except queue.Empty:
                    break
            try:
                self._prepare_many(jobs)
            except Exception:  # noqa: BLE001
                log.exception("window preparation failed; dropping %d "
                              "window(s)", len(jobs))

    def run_once(self) -> bool:
        """One scheduler turn: admit prepared windows → step → harvest.
        Returns True if any work happened (used for idle backoff).

        When the server is driven synchronously (tests, one-shot batch
        transcription — no start()), pending windows are prepared inline
        here instead of by the prep thread."""
        if self._prep_thread is None or not self._prep_thread.is_alive():
            while not self._pending.empty() and self._free_slots():
                jobs = []
                while len(jobs) < self._prep_buckets[-1]:
                    try:
                        jobs.append(self._pending.get_nowait())
                    except queue.Empty:
                        break
                if not jobs:
                    break
                self._prepare_many(jobs)
        if self.draft_cfg is not None and self.spec_policy == "auto":
            # Re-pick the dispatch mode only while the batcher is EMPTY
            # (mid-decode switches corrupt cache-fill conventions — see
            # __init__): speculate iff exactly one window is waiting —
            # counting windows mid-prep, or a stagger can look like 1.
            with self._lock:
                occupied = bool(self._slots)
            if not occupied:
                waiting = (self._ready.qsize() + self._ready_first.qsize()
                           + self._unlanded)
                if waiting == 0:
                    # Fully idle drain: traffic went quiet, forget the
                    # concurrency evidence so a later lone window (PTT
                    # style) speculates again.
                    self._spec_blocked = False
                self._spec_mode = waiting == 1 and not self._spec_blocked
        worked = self._admit_pending()
        with self._lock:
            n_active = len(self._slots)
        if n_active:
            # Deep stepping: when no further admission is possible until
            # a harvest frees a slot, run a deep_factor× longer scan per
            # dispatch and harvest each turn (same token cadence between
            # harvests, ~2.5x fewer host dispatches). Never go deep
            # while a session's first window is in flight (submitted →
            # admitted): its admission would stall behind the longer
            # scan — the exact QoS lever the reserve exists for.
            deep = (n_active >= self._regular_cap()
                    and not self._first_pending
                    and self.deep_factor > 1 and self.supports_deep)
            self._step_state(deep=deep)
            self._turn += 1
            if (deep or self._turn % self.harvest_every == 0
                    or ((not self._ready.empty()
                         or not self._ready_first.empty())
                        and not self._free_slots())):
                self._harvest()
            worked = True
        return worked

    def _regular_cap(self) -> int:
        """Max occupancy non-first windows may fill: one slot stays in
        reserve WHILE a session's first window is in flight (submitted
        but not yet admitted) — so the reserve is free at steady state
        with no joiners, and the held-back slot goes to the joiner, not
        the next resubmission, the moment a harvest frees one."""
        if (self.reserve_first_window and self.n_slots > 1
                and self._first_pending):
            return self.n_slots - 1
        return self.n_slots

    # -- internals ---------------------------------------------------------------

    def _init_device_state(self, *, dtype, max_len, int8_self_cache) -> None:
        """Allocate the device-side batch state (overridden by
        BeamEngineServer to allocate beam groups instead of slots)."""
        self._check_hbm_budget(functools.partial(
            batcher.state_bytes, self.cfg, dtype=dtype, max_len=max_len,
            audio_ctx=self.audio_ctx, int8_self_cache=int8_self_cache,
            draft_cfg=self.draft_cfg), unit="slot")
        self.state = batcher.init_state(self.cfg, self.n_slots, dtype=dtype,
                                        max_len=max_len,
                                        audio_ctx=self.audio_ctx,
                                        int8_self_cache=int8_self_cache,
                                        draft_cfg=self.draft_cfg)

    def _check_hbm_budget(self, state_bytes_at, *, unit: str) -> None:
        """Refuse slot counts whose device state cannot fit next to the
        weights — computed exactly from cfg (batcher.state_bytes), not
        discovered as a RESOURCE_EXHAUSTED mid-run. state_bytes_at(n) →
        bytes of the batch state at n slots/groups. No-op when the HBM
        capacity is unknown (CPU test backend)."""
        fits = hbm_fit_count(self.params, state_bytes_at,
                             draft_params=self.draft_params)
        if fits is None or self.n_slots <= fits:
            return
        limit = device_hbm_limit()
        nbytes = lambda tree: sum(int(np.prod(p.shape)) * p.dtype.itemsize
                                  for p in jax.tree.leaves(tree))
        weights = nbytes(self.params)
        if self.draft_params is not None:
            weights += nbytes(self.draft_params)
        raise ValueError(
            f"n_slots={self.n_slots} needs "
            f"{state_bytes_at(self.n_slots) / 2**30:.2f} GiB of {unit} "
            f"state next to {weights / 2**30:.2f} GiB of weights "
            f"(chip: {limit / 2**30:.2f} GiB, "
            f"{HBM_BUDGET_FRACTION:.0%} budgeted); "
            f"largest {unit} count that fits: {fits}")

    def _step_state(self, deep: bool = False) -> None:
        """One step dispatch over the device state (overridden by
        BeamEngineServer to advance beam groups instead of slots).
        `deep` multiplies the scan length by deep_factor — two compiled
        step variants total, identical per-token math."""
        inner = self.inner_steps * (self.deep_factor if deep else 1)
        if self.draft_cfg is not None and self._spec_mode:
            n_iters = max(1, inner // self.k_spec)
            self.spec_iters += n_iters   # accept-rate accounting
            self.state = batcher.spec_step(
                self.cfg, self.params, self.draft_cfg,
                self.draft_params, self.state, self._suppress,
                k_spec=self.k_spec,
                n_iters=n_iters,
                room_cap=self.room_cap,
                blank_token=self._blank_token,
                rep_threshold=self.rep_threshold,
                force_accept=self.spec_force_accept)
        else:
            self.state = batcher.step(
                self.cfg, self.params, self.state, self._suppress,
                inner_steps=inner,
                blank_token=self._blank_token,
                rep_threshold=self.rep_threshold,
                # Explicit cap: spec-margined states carry SPEC_MARGIN
                # extra buffer rows that must not extend the decode.
                room_cap=self.room_cap)

    def _free_slots(self) -> list[int]:
        with self._lock:
            return [i for i in range(self.n_slots) if i not in self._slots]

    def _admit_pending(self) -> bool:
        """Install prepared windows into free slots — at most
        `max_admissions_per_turn` non-first windows per scheduler turn
        while other sessions are decoding, so the active decode clock
        never stalls more than ~one admit dispatch between step
        dispatches (burst joins spread across turns instead of
        bunching). With an idle batcher all free slots fill at once.

        QoS ordering: a session's FIRST window (priority queue) is
        admitted ahead of any resubmission, outside the per-turn budget,
        and may take the reserved slot non-first windows must leave free
        (_regular_cap) — so a new session's first partial never waits a
        full batch drain under saturation."""
        with self._lock:
            n_active = len(self._slots)
        budget = self.max_admissions_per_turn if n_active else self.n_slots
        spec_limited = self.spec_policy == "auto" and self._spec_mode
        if spec_limited:
            # Spec loses at batch (HBM-amortized plain path: accept-1.0
            # endpoint 190x vs plain 250x), so auto NEVER builds one: a
            # spec batcher admits only into emptiness. A window that
            # arrives mid-spec-decode is concurrency evidence — record
            # it so the NEXT re-pick (occupancy 0 in run_once) chooses
            # the plain step even if that window is the only one waiting
            # by then. Without the flag, two alternating streaming
            # sessions each see "exactly 1 waiting" at every drain and
            # lock into serialized single-stream speculation; with it
            # they converge to the plain batcher after one blocked wait.
            if n_active and (self._ready.qsize() + self._ready_first.qsize()
                             + self._unlanded) > 0:
                self._spec_blocked = True
            budget = min(budget, max(0, 1 - n_active))
        admitted = False
        picked = []            # (slot, info, xkv, row, dxkv)
        free = self._free_slots()
        f = 0
        # First windows: every free slot, no per-turn budget (the
        # spec-auto total cap still applies — a spec batch stays size 1).
        while f < len(free) and not (spec_limited and budget <= 0):
            try:
                job, info, xkv, row, dxkv = self._ready_first.get_nowait()
            except queue.Empty:
                break
            picked.append((free[f], info, xkv, row, dxkv))
            f += 1
            if spec_limited:
                budget -= 1
            with self._lock:
                self._served.add(job.session_id)
                self._first_pending.discard(job.session_id)
            log.debug("admitting session %d FIRST window %d into slot %d",
                      job.session_id, job.window_id, free[f - 1])
        # Non-first windows: per-turn budget + the occupancy reserve.
        cap = self._regular_cap()
        while (f < len(free) and budget > 0
               and n_active + len(picked) < cap):
            try:
                job, info, xkv, row, dxkv = self._ready.get_nowait()
            except queue.Empty:
                break
            picked.append((free[f], info, xkv, row, dxkv))
            f += 1
            budget -= 1
            with self._lock:
                self._served.add(job.session_id)
            log.debug("admitting session %d window %d into slot %d",
                      job.session_id, job.window_id, free[f - 1])
        # Windows prepared in the same batch (same xkv buffers) install
        # in ONE dispatch (batcher.admit_many) — a join burst costs one
        # admit instead of one per window. Prompt lengths are computed
        # once per entry (not re-derived per comparison), and batched
        # installs are chunked to power-of-two group sizes so the jitted
        # prefill graph compiles for at most log2(n_slots) shapes instead
        # of one per burst size ever seen.
        tok = self.tokenizer
        plens = [len(tok.sot_sequence(info.language, info.task,
                                      timestamps=info.timestamps))
                 for _, info, *_ in picked]
        i = 0
        while i < len(picked):
            group = [picked[i]]
            while (i + len(group) < len(picked)
                   and picked[i + len(group)][2] is picked[i][2]
                   and plens[i + len(group)] == plens[i]):
                group.append(picked[i + len(group)])
            i += len(group)
            admitted = True
            while group:
                k = 1 << (len(group).bit_length() - 1)   # ≤ len(group)
                chunk, group = group[:k], group[k:]
                if len(chunk) == 1:
                    slot, info, xkv, row, dxkv = chunk[0]
                    self._install(slot, info, xkv=xkv, row=row, dxkv=dxkv)
                else:
                    self._install_many(chunk)
        return admitted

    def _prepare_many(self, jobs: list[_Pending]) -> None:
        """All per-window work that doesn't need a slot, for a BATCH of
        windows in one fused dispatch: preprocess, mel, encode, int8
        cross-KV, language logits. Prepared entries land on self._ready
        as (job, info, batched_xkv, row) — the batched xkv is sliced
        per-row inside the admit kernel."""
        try:
            self._prepare_many_inner(jobs)
        except Exception:
            # Dropped windows must not hold the first-window reserve
            # (or suspend deep stepping) forever.
            with self._lock:
                for job in jobs:
                    if job.first:
                        self._first_pending.discard(job.session_id)
            raise
        finally:
            # Landed on _ready (or dropped on exception): either way the
            # batch leaves the _unlanded count. Decrementing AFTER the
            # puts means readers may transiently OVERcount a window in
            # both _unlanded and _ready.qsize(), never undercount — see
            # the invariant at __init__.
            with self._count_lock:
                self._unlanded -= len(jobs)

    def _prepare_many_inner(self, jobs: list[_Pending]) -> None:
        tok = self.tokenizer
        n_frames = self.audio_ctx * 2
        n_samples = n_frames * mel_ops.HOP_LENGTH
        bucket = next(b for b in self._prep_buckets if b >= len(jobs))
        windows = np.zeros((bucket, n_samples), np.float32)
        for j, job in enumerate(jobs):
            if self.preprocess is not None:
                try:
                    job.audio = self.preprocess(job.audio)
                except Exception as e:  # noqa: BLE001 — degrade, keep audio
                    log.warning("preprocess failed (%s); using raw audio",
                                e)
            n = min(len(job.audio), n_samples)
            windows[j, :n] = job.audio[:n]
        xkv, lang_probs, dxkv = self._prep_fn(self.params,
                                              self.draft_params,
                                              jnp.asarray(windows))

        need_detect = any(j.language in ("auto", "", None) for j in jobs)
        if need_detect:
            idx = np.asarray(lang_probs).argmax(axis=-1)
            detected = [tok.special.languages[i] for i in idx]
        for j, job in enumerate(jobs):
            language = job.language
            if language in ("auto", "", None):
                language = detected[j]
            info = _SlotInfo(job.session_id, job.window_id, 0,
                             job.submitted_at, time.monotonic(),
                             language=language, task=job.task,
                             timestamps=job.timestamps, temp_idx=0)
            dest = self._ready_first if job.first else self._ready
            dest.put((job, info, xkv, j, dxkv))

    def _install(self, slot: int, info: _SlotInfo, xkv=None,
                 row: int = 0, dxkv=None) -> None:
        """Prefill `slot` at the ladder temperature info.temp_idx: from a
        prepared batched cross-KV (first install, `xkv` row `row`) or
        from the slot's own device copy (retry, batcher.readmit)."""
        tok = self.tokenizer
        prompt = tok.sot_sequence(info.language, info.task,
                                  timestamps=info.timestamps)
        info.prompt_len = len(prompt)
        temp = float(self.temperatures[info.temp_idx])
        rng = self._rng_for(info)
        if xkv is not None:
            self.state = batcher.admit(
                self.cfg, self.params, self.state, jnp.int32(slot), xkv,
                jnp.asarray([prompt], jnp.int32),
                jnp.asarray(info.timestamps),
                prompt_len=len(prompt), temperature=jnp.float32(temp),
                rng=jnp.asarray(rng), row=jnp.int32(row),
                draft_cfg=self.draft_cfg, draft_params=self.draft_params,
                draft_xkv=dxkv)
        else:
            self.state = batcher.readmit(
                self.cfg, self.params, self.state, jnp.int32(slot),
                jnp.asarray([prompt], jnp.int32),
                jnp.asarray(info.timestamps),
                prompt_len=len(prompt), temperature=jnp.float32(temp),
                rng=jnp.asarray(rng),
                draft_cfg=self.draft_cfg,
                draft_params=self.draft_params)
        with self._lock:
            self._slots[slot] = info

    def _rng_for(self, info: _SlotInfo) -> np.ndarray:
        return np.asarray(
            jax.random.key_data(jax.random.PRNGKey(slot_seed(info))),
            np.uint32)

    def _install_many(self, group) -> None:
        """One-dispatch install of k same-prep-batch windows."""
        tok = self.tokenizer
        slots, prompts, use_ts, temps, rngs, rows = [], [], [], [], [], []
        xkv = group[0][2]
        dxkv = group[0][4]
        for slot, info, _, row, _ in group:
            prompt = tok.sot_sequence(info.language, info.task,
                                      timestamps=info.timestamps)
            info.prompt_len = len(prompt)
            slots.append(slot)
            prompts.append(prompt)
            use_ts.append(info.timestamps)
            temps.append(float(self.temperatures[info.temp_idx]))
            rngs.append(self._rng_for(info))
            rows.append(row)
        self.state = batcher.admit_many(
            self.cfg, self.params, self.state, slots, xkv,
            prompts, use_ts, prompt_len=len(prompts[0]),
            temperatures=temps, rngs=np.stack(rngs), rows=rows,
            draft_cfg=self.draft_cfg, draft_params=self.draft_params,
            draft_xkv=dxkv)
        with self._lock:
            for slot, info, *_ in group:
                self._slots[slot] = info

    def _quality_verdict(self, text: str, avg_logprob: float,
                         no_speech_prob: float,
                         degenerate: bool) -> tuple[str, float]:
        """whisper's per-chunk heuristics → ('emit'|'skip'|'fallback', cr).

        skip: confident silence (no_speech AND low logprob) → empty result.
        fallback: degenerate output (repetition-guard abort, compression
        ratio, or low confidence) → retry at the next ladder temperature."""
        cr = compression_ratio(text)
        if (no_speech_prob > self.no_speech_threshold
                and avg_logprob < self.logprob_threshold):
            return "skip", cr
        if (degenerate or cr > self.compression_ratio_threshold
                or avg_logprob < self.logprob_threshold):
            return "fallback", cr
        return "emit", cr

    def _harvest(self) -> None:
        # ONE device→host fetch for the per-turn check: each np.asarray
        # is a full dispatch round-trip (200 ms through the dev tunnel),
        # and the old per-slot length reads made harvest the serving
        # bottleneck (bench: serving at 24% of the raw loop pre-fix).
        finished, lengths = jax.device_get((self.state.finished,
                                            self.state.length))
        if not finished.any():
            # First-token latency bookkeeping for live partials.
            with self._lock:
                for slot, info in self._slots.items():
                    if info.first_token_at is None and lengths[slot] > 0:
                        info.first_token_at = time.monotonic()
            return
        tokens, pos, sum_lp, no_speech, degenerate = jax.device_get(
            (self.state.tokens, self.state.pos, self.state.sum_logprob,
             self.state.no_speech, self.state.degenerate))
        eot = self.tokenizer.special.eot
        done_mask = np.zeros(self.n_slots, bool)
        retries: list[tuple[int, _SlotInfo]] = []
        now = time.monotonic()
        with self._lock:
            done = [(s, i) for s, i in self._slots.items() if finished[s]]
            for slot, info in done:
                content = [int(t) for t in
                           tokens[slot, info.prompt_len:pos[slot]]
                           if t != eot]
                text = self.tokenizer.decode(content)
                avg_lp = float(sum_lp[slot]) / max(int(lengths[slot]), 1)
                ns = float(no_speech[slot])
                verdict, cr = self._quality_verdict(
                    text, avg_lp, ns, bool(degenerate[slot]))
                temp = float(self.temperatures[info.temp_idx])
                if (verdict == "fallback"
                        and info.temp_idx + 1 < len(self.temperatures)):
                    info.temp_idx += 1
                    log.info("slot %d window %d degenerate (cr=%.2f, "
                             "lp=%.2f%s); retrying at T=%.1f",
                             slot, info.window_id, cr, avg_lp,
                             ", rep-guard" if degenerate[slot] else "",
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
            self.state = batcher.release(self.state, jnp.asarray(done_mask))
        for slot, info in retries:
            self._install(slot, info)
