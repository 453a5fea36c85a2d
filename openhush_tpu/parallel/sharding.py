"""Device mesh + sharding rules (tensor-parallel × data-parallel over ICI).

The reference has no multi-device path (SURVEY.md §2c: GpuConfig exists but is
never consumed, src/config.rs:899-908). Here sharding is first-class:

- Mesh axes: ("data", "model"). "data" shards batch (concurrent sessions /
  windows); "model" is Megatron-style tensor parallelism over attention heads
  and MLP hidden — the layout whose collectives (psum of per-device partial
  outputs) ride ICI.
- Param rule: column-parallel for q/k/v and fc1 (shard output dim), row-
  parallel for o and fc2 (shard input dim); embeddings/conv/LN replicated.
  XLA GSPMD inserts the reduce at each row-parallel matmul automatically.
- KV caches shard over heads ("model") and batch ("data") so decode steps
  never move cache bytes across chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(n_model: Optional[int] = None,
                devices=None) -> Mesh:
    """Mesh over all (or given) devices, shaped [data, model]."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_model is None:
        n_model = 1 if n == 1 else min(4, n)
    assert n % n_model == 0, f"{n} devices not divisible by model={n_model}"
    arr = np.array(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# Param-tree sharding rules: leaf name → PartitionSpec (leading [L] axis on
# stacked layer weights is never sharded).
_LAYER_RULES = {
    # column-parallel (output dim = heads / ffn hidden)
    "q_w": P(None, None, MODEL_AXIS), "q_b": P(None, MODEL_AXIS),
    "k_w": P(None, None, MODEL_AXIS),
    "v_w": P(None, None, MODEL_AXIS), "v_b": P(None, MODEL_AXIS),
    "xq_w": P(None, None, MODEL_AXIS), "xq_b": P(None, MODEL_AXIS),
    "xk_w": P(None, None, MODEL_AXIS),
    "xv_w": P(None, None, MODEL_AXIS), "xv_b": P(None, MODEL_AXIS),
    "fc1_w": P(None, None, MODEL_AXIS), "fc1_b": P(None, MODEL_AXIS),
    # row-parallel (input dim sharded, output reduced)
    "o_w": P(None, MODEL_AXIS, None),
    "xo_w": P(None, MODEL_AXIS, None),
    "fc2_w": P(None, MODEL_AXIS, None),
}


def param_spec(params) -> dict:
    """PartitionSpec pytree matching a Whisper param pytree."""
    def walk(node, name=""):
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        return _LAYER_RULES.get(name, P())
    return walk(params)


def shard_params(params, mesh: Mesh):
    """Place a (host/numpy) param pytree onto the mesh with TP sharding."""
    specs = param_spec(params)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, specs)


def data_sharding(mesh: Mesh, trailing_none: int = 0):
    """NamedSharding for batched activations: batch on 'data', rest
    replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * trailing_none)))


def cache_spec() -> P:
    """KV cache, flat layout [L, B, T, H*Dh]: batch on data, the
    head-contiguous feature dim on model (head h owns columns
    h*Dh:(h+1)*Dh, so a model-axis split is a split over head groups)."""
    return P(None, DATA_AXIS, None, MODEL_AXIS)


def kv_scale_spec() -> P:
    """Quantized-KV scales [L, B, T, H]: heads on model (aligned with
    cache_spec's head-group split)."""
    return P(None, DATA_AXIS, None, MODEL_AXIS)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_slot_state(state, mesh: Mesh, n_slots: int):
    """Place a continuous-batching SlotState on the mesh: slot (batch)
    dimension over 'data', everything else replicated — the multi-chip
    serving layout (sessions sharded across chips, weights TP within).
    Token-exact vs single-device (tested on a virtual 8-device mesh)."""
    import jax

    def place(a):
        if a.ndim >= 2 and a.shape[1] == n_slots:    # [L, B, ...]
            return jax.device_put(a, NamedSharding(mesh, P(None, DATA_AXIS)))
        if a.ndim >= 1 and a.shape[0] == n_slots:    # [B, ...]
            return jax.device_put(a, NamedSharding(mesh, P(DATA_AXIS)))
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree.map(place, state)


def shard_beam_state(state, mesh: Mesh, n_groups: int,
                     beam_size: int):
    """Place a beam-serving BeamState on the mesh: GROUPS over 'data',
    everything else replicated. The flat G*K row dimension is group-major,
    so splitting it at group boundaries (requires n_groups % n_data == 0)
    keeps every beam expansion's cross-row work — top-k over K·V
    candidates, beam reordering gathers — local to one device; only the
    weights' TP collectives cross chips. Token-exact vs single-device
    (tests/test_beam_server.py on the virtual mesh)."""
    n_data = mesh.shape[DATA_AXIS]
    if n_groups % n_data:
        raise ValueError(f"n_groups={n_groups} not divisible by the data "
                         f"axis ({n_data}); beam groups must not straddle "
                         "devices")
    gk = n_groups * beam_size
    # Structural placement by field name (shape-sniffing misfires when
    # K == G or L == G): [L, G*K, ...] caches and [L, G, ...] group-shared
    # cross-KV split their ROW dim (axis 1) over 'data'; every other
    # field with a leading G*K or G dim splits axis 0.
    axis1_fields = {"cache_k", "cache_v", "cache_ks", "cache_vs",
                    "xkv_k", "xkv_ks", "xkv_v", "xkv_vs"}
    # Coverage guard: a future [L, G*K|G, ...] BeamState field missing
    # from the set would silently fall through to the axis-0 sniff —
    # replicated (perf loss) or, when L coincides with G or G*K, split
    # over its LAYER axis. Catch it structurally instead.
    n_layers = state.cache_k.shape[0]
    for f in state._fields:
        a = getattr(state, f)
        if (f not in axis1_fields and a.ndim >= 2
                and a.shape[0] == n_layers and a.shape[1] in (gk, n_groups)):
            raise AssertionError(
                f"BeamState.{f} looks like a per-layer row-dim buffer "
                f"(shape {a.shape}) but is not in shard_beam_state's "
                "axis1_fields — add it (row dim must split over 'data')")

    n_model = mesh.shape[MODEL_AXIS]

    def spec_for(name, a):
        if name in axis1_fields:
            # Rows over 'data'; the head-contiguous trailing dim (HD for
            # values, H for scales) over 'model' — the same layout as the
            # greedy cache_spec()/kv_scale_spec() AND the layout TP
            # projection outputs already carry. Aligning them stops GSPMD
            # from force-resharding the donated cache buffers at admit
            # (involuntary-full-remat warnings, VERDICT r4 #6). The fp-
            # mode [L, G*K, 1, 1] scale placeholders (and any head count
            # not divisible by the model axis) keep the trailing dim
            # unsplit.
            last = (MODEL_AXIS if a.shape[-1] > 1
                    and a.shape[-1] % n_model == 0 else None)
            return P(None, DATA_AXIS, None, last)
        if a.ndim >= 1 and a.shape[0] in (gk, n_groups):
            return P(DATA_AXIS)
        return P()

    placed = {f: jax.device_put(
        getattr(state, f),
        NamedSharding(mesh, spec_for(f, getattr(state, f))))
        for f in state._fields}
    return type(state)(**placed)


def enable_sharded_flash(mesh: Mesh) -> None:
    """Switch the encoder's flash-attention path to explicit shard_map
    partitioning on `mesh` (batch on 'data', heads on 'model'). Replaces
    the old blanket device_count>1 flash disable: the Pallas kernel then
    runs per-device on its local head/batch block — the same invocation
    shape as the benchmarked single-device call — with no collectives
    (attention is head-parallel)."""
    from openhush_tpu.models.whisper import model as whisper_model
    whisper_model.set_flash_mesh(mesh)


def disable_sharded_flash() -> None:
    from openhush_tpu.models.whisper import model as whisper_model
    whisper_model.set_flash_mesh(None)
