"""Model checkpointing: npz (simple, portable) and Orbax (sharding-aware).

Parity context: the reference's "checkpoints" are GGML model files with
resumable downloads (SURVEY.md §5). Here model weights live as JAX pytrees;
npz covers the single-host case (models/whisper/convert.py), while Orbax
adds what TPU deployments need: async saves, restore-with-sharding directly
onto a (data, model) mesh without host-RAM staging, and fine-tuning
train-state checkpoints (params + opt_state + step).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

log = logging.getLogger(__name__)


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_orbax(params: Any, path: str) -> None:
    """Save a pytree checkpoint to `path` (a directory)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_orbax(path: str, template: Optional[Any] = None,
               shardings: Optional[Any] = None) -> Any:
    """Restore a pytree; with `shardings` (a pytree of NamedSharding
    matching the params) arrays land directly on their mesh shards."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None and shardings is not None:
            import jax
            abstract = jax.tree.map(
                lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                                  sharding=s),
                template, shardings)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def save_train_state(path: str, params: Any, opt_state: Any,
                     step: int) -> None:
    """Fine-tuning checkpoint (params + optimizer + step)."""
    save_orbax({"params": params, "opt_state": opt_state,
                "step": step}, path)


def load_train_state(path: str) -> tuple[Any, Any, int]:
    tree = load_orbax(path)
    return tree["params"], tree["opt_state"], int(tree["step"])


def load_params(path: str) -> Any:
    """Load from either format: a .npz file or an Orbax directory."""
    if os.path.isdir(path):
        return load_orbax(path)
    from openhush_tpu.models.whisper.convert import load_npz
    return load_npz(path)
