"""Checkpointing.

The reference checkpoints best-accuracy model weights with torch.save each
epoch (demo_sgrace.py:595-610) and ships pretrained .ptx weights for preload
fine-tuning. Here: msgpack via flax.serialization for single-host (the .ptx
analogue), plus orbax for sharded/multi-host checkpoints of full train state
(params + optimizer), which the reference lacks entirely.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, params: Any) -> None:
    """Save a params pytree (best-model checkpoint, torch.save analogue)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_checkpoint(path: str, target: Any) -> Any:
    """Load params saved by save_checkpoint into the structure of target."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_train_state_orbax(directory: str, state, step: int) -> None:
    """Full train-state checkpoint (params + optimizer) via orbax —
    multi-host/sharded capable."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(os.path.abspath(directory), f"step_{step}"),
            jax.device_get(state),
        )


def load_train_state_orbax(directory: str, target, step: int):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.join(os.path.abspath(directory), f"step_{step}"),
            target=target,
        )
