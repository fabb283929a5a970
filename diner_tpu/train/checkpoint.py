"""Checkpoint save/restore (orbax).

TPU-native replacement for Lightning's ModelCheckpoint + ``torch.save``
(reference ``configs/train_dtu.yaml:82-86``, ``src/models/diner.py:317-318``,
``deps/TransMVSNet/train.py:97-104``): the whole train state
{params, batch_stats, opt_state, step} is one pytree, saved atomically; on
multi-host setups orbax handles the host-0 coordination.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax


def save_checkpoint(ckpt_dir, state, step: Optional[int] = None,
                    config_json: Optional[dict] = None):
    """Save `state` (any pytree) under ``ckpt_dir/step_<N>``."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    os.makedirs(ckpt_dir, exist_ok=True)
    if step is None:
        step = int(jax.device_get(state.step))
    path = ckpt_dir / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    if config_json is not None:
        with open(ckpt_dir / "config.json", "w") as f:
            json.dump(config_json, f, indent=2, default=str)
    return str(path)


def latest_checkpoint(ckpt_dir) -> Optional[str]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted(p for p in ckpt_dir.iterdir()
                   if p.is_dir() and p.name.startswith("step_"))
    return str(steps[-1]) if steps else None


def restore_checkpoint(path, target: Any):
    """Restore into the structure of `target` (an abstract or concrete
    state pytree)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target=jax.device_get(target))
