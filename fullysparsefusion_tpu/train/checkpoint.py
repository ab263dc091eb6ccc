"""Checkpointing — orbax snapshots + reference ``.pth`` conversion.

The reference uses mmcv epoch checkpoints plus ``load_from`` warm-starts
from an FSD pretrain (default_runtime.py:1, FSF_nuScenes_config.py:429;
SURVEY.md §5 checkpoint/resume). Here: orbax for native save/resume of the
full TrainState, and a torch→pytree converter so reference checkpoints can
seed the TPU model (metric-parity north star).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, state) -> None:
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def load_checkpoint(path: str, target):
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def load_model_vars(path: str, vars_template) -> Dict:
    """Restore model variables from a TRAINING checkpoint (full TrainState).

    Inference tools don't carry an optimizer; this rebuilds a structural
    TrainState skeleton around the variable template (the optimizer state
    layout depends only on the param tree) and extracts params/batch_stats.
    """
    import jax.numpy as jnp

    from ..parallel.train import TrainState, make_optimizer

    tx = make_optimizer()
    skeleton = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=vars_template["params"],
        batch_stats=vars_template["batch_stats"],
        opt_state=tx.init(vars_template["params"]),
    )
    state = load_checkpoint(path, skeleton)
    return {"params": state.params, "batch_stats": state.batch_stats}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.pth`` into {name: ndarray} (CPU torch only)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


# Tensor-level torch↔flax layout rules live in torch_map.py (complete map,
# round-trip tested); this module only reads the raw state_dict.
