"""Training-run checkpointing.

The reference checkpoints only model weights (`_models/<time>.model` via
VarStore::save, network.rs:29-30) and replay examples as text files;
optimizer state is rebuilt every train() call and resume is manual
(SURVEY.md §5.3-4).  This module keeps that artifact layout AND adds a
full-run checkpoint (weights + optimizer state + buffer file pointer +
generation counter) so a trainer can resume exactly where it stopped.
"""

from __future__ import annotations

import json
import os

import jax
from flax import serialization


def save_run(path: str, *, variables, opt_state=None, meta: dict | None = None):
    """Write a resumable checkpoint directory."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "variables.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    if opt_state is not None:
        with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(opt_state)))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f, indent=2)


def load_run(path: str, *, variables_template, opt_state_template=None):
    """Restore (variables, opt_state | None, meta) from `save_run` output."""
    with open(os.path.join(path, "variables.msgpack"), "rb") as f:
        variables = serialization.from_bytes(variables_template, f.read())
    opt_state = None
    opt_path = os.path.join(path, "opt_state.msgpack")
    if opt_state_template is not None and os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = serialization.from_bytes(opt_state_template, f.read())
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return variables, opt_state, meta
