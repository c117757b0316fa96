"""Checkpoint / resume via Orbax.

Reproduces the reference scheme (train.py:332-339, utils.py:758-760):
per-epoch checkpoints ``model_{epoch}`` holding {params, opt_state, step}
plus the run args, written by process 0 only; ``--resume`` restores
everything, ``--start_from_weights`` restores params only.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from detectinblur_tpu.parallel.mesh import is_main_process
from detectinblur_tpu.train.state import TrainState


def save_checkpoint(output_dir: str, state: TrainState, epoch: int,
                    args: Optional[dict] = None, bn_stats=None) -> str:
    path = os.path.join(os.path.abspath(output_dir), f"model_{epoch}")
    if is_main_process():
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if bn_stats is not None:
            # Live-BN models (--unfrozen_batch_norm / mobile_net torsos):
            # running stats are model state and must survive resume.
            payload["bn_stats"] = bn_stats
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, payload)
        if args is not None:
            with open(os.path.join(output_dir, f"args_{epoch}.json"), "w") as f:
                json.dump(args, f, indent=2, default=str)
    return path


def restore_checkpoint(path: str, template: TrainState, bn_stats_template=None):
    """Restore {params, opt_state, step} (+ bn_stats when a template for it
    is given — then returns (state, bn_stats))."""
    items = {
        "params": template.params,
        "opt_state": template.opt_state,
        "step": template.step,
    }
    if bn_stats_template is not None:
        items["bn_stats"] = bn_stats_template
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), items)
    state = TrainState(restored["step"], restored["params"],
                       restored["opt_state"])
    if bn_stats_template is not None:
        return state, restored["bn_stats"]
    return state


def restore_weights(path: str, params_template) -> Any:
    """--start_from_weights: params only (train.py:260-263).

    Accepts either a full ``save_checkpoint`` directory — restores just its
    "params" subtree via a partial restore, leaving optimizer state and step
    untouched — or a bare params-tree checkpoint. The branch is decided by
    the checkpoint's own metadata: Orbax's partial restore silently returns
    the TEMPLATE (i.e. the caller's fresh init) for an absent subtree
    rather than raising, so a try/except here would load wrong weights
    without a sound."""
    path = os.path.abspath(path)
    if checkpoint_keys(path) >= {"params", "opt_state", "step"}:
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            out = ckptr.restore(path, args=ocp.args.PyTreeRestore(
                item={"params": params_template}, partial_restore=True))
        return out["params"]
    # Bare params tree.
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, params_template)


def checkpoint_keys(path: str) -> set:
    """Top-level pytree keys of an Orbax checkpoint directory.

    A metadata READ failure propagates (corrupt/missing checkpoint should
    fail loudly, not silently demote a full checkpoint to a bare tree);
    only a non-mapping pytree root (list/array checkpoints, which ARE
    bare trees) maps to the empty set."""
    with ocp.StandardCheckpointer() as ckptr:
        md = ckptr.metadata(os.path.abspath(path)).item_metadata
    try:
        return set(md.keys())
    except (AttributeError, TypeError):
        return set()


def restore_subtree(path: str, key: str, template):
    """Restore one top-level subtree of a checkpoint, or return the
    template (with a warning) when the checkpoint doesn't carry it.

    This is THE way to partially restore here: Orbax's partial restore
    silently returns the template for an absent subtree rather than
    raising, so presence must come from the checkpoint's own metadata."""
    if key in checkpoint_keys(path):
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            out = ckptr.restore(
                os.path.abspath(path),
                args=ocp.args.PyTreeRestore(
                    item={key: template}, partial_restore=True))
        return out[key]
    print(f"checkpoint has no {key}; using the fresh template")
    return template


def latest_epoch(output_dir: str) -> Optional[int]:
    """Autodiscover the newest model_{epoch} (deblur model.py:61-132 has
    the same convention for its own checkpoints)."""
    if not os.path.isdir(output_dir):
        return None
    epochs = []
    for name in os.listdir(output_dir):
        if name.startswith("model_"):
            try:
                epochs.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return max(epochs) if epochs else None
