"""Checkpoint / resume via Orbax.

Capability parity with the reference's checkpoint subsystem (SURVEY.md #37):
a saved step bundles model params, optimizer state, and the training
metadata dict {epoch, loss, noise_ratio, global_step, best_mean_dice,
project_name, wandb id} (engine.py:113-142); resume restores everything
including the run id for log continuation (train.py:152-164); pretrained
encoder-subtree restore mirrors train.py:166-176; Tester-style
epoch-addressed loading mirrors test.py:85-91.

TPU-native: Orbax async checkpointing of the TrainState pytree — params can
be sharded over a mesh and are saved/restored with their shardings; there is
no DataParallel unwrap (engine.py:124-125) because state is just a pytree.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(path) -> Path:
    return Path(path).absolute()


def save_checkpoint(
    path,
    state: Any,
    metadata: Optional[Dict] = None,
    *,
    async_save: bool = False,
) -> None:
    """Save a TrainState (or any pytree) + JSON metadata to `path`."""
    path = _ckpt_dir(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if async_save:
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        ckptr.wait_until_finished()
    else:
        # close() barriers on the atomic tmp-dir rename, which orbax
        # finalises on a background thread even for the sync checkpointer —
        # without it the checkpoint may not be visible immediately (matters
        # when the process exits right after, e.g. preemption saves)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, state, force=True)
    if metadata is not None:
        with open(path.parent / (path.name + ".meta.json"), "w") as f:
            json.dump(metadata, f)


def restore_checkpoint(path, state_template: Any) -> Tuple[Any, Dict]:
    """Restore a pytree saved by `save_checkpoint`; returns (state, meta)."""
    path = _ckpt_dir(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, state_template)
    meta_path = path.parent / (path.name + ".meta.json")
    meta: Dict = {}
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def restore_params(path, state: Any, *, use_ema: bool = False
                   ) -> Tuple[Any, Dict]:
    """Restore only the model params from a checkpoint into `state`.

    Used by the Tester (test.py:85-91 parity): evaluation does not need the
    optimizer state, and the checkpoint may have been written with a
    different optimizer/schedule configuration than the eval-side template.

    `use_ema=True` selects the EMA parameter tree instead — the analogue of
    evaluating the vendored TrainLoop's `ema_{rate}_{step}.pt` checkpoints
    (guided_diffusion/train_util.py:228-255). Checkpoints trained without
    `ema_rate` carry no EMA tree; that is a configuration error, not a
    silent fallback.
    """
    path = _ckpt_dir(path)
    raw = ocp.StandardCheckpointer().restore(path)  # template-free pytree
    source = raw["params"]
    if use_ema:
        if raw.get("ema_params") is None:
            raise ValueError(
                f"use_ema=True but checkpoint {path} has no ema_params "
                "(was it trained with ema_rate set?)"
            )
        source = raw["ema_params"]
    params = jax.tree_util.tree_map(
        lambda t, r: jax.numpy.asarray(r, t.dtype),
        state.params, source,
    )
    state = state.replace(params=params)
    meta_path = path.parent / (path.name + ".meta.json")
    meta: Dict = {}
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def restore_subtree(params: Any, pretrained: Any, key: str = "embed_model"
                    ) -> Any:
    """Graft a pretrained subtree (e.g. the image encoder) into params.

    The analogue of the reference's pretrained-weight surgery
    (train.py:166-176: load encoder.pt / swinvit.pt into
    model.embed_model[.swinViT]). `key` may be a "/"-separated path, e.g.
    "embed_model/swinViT".
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    def _set(node, path_parts, value):
        part = path_parts[0]
        if len(path_parts) == 1:
            assert part in node, f"{part} not in params subtree"
            node[part] = value
            return
        _set(node[part], path_parts[1:], value)

    root = params["params"] if "params" in params else params
    _set(root, key.split("/"), pretrained)
    return params


def latest_checkpoint(weights_dir, prefix: str = "epoch_") -> Optional[Path]:
    """Find the newest epoch-addressed checkpoint (test.py:85-91 parity)."""
    weights_dir = Path(weights_dir)
    if not weights_dir.exists():
        return None
    candidates = []
    for p in weights_dir.iterdir():
        if p.name.startswith(prefix):
            try:
                candidates.append((int(p.name[len(prefix):].split(".")[0]), p))
            except ValueError:
                continue
    if not candidates:
        return None
    return max(candidates)[1]


class PreemptionGuard:
    """Checkpoint-at-next-safe-point on SIGTERM / SIGUSR1.

    Preemptible TPU VMs deliver SIGTERM shortly before shutdown; the
    reference has no preemption handling (its launcher kills the process
    group on SIGINT, light_training/launch.py:109-111, and recovery is a
    manual resume). The Trainer polls `requested` once per step and saves a
    resumable `preempt` checkpoint before exiting cleanly.

    Signal handlers can only be installed from the main thread; elsewhere
    (e.g. pytest workers) the guard degrades to a manual flag.
    """

    def __init__(self, install: bool = True):
        self.requested = False
        self._installed = False
        if install:
            import signal
            import threading
            if threading.current_thread() is threading.main_thread():
                for sig in (signal.SIGTERM, signal.SIGUSR1):
                    signal.signal(sig, self._handler)
                self._installed = True

    def _handler(self, signum, frame):  # pragma: no cover - signal path
        self.requested = True
