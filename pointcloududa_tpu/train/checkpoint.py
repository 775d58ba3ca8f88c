"""Checkpointing with the reference's best/last/.Scr-rename semantics.

Mirrors ``src/utils/callbacks.py:33-94`` (``ModelCheckPointCallback``):
- tracks a monitor (``val_lge_dice``, mode=max);
- saves the best ``{epoch, model_state, optimizer_state}`` per network;
- at the final epoch renames the best checkpoint to embed the score
  (``...Scr{monitor:.3}``, ``callbacks.py:81-83``) and writes a last-model
  snapshot;
- one callback instance per network (generator + each discriminator,
  ``train_mscmrseg.py:469-501``).

Storage is Orbax (one directory per checkpoint; atomic, pytree-native)
instead of ``torch.save`` pickles. ``EarlyStoppingCallback``
(``callbacks.py:6-30``) is reproduced too — wired behind a config knob
rather than dead like the reference's.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        # Multi-host: after ``device_get`` every process holds the FULL
        # (replicated) tree, so each rank checkpoints independently to its
        # own path (rank 0 owns the real workdir, the rest write to scratch
        # — see the train CLIs). Restricting ``active_processes`` to this
        # rank makes orbax skip its cross-process barriers and treat the
        # rank as its own primary host; the default all-process barrier
        # protocol assumes one SHARED directory, which we don't use.
        me = jax.process_index()
        mp = ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"rank{me}",
        )
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(multiprocessing_options=mp),
            multiprocessing_options=mp,
        )
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, jax.device_get(tree))


def restore_pytree(path: str, target: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    if target is None:
        return _checkpointer().restore(path)
    return _checkpointer().restore(path, item=jax.device_get(target))


def restore_net_state(path: str, template: Any) -> Any:
    """Restore one network's NetState from a checkpoint directory.

    Tolerates both the trainer layout ``{"epoch", "state": {"net": ...}}``
    and a bare NetState tree — the same dict-or-raw leniency as the
    reference's loaders (``evaluate_mscmrseg.py:109-115``).
    """
    try:
        payload = restore_pytree(path, {"epoch": np.int64(0), "state": {"net": template, "config": None}})
        return jax.tree.unflatten(
            jax.tree.structure(template), jax.tree.leaves(payload["state"]["net"])
        )
    except Exception:
        restored = restore_pytree(path, template)
        return jax.tree.unflatten(jax.tree.structure(template), jax.tree.leaves(restored))


class EarlyStoppingCallback:
    """Patience counter (reference ``callbacks.py:6-30``)."""

    def __init__(self, patience: int, mode: str = "min"):
        assert mode in ("min", "max")
        self.patience = patience
        self.mode = mode
        self.counter = 0
        self.best_result = np.inf if mode == "min" else -np.inf

    def step(self, monitor: float) -> None:
        better = monitor > self.best_result if self.mode == "max" else monitor < self.best_result
        if better:
            self.best_result = monitor
            self.counter = 0
        else:
            self.counter += 1

    def should_stop(self) -> bool:
        return self.counter >= self.patience


class ModelCheckpointCallback:
    """Best/last checkpointing for ONE network's state pytree."""

    def __init__(
        self,
        mode: str = "min",
        best_model_name: Optional[str] = None,
        save_best: bool = False,
        save_last_model: bool = False,
        model_name: str = "weights/model_checkpoint",
        n_epochs: int = 200,
    ):
        assert mode in ("min", "max")
        self.mode = mode
        self.best_result = np.inf if mode == "min" else -np.inf
        self.model_name = model_name
        self.best_model_name = best_model_name or model_name
        self.save_last_model = save_last_model
        self.n_epochs = n_epochs
        self.epoch = 0
        self._save_best = save_best
        self.final_best_path: Optional[str] = None

    def _payload(self, tree: Any, epoch: int) -> Any:
        return {"epoch": np.int64(epoch), "state": jax.device_get(tree)}

    def step(self, monitor: float, tree: Any, epoch: int) -> None:
        if self._save_best:
            better = monitor > self.best_result if self.mode == "max" else monitor < self.best_result
            if epoch == 1 or better:
                self.best_result = monitor
                self.epoch = epoch
                save_pytree(self.best_model_name, self._payload(tree, epoch))
            if epoch == self.n_epochs:
                scored = f"{self.best_model_name}.Scr{np.around(self.best_result, 3)}"
                if os.path.exists(self.best_model_name):
                    if os.path.exists(scored):
                        shutil.rmtree(scored)
                    os.rename(self.best_model_name, scored)
                self.final_best_path = scored
        if self.save_last_model and epoch == self.n_epochs:
            save_pytree(self.model_name, self._payload(tree, epoch))
