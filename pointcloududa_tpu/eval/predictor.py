"""Serving-oriented inference: a compile-once predictor and portable
StableHLO export.

The reference has no serving story (inference = re-running the eval script
with a checkpoint). For production deployment this module provides:

- :class:`Predictor` — weights baked in, one compiled executable reused
  across calls, fixed batch with tail padding;
- :func:`export_predictor` / :func:`load_exported` — ``jax.export``
  StableHLO serialization: the artifact embeds the weights and runs on any
  matching runtime without Python model code.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pointcloududa_tpu.config import UDAConfig
from pointcloududa_tpu.train.state import build_models


class Predictor:
    """Compiled segmentation forward. Returns logits (and the point cloud
    when the config has the point head)."""

    def __init__(self, cfg: UDAConfig, net_state, batch_size: int = 8):
        self.cfg = cfg
        self.batch_size = batch_size
        gen, *_ = build_models(cfg)
        variables = {"params": net_state.params, "batch_stats": net_state.batch_stats}

        def fwd(x):
            logits, _, points = gen.apply(variables, x, train=False)
            return (logits, points) if cfg.point_head else (logits, None)

        self._fwd = jax.jit(fwd)

    def __call__(self, images: np.ndarray):
        """images: (N, H, W, C) float32 — any N; internally padded to the
        compiled batch size."""
        n = len(images)
        bs = self.batch_size
        logits_out, points_out = [], []
        for i in range(0, n, bs):
            chunk = images[i : i + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            logits, points = self._fwd(jnp.asarray(chunk))
            keep = bs - pad
            logits_out.append(np.asarray(logits)[:keep])
            if points is not None:
                points_out.append(np.asarray(points)[:keep])
        logits = np.concatenate(logits_out)
        points = np.concatenate(points_out) if points_out else None
        return logits, points


def export_predictor(cfg: UDAConfig, net_state, batch_size: int = 8) -> bytes:
    """Serialize the forward (weights embedded) to portable StableHLO."""
    from jax import export as jax_export

    gen, *_ = build_models(cfg)
    variables = jax.device_get({"params": net_state.params, "batch_stats": net_state.batch_stats})

    def fwd(x):
        logits, _, points = gen.apply(variables, x, train=False)
        return (logits, points) if cfg.point_head else logits

    spec = jax.ShapeDtypeStruct((batch_size, cfg.crop_size, cfg.crop_size, cfg.in_channels), jnp.float32)
    return bytes(jax_export.export(jax.jit(fwd))(spec).serialize())


def load_exported(blob: bytes):
    """Returns a callable(images) over the exported artifact."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return lambda x: exported.call(jnp.asarray(x, jnp.float32))
