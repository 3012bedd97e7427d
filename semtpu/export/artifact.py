"""Portable inference artifacts (the ImageJ model-converter analog).

The reference ships a keras -> TF-1.12 frozen-graph converter so trained
models run outside the training stack (`ImageJ Plugin/Convert_Models_to_TF112/`,
SURVEY.md §2.6). The TPU-native equivalent: serialize the jitted forward
function to StableHLO with `jax.export` — weights embedded, shape-polymorphic
over the batch dimension — so any JAX runtime (CPU/GPU/TPU, any host) can run
inference from one self-contained file without semtpu's model code.

Artifact layout: <path>/model.stablehlo (serialized bytes) +
<path>/meta.json (tile shape, channels, normalization contract).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np


@dataclass
class ExportedModel:
    call: callable
    tile_h: int
    tile_w: int
    channels: int
    normalization: str

    def __call__(self, x):
        return self.call(np.asarray(x, np.float32))


def export_unet(trainer, path: str, tile_h: int | None = None,
                tile_w: int | None = None) -> None:
    """Export a trained UNetTrainer's forward pass as a StableHLO artifact.

    Batch dimension is symbolic, spatial dims fixed to the tile shape (the
    serving contract: batched fixed-size tiles — matching the frozen-graph
    contract of the reference's ImageJ path).
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    cfg = trainer.config
    tile_h = tile_h or cfg.tile_h
    tile_w = tile_w or cfg.tile_w
    variables = {"params": jax.device_get(trainer.state.params),
                 "batch_stats": jax.device_get(trainer.state.batch_stats)}
    model = trainer.model

    def fwd(x):
        return model.apply(variables, x, train=False)

    b = jexport.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct((b[0], tile_h, tile_w, 1), jnp.float32)
    exported = jexport.export(jax.jit(fwd))(x_spec)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.stablehlo"), "wb") as fh:
        fh.write(exported.serialize())
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump({"tile_h": tile_h, "tile_w": tile_w, "channels": 1,
                   "normalization": "minmax01_contrast_clip",
                   "kind": "multires_unet",
                   "weighting": float(trainer._weighting)}, fh)


def load_artifact(path: str) -> ExportedModel:
    """Load a StableHLO artifact; returns a callable (B,H,W,1)->(B,H,W,1)."""
    from jax import export as jexport

    with open(os.path.join(path, "model.stablehlo"), "rb") as fh:
        exported = jexport.deserialize(bytearray(fh.read()))
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)

    def call(x):
        return np.asarray(exported.call(x))

    return ExportedModel(call=call, tile_h=meta["tile_h"], tile_w=meta["tile_w"],
                         channels=meta["channels"],
                         normalization=meta["normalization"])
