"""AOT model export for serving (`jax.export` / StableHLO).

The reference deploys trained models by unpickling torch checkpoints into
Python model code (`evaluate.py:140-149`).  The TPU-native serving story is
ahead-of-time compilation: the full rollout forward — parameters baked in as
constants — is lowered once to StableHLO and serialized.  The artifact is
self-contained (no model code, no Python class, no weights file needed at
load time), versioned by StableHLO's compatibility guarantees, and can be
lowered for platforms the exporting host doesn't have (export on CPU, serve
on TPU).

Artifact layout: a single file, json header (magic, shapes, model config,
platforms) + raw `jax.export` blob.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"DLWPXP01"


def export_rollout(
    model,
    params,
    const_shape: Sequence[int] | None,
    pres_shape: Sequence[int] | None,
    prog_shape: Sequence[int],
    platforms: Sequence[str] | None = None,
    dtype=jnp.float32,
):
    """Export the model's full rollout forward with `params` baked in.

    Shapes are [B, T, C, (F,) H, W] like the calling convention; pass None
    for absent constant/prescribed groups.  `platforms` defaults to the
    current backend; pass e.g. ("tpu", "cpu") to build one artifact that
    serves on either.
    """
    from jax import export as jexport

    def serve(const, pres, prog):
        return model.apply({"params": params}, const, pres, prog)

    def spec(shape):
        return (
            None if shape is None
            else jax.ShapeDtypeStruct(tuple(shape), dtype)
        )

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    return jexport.export(jax.jit(serve), **kwargs)(
        spec(const_shape), spec(pres_shape), spec(prog_shape)
    )


def save_exported(path: str, exported, meta: dict | None = None) -> None:
    """Write an exported rollout + json metadata as one artifact file."""
    header = json.dumps(
        {
            "format": "dlwpbench_tpu.export.v1",
            "platforms": list(exported.platforms),
            "in_avals": [str(a) for a in exported.in_avals],
            "out_avals": [str(a) for a in exported.out_avals],
            **(meta or {}),
        }
    ).encode()
    blob = exported.serialize()
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<q", len(header)))
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)


def load_exported(path: str):
    """Load an artifact -> (callable(const, pres, prog), meta dict).

    The callable runs the serialized computation; pass inputs with the
    same structure as at export time — absent groups (exported as None,
    e.g. navier_stokes has no constants/prescribed) are passed as None.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a dlwpbench_tpu export artifact")
        (hlen,) = struct.unpack("<q", f.read(8))
        meta = json.loads(f.read(hlen).decode())
        blob = f.read()
    exported = jexport.deserialize(blob)

    def run(*args):
        # pass args through VERBATIM (including None): the serialized
        # in_tree contains the None leaves groups exported without — the
        # call must have the same pytree structure as at export time
        return exported.call(*args)

    return run, meta


def export_from_run_dir(
    run_dir: str,
    out_path: str,
    batch_size: int = 1,
    sequence_length: int | None = None,
    platforms: Sequence[str] | None = None,
):
    """Export a trained run (config + best checkpoint) to a serving artifact.

    Mirrors the evaluator's restore path (`evaluation/evaluate.py`): the
    run dir's saved config names the model and data shapes; the best
    checkpoint provides the weights.
    """
    from dlwpbench_tpu.models import registry
    from dlwpbench_tpu.training.config import load_saved_config
    from dlwpbench_tpu.training.trainer import (
        TrainState,
        Trainer,
        load_checkpoint,
    )

    cfg = load_saved_config(run_dir)
    model = registry.build_model(cfg.model)
    d = cfg.data
    hpx = cfg.model.get("mesh") == "healpix"
    spatial = (
        (12, int(d.nside), int(d.nside)) if hpx
        else (int(d.height), int(d.width))
    )
    T = int(
        sequence_length
        or cfg.get("testing", {}).get("sequence_length", 17)
    )
    ctx = int(cfg.model.get("context_size", 1))
    B = batch_size
    shapes = {
        "const": (B, 1, int(d.constant_channels), *spatial)
        if int(d.constant_channels) else None,
        "pres": (B, T, int(d.prescribed_channels), *spatial)
        if int(d.prescribed_channels) else None,
        "prog": (B, T, int(d.prognostic_channels), *spatial),
    }

    def zeros(shape):
        return None if shape is None else jnp.zeros(shape, jnp.float32)

    variables = model.init(
        jax.random.PRNGKey(0),
        zeros(shapes["const"]), zeros(shapes["pres"]), zeros(shapes["prog"]),
    )
    tmpl = Trainer(model).init(
        (zeros(shapes["const"]), zeros(shapes["pres"]),
         zeros(shapes["prog"]),
         jnp.zeros((B, T - ctx, int(d.prognostic_channels), *spatial)))
    )
    state = load_checkpoint(run_dir, cfg.model.name, tmpl, kind="best")
    # TrainState.params is the full flax variables dict ({"params": ...})
    weights = state.params.get("params", state.params)
    exported = export_rollout(
        model, weights, shapes["const"], shapes["pres"], shapes["prog"],
        platforms=platforms,
    )
    save_exported(
        out_path, exported,
        meta={
            "model": dict(cfg.model),
            "data": dict(cfg.data),
            "run_dir": os.path.abspath(run_dir),
            # exact call shapes (None = group absent): the serving side
            # must batch/window to these — the artifact is shape-locked
            "shapes": shapes,
            "context_size": ctx,
        },
    )
    return out_path
