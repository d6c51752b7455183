"""Versioned model-package checkpoints (the Modulus `.mdlus` analog).

Reference: `models/graphcast/utils/module.py:175-346` — GraphCast/MGN-lineage
models save versioned tar archives containing the weights plus a metadata
json (model name, version, argument dict) and can be re-instantiated from
file via the registry.  Here: a zip archive with

    metadata.json   {name, type, version, args, format}
    params.msgpack  flax-serialized parameter pytree

`load_module_checkpoint` rebuilds the model from the registry with the saved
args and returns (model, params).
"""

from __future__ import annotations

import json
import os
import zipfile

from flax import serialization

FORMAT_VERSION = "dlwpbench_tpu.module.v1"


def save_module_checkpoint(path: str, model, params, version: str = "0.1.0"):
    fields = getattr(model, "__dataclass_fields__", {})
    args = {}
    for k in fields:
        v = getattr(model, k)
        if isinstance(v, (int, float, str, bool, type(None))):
            args[k] = v
        elif isinstance(v, (tuple, list)):
            args[k] = list(v)
    meta = {
        "format": FORMAT_VERSION,
        "type": type(model).__name__,
        "name": getattr(model, "name", type(model).__name__),
        "version": version,
        "args": args,
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("metadata.json", json.dumps(meta, indent=1))
        z.writestr("params.msgpack", serialization.to_bytes(params))


def load_module_checkpoint(path: str):
    """Returns (model, params) re-instantiated from the archive."""
    from dlwpbench_tpu.models import registry
    import dlwpbench_tpu.models  # noqa: F401  (populate registry)

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("metadata.json"))
        blob = z.read("params.msgpack")
    if meta.get("format") != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint format {meta.get('format')!r}")
    cls = registry.get_model_class(meta["type"])
    args = dict(meta["args"])
    for k, v in list(args.items()):
        if isinstance(v, list):
            args[k] = tuple(v)
    model = cls(**args)
    params = serialization.msgpack_restore(blob)
    return model, params
