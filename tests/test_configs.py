"""Every committed model config must compose, build, and run a tiny forward.

The reference ships 22 model config files (`configs/model/`, SURVEY §5);
this sweep keeps our matching set alive — a config that drifts from its
model's fields fails here, not at a user's first training run.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_DIR = os.path.join(REPO, "configs")
MODEL_CFGS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(CFG_DIR, "model", "*.yaml"))
)

# tiny-shape overrides so the sweep stays fast; healpix models get nside 8
_LL = [
    "data.height=16", "data.width=32",
    "training.sequence_length=3", "validation.sequence_length=3",
]


def _tiny_model_overrides(name: str, cfg) -> list[str]:
    m = cfg.model
    ov = []
    t = m.get("type")
    if t == "SwinTransformer":
        ov.append("model.embed_dim=8")
    elif t == "PanguWeather":  # embed_dim must divide num_heads [6,12,12,6]
        ov.append("model.embed_dim=24")
    if "processor_layers" in m:
        ov.append("model.processor_layers=3")
    if "processor_size" in m:
        ov.append("model.processor_size=2")
    if "depth" in m and t == "FourCastNet":
        ov.append("model.depth=2")
    return ov


@pytest.mark.parametrize("name", MODEL_CFGS)
def test_model_config_builds_and_steps(name):
    import jax
    import jax.numpy as jnp

    from dlwpbench_tpu.models import registry
    from dlwpbench_tpu.training.config import load_config

    cfg = load_config(CFG_DIR, overrides=[f"model={name}", *_LL])
    cfg = load_config(
        CFG_DIR,
        overrides=[f"model={name}", *_LL, *_tiny_model_overrides(name, cfg)],
    )
    model = registry.build_model(cfg.model)

    hpx = cfg.model.get("mesh") == "healpix"
    H, W = (8, 8) if hpx else (int(cfg.data.height), int(cfg.data.width))
    Cc = int(cfg.data.constant_channels)
    Cp = int(cfg.data.prescribed_channels)
    Cq = int(cfg.data.prognostic_channels)
    ctx = int(cfg.model.get("context_size", 1))
    B, T = 1, ctx + 1
    spatial = (12, H, W) if hpx else (H, W)

    rng = np.random.default_rng(0)
    const = jnp.asarray(
        rng.standard_normal((B, 1, Cc, *spatial)).astype(np.float32)
    )
    pres = jnp.asarray(
        rng.standard_normal((B, T, Cp, *spatial)).astype(np.float32)
    )
    prog = jnp.asarray(
        rng.standard_normal((B, T, Cq, *spatial)).astype(np.float32)
    )

    variables = model.init(jax.random.PRNGKey(0), const, pres, prog)
    out = model.apply(variables, const, pres, prog)
    assert out.shape == (B, T - ctx, Cq, *spatial)
    assert np.isfinite(np.asarray(out)).all()


class TestInterpolationResolver:
    """Hydra-like strictness (training/config.py): missing keys and cycles
    raise instead of silently producing 'None' strings; string-context
    references resolve recursively."""

    def _resolve(self, raw):
        from dlwpbench_tpu.training.config import (
            _resolve_interpolations,
            _wrap,
        )

        return _resolve_interpolations(_wrap(raw))

    def test_chained_string_interpolation(self):
        cfg = self._resolve({
            "data": {"tag": "ns64"},
            "model": {"name": "${data.tag}_net"},
            "run_dir": "outputs/${model.name}",
        })
        assert cfg["run_dir"] == "outputs/ns64_net"
        assert cfg["model"]["name"] == "ns64_net"

    def test_missing_key_raises(self):
        import pytest as _pytest

        with _pytest.raises(KeyError, match="missing key"):
            self._resolve({"run_dir": "outputs/${model.nmae}",
                           "model": {"name": "x"}})

    def test_cycle_raises(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="cycle"):
            self._resolve({"a": "${b}", "b": "${a}"})
