"""bf16 dtype stability across the model zoo.

Mixed-precision training (`Trainer(compute_dtype="bfloat16")`) casts params
and inputs to bf16 and runs the rollout scan in bf16.  Any fp32 constant
inside a model's `step` (numpy bias tables, graph edge features, DFT
matrices) silently promotes the output back to fp32, which breaks the scan
carry (`lax.scan` requires carry-in == carry-out types) — exactly the
failure ladder rungs graphcast@32m@bf16 / mgn@32m@bf16 hit.  This test pins
every registered family: bf16 in -> bf16 out.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlwpbench_tpu.models import build_model

# tiny configs per family; "_spatial" overrides the (H, W) grid
ZOO_BF16 = {
    "UNet": {"hidden_channels": [8, 16]},
    "UNetHPX": {"hidden_channels": [8, 16], "_spatial": (12, 8, 8)},
    "ConvLSTM": {"hidden_sizes": [8]},
    "ConvLSTMHPX": {"hidden_sizes": [8], "_spatial": (12, 8, 8)},
    "FNO2DModule": {"hidden_channels": 16, "lifting_channels": 16,
                    "projection_channels": 16, "n_layers": 2,
                    "n_modes": [4, 4]},
    "TFNO2DModule": {"hidden_channels": 16, "lifting_channels": 16,
                     "projection_channels": 16, "n_layers": 2,
                     "n_modes": [4, 4], "rank": 0.5},
    "SFNO2DModule": {"embed_dim": 16, "num_layers": 2, "height": 16,
                     "width": 32},
    "FourCastNet": {"img_height": 16, "img_width": 32, "patch_size": [2, 2],
                    "embed_dim": 16, "depth": 2, "num_blocks": 2},
    "ModernUNet": {"hidden_channels": [8, 16]},
    "MUNetHPX": {"hidden_channels": [8, 16], "_spatial": (12, 8, 8)},
    "SwinTransformer": {"img_height": 16, "img_width": 32, "patch_size": 1,
                        "embed_dim": 16, "depths": [2], "num_heads": [2]},
    "SwinTransformerHPX": {"img_height": 8, "img_width": 8, "patch_size": 1,
                           "embed_dim": 16, "depths": [2], "num_heads": [2],
                           "_spatial": (12, 8, 8)},
    "PanguWeather": {"embed_dim": 24, "num_heads": [2, 4, 4, 2],
                     "window_size": [2, 6, 12], "patch_size": [1, 1],
                     "n_lat": 16, "n_lon": 32},
    "MeshGraphNet": {"processor_size": 2, "hidden_dim_processor": 16,
                     "hidden_dim_node_encoder": 16,
                     "hidden_dim_edge_encoder": 16,
                     "hidden_dim_node_decoder": 16,
                     "graph_height": 16, "graph_width": 32},
    "GraphCastNet": {"input_height": 16, "input_width": 32, "mesh_level": 1,
                     "processor_layers": 2, "hidden_dim": 16},
    "DISTANA": {"hidden_size": 8, "layers": 1},
}


@pytest.mark.parametrize("name", sorted(ZOO_BF16))
def test_bf16_rollout_dtype_stable(name):
    cfg = dict(ZOO_BF16[name])
    spatial = cfg.pop("_spatial", (16, 32))
    m = build_model({
        "type": name, "constant_channels": 2, "prescribed_channels": 1,
        "prognostic_channels": 2, "context_size": 1, **cfg,
    })
    r = np.random.default_rng(0)
    const = jnp.asarray(r.standard_normal((1, 1, 2, *spatial)), jnp.float32)
    pres = jnp.asarray(r.standard_normal((1, 3, 1, *spatial)), jnp.float32)
    prog = jnp.asarray(r.standard_normal((1, 3, 2, *spatial)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), const, pres, prog)

    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.bfloat16)
        return x

    p16 = jax.tree.map(cast, params)
    out = m.apply(p16, cast(const), cast(pres), cast(prog))
    assert out.dtype == jnp.bfloat16, f"{name} promoted to {out.dtype}"
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
