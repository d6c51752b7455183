"""AOT export (`utils/export.py`): serialized StableHLO serving artifacts."""

from __future__ import annotations

import os

import numpy as np
import pytest


class TestExportRoundtrip:
    def test_rollout_export_matches_apply(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.utils.export import (
            export_rollout,
            load_exported,
            save_exported,
        )

        model = UNet(
            constant_channels=2, prescribed_channels=1, prognostic_channels=3,
            hidden_channels=(4, 8), context_size=1,
        )
        B, T, H, W = 2, 4, 16, 32
        rng = np.random.default_rng(0)
        const = jnp.asarray(
            rng.standard_normal((B, 1, 2, H, W)).astype(np.float32))
        pres = jnp.asarray(
            rng.standard_normal((B, T, 1, H, W)).astype(np.float32))
        prog = jnp.asarray(
            rng.standard_normal((B, T, 3, H, W)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), const, pres, prog)
        want = np.asarray(model.apply(variables, const, pres, prog))

        exported = export_rollout(
            model, variables["params"],
            const.shape, pres.shape, prog.shape,
        )
        path = os.path.join(str(tmp_path), "unet.stablehlo")
        save_exported(path, exported, meta={"model": {"type": "UNet"}})
        assert os.path.getsize(path) > 0

        run, meta = load_exported(path)
        assert meta["model"]["type"] == "UNet"
        got = np.asarray(run(const, pres, prog))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_export_absent_groups_served_as_none(self, tmp_path):
        """Artifacts exported with const/pres absent (None specs — the
        navier_stokes shape) must be callable by passing None through:
        run() may not strip Nones (the serialized in_tree contains them)."""
        import jax
        import jax.numpy as jnp

        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.utils.export import (
            export_rollout,
            load_exported,
            save_exported,
        )

        model = UNet(
            constant_channels=0, prescribed_channels=0, prognostic_channels=2,
            hidden_channels=(4, 8), context_size=1,
        )
        B, T, H, W = 1, 3, 16, 32
        prog = jnp.asarray(np.random.default_rng(1).standard_normal(
            (B, T, 2, H, W)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), None, None, prog)
        want = np.asarray(model.apply(variables, None, None, prog))

        exported = export_rollout(
            model, variables["params"], None, None, prog.shape,
        )
        path = os.path.join(str(tmp_path), "ns_unet.stablehlo")
        save_exported(path, exported, meta={"model": {"type": "UNet"}})
        run, _ = load_exported(path)
        got = np.asarray(run(None, None, prog))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_bad_magic_rejected(self, tmp_path):
        from dlwpbench_tpu.utils.export import load_exported

        p = os.path.join(str(tmp_path), "junk.bin")
        with open(p, "wb") as f:
            f.write(b"NOTANARTIFACT")
        with pytest.raises(ValueError, match="not a dlwpbench_tpu export"):
            load_exported(p)

    def test_serve_cli_end_to_end(self, tmp_path):
        """Train (CLI) -> export (CLI) -> serve (CLI): the code-free
        serving path writes forecast files + metrics from the artifact."""
        import json

        from scripts.export_model import main as export_main
        from scripts.serve import main as serve_main
        from scripts.train import main as train_main

        run_dir = os.path.join(str(tmp_path), "run")
        train_main([
            "model=unet", "data=synthetic",
            "data.height=16", "data.width=32",
            "training.epochs=1", "training.batch_size=2",
            "training.sequence_length=3", "validation.sequence_length=3",
            f"run_dir={run_dir}",
        ])
        art = os.path.join(str(tmp_path), "unet.stablehlo")
        export_main(["-c", run_dir, "-o", art,
                     "--batch-size", "2", "--sequence-length", "3"])
        out_dir = os.path.join(str(tmp_path), "serving")
        serve_main(["-a", art, "-c", run_dir, "--out-dir", out_dir])
        m = json.load(open(os.path.join(out_dir, "metrics.json")))
        assert "rmse" in m and all(
            np.isfinite(v).all() for v in m["rmse"].values()
        )
        s = json.load(open(os.path.join(out_dir, "serving.json")))
        assert s["gridpoints_per_s"] > 0
        # batch-size mismatch is refused (the artifact is shape-locked)
        with pytest.raises(ValueError, match="shape-locked"):
            serve_main(["-a", art, "-c", run_dir, "--out-dir", out_dir,
                        "--batch-size", "5"])

    def test_export_from_run_dir_cli(self, tmp_path):
        """Train one tiny epoch via the real CLI, export the run, serve."""
        import jax.numpy as jnp

        from scripts.export_model import main as export_main
        from scripts.train import main as train_main

        run_dir = os.path.join(str(tmp_path), "run")
        train_main([
            "model=unet", "data=synthetic",
            "data.height=16", "data.width=32",
            "training.epochs=1", "training.batch_size=2",
            "training.sequence_length=3", "validation.sequence_length=3",
            f"run_dir={run_dir}",
        ])
        out = os.path.join(str(tmp_path), "unet.stablehlo")
        export_main([
            "-c", run_dir, "-o", out,
            "--batch-size", "1", "--sequence-length", "3",
        ])

        from dlwpbench_tpu.utils.export import load_exported

        run, meta = load_exported(out)
        cfg = meta["model"]
        const = jnp.zeros((1, 1, cfg["constant_channels"], 16, 32), jnp.float32)
        pres = jnp.zeros((1, 3, cfg["prescribed_channels"], 16, 32), jnp.float32)
        prog = jnp.zeros((1, 3, cfg["prognostic_channels"], 16, 32), jnp.float32)
        out_arr = np.asarray(run(const, pres, prog))
        assert out_arr.shape[0] == 1 and out_arr.shape[1] == 2
        assert np.isfinite(out_arr).all()
        assert cfg["type"] == "UNet"
