"""Trainer integration tests: fit loop, checkpoint resume, remat rollout."""

import numpy as np
import pytest


def _make_ds(T=48, Cq=2, H=8, W=16, seq=4):
    from dlwpbench_tpu.data.dataset import WindowedWeatherDataset

    rng = np.random.default_rng(0)
    prog = np.cumsum(
        0.1 * rng.standard_normal((T, Cq, H, W)), axis=0
    ).astype(np.float32)
    return WindowedWeatherDataset(prognostic=prog, sequence_length=seq, context_size=1)


class TestFitAndResume:
    def test_fit_checkpoints_and_resume(self, tmp_path):
        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.training.trainer import (
            Trainer,
            load_checkpoint,
        )

        ds = _make_ds()
        model = UNet(
            constant_channels=0,
            prescribed_channels=0,
            prognostic_channels=2,
            hidden_channels=(4,),
            context_size=1,
        )
        tr = Trainer(model, epochs=2, learning_rate=1e-3)
        state = tr.init(next(iter(ds.batches(2))))
        run_dir = str(tmp_path)
        tr.fit(state, ds, ds, batch_size=4, run_dir=run_dir, model_name="m",
               verbose=False)
        assert state.epoch == 2
        assert (tmp_path / "checkpoints" / "m_last.ckpt").exists()
        assert (tmp_path / "checkpoints" / "m_best.ckpt").exists()

        # resume: restored state continues from epoch 2 with more epochs
        tr2 = Trainer(model, epochs=3, learning_rate=1e-3)
        tpl = tr2.init(next(iter(ds.batches(2))))
        restored = load_checkpoint(run_dir, "m", tpl, kind="last")
        assert restored.epoch == 2
        assert np.isfinite(restored.best_val_error)
        tr2.fit(restored, ds, ds, batch_size=4, run_dir=run_dir,
                model_name="m", verbose=False)
        assert restored.epoch == 3

    def test_loss_decreases(self):
        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.training.trainer import Trainer

        ds = _make_ds(T=64)
        model = UNet(
            constant_channels=0,
            prescribed_channels=0,
            prognostic_channels=2,
            hidden_channels=(8,),
            context_size=1,
        )
        tr = Trainer(model, epochs=5, learning_rate=3e-3)
        state = tr.init(next(iter(ds.batches(2))))
        l0 = tr.train_epoch(state, ds, batch_size=8)
        for _ in range(4):
            l = tr.train_epoch(state, ds, batch_size=8)
        assert l < l0

    def test_grad_accumulation_equivalence(self):
        """accum=2 over a batch ~ single big-batch step (same grads modulo
        averaging order)."""
        import jax

        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.training.trainer import Trainer

        ds = _make_ds()
        model = UNet(
            constant_channels=0,
            prescribed_channels=0,
            prognostic_channels=2,
            hidden_channels=(4,),
            context_size=1,
        )
        t1 = Trainer(model, epochs=1, clip_gradients=False)
        t2 = Trainer(model, epochs=1, clip_gradients=False,
                     gradient_accumulation_steps=2)
        s1 = t1.init(next(iter(ds.batches(4))))
        s2 = t2.init(next(iter(ds.batches(4))))
        l1 = t1.train_epoch(s1, ds, batch_size=4, shuffle=False)
        l2 = t2.train_epoch(s2, ds, batch_size=4, shuffle=False)
        assert l1 == pytest.approx(l2, rel=1e-4)
        d = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            s1.params, s2.params,
        )
        assert max(jax.tree.leaves(d)) < 1e-5


class TestRemat:
    def test_remat_same_values_and_grads(self):
        import jax
        import jax.numpy as jnp

        from dlwpbench_tpu.models.unet import UNet

        kw = dict(
            constant_channels=0,
            prescribed_channels=0,
            prognostic_channels=2,
            hidden_channels=(4,),
            context_size=1,
        )
        m0 = UNet(**kw)
        m1 = UNet(remat=True, **kw)
        prog = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 5, 2, 8, 16)),
            jnp.float32,
        )
        p = m0.init(jax.random.PRNGKey(0), None, None, prog)

        def loss(params, model):
            return (model.apply(params, None, None, prog) ** 2).mean()

        l0, g0 = jax.value_and_grad(loss)(p, m0)
        l1, g1 = jax.value_and_grad(loss)(p, m1)
        assert float(l0) == pytest.approx(float(l1), rel=1e-6)
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), g0, g1
        )
        assert max(jax.tree.leaves(diff)) < 1e-5

        # remat policies trade recompute for HBM but must not change math
        for policy in ("dots", "dots_no_batch"):
            mp = UNet(remat=True, remat_policy=policy, **kw)
            lp, gp = jax.value_and_grad(loss)(p, mp)
            assert float(lp) == pytest.approx(float(l0), rel=1e-6)
            diff = jax.tree.map(
                lambda a, b: float(jnp.abs(a - b).max()), g0, gp
            )
            assert max(jax.tree.leaves(diff)) < 1e-5

    def test_remat_stateful_scan_models(self):
        """ConvLSTM/DISTANA scan with their own bespoke bodies (persistent
        h/c, lateral lattice state) — remat must preserve values and grads,
        and must actually reduce what is saved for backward."""
        import jax
        import jax.numpy as jnp
        from jax._src.ad_checkpoint import saved_residuals

        from dlwpbench_tpu.models.convlstm import ConvLSTM
        from dlwpbench_tpu.models.distana import DISTANA

        prog = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 6, 2, 8, 16)),
            jnp.float32,
        )
        for cls, kw in (
            (ConvLSTM, dict(hidden_sizes=(6, 6))),
            (DISTANA, dict(hidden_size=6, layers=2)),
        ):
            m0 = cls(constant_channels=0, prescribed_channels=0,
                     prognostic_channels=2, context_size=1, **kw)
            m1 = m0.clone(remat=True)
            p = m0.init(jax.random.PRNGKey(0), None, None, prog)

            def loss(params, model):
                return (model.apply(params, None, None, prog) ** 2).mean()

            l0, g0 = jax.value_and_grad(loss)(p, m0)
            l1, g1 = jax.value_and_grad(loss)(p, m1)
            assert float(l0) == pytest.approx(float(l1), rel=1e-6)
            diff = jax.tree.map(
                lambda a, b: float(jnp.abs(a - b).max()), g0, g1
            )
            assert max(jax.tree.leaves(diff)) < 1e-5

            n_saved = lambda model: sum(
                int(np.prod(aval.shape))
                for aval, _ in saved_residuals(
                    lambda pp: loss(pp, model), p)
            )
            assert n_saved(m1) < 0.5 * n_saved(m0), cls.__name__


class TestMixedPrecision:
    def test_bf16_compute_fp32_master(self):
        """compute_dtype='bfloat16': forward/backward in bf16, master params
        and AdamW state stay fp32, loss trajectory tracks the fp32 run."""
        import jax
        import jax.numpy as jnp

        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.training.trainer import Trainer

        ds = _make_ds(T=64)
        kw = dict(constant_channels=0, prescribed_channels=0,
                  prognostic_channels=2, hidden_channels=(8,), context_size=1)

        losses = {}
        for dtype in (None, "bfloat16"):
            tr = Trainer(UNet(**kw), epochs=3, learning_rate=1e-3,
                         compute_dtype=dtype)
            state = tr.init(next(iter(ds.batches(2))))
            assert all(
                x.dtype == jnp.float32
                for x in jax.tree.leaves(state.params)
            )
            seen = []
            tr.fit(state, ds, ds, batch_size=8, verbose=False,
                   on_epoch_end=lambda st, tl, vl, pl: seen.append(tl))
            # master params stay fp32 after bf16 steps
            assert all(
                x.dtype == jnp.float32
                for x in jax.tree.leaves(state.params)
            )
            losses[dtype] = seen
        assert losses["bfloat16"][-1] < losses["bfloat16"][0]  # it learns
        # bf16 loss within 20% of fp32 at every epoch
        for a, b in zip(losses[None], losses["bfloat16"]):
            assert abs(a - b) / a < 0.2

    def test_bf16_diffusion_step_finite(self):
        import numpy as np

        from dlwpbench_tpu.models.modern_unet import DiffModernUNet
        from dlwpbench_tpu.training.trainer import Trainer

        model = DiffModernUNet(constant_channels=0, prescribed_channels=0,
                               prognostic_channels=2, hidden_channels=(8, 16),
                               context_size=1)
        tr = Trainer(model, epochs=1, learning_rate=1e-3,
                     training_type="diffusion", compute_dtype="bfloat16")
        rng = np.random.default_rng(0)
        prog = rng.standard_normal((4, 2, 2, 8, 16)).astype(np.float32)
        state = tr.init((None, None, prog, prog[:, 1:]))
        import jax.numpy as jnp

        _, _, loss = tr._train_step(
            state.params, state.opt_state, None, None,
            jnp.asarray(prog), jnp.asarray(prog[:, 1:]),
            jnp.float32(1e-3), __import__("jax").random.PRNGKey(0),
        )
        assert np.isfinite(float(loss))


class TestDataParallelTrainer:
    def test_dp_losses_match_single_device(self):
        """Trainer(spmd_mesh=...) shards batches over the data axis and
        replicates params; per-epoch losses must match the single-device
        trainer bit-for-bit-ish (same batches, same seed)."""
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs multi-device CPU mesh")
        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.parallel.mesh import make_mesh
        from dlwpbench_tpu.training.trainer import Trainer

        ds = _make_ds()
        kw = dict(
            constant_channels=0, prescribed_channels=0,
            prognostic_channels=2, hidden_channels=(4, 8), context_size=1,
        )
        losses = {}
        for name, mesh in (
            ("single", None),
            ("dp", make_mesh(4, data=4, x=1)),
        ):
            model = UNet(**kw)
            tr = Trainer(model, learning_rate=1e-3, epochs=2, seed=7,
                         spmd_mesh=mesh)
            batch = next(iter(ds.batches(4)))
            state = tr.init(batch)
            ls = [tr.train_epoch(state, ds, batch_size=4, shuffle=False)
                  for _ in range(2)]
            losses[name] = ls
        np.testing.assert_allclose(
            losses["dp"], losses["single"], rtol=1e-5, atol=1e-6
        )


class TestAsyncCheckpointDonationSafety:
    def test_submit_survives_donated_originals(self, tmp_path):
        """The writer must snapshot device buffers at submit time: the
        next train step DONATES params/opt_state, which invalidates the
        originals mid-serialization ("Array has been deleted", observed on
        an 80M-param run).  Deleting the originals right after submit
        simulates the donation losing the race."""
        import jax
        import jax.numpy as jnp

        from dlwpbench_tpu.models.unet import UNet
        from dlwpbench_tpu.training.trainer import (
            AsyncCheckpointWriter, Trainer, load_checkpoint,
        )

        model = UNet(constant_channels=0, prescribed_channels=0,
                     prognostic_channels=1, hidden_channels=[4, 8],
                     context_size=1)
        rng = np.random.default_rng(0)
        prog = jnp.asarray(
            rng.standard_normal((2, 3, 1, 16, 32)), jnp.float32)
        tr = Trainer(model, epochs=1, training_type="diffusion")
        state = tr.init((None, None, prog, prog[:, 1:]))

        w = AsyncCheckpointWriter()
        w.submit(str(tmp_path), "m", state, kind="last")
        # simulate donation: delete every original device buffer
        for leaf in jax.tree.leaves(
            (state.params, state.opt_state, state.ema_params)
        ):
            if isinstance(leaf, jax.Array):
                leaf.delete()
        w.join()  # must not raise

        # restore into a fresh template and check round-trip
        state2 = tr.init((None, None, prog, prog[:, 1:]))
        restored = load_checkpoint(str(tmp_path), "m", state2, kind="last")
        assert restored.ema_params is not None
