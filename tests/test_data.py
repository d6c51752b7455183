"""Tests for the data layer: NS solver physics, windowed dataset semantics."""

import numpy as np
import pytest


class TestNS2D:
    def test_solver_basic(self):
        import jax

        from dlwpbench_tpu.data import ns2d

        key = jax.random.PRNGKey(0)
        n = 32
        w0 = ns2d.gaussian_random_field(key, n, batch=2)
        assert w0.shape == (2, n, n)
        traj = np.asarray(
            ns2d.simulate(w0, n=n, nu=1e-3, dt=1e-3, record_steps=3, inner_steps=20)
        )
        assert traj.shape == (2, 4, n, n)
        assert np.isfinite(traj).all()
        # viscosity + small forcing: enstrophy must not blow up
        ens = (traj**2).mean(axis=(2, 3))
        assert ens[:, -1].max() < ens[:, 0].max() * 2.0

    def test_grf_zero_mean(self):
        import jax

        from dlwpbench_tpu.data import ns2d

        w0 = np.asarray(ns2d.gaussian_random_field(jax.random.PRNGKey(1), 64, 4))
        assert abs(w0.mean()) < 1e-3  # k=0 mode removed
        assert w0.std() > 0.1

    def test_pure_diffusion_decay(self):
        """With zero forcing, high viscosity: amplitude decays ~exp(-nu k^2 t)."""
        import jax.numpy as jnp

        from dlwpbench_tpu.data import ns2d

        n = 32
        x = np.linspace(0, 1, n, endpoint=False)
        X, Y = np.meshgrid(x, x, indexing="ij")
        k = 2
        w0 = jnp.asarray(np.sin(2 * np.pi * k * X))[None]
        nu, dt, steps = 1e-2, 1e-3, 100
        traj = np.asarray(
            ns2d.simulate(
                w0, n=n, nu=nu, dt=dt, record_steps=1, inner_steps=steps,
                forcing=jnp.zeros((n, n)),
            )
        )
        t = dt * steps
        expected = np.exp(-nu * (2 * np.pi * k) ** 2 * t)
        ratio = np.abs(traj[0, 1]).max() / np.abs(traj[0, 0]).max()
        assert ratio == pytest.approx(expected, rel=1e-3)


class TestWindowedDataset:
    def _make(self, **kw):
        from dlwpbench_tpu.data.dataset import WindowedWeatherDataset

        T, Cq, H, W = 20, 2, 4, 8
        prog = np.arange(T * Cq * H * W, dtype=np.float32).reshape(T, Cq, H, W)
        pres = np.ones((T, 1, H, W), np.float32)
        const = np.zeros((3, H, W), np.float32)
        return (
            WindowedWeatherDataset(
                prognostic=prog, constants=const, prescribed=pres, **kw
            ),
            prog,
        )

    def test_short_split_len_zero(self):
        """A split shorter than one window yields 0 items, not a negative
        __len__ (which makes len() raise)."""
        ds, _ = self._make(sequence_length=25)
        assert len(ds) == 0
        assert list(ds.batches(4)) == []

    def test_prescribed_filled_past_data_end(self):
        """Long rollouts past the data end: the prognostic window zero-fills
        and the PRESCRIBED window continues by repeating its last frame —
        both must reach full length or batching shape-mismatches."""
        ds, prog = self._make(sequence_length=8, init_indices=[15])
        const, pres, p, tar = ds[0]
        assert pres.shape[0] == 8 and p.shape[0] == 8
        np.testing.assert_array_equal(pres[4:], np.broadcast_to(
            pres[4], pres[4:].shape))
        np.testing.assert_array_equal(p[:5], prog[15:20])
        assert p[5:].sum() == 0.0  # prognostic zero-fill

    def test_item_semantics(self):
        ds, prog = self._make(sequence_length=5, context_size=1)
        assert len(ds) == (20 - 5) // 5
        const, pres, p, tar = ds[1]
        # window starts at item*seq = 5
        np.testing.assert_array_equal(p, prog[5:10])
        np.testing.assert_array_equal(tar, prog[6:11][1:])  # target[context:]
        assert const.shape == (1, 3, 4, 8)
        assert pres.shape == (5, 1, 4, 8)

    def test_init_indices(self):
        ds, prog = self._make(sequence_length=4, context_size=2, init_indices=[3, 7])
        assert len(ds) == 2
        _, _, p, tar = ds[1]
        np.testing.assert_array_equal(p, prog[7:11])
        np.testing.assert_array_equal(tar, prog[8:12][2:])

    def test_batches(self):
        ds, _ = self._make(sequence_length=5, context_size=1)
        batches = list(ds.batches(2))
        assert batches[0][2].shape == (2, 5, 2, 4, 8)
        assert batches[0][3].shape == (2, 4, 2, 4, 8)

    def test_zero_fill_past_end(self):
        ds, prog = self._make(sequence_length=6, context_size=1, init_indices=[16])
        _, _, p, tar = ds[0]
        assert p.shape[0] == 6
        assert (tar[-2:] == 0).all()  # beyond T=20 zero-filled

    def test_normalize(self):
        from dlwpbench_tpu.data.dataset import normalize_variables

        raw = {"t2m": np.array([[1.0, 2.0], [3.0, np.nan]])}
        out, stats = normalize_variables(raw)
        assert np.isfinite(out["t2m"]).all()
        assert abs(out["t2m"][0, 0] - (1 - stats["t2m"].mean) / stats["t2m"].std) < 1e-6

    def test_biweekly_inits(self):
        import pandas as pd

        from dlwpbench_tpu.data.dataset import biweekly_init_indices

        times = pd.date_range("2017-01-01", "2017-02-01", freq="1h").values
        idx = biweekly_init_indices(
            times, np.datetime64("2017-01-01"), np.datetime64("2017-02-01")
        )
        t = pd.DatetimeIndex(times[idx])
        assert len(idx) > 0
        assert set(t.dayofweek) <= {0, 3}
        assert (t.hour == 11).all()


class TestMultiHostSharding:
    """Per-host input shards (SURVEY hard part #6): deterministic,
    disjoint, lockstep, and their union is the single-host epoch."""

    def _make(self, T=41, seq=2):
        from dlwpbench_tpu.data.dataset import WindowedWeatherDataset

        Cq, H, W = 1, 2, 4
        # encode the window start index in the data so batches identify
        # their windows
        prog = np.arange(T, dtype=np.float32)[:, None, None, None] * np.ones(
            (T, Cq, H, W), np.float32
        )
        return WindowedWeatherDataset(
            prognostic=prog, sequence_length=seq, seed=7
        )

    @staticmethod
    def _window_ids(batches):
        ids = []
        for _, _, prog, _ in batches:
            ids.extend(float(prog[b, 0, 0, 0, 0]) for b in range(prog.shape[0]))
        return ids

    def test_union_is_single_host_epoch(self):
        ds = self._make()
        n_hosts = 4
        single = self._window_ids(ds.batches(2, shuffle=True, host_id=0,
                                             n_hosts=1, epoch=3))
        # NOTE: single-host shuffle uses the dataset's stateful rng; rebuild
        # for a clean comparison set
        ds = self._make()
        single = set(self._window_ids(ds.batches(2)))
        shards = [
            self._window_ids(
                self._make().batches(
                    2, shuffle=True, host_id=h, n_hosts=n_hosts, epoch=3
                )
            )
            for h in range(n_hosts)
        ]
        # lockstep: equal window counts per host
        assert len({len(sh) for sh in shards}) == 1
        # disjoint
        all_ids = [i for sh in shards for i in sh]
        assert len(all_ids) == len(set(all_ids))
        # union == the epoch (up to the n_hosts lockstep truncation)
        missing = single - set(all_ids)
        assert len(missing) < n_hosts
        assert set(all_ids) <= single

    def test_deterministic_across_processes(self):
        """Same (seed, epoch, host) -> identical stream; epochs differ."""
        a = self._window_ids(
            self._make().batches(2, shuffle=True, host_id=1, n_hosts=4,
                                 epoch=5)
        )
        b = self._window_ids(
            self._make().batches(2, shuffle=True, host_id=1, n_hosts=4,
                                 epoch=5)
        )
        c = self._window_ids(
            self._make().batches(2, shuffle=True, host_id=1, n_hosts=4,
                                 epoch=6)
        )
        assert a == b
        assert a != c

    def test_multihost_shuffle_requires_epoch(self):
        import pytest as _pytest

        ds = self._make()
        with _pytest.raises(ValueError, match="epoch"):
            next(ds.batches(2, shuffle=True, host_id=0, n_hosts=2))


class TestMetrics:
    def test_weighted_rmse_uniform(self):
        import jax.numpy as jnp

        from dlwpbench_tpu.evaluation.metrics import weighted_rmse

        lats = np.linspace(-87.1875, 87.1875, 32)
        out = jnp.zeros((3, 4, 32, 64))
        tar = jnp.full((3, 4, 32, 64), 2.0)
        r = np.asarray(weighted_rmse(out, tar, lats))
        np.testing.assert_allclose(r, 2.0, rtol=1e-5)

    def test_acc_perfect(self):
        import jax.numpy as jnp

        from dlwpbench_tpu.evaluation.metrics import acc

        lats = np.linspace(-87.1875, 87.1875, 32)
        rng = np.random.default_rng(0)
        tar = jnp.asarray(rng.standard_normal((2, 3, 32, 64)), jnp.float32)
        clim = jnp.zeros((1, 3, 32, 64))
        a = np.asarray(acc(tar, tar, clim, lats))
        np.testing.assert_allclose(a, 1.0, rtol=1e-5)

    def test_melr_identical_fields(self):
        import jax.numpy as jnp

        from dlwpbench_tpu.training.losses import melr

        lats = np.linspace(-87.1875, 87.1875, 16)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 32)))
        m, ratio = melr(x, x, lats)
        assert abs(float(m)) < 1e-6

    def test_mse_loss_weighted(self):
        import jax.numpy as jnp

        from dlwpbench_tpu.training.losses import latitude_weights, mse_loss

        lats = np.linspace(-87.1875, 87.1875, 8)
        w = jnp.asarray(latitude_weights(lats))[:, None]
        pred = jnp.zeros((2, 8, 4))
        tar = jnp.ones((2, 8, 4))
        assert float(mse_loss(pred, tar, w)) == pytest.approx(1.0, rel=1e-6)


class TestNativeBatcher:
    def test_native_matches_python(self):
        from dlwpbench_tpu.data import native
        from dlwpbench_tpu.data.dataset import WindowedWeatherDataset

        if not native.available():
            import pytest

            pytest.skip("no C++ toolchain")
        rng = np.random.default_rng(0)
        prog = rng.standard_normal((40, 2, 4, 8)).astype(np.float32)
        pres = rng.standard_normal((40, 1, 4, 8)).astype(np.float32)
        const = rng.standard_normal((3, 4, 8)).astype(np.float32)
        ds = WindowedWeatherDataset(
            prognostic=prog, constants=const, prescribed=pres,
            sequence_length=5, context_size=2,
        )
        fast = next(iter(ds.batches(4)))
        # force slow path
        slow_items = [ds[j] for j in range(4)]
        slow = (
            np.stack([it[0] for it in slow_items]),
            np.stack([it[1] for it in slow_items]),
            np.stack([it[2] for it in slow_items]),
            np.stack([it[3] for it in slow_items]),
        )
        for f, s in zip(fast, slow):
            np.testing.assert_allclose(f, s, atol=1e-7)

    def test_raw_assemble(self):
        from dlwpbench_tpu.data import native

        data = np.arange(60, dtype=np.float32).reshape(10, 6)
        out = native.assemble_windows(data, np.asarray([0, 3, 5]), 4)
        np.testing.assert_array_equal(out[1], data[3:7])

    def test_noise_statistics(self):
        from dlwpbench_tpu.data import native

        if not native.available():
            import pytest

            pytest.skip("no C++ toolchain")
        x = np.zeros(200_000, np.float32)
        native.add_gaussian_noise(x, 0.5, seed=42)
        assert abs(x.mean()) < 0.01
        assert abs(x.std() - 0.5) < 0.01


def test_compute_statistics():
    from dlwpbench_tpu.data.dataset import WindowedWeatherDataset

    prog = np.stack(
        [np.full((4, 8), 2.0), np.full((4, 8), -1.0)], axis=0
    )[None].repeat(10, 0).astype(np.float32)  # [10, 2, 4, 8]
    ds = WindowedWeatherDataset(prognostic=prog, sequence_length=3)
    st = ds.compute_statistics()
    np.testing.assert_allclose(st["prognostic"]["mean"], [2.0, -1.0])
    np.testing.assert_allclose(st["prognostic"]["std"], [0.0, 0.0])


def test_synthetic_biweekly_test_inits():
    from dlwpbench_tpu.data.sources import build_datasets

    d = {
        "type": "synthetic", "n_time": 600, "height": 8, "width": 16,
        "prognostic_channels": 1, "prescribed_channels": 0,
        "constant_channels": 0, "normalize": True, "seed": 0,
    }
    tr = {"sequence_length": 4, "noise": 0}
    va = {"sequence_length": 4}
    te = {"sequence_length": 6}
    train, val, test, _ = build_datasets(d, tr, va, te, 1)
    # test split uses explicit biweekly Mon/Thu 11:00 init indices
    assert test.init_indices is not None and len(test.init_indices) > 0
    # and windows fit inside the split
    _, _, p, t = test[len(test.init_indices) - 1]
    assert p.shape[0] == 6


class TestYearLongSoundness:
    def test_rmse_months_11_12_selects_tail(self):
        """Lead times in [334 d, 365 d] only (reference evaluate.py:864-872,
        first forecast step = lead dt per pd.timedelta_range(start=dt)): a
        divergence injected before lead 334 d must not affect the metric."""
        import jax.numpy as jnp

        from dlwpbench_tpu.evaluation.metrics import rmse_months_11_12

        T = 366  # daily steps, one year: index i has lead (i+1) days
        out = np.zeros((1, T, 4, 8), np.float32)
        tar = np.zeros((1, T, 4, 8), np.float32)
        out[:, :333] = 100.0  # leads 1..333 d: before the window, ignored
        out[:, 333:365] = 3.0  # leads 334..365 d: the window
        out[:, 365:] = 100.0  # lead 366 d: after the window, ignored
        r = float(rmse_months_11_12(jnp.asarray(out), jnp.asarray(tar), 24.0))
        np.testing.assert_allclose(r, 3.0, rtol=1e-6)
        # a rollout reaching exactly lead 334 d (T=334 daily steps) is long
        # enough — the old 0-based lead labeling wrongly returned None
        assert rmse_months_11_12(
            jnp.asarray(out[:, :334]), jnp.asarray(tar[:, :334]), 24.0
        ) is not None

    def test_rmse_months_11_12_short_rollout_none(self):
        import jax.numpy as jnp

        from dlwpbench_tpu.evaluation.metrics import rmse_months_11_12

        out = jnp.zeros((1, 57, 4, 8))
        assert rmse_months_11_12(out, out, 6.0) is None

    def test_compute_metrics_includes_months_11_12(self, tmp_path):
        import json

        from dlwpbench_tpu.evaluation.evaluate import compute_metrics

        rng = np.random.default_rng(0)
        T = 30  # 30 x 2-week steps > 334 days
        out = rng.standard_normal((1, T, 1, 8, 16)).astype(np.float32)
        tar = rng.standard_normal((1, T, 1, 8, 16)).astype(np.float32)
        lats = np.linspace(-87, 87, 8)
        res = compute_metrics(out, tar, lats, ["z500"], str(tmp_path),
                              timedelta_hours=14 * 24.0)
        assert "rmse_months_11_12" in res and "z500" in res["rmse_months_11_12"]
        saved = json.load(open(tmp_path / "metrics.json"))
        assert "rmse_months_11_12" in saved


class TestForecastVideo:
    def test_frame_writer_three_panel(self, tmp_path):
        """Frame rendering is testable without ffmpeg (feature-gated mp4)."""
        from dlwpbench_tpu.evaluation.evaluate import render_forecast_frames

        rng = np.random.default_rng(1)
        out = rng.standard_normal((3, 8, 16)).astype(np.float32)
        tar = rng.standard_normal((3, 8, 16)).astype(np.float32)
        n = render_forecast_frames(out, str(tmp_path), targets=tar,
                                   var_name="z500")
        assert n == 3
        import os

        frames = sorted(os.listdir(tmp_path))
        assert frames == ["f0000.png", "f0001.png", "f0002.png"]
        assert all((tmp_path / f).stat().st_size > 1000 for f in frames)

    def test_generate_mp4_feature_gated(self, tmp_path):
        import shutil

        from dlwpbench_tpu.evaluation.evaluate import generate_mp4

        out = np.zeros((2, 8, 16), np.float32)
        ok = generate_mp4(out, str(tmp_path / "v.mp4"))
        if shutil.which("ffmpeg") is None:
            assert ok is False and not (tmp_path / "v.mp4").exists()
        else:
            assert ok is True and (tmp_path / "v.mp4").exists()


class TestClimatologyRMSE:
    def test_compute_metrics_writes_climatology_rmse(self, tmp_path):
        """With a climatology forecast present, compute_metrics reports the
        climatology's own lat-weighted RMSE (reference rmses_climatology.nc,
        evaluate.py:823-827)."""
        import json

        from dlwpbench_tpu.evaluation.evaluate import compute_metrics

        rng = np.random.default_rng(0)
        out = rng.standard_normal((2, 3, 1, 8, 16)).astype(np.float32)
        tar = rng.standard_normal((2, 3, 1, 8, 16)).astype(np.float32)
        clim = np.zeros_like(tar)
        lats = np.linspace(-80, 80, 8)
        res = compute_metrics(out, tar, lats, ["z500"], str(tmp_path),
                              climatology=clim)
        assert "rmse_climatology" in res
        assert len(res["rmse_climatology"]["z500"]) == 3
        import os

        assert any("rmses_climatology" in f for f in os.listdir(tmp_path))
        saved = json.load(open(tmp_path / "metrics.json"))
        assert "acc" in saved and "rmse_climatology" in saved
