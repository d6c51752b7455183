"""Tests for L0 grid geometry: lat-lon weights, HEALPix index math, padding."""

import numpy as np
import pytest

from dlwpbench_tpu.grids import healpix as hpx
from dlwpbench_tpu.grids.latlon import weatherbench_grid


class TestLatLon:
    def test_weatherbench_5p625(self):
        g = weatherbench_grid(5.625)
        assert g.shape == (32, 64)
        assert g.lats[0] == pytest.approx(-87.1875)
        assert g.lats[-1] == pytest.approx(87.1875)
        assert g.lons[0] == 0.0

    def test_lat_weights_normalized(self):
        g = weatherbench_grid(5.625)
        w = g.lat_weights()
        assert w.mean() == pytest.approx(1.0)
        assert w[len(w) // 2] > w[0]  # equator heavier than poles


class TestNestedIndexing:
    @pytest.mark.parametrize("nside", [2, 4, 8, 16])
    def test_bijection(self, nside):
        m = hpx.nest_to_fhw(nside)
        assert sorted(m.reshape(-1).tolist()) == list(range(hpx.npix(nside)))
        inv = hpx.fhw_to_nest(nside)
        assert (m.reshape(-1)[inv] == np.arange(hpx.npix(nside))).all()

    def test_matches_reference_bit_interleave(self):
        """Cross-check against the reference's string-based bit algorithm
        (healpix_mapping.py:440-483), reimplemented literally here."""
        nside = 8

        def ref_hpxidx2fyx(hpxidx):
            f = hpxidx // nside**2
            b = format(hpxidx % nside**2, "b").zfill(nside)
            y = int(b[::2], 2) if b[::2] else 0
            x = int(b[1::2], 2) if b[1::2] else 0
            return f, y, x

        m = hpx.nest_to_fhw(nside)
        rng = np.random.default_rng(0)
        for idx in rng.integers(0, hpx.npix(nside), 50):
            f, y, x = ref_hpxidx2fyx(int(idx))
            # reference stores value at [f, nside-1-x, nside-1-y]
            assert m[f, nside - 1 - x, nside - 1 - y] == idx


class TestRingNest:
    @pytest.mark.parametrize("nside", [1, 2, 4, 8, 32])
    def test_bijection(self, nside):
        r2n = hpx.ring_to_nest(nside)
        assert sorted(r2n.tolist()) == list(range(hpx.npix(nside)))

    @pytest.mark.parametrize("nside", [1, 2, 4, 8, 16])
    def test_centers_agree(self, nside):
        """Pixel centers computed from ring analytics must equal centers from
        the nested face/xy equations — validates both paths and the map."""
        n = hpx.npix(nside)
        ring_idx = np.arange(n)
        lat_r, lon_r = hpx.ring_pix2ang(nside, ring_idx)
        nest_idx = hpx.ring_to_nest(nside)
        lat_n, lon_n = hpx.nest_pix2ang(nside, nest_idx)
        np.testing.assert_allclose(lat_r, lat_n, atol=1e-9)
        np.testing.assert_allclose(lon_r % 360, lon_n % 360, atol=1e-9)

    def test_nside1_identity(self):
        # For nside=1 both orderings coincide.
        assert (hpx.ring_to_nest(1) == np.arange(12)).all()


# --------------------------------------------------------------------------
# Value-level reimplementation of the reference padding algorithm
# (utils/healpix.py:193-368) used as an independent oracle for the
# gather-table derivation.
# --------------------------------------------------------------------------


def _rot(x, k):
    return np.rot90(x, k, (-2, -1))


def _tl(t, l, p):
    ret = np.zeros((*t.shape[:-2], p, p), t.dtype)
    ret[..., -1, -1] = 0.5 * t[..., -1, 0] + 0.5 * l[..., 0, -1]
    for i in range(1, p):
        ret[..., -i - 1, -i:] = t[..., -i - 1, :i]
        ret[..., -i:, -i - 1] = l[..., :i, -i - 1]
        ret[..., -i - 1, -i - 1] = 0.5 * t[..., -i - 1, 0] + 0.5 * l[..., 0, -i - 1]
    return ret


def _br(b, r, p):
    ret = np.zeros((*b.shape[:-2], p, p), b.dtype)
    ret[..., 0, 0] = 0.5 * b[..., 0, -1] + 0.5 * r[..., -1, 0]
    for i in range(1, p):
        ret[..., :i, i] = r[..., -i:, i]
        ret[..., i, :i] = b[..., i, -i:]
        ret[..., i, i] = 0.5 * b[..., i, -1] + 0.5 * r[..., -1, i]
    return ret


def _pn(p, c, t, tl, l, bl, b, br, r, tr):
    c = np.concatenate([_rot(t, 1)[..., -p:, :], c, b[..., :p, :]], -2)
    left = np.concatenate(
        [_rot(tl, 2)[..., -p:, -p:], _rot(l, -1)[..., -p:], bl[..., :p, -p:]], -2
    )
    right = np.concatenate([tr[..., -p:, :p], r[..., :p], br[..., :p, :p]], -2)
    return np.concatenate([left, c, right], -1)


def _pe(p, c, t, tl, l, bl, b, br, r, tr):
    c = np.concatenate([t[..., -p:, :], c, b[..., :p, :]], -2)
    left = np.concatenate([tl[..., -p:, -p:], l[..., -p:], bl[..., :p, -p:]], -2)
    right = np.concatenate([tr[..., -p:, :p], r[..., :p], br[..., :p, :p]], -2)
    return np.concatenate([left, c, right], -1)


def _ps(p, c, t, tl, l, bl, b, br, r, tr):
    c = np.concatenate([t[..., -p:, :], c, _rot(b, 1)[..., :p, :]], -2)
    left = np.concatenate([tl[..., -p:, -p:], l[..., -p:], bl[..., :p, -p:]], -2)
    right = np.concatenate(
        [tr[..., -p:, :p], _rot(r, -1)[..., :p], _rot(br, 2)[..., :p, :p]], -2
    )
    return np.concatenate([left, c, right], -1)


def reference_healpix_pad(data, p):
    """Oracle: value-level padding per the reference neighbor tables."""
    f = [data[..., i, :, :] for i in range(12)]
    out = [
        _pn(p, f[0], f[1], f[2], f[3], f[3], f[4], f[8], f[5], f[1]),
        _pn(p, f[1], f[2], f[3], f[0], f[0], f[5], f[9], f[6], f[2]),
        _pn(p, f[2], f[3], f[0], f[1], f[1], f[6], f[10], f[7], f[3]),
        _pn(p, f[3], f[0], f[1], f[2], f[2], f[7], f[11], f[4], f[0]),
        _pe(p, f[4], f[0], _tl(f[0], f[3], p), f[3], f[7], f[11],
            _br(f[11], f[8], p), f[8], f[5]),
        _pe(p, f[5], f[1], _tl(f[1], f[0], p), f[0], f[4], f[8],
            _br(f[8], f[9], p), f[9], f[6]),
        _pe(p, f[6], f[2], _tl(f[2], f[1], p), f[1], f[5], f[9],
            _br(f[9], f[10], p), f[10], f[7]),
        _pe(p, f[7], f[3], _tl(f[3], f[2], p), f[2], f[6], f[10],
            _br(f[10], f[11], p), f[11], f[4]),
        _ps(p, f[8], f[5], f[0], f[4], f[11], f[11], f[10], f[9], f[9]),
        _ps(p, f[9], f[6], f[1], f[5], f[8], f[8], f[11], f[10], f[10]),
        _ps(p, f[10], f[7], f[2], f[6], f[9], f[9], f[8], f[11], f[11]),
        _ps(p, f[11], f[4], f[3], f[7], f[10], f[10], f[9], f[8], f[8]),
    ]
    return np.stack(out, axis=-3)


class TestHealpixPad:
    @pytest.mark.parametrize("nside,p", [(4, 1), (8, 1), (8, 2), (8, 3), (16, 2)])
    def test_gather_matches_oracle(self, nside, p):
        import jax.numpy as jnp

        from dlwpbench_tpu.ops.padding import healpix_pad

        rng = np.random.default_rng(42)
        x = rng.standard_normal((2, 3, 12, nside, nside)).astype(np.float32)
        want = reference_healpix_pad(x, p)
        got = np.asarray(healpix_pad(jnp.asarray(x), p))
        assert got.shape == (2, 3, 12, nside + 2 * p, nside + 2 * p)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_interior_untouched(self):
        import jax.numpy as jnp

        from dlwpbench_tpu.ops.padding import healpix_pad

        x = np.random.default_rng(0).standard_normal((12, 8, 8)).astype(np.float32)
        got = np.asarray(healpix_pad(jnp.asarray(x), 2))
        np.testing.assert_array_equal(got[:, 2:-2, 2:-2], x)


class TestCylinderPad:
    def test_semantics(self):
        import jax.numpy as jnp

        from dlwpbench_tpu.ops.padding import cylinder_pad

        x = np.arange(24, dtype=np.float32).reshape(1, 1, 4, 6)
        got = np.asarray(cylinder_pad(jnp.asarray(x), 1))
        assert got.shape == (1, 1, 6, 8)
        # zero rows top/bottom (latitude)
        assert (got[..., 0, :] == 0).all() and (got[..., -1, :] == 0).all()
        # circular in longitude
        np.testing.assert_array_equal(got[..., 1:-1, 0], x[..., :, -1])
        np.testing.assert_array_equal(got[..., 1:-1, -1], x[..., :, 0])
        np.testing.assert_array_equal(got[..., 1:-1, 1:-1], x)
