"""Pallas flash window-attention kernel vs reference attention (interpret
mode on CPU; the same kernel compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestFlashWindowAttention:
    @pytest.mark.parametrize("N,D,blk", [(128, 32, 64), (256, 16, 128)])
    def test_matches_reference(self, N, D, blk):
        from dlwpbench_tpu.ops.pallas_attention import (
            flash_window_attention,
            reference_attention,
        )

        B, H = 2, 3
        r = np.random.default_rng(0)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((H, N, N)), jnp.float32)

        want = np.asarray(reference_attention(q, k, v, bias, D**-0.5))
        got = np.asarray(
            flash_window_attention(q, k, v, bias, block_q=blk, block_k=blk,
                                   interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_panel_and_streaming_paths_agree(self):
        """The resident-panel kernels (N 128-aligned, panels fit VMEM) and
        the grid-block streaming kernels must agree with the oracle AND
        each other, forward and backward (`_panel_blocks` dispatch)."""
        import dlwpbench_tpu.ops.pallas_attention as pa

        assert pa._panel_blocks(256, 32) is not None
        assert pa._panel_blocks(300, 32) is None      # unaligned
        assert pa._panel_blocks(16200, 32) is None    # unaligned + huge
        assert pa._panel_blocks(8192, 32) is None     # VMEM overflow

        B, H, N, D = 2, 2, 256, 32
        r = np.random.default_rng(11)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((1, H, N, N)), jnp.float32)

        # panel path (dispatched automatically for this shape)
        out_p = pa.flash_window_attention(q, k, v, bias, interpret=True)
        # streaming path, forced by monkeypatching the dispatcher
        orig = pa._panel_blocks
        pa._panel_blocks = lambda n, d: None
        try:
            pa._flash_impl.clear_cache()
            out_s = pa.flash_window_attention(q, k, v, bias, interpret=True)
            g_s = jax.grad(
                lambda q: jnp.sum(
                    pa.flash_window_attention(q, k, v, bias, interpret=True)
                    ** 2
                )
            )(q)
        finally:
            pa._panel_blocks = orig
            pa._flash_impl.clear_cache()
        g_p = jax.grad(
            lambda q: jnp.sum(
                pa.flash_window_attention(q, k, v, bias, interpret=True) ** 2
            )
        )(q)
        np.testing.assert_allclose(out_p, out_s, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(g_p, g_s, rtol=2e-4, atol=2e-4)

    def test_mask_in_bias(self):
        """-100 shift-mask entries (as Swin folds them into bias) behave."""
        from dlwpbench_tpu.ops.pallas_attention import (
            flash_window_attention,
            reference_attention,
        )

        B, H, N, D = 1, 2, 128, 16
        r = np.random.default_rng(1)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        mask = np.zeros((H, N, N), np.float32)
        mask[:, : N // 2, N // 2 :] = -100.0
        mask[:, N // 2 :, : N // 2] = -100.0
        bias = jnp.asarray(mask)
        want = np.asarray(reference_attention(q, k, v, bias, D**-0.5))
        got = np.asarray(
            flash_window_attention(q, k, v, bias, block_q=64, block_k=64,
                                   interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_grouped_bias(self):
        """[G, H, N, N] per-window bias selected as window = b % G (the
        multi-window Swin / Pangu earth-bias layout)."""
        from dlwpbench_tpu.ops.pallas_attention import (
            flash_window_attention,
            reference_attention,
        )

        G, H, N, D = 3, 2, 128, 16
        B = 2 * G  # batch laid out as sample*G + window
        r = np.random.default_rng(2)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((G, H, N, N)), jnp.float32)
        bias = bias.at[:, :, : N // 4, N // 2 :].add(-100.0)  # mask-like

        want = np.asarray(reference_attention(q, k, v, bias, D**-0.5))
        got = np.asarray(
            flash_window_attention(q, k, v, bias, block_q=64, block_k=64,
                                   interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_gradients(self):
        """custom-VJP gradients match differentiating the einsum oracle."""
        import jax

        from dlwpbench_tpu.ops.pallas_attention import (
            flash_window_attention,
            reference_attention,
        )

        B, H, N, D = 2, 2, 128, 16
        r = np.random.default_rng(3)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((H, N, N)), jnp.float32)

        def loss_flash(q, k, v, bias):
            return (
                flash_window_attention(
                    q, k, v, bias, block_q=64, block_k=64, interpret=True
                ) ** 2
            ).sum()

        def loss_ref(q, k, v, bias):
            return (reference_attention(q, k, v, bias, D**-0.5) ** 2).sum()

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
            )

    def test_gradients_grouped_bias(self):
        """Fused flash backward with [G, H, N, N] grouped bias: dQ/dK/dV and
        the per-group dBias (dS summed over the group's batch members via
        grid-revisit accumulation) all match the einsum oracle."""
        import jax

        from dlwpbench_tpu.ops.pallas_attention import (
            flash_window_attention,
            reference_attention,
        )

        G, H, N, D = 2, 2, 128, 16
        B = 3 * G
        r = np.random.default_rng(9)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((G, H, N, N)), jnp.float32)

        def loss_flash(q, k, v, bias):
            return (
                flash_window_attention(
                    q, k, v, bias, block_q=32, block_k=64, interpret=True
                ) * jnp.cos(jnp.arange(D, dtype=jnp.float32))
            ).sum()

        def loss_ref(q, k, v, bias):
            return (
                reference_attention(q, k, v, bias, D**-0.5)
                * jnp.cos(jnp.arange(D, dtype=jnp.float32))
            ).sum()

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkv b", g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name}",
            )

    def test_gradients_unaligned_n(self):
        """N not a multiple of 128 (odd grids, e.g. 90x180 global windows ->
        N = 16200): the kernels stream cdiv blocks and iota-mask the tail's
        phantom keys in-kernel (no operand padding); outputs and all four
        gradients match the einsum oracle.  G < B here, so the grouped
        member-sum dBias kernel runs with tail masking."""
        import jax

        from dlwpbench_tpu.ops.pallas_attention import (
            flash_window_attention,
            reference_attention,
        )

        G, H, N, D = 2, 2, 216, 16   # cdiv blocks of 128, tail 88
        B = 2 * G
        r = np.random.default_rng(11)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((G, H, N, N)), jnp.float32)

        # interpret=False: on CPU the impl auto-interprets; the tail-masked
        # streaming path is what runs on TPU too.
        out = flash_window_attention(q, k, v, bias)
        ref = reference_attention(q, k, v, bias, D**-0.5)
        assert out.shape == (B, H, N, D)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

        def loss_flash(q, k, v, bias):
            return (flash_window_attention(q, k, v, bias) ** 2).sum()

        def loss_ref(q, k, v, bias):
            return (reference_attention(q, k, v, bias, D**-0.5) ** 2).sum()

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip("qkv b", g1, g2):
            assert a.shape == b.shape, name
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name}",
            )

    def test_gradients_masked_bias(self):
        """-inf-style mask entries in the bias survive the exp/log-sum-exp
        round trip in the fused backward (no NaNs, matching grads)."""
        import jax

        from dlwpbench_tpu.ops.pallas_attention import (
            flash_window_attention,
            reference_attention,
        )

        B, H, N, D = 2, 1, 64, 8
        r = np.random.default_rng(11)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((H, N, N)), jnp.float32)
        bias = bias.at[:, : N // 2, N // 2 :].add(-1e4)

        f = lambda *a: (flash_window_attention(
            *a, block_q=32, block_k=32, interpret=True) ** 2).sum()
        ref = lambda q, k, v, b: (reference_attention(q, k, v, b, D**-0.5) ** 2).sum()
        g1 = jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b in zip(g1, g2):
            assert np.isfinite(np.asarray(a)).all()
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def _packed_oracle(q, k, v, bias, mask):
    """Einsum oracle for the packed layout: q/k/v [BW, nh, N, D],
    bias [nW, nh, N, N] (w = p % nW), mask [nLon, nW, N, N]
    (lon = (p // nW) % nLon)."""
    BW, nh, N, D = q.shape
    nW = bias.shape[0]
    nLon = mask.shape[0]
    p_idx = np.arange(BW)
    w = p_idx % nW
    lon = (p_idx // nW) % nLon
    s = jnp.einsum("bhnd,bhmd->bhnm", q * D**-0.5, k)
    s = s + bias[w] + mask[lon, w][:, None]
    probs = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", probs, v)


class TestPackedWindowAttention:
    """Packed small-window kernel (Pangu earth attention) vs einsum oracle."""

    def _rand(self, BW, nh, N, D, nW, nLon, seed=0):
        r = np.random.default_rng(seed)
        q = jnp.asarray(r.standard_normal((BW, nh, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((BW, nh, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((BW, nh, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((nW, nh, N, N)), jnp.float32)
        mask = np.zeros((nLon, nW, N, N), np.float32)
        # shift-mask-like blocks per (lon, w)
        for lo in range(nLon):
            for w in range(nW):
                cut = (lo + w + 1) * N // (nLon + nW + 1)
                mask[lo, w, :cut, cut:] = -100.0
                mask[lo, w, cut:, :cut] = -100.0
        return q, k, v, bias, jnp.asarray(mask)

    @pytest.mark.parametrize("N,D,nh", [(144, 32, 2), (72, 16, 3)])
    def test_matches_oracle(self, N, D, nh):
        from dlwpbench_tpu.ops.pallas_attention import packed_window_attention

        nW, nLon, B = 2, 3, 2
        BW = B * nLon * nW
        q, k, v, bias, mask = self._rand(BW, nh, N, D, nW, nLon)
        want = np.asarray(_packed_oracle(q, k, v, bias, mask))
        got = np.asarray(
            packed_window_attention(q, k, v, bias, mask, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_no_mask(self):
        from dlwpbench_tpu.ops.pallas_attention import packed_window_attention

        nW, nh, N, D = 3, 2, 48, 8
        BW = 2 * nW
        q, k, v, bias, _ = self._rand(BW, nh, N, D, nW, 1, seed=3)
        zero = jnp.zeros((1, 1, N, N), jnp.float32)
        want = np.asarray(_packed_oracle(q, k, v, bias, zero))
        got = np.asarray(packed_window_attention(q, k, v, bias, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_gradients(self):
        """Fused backward (dq/dk/dv + in-kernel dbias accumulation over the
        batch members) matches differentiating the einsum oracle."""
        from dlwpbench_tpu.ops.pallas_attention import packed_window_attention

        nW, nLon, nh, N, D = 2, 2, 2, 64, 16
        B = 3
        BW = B * nLon * nW
        q, k, v, bias, mask = self._rand(BW, nh, N, D, nW, nLon, seed=5)
        proj = jnp.cos(jnp.arange(D, dtype=jnp.float32))

        def loss_packed(q, k, v, bias):
            return (
                packed_window_attention(q, k, v, bias, mask, interpret=True)
                * proj
            ).sum()

        def loss_ref(q, k, v, bias):
            return (_packed_oracle(q, k, v, bias, mask) * proj).sum()

        g1 = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip(("q", "k", "v", "bias"), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name}",
            )

    def test_gradients_no_mask_grouped_bias(self):
        """mask=None with grouped bias (nW > 1) — the default path Swin
        and Pangu's unshifted blocks take.  Regression: the backward used
        to emit a (nLon, nW, N, N) mask cotangent against the (1, 1, N, N)
        default-mask primal (shape-mismatch ValueError under jax.grad),
        and the mask index maps read out of bounds on the size-1 axis."""
        from dlwpbench_tpu.ops.pallas_attention import packed_window_attention

        nW, nh, N, D = 3, 2, 16, 8
        BW = 2 * nW
        q, k, v, bias, _ = self._rand(BW, nh, N, D, nW, 1, seed=11)
        zero = jnp.zeros((1, 1, N, N), jnp.float32)
        proj = jnp.cos(jnp.arange(D, dtype=jnp.float32))

        def loss_packed(q, k, v, bias):
            return (
                packed_window_attention(q, k, v, bias, None, interpret=True)
                * proj
            ).sum()

        def loss_ref(q, k, v, bias):
            return (_packed_oracle(q, k, v, bias, zero) * proj).sum()

        g1 = jax.grad(loss_packed, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for name, a, b in zip(("q", "k", "v", "bias"), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name}",
            )

    def test_pangu_model_packed_matches_einsum(self):
        """PanguWeather forced onto the packed kernel reproduces the einsum
        path through full rollout steps (shifted + unshifted blocks)."""
        from dlwpbench_tpu.models.pangu import PanguWeather

        kw = dict(
            constant_channels=1, prescribed_channels=0, prognostic_channels=2,
            embed_dim=16, num_heads=(1, 2, 2, 1), patch_size=(1, 1),
            n_lat=8, n_lon=16, context_size=1,
        )
        r = np.random.default_rng(7)
        const = jnp.asarray(r.standard_normal((1, 1, 1, 8, 16)), jnp.float32)
        prog = jnp.asarray(r.standard_normal((1, 3, 2, 8, 16)), jnp.float32)
        pres = jnp.zeros((1, 3, 0, 8, 16), jnp.float32)

        m_e = PanguWeather(use_flash_attention=False, **kw)
        params = m_e.init(jax.random.PRNGKey(0), const, pres, prog)
        out_e = m_e.apply(params, const, pres, prog)
        m_p = PanguWeather(use_flash_attention="packed", **kw)
        out_p = m_p.apply(params, const, pres, prog)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_e), rtol=2e-4, atol=2e-4
        )
        # 5D partition-free path: same params, same output
        m_5 = PanguWeather(use_flash_attention="packed5d", **kw)
        out_5 = m_5.apply(params, const, pres, prog)
        np.testing.assert_allclose(
            np.asarray(out_5), np.asarray(out_e), rtol=2e-4, atol=2e-4
        )

    def test_swin_model_packed_matches_einsum(self):
        """SwinTransformer forced onto the packed kernel reproduces the
        einsum path (grouped bias, G=1 global windows)."""
        from dlwpbench_tpu.models.swin import SwinTransformer

        kw = dict(
            img_height=8, img_width=16, patch_size=1,
            constant_channels=1, prescribed_channels=0, prognostic_channels=2,
            embed_dim=16, depths=(2, 2), num_heads=(2, 2), context_size=1,
        )
        r = np.random.default_rng(8)
        const = jnp.asarray(r.standard_normal((1, 1, 1, 8, 16)), jnp.float32)
        prog = jnp.asarray(r.standard_normal((1, 3, 2, 8, 16)), jnp.float32)
        pres = jnp.zeros((1, 3, 0, 8, 16), jnp.float32)

        m_e = SwinTransformer(use_flash_attention=False, **kw)
        params = m_e.init(jax.random.PRNGKey(0), const, pres, prog)
        out_e = m_e.apply(params, const, pres, prog)
        m_p = SwinTransformer(use_flash_attention="packed", **kw)
        out_p = m_p.apply(params, const, pres, prog)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_e), rtol=2e-4, atol=2e-4
        )

    def test_gradients_unaligned_n_per_batch_bias(self):
        """Unaligned N with G == B (every batch row owns its bias group):
        the dQ kernel emits dBias blocks directly; tail q-rows/k-cols of
        each dS tile must be discarded by the boundary store."""
        import jax

        from dlwpbench_tpu.ops.pallas_attention import (
            flash_window_attention,
            reference_attention,
        )

        G, H, N, D = 2, 2, 216, 16
        B = G  # G == B
        r = np.random.default_rng(12)
        q = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        k = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        v = jnp.asarray(r.standard_normal((B, H, N, D)), jnp.float32)
        bias = jnp.asarray(0.1 * r.standard_normal((G, H, N, N)), jnp.float32)

        out = flash_window_attention(q, k, v, bias)
        ref = reference_attention(q, k, v, bias, D**-0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
        )

        g1 = jax.grad(
            lambda q, k, v, b:
            (flash_window_attention(q, k, v, b) ** 2).sum(),
            argnums=(0, 1, 2, 3),
        )(q, k, v, bias)
        g2 = jax.grad(
            lambda q, k, v, b:
            (reference_attention(q, k, v, b, D**-0.5) ** 2).sum(),
            argnums=(0, 1, 2, 3),
        )(q, k, v, bias)
        for name, a, b in zip("qkvb", g1, g2):
            assert a.shape == b.shape, name
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name}",
            )


def _qkv_oracle(qkv, bias, mask, nh):
    """Einsum oracle for the token-major layout: qkv [B, L, nW, N, 3C],
    bias [nW, nh, Nk, Nq] (KEY-major, the kernel layout), mask
    [L, nW, N, N] (symmetric) or None."""
    B, L, nW, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // nh
    scale = hd**-0.5
    q, k, v = (
        qkv[..., i * C:(i + 1) * C].reshape(B, L, nW, N, nh, hd)
        for i in range(3)
    )
    s = jnp.einsum("blwnhd,blwmhd->blwhnm", q * scale, k)
    s = s + bias.swapaxes(-1, -2)[None, None]
    if mask is not None:
        s = s + mask[None, :, :, None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("blwhnm,blwmhd->blwnhd", p, v)
    return o.reshape(B, L, nW, N, C)


class TestWindowAttentionQKV:
    """Token-major packed kernel (fused-qkv layout, zero host relayout;
    `window_attention_qkv`) vs einsum oracle."""

    def _rand(self, B, L, nW, N, nh, hd, seed=0, with_mask=True):
        r = np.random.default_rng(seed)
        C = nh * hd
        qkv = jnp.asarray(
            r.standard_normal((B, L, nW, N, 3 * C)), jnp.float32
        )
        bias = jnp.asarray(
            0.1 * r.standard_normal((nW, nh, N, N)), jnp.float32
        )
        if not with_mask:
            return qkv, bias, None
        mask = np.zeros((L, nW, N, N), np.float32)
        for lo in range(L):
            for w in range(nW):
                cut = (lo + w + 1) * N // (L + nW + 1)
                mask[lo, w, :cut, cut:] = -100.0
                mask[lo, w, cut:, :cut] = -100.0
        return qkv, bias, jnp.asarray(mask)

    @pytest.mark.parametrize("N,hd,nh", [(144, 16, 2), (72, 32, 3)])
    def test_matches_oracle(self, N, hd, nh):
        from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv

        B, L, nW = 4, 3, 2  # B=4 exercises the G>1 multi-member blocks
        qkv, bias, mask = self._rand(B, L, nW, N, nh, hd)
        want = np.asarray(_qkv_oracle(qkv, bias, mask, nh))
        got = np.asarray(
            window_attention_qkv(qkv, bias, mask, nh, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_no_mask(self):
        from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv

        qkv, bias, _ = self._rand(6, 1, 3, 48, 2, 16, seed=3,
                                  with_mask=False)
        want = np.asarray(_qkv_oracle(qkv, bias, None, 2))
        got = np.asarray(
            window_attention_qkv(qkv, bias, None, 2, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_gradients(self):
        """Fused backward (dqkv in the Dense layout + dBias accumulated
        across (lon, batch) grid revisits) matches the einsum oracle."""
        from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv

        B, L, nW, N, nh, hd = 4, 2, 2, 64, 2, 16
        qkv, bias, mask = self._rand(B, L, nW, N, nh, hd, seed=5)
        proj = jnp.cos(jnp.arange(nh * hd, dtype=jnp.float32))

        def loss_k(qkv, bias):
            return (
                window_attention_qkv(qkv, bias, mask, nh, interpret=True)
                * proj
            ).sum()

        def loss_ref(qkv, bias):
            return (_qkv_oracle(qkv, bias, mask, nh) * proj).sum()

        g1 = jax.grad(loss_k, argnums=(0, 1))(qkv, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
        for name, a, b in zip(("qkv", "bias"), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name}",
            )


class TestWindowAttentionQKV5D:
    """5D kernel (`window_attention_qkv5d`): window partition/reverse
    folded into BlockSpec index maps — must equal the partition ->
    token-major kernel -> reverse composition (itself oracle-tested)."""

    def _rand5(self, B, Pl, Lat, Lon, win, nh, hd, seed=0, with_mask=True):
        from dlwpbench_tpu.models.pangu import (
            window_partition_3d,
        )

        r = np.random.default_rng(seed)
        C = nh * hd
        qkv5 = jnp.asarray(
            r.standard_normal((B, Pl, Lat, Lon, 3 * C)), jnp.float32
        )
        wpl, wlat, wlon = win
        nW = (Pl // wpl) * (Lat // wlat)
        nLon = Lon // wlon
        N = wpl * wlat * wlon
        bias = jnp.asarray(
            0.1 * r.standard_normal((nW, nh, N, N)), jnp.float32
        )
        mask = None
        if with_mask:
            m = np.zeros((nLon, nW, N, N), np.float32)
            for lo in range(nLon):
                for w in range(nW):
                    cut = (lo + w + 1) * N // (nLon + nW + 1)
                    m[lo, w, :cut, cut:] = -100.0
                    m[lo, w, cut:, :cut] = -100.0
            mask = jnp.asarray(m)
        return qkv5, bias, mask

    @staticmethod
    def _via_partition(qkv5, bias, mask, nh, win):
        from dlwpbench_tpu.models.pangu import (
            window_partition_3d, window_reverse_3d,
        )
        from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv

        B, Pl, Lat, Lon, C3 = qkv5.shape
        wpl, wlat, wlon = win
        nLon = Lon // wlon
        wins = window_partition_3d(qkv5, win)  # [B*nLon, nW, N, 3C]
        tok = wins.reshape(B, nLon, wins.shape[1], wins.shape[2], C3)
        out = window_attention_qkv(tok, bias, mask, nh, interpret=True)
        C = C3 // 3
        out = out.reshape(B * nLon, out.shape[2], out.shape[3], C)
        return window_reverse_3d(out, win, Pl, Lat, Lon)

    @pytest.mark.parametrize("win,Pl,Lat,Lon", [
        ((2, 3, 4), 2, 6, 8),     # multi-window, multi-lon
        ((2, 6, 12), 2, 6, 24),   # the Pangu window at a narrow grid
    ])
    def test_matches_partition_composition(self, win, Pl, Lat, Lon):
        from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv5d

        nh, hd, B = 2, 16, 4
        qkv5, bias, mask = self._rand5(B, Pl, Lat, Lon, win, nh, hd)
        want = np.asarray(self._via_partition(qkv5, bias, mask, nh, win))
        got = np.asarray(
            window_attention_qkv5d(qkv5, bias, mask, nh, win,
                                   interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_no_mask(self):
        from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv5d

        win = (2, 3, 4)
        qkv5, bias, _ = self._rand5(2, 2, 6, 8, win, 2, 16, seed=3,
                                    with_mask=False)
        want = np.asarray(self._via_partition(qkv5, bias, None, 2, win))
        got = np.asarray(
            window_attention_qkv5d(qkv5, bias, None, 2, win, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_gradients(self):
        """Fused 5D backward (dqkv in the 5D Dense layout + accumulated
        dBias) matches the partition-composition gradients."""
        from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv5d

        win, Pl, Lat, Lon, nh, hd = (2, 3, 4), 2, 6, 8, 2, 16
        qkv5, bias, mask = self._rand5(4, Pl, Lat, Lon, win, nh, hd, seed=5)
        proj = jnp.cos(jnp.arange(nh * hd, dtype=jnp.float32))

        def loss_k(qkv5, bias):
            return (
                window_attention_qkv5d(qkv5, bias, mask, nh, win,
                                       interpret=True) * proj
            ).sum()

        def loss_ref(qkv5, bias):
            return (self._via_partition(qkv5, bias, mask, nh, win)
                    * proj).sum()

        g1 = jax.grad(loss_k, argnums=(0, 1))(qkv5, bias)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(qkv5, bias)
        for name, a, b in zip(("qkv5", "bias"), g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"d{name}",
            )


class TestWindowAttentionQKVSharedBias:
    """bias leading dim 1 (unshifted Swin windows share one relative-
    position bias): the kernel must broadcast it over windows and
    accumulate dBias over ALL of them."""

    def test_shared_bias_matches_broadcast(self):
        from dlwpbench_tpu.ops.pallas_attention import window_attention_qkv

        B, L, nW, N, nh, hd = 4, 1, 3, 64, 2, 16
        r = np.random.default_rng(11)
        C = nh * hd
        qkv = jnp.asarray(r.standard_normal((B, L, nW, N, 3 * C)),
                          jnp.float32)
        b1 = jnp.asarray(0.1 * r.standard_normal((1, nh, N, N)), jnp.float32)
        bfull = jnp.broadcast_to(b1, (nW, nh, N, N))

        o1 = window_attention_qkv(qkv, b1, None, nh, interpret=True)
        o2 = window_attention_qkv(qkv, bfull, None, nh, interpret=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)

        g1 = jax.grad(
            lambda b: window_attention_qkv(qkv, b, None, nh,
                                           interpret=True).sum()
        )(b1)
        gf = jax.grad(
            lambda b: window_attention_qkv(qkv, b, None, nh,
                                           interpret=True).sum()
        )(bfull)
        np.testing.assert_allclose(
            np.asarray(g1)[0], np.asarray(gf).sum(0), rtol=1e-4, atol=1e-4
        )
