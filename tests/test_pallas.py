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
