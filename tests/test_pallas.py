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
