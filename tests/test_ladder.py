"""Ladder benchmark machinery: width solving hits the reference's param
rungs (scripts/benchmark_ladder.py) without building real arrays."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.parametrize("family,target,tol", [
    ("unet", 500e3, 0.1),
    ("unet", 8e6, 0.1),
    ("convlstm", 8e6, 0.1),
    ("fourcastnet", 8e6, 0.15),
    ("sfno2d", 8e6, 0.15),
    ("swin", 500e3, 0.15),
    ("pangu", 500e3, 0.15),
    ("pangu", 8e6, 0.35),
    ("graphcast", 8e6, 0.1),
    ("mgn", 8e6, 0.1),
    ("fno2d", 8e6, 0.15),
    ("modernunet", 8e6, 0.1),
    ("distana", 500e3, 0.1),
    ("distana", 8e6, 0.1),
])
def test_solve_width_hits_target(family, target, tol):
    import jax.numpy as jnp

    import benchmark_ladder as L

    H, W, Cc, Cp, Cq = 32, 64, 4, 1, 8
    shapes = (
        jnp.zeros((1, 1, Cc, H, W), jnp.float32),
        jnp.zeros((1, 15, Cp, H, W), jnp.float32),
        jnp.zeros((1, 15, Cq, H, W), jnp.float32),
    )
    w, n = L.solve_width(family, target, shapes, H, W, Cc, Cp, Cq, None)
    assert abs(n - target) / target <= tol, (family, w, n)


def test_healpix_family_builds():
    import jax.numpy as jnp

    import benchmark_ladder as L

    shapes = (
        jnp.zeros((1, 1, 4, 12, 8, 8), jnp.float32),
        jnp.zeros((1, 15, 1, 12, 8, 8), jnp.float32),
        jnp.zeros((1, 15, 8, 12, 8, 8), jnp.float32),
    )
    w, n = L.solve_width("unet_hpx", 2e6, shapes, 8, 8, 4, 1, 8, 8)
    assert abs(n - 2e6) / 2e6 <= 0.15
