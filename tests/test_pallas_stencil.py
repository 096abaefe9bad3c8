"""Pallas TPU stencil kernel equivalence (runs only on a TPU backend —
the rest of the suite uses the local CPU backend)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from penguin_tpu.pallas_kernels.stencil import stencil5_available, stencil5_matvec
from penguin_tpu.operators import _shift_m, _shift_p


@pytest.mark.skipif(not stencil5_available(), reason="needs TPU backend")
def test_stencil5_matches_xla():
    M, N = 256, 256
    rng = np.random.default_rng(0)
    cc, cxm, cxp, cym, cyp, x = [
        jnp.asarray(rng.standard_normal((M, N)), jnp.float32) for _ in range(6)
    ]
    ref = (
        cc * x
        + cxm * _shift_m(x, 0)
        + cxp * _shift_p(x, 0)
        + cym * _shift_m(x, 1)
        + cyp * _shift_p(x, 1)
    )
    got = stencil5_matvec(cc, cxm, cxp, cym, cyp, x, tile_m=128)
    assert float(jnp.abs(got - ref).max()) < 1e-6
