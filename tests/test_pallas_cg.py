"""Fused CG algebra kernels (opt-in path): kernel-level validation in
interpret mode, and the fused loop against the plain loop on a small
tiled-size problem."""

import numpy as np
import jax.numpy as jnp

from nodal_tpu.ops.grid import laplacian_matvec
from nodal_tpu.ops.pallas_cg import stencil_partials, update_partials


def test_stencil_partials_matches_reference():
    rng = np.random.default_rng(0)
    h, w = 512, 128
    p = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
    lp, part = stencil_partials(p, weight=2.0)
    lp_ref = laplacian_matvec(p, 2.0)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(part[:, 0])),
                               float(jnp.vdot(p, lp_ref)), rtol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(part[:, 1])),
                               float(jnp.sum(p)), rtol=1e-4, atol=1e-3)


def test_update_partials_matches_reference():
    rng = np.random.default_rng(1)
    h, w = 512, 128
    x, r, p, lp = (
        jnp.asarray(rng.standard_normal((h, w)).astype(np.float32))
        for _ in range(4)
    )
    alpha, mean_p = jnp.float32(0.37), jnp.float32(0.011)
    xn, rn, part = update_partials(x, r, p, lp, alpha, mean_p)
    xn_ref = x + 0.37 * p
    rn_ref = r - 0.37 * (lp + 0.011)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xn_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rn), np.asarray(rn_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(part[:, 0])),
                               float(jnp.vdot(rn_ref, rn_ref)), rtol=1e-4)
