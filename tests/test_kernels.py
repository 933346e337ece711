# ------------------------------------------------------------------
"""Pallas kernel tests (interpret mode on CPU; the real TPU path is the
same kernel code compiled by Mosaic).

Golden reference for the scan: jax.lax.associative_scan with the standard
first-order-recurrence combine -- the same math as the mamba-ssm CUDA
selective-scan (reference models/encoder/Mamba.py:23,159).
"""
# ------------------------------------------------------------------

import jax
import jax.numpy as jnp
import numpy as np

from idee_tpu.kernels.selective_scan import (_scan_pallas_2d, _scan_xla,
                                             linear_scan)


def _ref_scan(a, b, axis):
    def combine(l, r):
        return l[0] * r[0], r[0] * l[1] + r[1]

    _, h = jax.lax.associative_scan(combine, (a, b), axis=axis)
    return h


class TestLinearScan:
    def test_matches_sequential(self):
        rng = np.random.default_rng(0)
        L, M = 16, 64
        a = jnp.asarray(rng.uniform(0.5, 1.0, (L, M)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(L, M)).astype(np.float32))
        h = np.zeros((M,), np.float32)
        seq = []
        for t in range(L):
            h = np.asarray(a)[t] * h + np.asarray(b)[t]
            seq.append(h)
        np.testing.assert_allclose(np.asarray(linear_scan(a, b, axis=0)),
                                   np.stack(seq), rtol=1e-5, atol=1e-5)

    def test_pallas_interpret_matches_xla(self):
        rng = np.random.default_rng(1)
        L, M = 32, 2048  # M multiple of 1024
        a = jnp.asarray(rng.uniform(0.0, 1.0, (L, M)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(L, M)).astype(np.float32))
        h_p = _scan_pallas_2d(a, b, interpret=True)
        h_x = _scan_xla(a, b)
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                                   rtol=1e-5, atol=1e-5)

    def test_axis_and_shape_handling(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(0.2, 0.9, (3, 8, 4, 2)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(3, 8, 4, 2)).astype(np.float32))
        h = linear_scan(a, b, axis=1)
        np.testing.assert_allclose(np.asarray(h),
                                   np.asarray(_ref_scan(a, b, 1)),
                                   rtol=1e-5, atol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        rng = np.random.default_rng(3)
        L, M = 8, 16
        a = jnp.asarray(rng.uniform(0.3, 0.9, (L, M)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(L, M)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(L, M)).astype(np.float32))

        def loss_kernel(a, b):
            return jnp.sum(linear_scan(a, b, axis=0) * w)

        def loss_ref(a, b):
            return jnp.sum(_ref_scan(a, b, 0) * w)

        ga_k, gb_k = jax.grad(loss_kernel, argnums=(0, 1))(a, b)
        ga_r, gb_r = jax.grad(loss_ref, argnums=(0, 1))(a, b)
        np.testing.assert_allclose(np.asarray(ga_k), np.asarray(ga_r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb_k), np.asarray(gb_r),
                                   rtol=1e-4, atol=1e-5)

    def test_mamba_backbone_still_correct(self):
        """The Mamba encoder (which now routes through linear_scan) produces
        finite outputs of the right shape."""
        from idee_tpu.nn.mamba import MambaSSM

        ssm = MambaSSM(d_model=8, d_state=2)
        x = jnp.asarray(np.random.default_rng(4).normal(
            size=(2, 16, 8)).astype(np.float32))
        v = ssm.init(jax.random.PRNGKey(0), x)
        y = ssm.apply(v, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
