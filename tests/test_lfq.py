"""LFQ quantizer: unit semantics + numerical parity vs the reference torch
implementation (models/codebook/LFQ.py) when importable."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idee_tpu.quant.lfq import LFQ


def _init(model, x, rng=0):
    return model.init({"params": jax.random.PRNGKey(rng)}, x, train=False)


def test_shapes_and_indices():
    lfq = LFQ(dim=16, codebook_size=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 16))
    v = _init(lfq, x)
    out, idx, aux = lfq.apply(v, x, train=False)
    assert out.shape == (2, 64, 16)
    assert idx.shape == (2, 64)
    assert set(np.unique(np.asarray(idx))) <= {0, 1}
    assert aux == 0.0  # eval: dummy zero (reference LFQ.py:264-266)


def test_index_is_sign_bit():
    lfq = LFQ(dim=1, codebook_size=2)  # no projections
    x = jnp.array([[[-2.0], [0.5], [3.0], [-0.1]]])
    v = _init(lfq, x)
    out, idx, _ = lfq.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 1, 0])
    np.testing.assert_array_equal(np.asarray(out)[0, :, 0], [-1, 1, 1, -1])


def test_straight_through_gradient():
    lfq = LFQ(dim=1, codebook_size=2, commitment_loss_weight=0.0,
              entropy_loss_weight=0.0, diversity_gamma=0.0)
    x = jnp.ones((1, 4, 1)) * 0.3
    v = _init(lfq, x)

    def f(x):
        out, _, _ = lfq.apply(v, x, train=True)
        return jnp.sum(out)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g))  # identity STE


def test_indices_to_codes_normal_code():
    lfq = LFQ(dim=16, codebook_size=2)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16))
    v = _init(lfq, x)
    code0 = lfq.apply(v, jnp.zeros((1,), jnp.int32),
                      method=lfq.indices_to_codes)
    code1 = lfq.apply(v, jnp.ones((1,), jnp.int32),
                      method=lfq.indices_to_codes)
    assert code0.shape == (1, 16)
    # code0/code1 differ by 2 * project_out.kernel
    kernel = v["params"]["project_out"]["kernel"]  # [1, 16]
    np.testing.assert_allclose(
        np.asarray(code1 - code0), 2 * np.asarray(kernel), rtol=1e-5)


def test_entropy_loss_signs():
    # all mass near a code -> low per-sample entropy; one-sided usage ->
    # low codebook entropy. Mixed signs increase codebook entropy.
    lfq = LFQ(dim=1, codebook_size=2, commitment_loss_weight=0.0,
              entropy_loss_weight=1.0, diversity_gamma=1.0)
    v = _init(lfq, jnp.ones((1, 4, 1)))
    onesided = jnp.ones((1, 64, 1)) * 2.0
    mixed = jnp.concatenate([jnp.ones((1, 32, 1)), -jnp.ones((1, 32, 1))], 1) * 2.0
    _, _, aux_one = lfq.apply(v, onesided, train=True)
    _, _, aux_mix = lfq.apply(v, mixed, train=True)
    # diversity term subtracts codebook entropy -> mixed usage lowers loss
    assert float(aux_mix) < float(aux_one)


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference repo not mounted")
def test_parity_vs_reference_torch():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from models.codebook.LFQ import LFQ as TorchLFQ
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    tmodel = TorchLFQ(dim=16, codebook_size=2, entropy_loss_weight=0.1,
                      diversity_gamma=0.1, commitment_loss_weight=3.0)
    tmodel.train()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 128, 16)).astype(np.float32)

    with torch.no_grad():
        tq, tidx, taux = tmodel(torch.from_numpy(x))

    # copy torch projection weights into the flax module
    jmodel = LFQ(dim=16, codebook_size=2, entropy_loss_weight=0.1,
                 diversity_gamma=0.1, commitment_loss_weight=3.0)
    params = {
        "project_in": {
            "kernel": jnp.asarray(tmodel.project_in.weight.detach().numpy().T),
            "bias": jnp.asarray(tmodel.project_in.bias.detach().numpy()),
        },
        "project_out": {
            "kernel": jnp.asarray(tmodel.project_out.weight.detach().numpy().T),
            "bias": jnp.asarray(tmodel.project_out.bias.detach().numpy()),
        },
    }
    jq, jidx, jaux = jmodel.apply({"params": params}, jnp.asarray(x),
                                  train=True)

    np.testing.assert_allclose(np.asarray(jq), tq.numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(jidx), tidx.numpy())
    np.testing.assert_allclose(float(jaux), float(taux), rtol=1e-4)

    # indices_to_codes parity (vq_0, the anomaly-loss anchor)
    with torch.no_grad():
        tcode = tmodel.indices_to_codes(torch.tensor([0]).long())
    jcode = jmodel.apply({"params": params}, jnp.zeros((1,), jnp.int32),
                         method=jmodel.indices_to_codes)
    np.testing.assert_allclose(np.asarray(jcode), tcode.numpy(), atol=1e-6)


def test_quantize_packed_matches_flat():
    """quantize_packed ([.., V*dim] block-diagonal layout) is numerically
    identical to quantize_flat on the row-major flattening -- s_q, indices,
    aux loss AND gradients (the packed path exists purely for TPU layout:
    the flat [M, dim] relayout tile-pads 8x and blocks GSPMD propagation)."""
    V, C = 6, 16
    lfq = LFQ(dim=C, codebook_size=2)
    rng = np.random.default_rng(3)
    zp = jnp.asarray(rng.normal(size=(2, 3, 4, 5, V * C)).astype(np.float32))
    vs = _init(lfq, zp.reshape(-1, C)[:, None, :])

    def run_flat(z):
        parts = lfq.apply(vs, z.reshape(-1, C), train=True,
                          method=lfq.quantize_flat)
        return parts.s_q.reshape(2, 3, 4, 5, V), parts.indices, parts.aux_loss

    def run_packed(z):
        parts = lfq.apply(vs, z, train=True, method=lfq.quantize_packed,
                          n_vars=V)
        return parts.s_q, parts.indices.reshape(-1), parts.aux_loss

    sf, idxf, auxf = run_flat(zp)
    sp, idxp, auxp = run_packed(zp)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sf), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idxp), np.asarray(idxf))
    np.testing.assert_allclose(float(auxp), float(auxf), rtol=1e-5)

    gf = jax.grad(lambda z: run_flat(z)[2] + jnp.sum(run_flat(z)[0]))(zp)
    gp = jax.grad(lambda z: run_packed(z)[2] + jnp.sum(run_packed(z)[0]))(zp)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gf), atol=1e-5)
