# ------------------------------------------------------------------
"""Tests for the non-LFQ codebooks: VQ (learnable / EMA / kmeans / psum
sync), FSQ, LatentQuantize, Random_VQ, and their integration into VQModel.

Golden targets where applicable are the reference modules
(models/codebook/{VQ,FSQ,LatentQuantize,Random_VQ}.py); LFQ has its own
golden suite in test_lfq.py.
"""
# ------------------------------------------------------------------

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idee_tpu.quant import get_quantizer
from idee_tpu.quant.fsq import FSQ
from idee_tpu.quant.latent_quantize import LatentQuantize
from idee_tpu.quant.random_vq import Random_VQ
from idee_tpu.quant.vq import VQ, laplace_smoothing


def _init(mod, x, train=False):
    return mod.init({"params": jax.random.PRNGKey(0),
                     "codebook": jax.random.PRNGKey(1)}, x, train=train)


# ------------------------------------------------------------------
# FSQ


class TestFSQ:
    def test_shapes_and_range(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 16))
        fsq = FSQ(dim=16, levels=(2,))
        v = _init(fsq, x)
        out, idx, aux = fsq.apply(v, x, train=False)
        assert out.shape == x.shape
        assert idx.shape == (2, 64)
        assert float(aux) == 0.0
        assert set(np.unique(np.asarray(idx))) <= {0, 1}

    def test_codes_roundtrip(self):
        """codes -> indices -> codes is the identity (pre-projection)."""
        fsq = FSQ(dim=3, levels=(3, 5, 4))
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 10, 3))
        v = _init(fsq, x)

        def roundtrip(m, z):
            codes = m.quantize(z)
            idx = m.codes_to_indices(codes)
            back = m.indices_to_codes(idx, project_out=False)
            return codes, idx, back

        codes, idx, back = fsq.apply(v, x[..., None, :], method=roundtrip)
        np.testing.assert_allclose(np.asarray(codes)[..., 0, :],
                                   np.asarray(back)[..., 0, :], atol=1e-6)
        assert int(np.max(np.asarray(idx))) < 3 * 5 * 4

    def test_ste_gradient_flows(self):
        # odd levels: offset=0, so tanh is unsaturated and the STE gradient
        # is visibly nonzero (even levels shift tanh by arctanh(~1) ~ 4.95,
        # same saturation as the reference formula, FSQ.py:96-101)
        fsq = FSQ(dim=16, levels=(3,))
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 16))
        v = _init(fsq, x)

        def f(xx):
            out, _, _ = fsq.apply(v, xx, train=True)
            return jnp.sum(out)

        g = jax.grad(f)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    @pytest.mark.skipif(not __import__("os").path.isdir("/root/reference"),
                        reason="reference not mounted")
    def test_golden_vs_reference(self):
        """Same projection weights => same outputs as the torch reference."""
        import sys

        import torch

        sys.path.insert(0, "/root/reference")
        from models.codebook.FSQ import FSQ as TorchFSQ

        tm = TorchFSQ(dim=16, levels=[2])
        x = np.random.default_rng(0).normal(size=(2, 32, 16)).astype(np.float32)
        with torch.no_grad():
            t_out, t_idx = tm(torch.from_numpy(x))

        fsq = FSQ(dim=16, levels=(2,))
        v = _init(fsq, jnp.asarray(x))
        # graft torch Linear weights (torch: [out,in] -> flax: [in,out])
        params = jax.tree.map(lambda p: p, v["params"])
        params["project_in"]["kernel"] = jnp.asarray(
            tm.project_in.weight.detach().numpy().T)
        params["project_in"]["bias"] = jnp.asarray(
            tm.project_in.bias.detach().numpy())
        params["project_out"]["kernel"] = jnp.asarray(
            tm.project_out.weight.detach().numpy().T)
        params["project_out"]["bias"] = jnp.asarray(
            tm.project_out.bias.detach().numpy())
        out, idx, _ = fsq.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), t_idx.numpy()[..., ])


# ------------------------------------------------------------------
# LatentQuantize


class TestLatentQuantize:
    def test_shapes_and_loss(self):
        lq = LatentQuantize(dim=16, levels=(2,))
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 32, 16))
        v = _init(lq, x)
        out, idx, loss = lq.apply(v, x, train=True)
        assert out.shape == x.shape
        assert idx.shape == (2, 32)
        assert float(loss) > 0  # commitment + quantization MSE
        out_e, _, loss_e = lq.apply(v, x, train=False)
        assert float(loss_e) == 0.0

    def test_values_init(self):
        """Level values: linspace for odd L, arange(L)/L - 0.5 for even
        (reference: LatentQuantize.py:115-116)."""
        lq = LatentQuantize(dim=3, levels=(3, 3, 3))
        x = jnp.zeros((1, 4, 3))
        v = _init(lq, x)
        vals = np.asarray(v["params"]["values_per_latent"])
        np.testing.assert_allclose(vals[0], [-0.5, 0.0, 0.5], atol=1e-6)

    def test_quantize_snaps_to_nearest(self):
        lq = LatentQuantize(dim=2, levels=(2, 2))
        x = jnp.asarray([[[-0.4, 0.1]]])  # values for L=2: [-0.5, 0.0]
        v = _init(lq, x)
        out, idx, _ = lq.apply(v, x, train=False)
        np.testing.assert_allclose(np.asarray(out)[0, 0], [-0.5, 0.0],
                                   atol=1e-6)
        assert int(np.asarray(idx)[0, 0]) == 0 + 1 * 2  # digits (0, 1)

    def test_gradient_reaches_values(self):
        lq = LatentQuantize(dim=16, levels=(2,))
        x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16))
        v = _init(lq, x)

        def f(params):
            out, _, loss = lq.apply({"params": params}, x, train=True)
            return loss

        g = jax.grad(f)(v["params"])
        assert float(jnp.abs(g["values_per_latent"]).sum()) >= 0  # finite
        assert np.isfinite(np.asarray(g["values_per_latent"])).all()


# ------------------------------------------------------------------
# VQ


class TestVQ:
    def test_learnable_default_shapes(self):
        vq = VQ(dim=16, codebook_size=2, codebook_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 16))
        v = _init(vq, x, train=True)
        assert "embed" in v["params"]  # learnable codebook is a param
        out, idx, loss = vq.apply(v, x, train=True)
        assert out.shape == x.shape
        assert idx.shape == (2, 64)
        assert float(loss) > 0

    def test_quantized_matches_nearest_code(self):
        vq = VQ(dim=4, codebook_size=8, codebook_dim=4)
        x = jax.random.normal(jax.random.PRNGKey(8), (1, 32, 4))
        v = _init(vq, x)
        out, idx, _ = vq.apply(v, x, train=False)
        embed = np.asarray(v["params"]["embed"])[0]  # [K, D]
        d = np.linalg.norm(np.asarray(x)[0][:, None] - embed[None], axis=-1)
        np.testing.assert_array_equal(np.asarray(idx)[0], d.argmin(-1))
        np.testing.assert_allclose(np.asarray(out)[0],
                                   embed[d.argmin(-1)], atol=1e-5)

    def test_ema_update_math(self):
        """One EMA step: cluster_size/embed_avg follow the reference decay
        (VQ.py:534-548)."""
        decay, K = 0.8, 4
        vq = VQ(dim=4, codebook_size=K, codebook_dim=4, ema_update=True,
                learnable_codebook=False, decay=decay)
        x = jax.random.normal(jax.random.PRNGKey(9), (1, 64, 4))
        v = _init(vq, x, train=True)
        cb0 = v["codebook"]
        embed0 = np.asarray(cb0["embed"])

        (_, idx, _), upd = vq.apply(v, x, train=True, mutable=["codebook"],
                                    rngs={"codebook": jax.random.PRNGKey(0)})
        onehot = np.eye(K, dtype=np.float32)[np.asarray(idx)[0]]
        bins = onehot.sum(0)
        sums = np.asarray(x)[0].T @ onehot  # [D, K]
        exp_cs = np.asarray(cb0["cluster_size"])[0] * decay + bins * (1 - decay)
        np.testing.assert_allclose(np.asarray(upd["codebook"]["cluster_size"])[0],
                                   exp_cs, rtol=1e-5)
        exp_avg = (np.asarray(cb0["embed_avg"])[0] * decay
                   + sums.T * (1 - decay))
        np.testing.assert_allclose(np.asarray(upd["codebook"]["embed_avg"])[0],
                                   exp_avg, rtol=1e-4, atol=1e-5)
        smoothed = ((exp_cs + 1e-5) / (exp_cs.sum() + K * 1e-5)) * exp_cs.sum()
        np.testing.assert_allclose(np.asarray(upd["codebook"]["embed"])[0],
                                   exp_avg / smoothed[:, None],
                                   rtol=1e-4, atol=1e-5)
        # embed actually moved
        assert np.abs(np.asarray(upd["codebook"]["embed"]) - embed0).sum() > 0

    def test_kmeans_init_runs_once(self):
        vq = VQ(dim=4, codebook_size=2, codebook_dim=4, ema_update=True,
                learnable_codebook=False, kmeans_init=True, kmeans_iters=4)
        x = jax.random.normal(jax.random.PRNGKey(10), (1, 128, 4))
        v = _init(vq, x, train=False)  # train=True at init would k-means
        assert float(v["codebook"]["initted"]) == 0.0
        assert np.abs(np.asarray(v["codebook"]["embed"])).sum() == 0.0
        (_, _, _), upd = vq.apply(v, x, train=True, mutable=["codebook"],
                                  rngs={"codebook": jax.random.PRNGKey(1)})
        assert float(upd["codebook"]["initted"]) == 1.0
        assert np.abs(np.asarray(upd["codebook"]["embed"])).sum() > 0

    def test_ema_psum_sync_on_mesh(self):
        """EMA stats all-reduce over the mesh axis: per-device batches give
        the same codebook as the fused batch on one device (the TPU-native
        replacement for NCCL all_reduce, reference VQ.py:534-539)."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        devices = np.array(jax.devices()[:8])
        mesh = Mesh(devices, ("data",))

        def make(sync):
            return VQ(dim=4, codebook_size=4, codebook_dim=4, ema_update=True,
                      learnable_codebook=False, decay=0.5,
                      sync_axis="data" if sync else None)

        x = jax.random.normal(jax.random.PRNGKey(11), (8, 32, 4))
        vq_s = make(True)
        v = _init(make(False), x[:1], train=True)

        @jax.jit
        def sharded(v, x):
            def f(cb, xx):
                (_, _, _), upd = vq_s.apply(
                    {"params": {}, "codebook": cb}, xx, train=True,
                    mutable=["codebook"],
                    rngs={"codebook": jax.random.PRNGKey(2)})
                return upd["codebook"]

            return shard_map(
                f, mesh=mesh,
                in_specs=(P(), P("data")), out_specs=P(),
            )(v["codebook"], x)

        cb_sharded = jax.device_get(sharded(v, x))

        # fused: all 8 device batches in one call, no sync
        vq_f = make(False)
        xf = x.reshape(1, 8 * 32, 4)
        (_, _, _), upd = vq_f.apply(v, xf, train=True, mutable=["codebook"],
                                    rngs={"codebook": jax.random.PRNGKey(2)})
        np.testing.assert_allclose(cb_sharded["cluster_size"],
                                   np.asarray(upd["codebook"]["cluster_size"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(cb_sharded["embed"],
                                   np.asarray(upd["codebook"]["embed"]),
                                   rtol=1e-3, atol=1e-5)

    def test_orthogonal_reg(self):
        vq = VQ(dim=4, codebook_size=4, codebook_dim=4,
                orthogonal_reg_weight=10.0)
        x = jax.random.normal(jax.random.PRNGKey(12), (1, 32, 4))
        v = _init(vq, x)
        _, _, loss_o = vq.apply(v, x, train=True)
        vq0 = VQ(dim=4, codebook_size=4, codebook_dim=4)
        _, _, loss_p = vq0.apply(v, x, train=True)
        assert float(loss_o) > float(loss_p)

    def test_laplace_smoothing(self):
        x = jnp.asarray([[1.0, 0.0, 3.0]])
        out = laplace_smoothing(x, 3, eps=1e-5)
        exp = (np.array([1.0, 0.0, 3.0]) + 1e-5) / (4.0 + 3e-5)
        np.testing.assert_allclose(np.asarray(out)[0], exp, rtol=1e-6)


# ------------------------------------------------------------------
# Random_VQ


class TestRandomVQ:
    def test_frozen_everything(self):
        rvq = Random_VQ(dim=16, codebook_size=2, codebook_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(13), (2, 32, 16))
        v = _init(rvq, x)
        assert v.get("params", {}) == {}  # nothing trainable
        out, idx, loss = rvq.apply(v, x, train=True)
        assert out.shape == x.shape
        assert float(loss) == 0.0
        # deterministic given frozen projections
        out2, idx2, _ = rvq.apply(v, x, train=True)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))

    def test_no_gradient_to_input_through_output(self):
        rvq = Random_VQ(dim=8, codebook_size=4, codebook_dim=8)
        x = jax.random.normal(jax.random.PRNGKey(14), (1, 16, 8))
        v = _init(rvq, x)

        def f(xx):
            out, _, _ = rvq.apply(v, xx, train=True)
            return jnp.sum(out ** 2)

        g = jax.grad(f)(x)
        assert float(jnp.abs(g).sum()) == 0.0  # fully stop-gradiented


# ------------------------------------------------------------------
# registry + model integration


class TestRegistryAndModel:
    def test_registry_resolves_all(self):
        for name in ("LFQ", "VQ", "FSQ", "LatentQuantize", "Random_VQ"):
            assert get_quantizer(name) is not None
        with pytest.raises(NotImplementedError):
            get_quantizer("nope")

    @pytest.mark.parametrize("codebook", ["VQ", "FSQ", "LatentQuantize",
                                          "Random_VQ"])
    def test_vq_model_with_codebook(self, tiny_config, codebook):
        from idee_tpu.models import build_model

        cfg = tiny_config.replace(codebook=codebook, encoder="CNN_3D")
        model = build_model(cfg)
        x = np.random.default_rng(0).normal(
            size=(1, 3, 1, cfg.delta_t, 16, 16)).astype(np.float32)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1),
                        "droppath": jax.random.PRNGKey(2),
                        "codebook": jax.random.PRNGKey(3)},
                       jnp.asarray(x), train=False)
        out = model.apply(v, jnp.asarray(x), train=False)
        assert out.z.shape == (1, 1, 16, 16)
        assert out.anomaly.shape == (1, 3, cfg.delta_t, 16, 16)
        assert out.vq0.shape == (cfg.codebook_dim,)

    def test_train_step_with_random_vq_state(self, tiny_config, fake_cube):
        """End-to-end: a stateful codebook threads through the jitted train
        step via TrainState.extra_vars."""
        from idee_tpu.data.loader import DataLoader
        from idee_tpu.data.synthetic import SyntheticDataset
        from idee_tpu.models import build_model
        from idee_tpu.train.state import create_train_state
        from idee_tpu.train.steps import init_epoch_metrics, make_train_step

        cfg = tiny_config.replace(codebook="Random_VQ")
        ds = SyntheticDataset(cube=fake_cube, times=cfg.times_train,
                              variables=list(cfg.variables),
                              delta_t=cfg.delta_t, is_aug=False)
        loader = DataLoader(ds, cfg.batch_size, shuffle=False, drop_last=True)
        batch = next(iter(loader))
        model = build_model(cfg)
        state = create_train_state(cfg, model, batch["x"], steps_per_epoch=5)
        assert "codebook" in state.extra_vars
        step = make_train_step(model, cfg, t0=float(ds.timestep[0]),
                               donate=False)
        metrics = init_epoch_metrics(ds.anomaly.shape)
        state2, metrics = step(state, metrics, batch)
        assert int(state2.step) == 1
        # frozen: codebook unchanged, params changed
        np.testing.assert_array_equal(
            np.asarray(state.extra_vars["codebook"]["vq"]["rand_projs"]),
            np.asarray(state2.extra_vars["codebook"]["vq"]["rand_projs"]))
