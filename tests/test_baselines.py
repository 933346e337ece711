# ------------------------------------------------------------------
"""Baseline zoo tests: MIL (DeepMIL/ARNet/RTFM/MGFN), SimpleNet, STEAL,
UniAD -- model shapes, masked-dense loss semantics vs naive ragged-bag
computation, and one end-to-end jitted train step per family.
"""
# ------------------------------------------------------------------

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idee_tpu.baselines.config import (mil_config, oneclass_config,
                                       recon_config)
from idee_tpu.baselines.mil import losses as L


def _tiny_mil(**kw):
    base = dict(
        in_channels_dynamic=3, variables=["var_01", "var_02", "var_03"],
        x_max=16, y_max=16, en_embed_dim=[8, 8], en_depths=[1, 1],
        cls_dim=[32, 8, 1], loss_k_deepmil=5, loss_alpha_arnet=32,
        loss_k_rtfm=5, loss_k_mgfn=3, dim_mtn_rtfm=8,
        agent_embed_dim=[8], dim_head_mgfn=[8, 8],
        times_train=(1, 40), times_val=(41, 56),
        batch_size=2, n_epochs=1,
    )
    base.update(kw)
    return mil_config(**base)


# ------------------------------------------------------------------
# masked-dense loss semantics vs naive ragged bags


class TestMaskedBagSemantics:
    def test_masked_topk_equals_ragged(self):
        rng = np.random.default_rng(0)
        scores = rng.random((50, 4)).astype(np.float32)
        mask = rng.random(50) > 0.5
        k = 5
        top, idx, valid = L.masked_topk(jnp.asarray(scores),
                                        jnp.asarray(mask), k)
        ragged = np.sort(scores[mask], axis=0)[::-1][:k]
        np.testing.assert_allclose(np.asarray(top), ragged, atol=1e-6)
        assert bool(np.all(np.asarray(valid)))

    def test_ranking_loss_matches_naive(self):
        """relu(1 - topk(p) + topk(n)).mean() on explicit bags."""
        rng = np.random.default_rng(1)
        s = rng.random((60, 3)).astype(np.float32)
        mask = rng.random(60) > 0.6
        k = 4
        got = float(L.ranking_loss(jnp.asarray(s), jnp.asarray(mask),
                                   jnp.asarray(~mask), k))
        p = np.sort(s[mask], axis=0)[::-1][:k]
        n = np.sort(s[~mask], axis=0)[::-1][:k]
        want = np.maximum(1.0 - p + n, 0).mean()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_dmil_and_center(self):
        rng = np.random.default_rng(2)
        s = rng.random((40, 2)).astype(np.float32)
        mask = rng.random(40) > 0.5
        k = 3
        got = float(L.dmil_ranking_loss(jnp.asarray(s), jnp.asarray(mask),
                                        jnp.asarray(~mask), k))
        p = np.sort(s[mask], axis=0)[::-1][:k]
        n = np.sort(s[~mask], axis=0)[::-1][:k]
        want = (-np.log(p)).mean() + (-np.log(1 - n)).mean()
        np.testing.assert_allclose(got, want, rtol=1e-4)

        got_c = float(L.center_loss(jnp.asarray(s), jnp.asarray(~mask),
                                    lambda_c=20.0))
        bag = s[~mask]
        want_c = ((bag - bag.mean()) ** 2).mean() * 20.0
        np.testing.assert_allclose(got_c, want_c, rtol=1e-5)

    def test_rtfm_loss_matches_naive(self):
        rng = np.random.default_rng(3)
        P, T, C, k = 30, 2, 6, 3
        s = rng.random((P, T)).astype(np.float32)
        f = rng.normal(size=(P, T, C)).astype(np.float32)
        mask = rng.random(P) > 0.5
        got = float(L.rtfm_loss(jnp.asarray(s), jnp.asarray(f),
                                jnp.asarray(mask), jnp.asarray(~mask), k,
                                margin=10.0, alpha=0.1))
        # naive per-column gather
        def bag_terms(sel):
            mag = np.linalg.norm(f, axis=-1)
            mag = np.where(sel[:, None], mag, -1.0)
            idx = np.argsort(-mag, axis=0)[:k]  # [k, T]
            ssel = np.take_along_axis(s, idx, axis=0)
            fsel = np.stack([f[idx[:, t], t] for t in range(T)], axis=1)
            return ssel, np.linalg.norm(fsel.mean(0), axis=-1)

        sp, pm = bag_terms(mask)
        sn, nm = bag_terms(~mask)
        want = ((-np.log(sp)).mean() + (-np.log(1 - sn)).mean()
                + 0.1 * np.mean((np.abs(10.0 - pm) + nm) ** 2))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_small_bag_does_not_crash(self):
        """Where torch.topk would raise (bag < k), the masked version
        falls back to a valid-slot mean."""
        s = jnp.asarray(np.random.default_rng(4).random((20, 1)),
                        jnp.float32)
        mask = jnp.zeros(20, bool).at[3].set(True)  # bag of 1, k = 5
        out = L.ranking_loss(s, mask, ~mask, k=5)
        assert np.isfinite(float(out))


# ------------------------------------------------------------------
# end-to-end train steps


class TestMILTraining:
    @pytest.mark.parametrize("variant", ["deepmil", "arnet", "rtfm", "mgfn"])
    def test_train_step(self, fake_cube, variant):
        from idee_tpu.baselines.mil.driver import (init_mil_metrics,
                                                   make_mil_train_step)
        from idee_tpu.baselines.mil.models import build_mil_model
        from idee_tpu.data.loader import DataLoader
        from idee_tpu.data.synthetic import SyntheticDataset
        from idee_tpu.train.state import create_train_state

        cfg = _tiny_mil()
        ds = SyntheticDataset(cube=fake_cube, times=cfg.times_train,
                              variables=list(cfg.variables),
                              delta_t=cfg.delta_t, is_aug=False)
        loader = DataLoader(ds, cfg.batch_size, shuffle=False,
                            drop_last=True)
        batch = next(iter(loader))
        model = build_mil_model(cfg, variant)
        state = create_train_state(cfg, model, batch["x"],
                                   steps_per_epoch=4)
        step = make_mil_train_step(model, cfg, variant,
                                   t0=float(ds.timestep[0]), donate=False)
        metrics = init_mil_metrics(ds.anomaly.shape)
        state2, metrics = step(state, metrics, batch)
        m = jax.device_get(metrics)
        assert int(m["n_steps"]) == 1
        assert np.isfinite(float(m["loss_sum"]))
        assert int(state2.step) == 1
        # params actually moved
        diff = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda p, q: float(jnp.abs(p - q).sum()),
                         state.params, state2.params))
        assert diff > 0


class TestSimpleNet:
    def test_train_and_eval_step(self, fake_cube):
        from idee_tpu.baselines.oneclass.driver import (Backbone,
                                                        init_oc_metrics,
                                                        make_oc_eval_step,
                                                        make_oc_train_step)
        from idee_tpu.baselines.oneclass.simplenet import SimpleNet
        from idee_tpu.data.loader import DataLoader
        from idee_tpu.data.synthetic import SyntheticDataset
        from idee_tpu.train.state import create_train_state

        cfg = oneclass_config(
            in_channels_dynamic=3, variables=["var_01", "var_02", "var_03"],
            x_max=16, y_max=16, en_embed_dim=[8, 8], en_depths=[1, 1],
            dim=16, dsc_hidden=8, batch_size=2,
            times_train=(1, 40), times_val=(41, 56))
        ds = SyntheticDataset(cube=fake_cube, times=cfg.times_train,
                              variables=list(cfg.variables),
                              delta_t=cfg.delta_t, is_aug=False,
                              is_replace_anomaly=True)
        loader = DataLoader(ds, cfg.batch_size, shuffle=False,
                            drop_last=True)
        batch = next(iter(loader))

        backbone = Backbone(config=cfg)
        model = SimpleNet(config=cfg)
        bb_vars = backbone.init({"params": jax.random.PRNGKey(0)},
                                batch["x"], train=False)
        z0 = backbone.apply(bb_vars, batch["x"], train=False)
        state = create_train_state(cfg, model, z0, steps_per_epoch=4)
        step = make_oc_train_step(backbone, model, cfg, bb_vars,
                                  donate=False)
        metrics = init_oc_metrics(ds.anomaly.shape)
        state2, metrics = step(state, metrics, batch)
        assert np.isfinite(float(jax.device_get(metrics)["loss_sum"]))

        estep = make_oc_eval_step(backbone, model, cfg, bb_vars,
                                  t0=float(ds.timestep[0]))
        from idee_tpu.train.state import model_variables
        metrics = init_oc_metrics(ds.anomaly.shape)
        metrics = estep(model_variables(state2), metrics, batch)
        m = jax.device_get(metrics)
        assert int(m["vote_cnt"].sum()) > 0

    def test_replace_anomaly_changes_extreme_pixels(self, fake_cube):
        from idee_tpu.data.synthetic import SyntheticDataset

        kw = dict(cube=fake_cube, times=(1, 40),
                  variables=fake_cube.variables, delta_t=8, is_aug=False)
        plain = SyntheticDataset(**kw)
        repl = SyntheticDataset(is_replace_anomaly=True, **kw)
        ext = plain.extreme > 0
        sel = np.broadcast_to(ext[None], plain.datacube_dynamic.shape)
        assert not np.allclose(plain.datacube_dynamic[sel],
                               repl.datacube_dynamic[sel])
        np.testing.assert_allclose(plain.datacube_dynamic[~sel],
                                   repl.datacube_dynamic[~sel])


class TestRecon:
    @pytest.mark.parametrize("which", ["steal", "uniad"])
    def test_train_step(self, fake_cube, which):
        from idee_tpu.baselines.recon.driver import (_build,
                                                     init_recon_metrics)
        from idee_tpu.data.loader import DataLoader
        from idee_tpu.data.synthetic import SyntheticDataset
        from idee_tpu.train.state import create_train_state

        cfg = recon_config(
            in_channels_dynamic=3, variables=["var_01", "var_02", "var_03"],
            x_max=16, y_max=16, batch_size=2,
            en_embed_dim_steal=[8, 12, 16], de_embed_dim_steal=[16, 12, 8],
            inplanes=3, instrides=2, feature_size=(8, 8), hidden_dim=12,
            dim_feedforward=24, nhead=3, num_encoder_layers=1,
            num_decoder_layers=1,
            delta_t=8 if which == "steal" else 1,
            times_train=(1, 40), times_val=(41, 56))
        ds = SyntheticDataset(cube=fake_cube, times=cfg.times_train,
                              variables=list(cfg.variables),
                              delta_t=cfg.delta_t, is_aug=False,
                              is_replace_anomaly=True)
        loader = DataLoader(ds, cfg.batch_size, shuffle=False,
                            drop_last=True)
        batch = next(iter(loader))

        model, make_train, make_eval = _build(cfg, which)
        x0 = (batch["x"][:, :, 0] if which == "steal"
              else batch["x"][:, :, 0, 0])
        state = create_train_state(cfg, model, x0, steps_per_epoch=4)
        step = make_train(model, cfg, t0=float(ds.timestep[0]),
                          donate=False)
        metrics = init_recon_metrics(ds.anomaly.shape)
        state2, metrics = step(state, metrics, batch)
        assert np.isfinite(float(jax.device_get(metrics)["loss_sum"]))
        assert int(state2.step) == 1

        from idee_tpu.train.state import model_variables
        estep = make_eval(model, cfg, t0=float(ds.timestep[0]))
        metrics = init_recon_metrics(ds.anomaly.shape)
        metrics = estep(model_variables(state2), metrics, batch)
        assert int(jax.device_get(metrics)["vote_cnt"].sum()) > 0

    def test_neighbor_mask(self):
        from idee_tpu.baselines.recon.uniad import neighbor_mask

        m = neighbor_mask((4, 4), (3, 3))
        assert m.shape == (16, 16)
        # token (0,0) attends to (0,0),(0,1),(1,0),(1,1) only
        allowed = np.nonzero(m[0])[0]
        np.testing.assert_array_equal(allowed, [0, 1, 4, 5])
        # mask is symmetric
        np.testing.assert_array_equal(m, m.T)


class TestCLIConfigs:
    def test_subclass_fields_reach_cli(self):
        from idee_tpu.config import read_arguments

        cfg = read_arguments(
            train=True, print_=False, save=False,
            argv=["--loss_k_deepmil", "7", "--agent_embed_dim", "[8]"],
            defaults=mil_config())
        assert cfg.loss_k_deepmil == 7
        assert cfg.agent_embed_dim == [8]
        assert cfg.cls_dim == [512, 256, 1]
