# ------------------------------------------------------------------
"""MIL losses as masked-dense math.

Parity target: Baselines_MIL/models/losses.py (421 LoC). The reference
operates on ragged bags (variable-length pixel lists selected by boolean
masks); every loss here reproduces the same top-k semantics on dense
[P(=H*W), ...] score/feature tensors with a mask, which is jit-compatible:

* bag membership -> additive mask fill (non-members filled with -1, below
  any sigmoid score, so top_k never selects them while the bag has >= k
  members);
* bernoulli instance drop (multiplicative, no rescale -- NoScaleDropout
  semantics, losses.py:18-30) applied before top-k exactly as the
  reference does;
* where a bag holds FEWER than k instances torch.topk would raise
  (reference relies on bags being large); here invalid top-k slots are
  masked out of the mean -- the documented, deliberate deviation.

All scores arrive sigmoid-activated in [0, 1] (the classifiers end with
Sigmoid); BCE is computed on probabilities with clamped logs (torch
BCELoss clamps at -100; we clip p to [1e-12, 1-1e-12]).
"""
# ------------------------------------------------------------------

import jax
import jax.numpy as jnp

_FILL = -1.0
_EPS = 1e-12


def _bern_keep(rng, shape, drop_rate: float):
    return jax.random.bernoulli(rng, 1.0 - drop_rate, shape).astype(
        jnp.float32)


def _log(p):
    return jnp.log(jnp.clip(p, _EPS, 1.0))


def _norm2(x, axis=-1):
    """L2 norm whose gradient is finite at x == 0.

    torch.norm's subgradient at 0 is 0 and torch's pairwise_distance adds
    eps=1e-6 inside the root, so the reference MIL losses never NaN on
    all-zero feature rows (which instance drop produces); jnp.linalg.norm
    differentiates to NaN there — observed as MGFN's loss going NaN in
    epoch 2 of the 48x48 zoo run. The 1e-12 shift changes values by
    < 1e-6 and leaves top-k rankings untouched.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + _EPS)


def masked_topk(values, mask, k: int):
    """Top-k of ``values`` [P, ...] along axis 0 restricted to mask [P].

    Returns (top [k, ...], idx [k, ...], valid [k, ...]) where valid marks
    slots actually inside the bag.
    """
    filled = jnp.where(mask[(...,) + (None,) * (values.ndim - 1)],
                       values, _FILL)
    moved = jnp.moveaxis(filled, 0, -1)              # [..., P]
    top, idx = jax.lax.top_k(moved, k)               # [..., k]
    top = jnp.moveaxis(top, -1, 0)
    idx = jnp.moveaxis(idx, -1, 0)
    valid = top > _FILL + 0.5
    return top, idx, valid


def _masked_mean(x, w):
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def ranking_loss(scores, mask_p, mask_n, k: int, drop_rate: float = 0.5,
                 train: bool = False, rng=None):
    """DeepMIL margin ranking (reference: losses.py:44-76).

    scores [P, T] in [0,1]; mask_p/mask_n [P] bool bag memberships.
    loss = relu(1 - topk(z_p) + topk(z_n)).mean() with elementwise
    bernoulli drop before top-k in training.
    """
    s_p = s_n = scores
    if train and drop_rate > 0:
        r1, r2 = jax.random.split(rng)
        s_p = scores * _bern_keep(r1, scores.shape, drop_rate)
        s_n = scores * _bern_keep(r2, scores.shape, drop_rate)
    p_top, _, p_ok = masked_topk(s_p, mask_p, k)
    n_top, _, n_ok = masked_topk(s_n, mask_n, k)
    w = (p_ok & n_ok).astype(jnp.float32)
    return _masked_mean(jax.nn.relu(1.0 - p_top + n_top), w)


def dmil_ranking_loss(scores, mask_p, mask_n, k: int, drop_rate: float = 0.5,
                      train: bool = False, rng=None):
    """ARNet DMIL ranking: BCE(topk(z_p), 1) + BCE(topk(z_n), 0)
    (reference: losses.py:105-129; k = t // alpha)."""
    s_p = s_n = scores
    if train and drop_rate > 0:
        r1, r2 = jax.random.split(rng)
        s_p = scores * _bern_keep(r1, scores.shape, drop_rate)
        s_n = scores * _bern_keep(r2, scores.shape, drop_rate)
    p_top, _, p_ok = masked_topk(s_p, mask_p, k)
    n_top, _, n_ok = masked_topk(s_n, mask_n, k)
    loss_p = _masked_mean(-_log(p_top), p_ok.astype(jnp.float32))
    loss_n = _masked_mean(-_log(1.0 - n_top), n_ok.astype(jnp.float32))
    return loss_p + loss_n


def center_loss(scores, mask_n, lambda_c: float = 20.0):
    """MSE of normal-bag scores to their own mean, scaled by lambda_c
    (reference: losses.py:132-142)."""
    w = mask_n[:, None].astype(jnp.float32) * jnp.ones_like(scores)
    mean = _masked_mean(scores, w)
    return _masked_mean((scores - mean) ** 2, w) * lambda_c


def rtfm_loss(scores, features, mask_p, mask_n, k: int,
              margin: float = 100.0, alpha: float = 1e-4,
              drop_rate: float = 0.5, train: bool = False, rng=None):
    """RTFM feature-magnitude loss (reference: losses.py:145-214).

    scores [P, T]; features [P, T, C]. Per bag: bernoulli-drop whole
    instances (rows), rank by L2 feature magnitude, take top-k indices,
    BCE the (undropped) scores at those indices, and pull/push the mean
    top-k feature magnitudes to margin / 0.

    Index note: the reference's fancy-indexing `z[idx]` with a [k, T]
    index tensor produces [k, T, T] cross terms (losses.py:200-206); we
    implement the intended per-column gather (score[i, t] =
    scores[idx[i, t], t]) -- identical when T == 1 and the intended
    semantics otherwise.
    """
    f_p = f_n = features
    if train and drop_rate > 0:
        r1, r2 = jax.random.split(rng)
        P = features.shape[0]
        f_p = features * _bern_keep(r1, (P,), drop_rate)[:, None, None]
        f_n = features * _bern_keep(r2, (P,), drop_rate)[:, None, None]

    mag_p = _norm2(f_p)  # [P, T]
    mag_n = _norm2(f_n)
    _, idx_p, ok_p = masked_topk(mag_p, mask_p, k)   # idx [k, T]
    _, idx_n, ok_n = masked_topk(mag_n, mask_n, k)

    s_p = jnp.take_along_axis(scores, idx_p, axis=0)  # [k, T]
    s_n = jnp.take_along_axis(scores, idx_n, axis=0)
    loss_p = _masked_mean(-_log(s_p), ok_p.astype(jnp.float32))
    loss_n = _masked_mean(-_log(1.0 - s_n), ok_n.astype(jnp.float32))

    def sel_feat(f, idx):  # [P,T,C], [k,T] -> [k,T,C]
        return jnp.take_along_axis(f, idx[..., None], axis=0)

    fp_mean = _norm2(sel_feat(f_p, idx_p).mean(0))  # [T]
    fn_mean = _norm2(sel_feat(f_n, idx_n).mean(0))
    loss_rtfm = jnp.mean((jnp.abs(margin - fp_mean) + fn_mean) ** 2)
    return loss_n + loss_p + alpha * loss_rtfm


def contrastive_loss(o1, o2, label: float, margin: float = 100.0):
    """Row-wise euclidean contrastive (reference: losses.py:259-269)."""
    # torch pairwise_distance eps semantics: finite grad at o1 == o2
    d = _norm2(o1 - o2)[..., None]
    return jnp.mean((1.0 - label) * d ** 2
                    + label * jnp.abs(margin - d) ** 2)


def mgfn_loss(scores, features, mask_p, mask_n, k: int = 100,
              lambda_mgfn: float = 1e-4, margin: float = 100.0,
              drop_rate: float = 0.5, train: bool = False, rng=None):
    """MGFN per-variable loss over the whole batch
    (reference: losses.py:319-420).

    scores [B, P, T]; features [B, P, T, C] for ONE variable; masks [B, P].
    Per sample: magnitude top-k -> BCE on scores; the t=0 top-k features
    across the batch feed three contrastive terms on their L1 norms.
    """
    B = scores.shape[0]
    rngs = jax.random.split(rng, B) if rng is not None else [None] * B

    loss_cls = 0.0
    p_stack, n_stack = [], []
    for b in range(B):  # B is small (batch_size 1-8); static unroll
        f_p = f_n = features[b]
        if train and drop_rate > 0:
            r1, r2 = jax.random.split(rngs[b])
            P = f_p.shape[0]
            f_p = f_p * _bern_keep(r1, (P,), drop_rate)[:, None, None]
            f_n = f_n * _bern_keep(r2, (P,), drop_rate)[:, None, None]
        mag_p = _norm2(f_p)
        mag_n = _norm2(f_n)
        _, idx_p, ok_p = masked_topk(mag_p, mask_p[b], k)
        _, idx_n, ok_n = masked_topk(mag_n, mask_n[b], k)
        s_p = jnp.take_along_axis(scores[b], idx_p, axis=0)
        s_n = jnp.take_along_axis(scores[b], idx_n, axis=0)
        loss_cls += (_masked_mean(-_log(s_p), ok_p.astype(jnp.float32))
                     + _masked_mean(-_log(1 - s_n), ok_n.astype(jnp.float32)))
        # t=0 top-k features (reference: losses.py:388-397)
        p_stack.append(jnp.take_along_axis(
            features[b][:, 0, :], idx_p[:, :1], axis=0))  # [k, C]
        n_stack.append(jnp.take_along_axis(
            features[b][:, 0, :], idx_n[:, :1], axis=0))

    p_all = jnp.linalg.norm(jnp.stack(p_stack), ord=1, axis=2)  # [B, k]
    n_all = jnp.linalg.norm(jnp.stack(n_stack), ord=1, axis=2)
    loss_con = contrastive_loss(p_all, n_all, 1.0, margin)
    loss_con_n = loss_con_a = 0.0
    if B % 2 == 0 and B >= 2:
        h = B // 2
        loss_con_n = contrastive_loss(n_all[:h], n_all[h:], 0.0, margin)
        loss_con_a = contrastive_loss(p_all[:h], p_all[h:], 0.0, margin)
    return loss_cls / B + lambda_mgfn * (loss_con + loss_con_a + loss_con_n)


def smooth_l2_loss(scores_p, lambda1: float = 8e-5):
    """Temporal smoothness on positive-bag scores [P, V, T, C]
    (reference: losses.py:79-91). Defined for parity; drivers keep it
    disabled exactly as the reference does (train_deepmil_synthetic.py)."""
    shifted = jnp.concatenate(
        [scores_p[:, :, 1:, :], scores_p[:, :, -1:, :]], axis=2)
    return jnp.sum((scores_p - shifted) ** 2) * lambda1


def sparsity_loss(scores_p, lambda2: float = 8e-5):
    """Sparsity on positive-bag scores (reference: losses.py:94-102)."""
    return jnp.sum(scores_p) * lambda2
