# ------------------------------------------------------------------
"""Loss functions (pure jnp).

Parity target: reference models/losses.py. All reductions and the
inverse-frequency weighting formula match the reference exactly:
  w = log((hist / sum(hist)) ** -0.5 + 1.1) indexed by the target class
(reference: models/losses.py:82-87,115-120).

The anomaly L1 loss constrains the quantized features z_q to the 'normal'
code vq_0 *outside* extreme regions; inside extremes the reference replaces
the target by detached predictions AND zeroes the weight, so the loss value
reduces to a weighted L1 with weight = 1 - mask
(reference: models/losses.py:158-166).
"""
# ------------------------------------------------------------------

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets):
    """Elementwise binary cross entropy on logits (torch BCEWithLogitsLoss)."""
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _inv_freq_weights(hist):
    """log((hist/total)^-0.5 + 1.1) (reference: models/losses.py:85-86).
    Zero-count classes get weight 0 -- the reference leaves them +inf, but
    those entries are never gathered (no pixel has that label), so zeroing
    is value-equivalent and NaN-safe under jit."""
    total = jnp.sum(hist)
    frac = hist / jnp.maximum(total, 1.0)
    w = jnp.log(jnp.where(frac > 0, frac, 1.0) ** -0.5 + 1.1)
    return jnp.where(frac > 0, w, 0.0)


def _capped_inv_freq_weights(hist, cap):
    """True inverse-frequency class weights min(1/frac, cap), zero-count
    classes weight 0. Opt-in deviation (cfg.bce_weighting="capped") for
    extreme class imbalance: at the reference's native 200x200 event
    density (0.88%% positives) the reference formula
    (models/losses.py:115-118) yields only w_pos/w_neg ~ 3.3 and training
    pins at zero predicted extremes (BASELINE.md "Positive-rate finding");
    1/frac capped at `cap` keeps the positive gradient mass O(negative's).
    """
    total = jnp.sum(hist)
    frac = hist / jnp.maximum(total, 1.0)
    w = jnp.minimum(1.0 / jnp.where(frac > 0, frac, 1.0), cap)
    return jnp.where(frac > 0, w, 0.0)


def bce_loss_synthetic(pred, target, weighting: str = "reference",
                       weight_cap: float = 100.0,
                       focal_gamma: float = 2.0):
    """Frequency-weighted BCE, mean-reduced (reference: models/losses.py:98-124).

    pred: logits [N, C, H, W]; target: {0,1} [N, C, H, W].

    weighting (opt-in deviations for the native event density, documented
    in BASELINE.md):
      "reference" -- log((hist/total)^-0.5 + 1.1), the reference formula;
      "capped"    -- min(1/frac, weight_cap) true inverse frequency;
      "focal"     -- focal BCE (Lin et al. 2017): alpha-balanced by
                     capped inverse frequency, modulated by (1-p_t)^gamma.
    """
    target = target.astype(jnp.float32)
    hist = jnp.array([jnp.sum(target == 0), jnp.sum(target == 1)],
                     dtype=jnp.float32)
    if weighting == "capped":
        w = jax.lax.stop_gradient(_capped_inv_freq_weights(hist, weight_cap))
    elif weighting == "focal":
        w = jax.lax.stop_gradient(_capped_inv_freq_weights(hist, weight_cap))
    else:
        w = jax.lax.stop_gradient(_inv_freq_weights(hist))
    weights = w[target.astype(jnp.int32)]
    if weighting == "focal":
        # the modulating factor carries gradient, as in the paper's eq. 5
        # and torchvision's sigmoid_focal_loss
        p = jax.nn.sigmoid(pred)
        p_t = p * target + (1.0 - p) * (1.0 - target)
        weights = weights * (1.0 - p_t) ** focal_gamma
    return jnp.mean(bce_with_logits(pred, target) * weights)


def bce_loss(pred, target, mask_valid):
    """Masked frequency-weighted BCE for real-world data
    (reference: models/losses.py:64-95).

    pred/target/mask_valid: [N, H, W] (or broadcastable); weights are zero on
    invalid pixels and the sum is normalized by sum(mask_valid).
    """
    target = target.astype(jnp.float32)
    mask = mask_valid.astype(jnp.float32)
    hist = jnp.array([jnp.sum((target == 0) * mask),
                      jnp.sum((target == 1) * mask)], dtype=jnp.float32)
    w = jax.lax.stop_gradient(_inv_freq_weights(hist))
    weights = w[target.astype(jnp.int32)] * mask
    return jnp.sum(bce_with_logits(pred, target) * weights) / jnp.sum(mask)


def anomaly_l1_loss_synthetic(z_q, mask_extreme_loss, vq0):
    """Driver-supervision L1 (reference: models/losses.py:127-168).

    z_q: [N, V, C, T, H, W] quantized features (fp32)
    mask_extreme_loss: [N, H, W] union of extremes over all delta_t steps
    vq0: [C] the 'normal' code vector (stop-gradient)
    loss = sum(|z_q - vq0| * (1-mask)) / sum(1-mask) broadcast over V,C,T.
    """
    z_q = z_q.astype(jnp.float32)
    N, V, C, T, H, W = z_q.shape
    mask = mask_extreme_loss.astype(jnp.float32)[:, None, None, None, :, :]
    weights = 1.0 - jnp.clip(mask, 0.0, 1.0)
    target = jax.lax.stop_gradient(vq0)[None, None, :, None, None, None]
    l1 = jnp.abs(z_q - target) * weights
    return jnp.sum(l1) / jnp.sum(jnp.broadcast_to(weights, z_q.shape))


def anomaly_l1_loss(z_q, mask_extreme_loss, mask_exclude, vq0):
    """Real-world variant: excluded pixels (cold surface / invalid) are also
    unconstrained (reference: models/losses.py:15-61).

    mask_exclude: [N, H, W] pixels to leave unconstrained in addition to
    extremes (the reference parameter is confusingly named mask_valid but is
    *added* to the extreme mask, models/losses.py:50).
    """
    z_q = z_q.astype(jnp.float32)
    mask = (mask_extreme_loss.astype(jnp.float32)
            + mask_exclude.astype(jnp.float32))
    mask = jnp.clip(mask, 0.0, 1.0)[:, None, None, None, :, :]
    weights = 1.0 - mask
    target = jax.lax.stop_gradient(vq0)[None, None, :, None, None, None]
    l1 = jnp.abs(z_q - target) * weights
    return jnp.sum(l1) / jnp.sum(jnp.broadcast_to(weights, z_q.shape))


@jax.custom_vjp
def anomaly_l1_lfq(s_q, w_pix, w_out, b_out):
    """Fused anomaly L1 for the 1-bit LFQ bottleneck -- exact value and
    gradients of anomaly_l1_loss_synthetic / anomaly_l1_loss without ever
    materializing the [N, V, C, T, H, W] float32 z_q tensor (~1.2 GB/sample
    at the 200x200 geometry; the round-1 memory ceiling).

    Identity: with vq_0 = project_out(-1) = -w_out + b_out (detached,
    reference train_synthetic.py:185-194) and z_q = s_q*w_out + b_out,
      |z_q_c - vq0_c| = |(s_q + 1) * w_c|,  s_q in {-1, +1}
    so the weighted sum collapses to elementwise ops on the scalar latent:
      loss = sum_m w_m * |s_q_m + 1| * sum_c|w_c| / (C * sum_m w_m).
    Gradients (d/ds_q, d/dw, d/db) are the exact derivatives of the
    uncollapsed form with vq_0 held constant -- verified against the torch
    reference by tests/test_losses.py.

    s_q:   [N, T, H, W, V] float32, +/-1 valued (STE carries the gradient)
    w_pix: [N, H, W] float32 weights (1 - extreme/exclusion mask)
    w_out/b_out: [C] project_out parameters (b_out gets gradient: the
                 reference's z_q side is live even though vq_0 is detached)
    """
    loss, _ = _anomaly_l1_lfq_fwd(s_q, w_pix, w_out, b_out)
    return loss


def _anomaly_l1_lfq_fwd(s_q, w_pix, w_out, b_out):
    N, T, H, W, V = s_q.shape
    C = w_out.shape[0]
    abs_w = jnp.sum(jnp.abs(w_out))
    pos = (s_q > 0).astype(jnp.float32)
    # sum over tokens of w_m * [s_q_m = +1]
    sp = jnp.einsum("nthwv,nhw->", pos, w_pix)
    den = C * T * V * jnp.sum(w_pix)
    loss = 2.0 * sp * abs_w / den
    return loss, (pos, w_pix, w_out, sp, abs_w, den)


def _anomaly_l1_lfq_bwd(res, g):
    pos, w_pix, w_out, sp, abs_w, den = res
    # d/ds_q |s_q+1|*abs_w = sign(s_q+1)*abs_w = pos*abs_w  (sign(0) = 0)
    ds_q = (g * abs_w / den) * pos * w_pix[:, None, :, :, None]
    # d/dw_c and d/db_c of |s_q*w_c + b_c - vq0_c| with vq0 constant:
    # sign((s_q+1)*w_c) * s_q  and  sign((s_q+1)*w_c); both reduce to
    # sign(w_c) summed over tokens where s_q = +1
    dwb = (g * sp / den) * jnp.sign(w_out)
    return ds_q, jnp.zeros_like(w_pix), dwb, dwb


anomaly_l1_lfq.defvjp(_anomaly_l1_lfq_fwd, _anomaly_l1_lfq_bwd)


def total_loss_synthetic(out, mask_extreme, mask_extreme_loss, lambda_anomaly,
                         weighting: str = "reference",
                         weight_cap: float = 100.0,
                         focal_gamma: float = 2.0):
    """Training objective (reference: train_synthetic.py:182-201):
    BCE(joint) + lambda_anomaly * anomaly_L1 + sum_v BCE(head_v) + loss_z_q.

    out: VQOutput; mask_extreme [N,H,W]; mask_extreme_loss [N,H,W].
    weighting/weight_cap/focal_gamma: see bce_loss_synthetic (opt-in
    class-imbalance variants; "reference" = exact parity).
    Returns (loss, dict of components).
    """
    target = mask_extreme.astype(jnp.float32)[:, None]  # [N,1,H,W]
    loss_bce = bce_loss_synthetic(out.z, target, weighting, weight_cap,
                                  focal_gamma)
    if getattr(out, "loss_anomaly", None) is not None:
        # fused in-model path (anomaly_l1_lfq); z_q is then dead in the
        # train step and XLA never materializes it
        loss_anom = out.loss_anomaly
    else:
        loss_anom = anomaly_l1_loss_synthetic(out.z_q, mask_extreme_loss,
                                              out.vq0)
    # per-variable heads: out.y is [N, V, 1, H, W]
    V = out.y.shape[1]
    loss_var = jnp.sum(
        jax.vmap(lambda yv: bce_loss_synthetic(yv, target, weighting,
                                               weight_cap, focal_gamma),
                 in_axes=1)(out.y)
    )
    loss = loss_bce + lambda_anomaly * loss_anom + loss_var + out.loss_z_q
    return loss, {
        "loss": loss,
        "loss_bce": loss_bce,
        "loss_anomaly": loss_anom,
        "loss_var": loss_var,
        "loss_z_q": out.loss_z_q,
    }
