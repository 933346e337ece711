# ------------------------------------------------------------------
"""Visualization helpers: prediction / anomaly image panels.

Parity target: reference utils/utils_train.py:591-657 -- cividis
probability maps, categorical {normal, drought, sea, no-veg, cold} maps,
and V x (T*W) tiled binary driver maps, consumed by the TensorBoard writer
(train_synthetic.py:310-315). Output: float RGB arrays in [0, 1],
channels-last.
"""
# ------------------------------------------------------------------

import numpy as np

# categorical palette (reference: utils_train.py:605-611)
_CAT_COLORS = np.array([
    [0.961, 0.871, 0.702],  # wheat      (0: normal)
    [0.545, 0.000, 0.000],  # darkred    (1: drought / anomaly)
    [0.000, 0.545, 0.545],  # darkcyan   (2: sea)
    [0.827, 0.827, 0.827],  # lightgrey  (3: no vegetation)
    [1.000, 1.000, 1.000],  # white      (4: cold surface)
], np.float32)


def _cividis(x):
    import matplotlib.pyplot as plt

    return plt.cm.cividis(np.clip(x, 0.0, 1.0))[..., :3]


def _categorical(labels):
    return _CAT_COLORS[np.clip(labels.astype(np.int64), 0,
                               len(_CAT_COLORS) - 1)]


def generate_images(pred, pred_c, target, mask_cold, mask_sea,
                    mask_no_vegetation, mask_prudence=None):
    """Real-world panels (reference: utils_train.py:591-616).

    pred: probabilities [N, H, W]; pred_c/target: {0,1} class maps;
    masks: {0,1} [N, H, W]. Returns (im_pred, im_pred_c, im_target)."""
    im_pred = _cividis(np.asarray(pred))

    pred_c = np.asarray(pred_c).copy()
    target = np.asarray(target).copy()
    for m in (pred_c, target):
        if mask_prudence is not None:
            m[np.asarray(mask_prudence) == 0] = 0
        m[np.asarray(mask_sea) == 1] = 2
        m[np.asarray(mask_no_vegetation) == 1] = 3
        m[np.asarray(mask_cold) == 1] = 4
    return im_pred, _categorical(pred_c), _categorical(target)


def generate_anomaly(anomaly):
    """V x (T*W) tiled binary driver maps (reference: utils_train.py:619-642).
    anomaly: [N, V, T, H, W] {0,1}. Returns [N, V, H, W*T, 3]."""
    anomaly = np.asarray(anomaly)
    N, V, T, H, W = anomaly.shape
    tiled = anomaly.transpose(0, 1, 3, 2, 4).reshape(N, V, H, T * W)
    return _categorical(tiled)


def generate_images_synthetic(pred, pred_c, target):
    """Synthetic panels (reference: utils_train.py:645-657)."""
    return (_cividis(np.asarray(pred)), _categorical(np.asarray(pred_c)),
            _categorical(np.asarray(target)))
