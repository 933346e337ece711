# ------------------------------------------------------------------
"""MIL MLP classifiers: DeepMIL, ARNet, RTFM.

Parity targets: Baselines_MIL/models/classifier/{DeepMIL,ARNet,RTFM}.py.
All are Linear stacks over the channel dim of [..., C] pixel-instance
features with ReLU between layers and Sigmoid on the head. Differences:
* DeepMIL: Dropout after every non-final layer; returns scores only;
* ARNet: Dropout after non-final layers, returns (first-layer features,
  scores) (ARNet.py:131-141);
* RTFM: like DeepMIL but returns (input features, scores) (RTFM.py:48-55).

Init note: the classifiers' own xavier init is overridden by the MIL_model
init sweep -- every Linear ends up N(0, 0.02) (build_deepmil.py:90-111);
the builder passes that init in.
"""
# ------------------------------------------------------------------

from typing import Callable, List, Optional

import flax.linen as nn
import jax.numpy as jnp


def normal_init(std: float = 0.02) -> Callable:
    """N(0, std) (the MIL init sweep, build_deepmil.py:101-109)."""
    return nn.initializers.normal(stddev=std)


class _MLPStack(nn.Module):
    dim: List[int]
    drop_rate: float = 0.6
    dropout_between: bool = True
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_first: bool = False):
        first = None
        n = len(self.dim)
        for i, d in enumerate(self.dim):
            x = nn.Dense(d, kernel_init=self.kernel_init,
                         bias_init=nn.initializers.zeros_init(),
                         dtype=self.dtype)(x)
            x = nn.sigmoid(x) if i == n - 1 else nn.relu(x)
            if i == 0:
                first = x
            if i != n - 1 and self.dropout_between:
                x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        if return_first:
            return first, x
        return x


class DeepMIL(nn.Module):
    """reference: classifier/DeepMIL.py:18-51. [..., C] -> scores [..., 1]."""

    embed_dim: int = 16
    dim: Optional[List[int]] = None
    drop_rate: float = 0.6
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _MLPStack(dim=list(self.dim or [512, 32, 1]),
                         drop_rate=self.drop_rate,
                         kernel_init=self.kernel_init, dtype=self.dtype,
                         name="mlp")(x, train)


class ARNet(nn.Module):
    """reference: classifier/ARNet.py:102-141 -> (features, scores)."""

    embed_dim: int = 16
    dim: Optional[List[int]] = None
    drop_rate: float = 0.6
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _MLPStack(dim=list(self.dim or [512, 32, 1]),
                         drop_rate=self.drop_rate,
                         kernel_init=self.kernel_init, dtype=self.dtype,
                         name="mlp")(x, train, return_first=True)


class RTFM(nn.Module):
    """reference: classifier/RTFM.py:18-55 -> (input features, scores)."""

    embed_dim: int = 16
    dim: Optional[List[int]] = None
    drop_rate: float = 0.7
    kernel_init: Callable = normal_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        scores = _MLPStack(dim=list(self.dim or [512, 32, 1]),
                           drop_rate=self.drop_rate,
                           kernel_init=self.kernel_init, dtype=self.dtype,
                           name="mlp")(x, train)
        return x, scores
