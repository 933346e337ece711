"""Neural network modules (flax.linen, channels-last, TPU-first layouts)."""

from idee_tpu.nn.layers import (  # noqa: F401
    Conv3d,
    DropPath,
    LayerNorm3d,
    Mlp,
    reference_init,
    trunc_normal_init,
)
