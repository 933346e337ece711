"""Device-mesh parallelism: the TPU replacement for torch DataParallel.

The reference replicates the model and scatters the batch with
torch.nn.DataParallel (reference: train_synthetic.py:134-135, README.md:78).
Here: a jax.sharding.Mesh with GSPMD -- params replicated, batch sharded on
the 'data' axis, XLA inserts the psum gradient reduction over ICI."""

from idee_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch_spec,
)
