"""Data pipelines: synthetic datacube, CERRA / ERA5-Land reanalysis, and the
host-side sharded loader with device prefetch.

The reference reads NetCDF via xarray in DataLoader worker processes
(reference: dataset/*.py). Here I/O is plain numpy/h5py on the host with an
asynchronous double-buffered device prefetcher -- the TPU analogue of
pin_memory + workers."""

from idee_tpu.data.synthetic import SyntheticCube, SyntheticDataset  # noqa: F401
from idee_tpu.data.loader import DataLoader  # noqa: F401
