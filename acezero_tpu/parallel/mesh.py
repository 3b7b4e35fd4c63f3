"""Device mesh & sharding helpers.

The parallelism design (SURVEY.md §2.3 TPU-native equivalents): a 1-D
`data` mesh axis carries
  - the patch-buffer rows and the training batch during mapping (the 8M-row
    buffer is the HBM hog — sharding it across the slice is what scales
    scene size);
  - the frame axis during registration and buffer fill;
params are replicated (the scene head is ~4MB — no parameter sharding
needed). Collectives are inserted by XLA from the sharding annotations
(GSPMD): the loss-mean over the sharded batch becomes a psum, the gradient
all-reduce comes from replicated-param output sharding. Growing to a 2-D
mesh (e.g. `data` x `seed` to map the 5 seed trials concurrently) is a
config change on these helpers, not a rewrite.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_rows(tree, mesh: Mesh):
    """Shard the leading (row) axis of every array in the tree."""
    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
