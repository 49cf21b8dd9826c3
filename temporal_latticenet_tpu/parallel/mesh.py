"""Device-mesh data parallelism.

The reference is strictly single-GPU (no torch.distributed anywhere --
SURVEY.md 2.7); this module adds the TPU-native scaling layer: a 1-D ``dp``
mesh over which whole sequences are sharded.  Parameters and optimiser
state are replicated; the gradient mean inside ``train_step``'s vmapped
batch loss becomes an XLA all-reduce over ICI when the batch axis is
sharded.  Multi-slice scaling follows by adding an outer DCN axis to the
same mesh -- no code changes in the model.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("dp",))


def shard_batch(mesh: Mesh, batch):
    """Place a SeqBatch with leading batch axis across the dp mesh axis."""
    sharding = NamedSharding(mesh, P("dp"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
