"""temporal_latticenet_tpu: TPU-native Temporal LatticeNet.

A from-scratch JAX/XLA re-implementation of the capabilities of
AIS-Bonn/temporal_latticenet (ICRA 2022) -- temporal semantic segmentation
of LiDAR sequences on the permutohedral lattice -- designed for TPU:
static-shape sorted vertex tables instead of CUDA hashmaps, gather+MXU
lattice convolutions, lax.scan temporal recurrence with BPTT, and
data-parallel scaling over a device mesh.  See README.md and PARITY.md.
"""

__version__ = "0.1.0"

from .config import ModelConfig, RuntimeConfig, cfgParser  # noqa: F401
