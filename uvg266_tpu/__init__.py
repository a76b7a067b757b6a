"""uvg266-tpu: a TPU-native VVC (H.266) encoder.

A from-scratch reimplementation of the capabilities of uvg266
(https://github.com/ultravideo/uvg266) designed for TPU hardware:

- Search / reconstruction runs as batched JAX/XLA/Pallas compute: intra modes,
  CU lattice candidates, cost grids and transforms are batch dimensions that
  map onto the MXU, replacing uvg266's pthread job DAG (threadqueue.c).
- Entropy coding (CABAC) is an inherently sequential bitstream-exact pass that
  runs per-substream on the host, parallel across WPP rows / tiles / frames.
- Scale-out uses jax.sharding meshes: CTU wavefront vectorization per chip,
  tile sharding with halo exchange across chips, GOP sharding across hosts.
"""

__version__ = "0.1.0"
