"""quickrank_tpu — a TPU-native learning-to-rank framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hpclab/quickrank (gradient-boosted tree rankers, linear rankers, IR metrics,
ensemble post-optimization, model codegen), built for SPMD execution over
TPU device meshes.
"""

__version__ = "0.1.0"
