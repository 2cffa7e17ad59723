"""relpose_gnn_tpu — a TPU-native camera-relocalization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nianticlabs/relpose-gnn ("Visual Camera Re-Localization using Graph Neural
Networks and Relative Pose Supervision", 3DV 2021).

Design (TPU-first, not a port):
  * Graphs are fixed-size (N nodes, dense [N, N] adjacency); message passing
    is dense batched einsum/matmul on the MXU instead of scatter/gather.
  * Dynamic kNN graph construction is an on-device top-k over the pairwise
    distance matrix (no host sync).
  * Retrieval is a batched descriptor matmul + top-k instead of a BallTree.
  * Training/eval steps are jitted and sharded over a `jax.sharding.Mesh`
    (data parallel over batch, optional tensor parallel over MLP hidden dims).

Subpackages:
  ops         pose/quaternion math, dense graph ops, Pallas kernels, PGO
  models      Flax modules: ResNet34, VGG16, NetVLAD, attention, GNN, heads
  data        7-Scenes / Cambridge parsers, packed graph datasets, pipeline
  retrieval   NetVLAD index, classical VLAD, neighbor subsampling
  training    criterion, trainer, checkpointing
  evaluation  batched relocalization evaluator
  parallel    mesh / sharding helpers
  utils       logging, profiling
"""

__version__ = "0.1.0"
