"""TaxoExpan-TPU: a TPU-native self-supervised taxonomy-expansion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of TaxoExpan
(WWW 2020, reference implementation: mickeysjm/TaxoExpan, DGL+PyTorch).

Key design differences from the reference (see SURVEY.md §7):

- Graphs are never mutated objects. Every ego-network is a *star* graph
  (grandparents -> anchor -> siblings, plus self-loops); we lay each one out in
  a fixed-shape padded slot array so all message passing becomes dense masked
  tensor ops that XLA tiles straight onto the MXU/VPU.
- Generic sparse kernels (SpMM / SDDMM / edge_softmax / segment readouts) are
  provided as well, both as jnp segment-op references and Pallas TPU kernels.
- Training/eval steps are pure jitted functions over pytrees; parallelism is
  expressed with `jax.sharding.Mesh` + NamedSharding (data parallel over the
  group axis, head-parallel tensor parallel for GAT), not DataParallel.
"""

__version__ = "0.1.0"
