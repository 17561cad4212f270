"""flow_supervisor_tpu — a TPU-native optical-flow framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
``iwbn/flow-supervisor`` (ECCV 2022 "Semi-Supervised Learning of Optical Flow by
Flow Supervisor"): RAFT feature/context encoders, all-pairs correlation volume with
multi-scale pyramid lookup, ConvGRU iterative refinement with convex upsampling,
supervised / unsupervised (census + smoothness + occlusion) / semi-supervised
teacher-student ("flow supervisor") training, dataset pipelines and augmentors,
evaluation (EPE / n-px / Fl-all, warm start) and flow-extraction tooling.

Design is TPU-first: NHWC layouts, static shapes, ``lax.scan`` refinement loop,
bf16 compute with fp32 islands, data parallelism via ``jax.sharding`` meshes, and
Pallas kernels for the correlation hot path.
"""

__version__ = "0.1.0"
