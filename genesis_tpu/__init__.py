"""genesis_tpu: a TPU-native JAX framework for object-centric generative
scene models (GENESIS, GENESIS-V2, MONet, baseline VAE).

Re-designed from scratch for TPU hardware: NHWC layouts feeding the MXU,
`lax.scan`/unrolled static-K slot recursions, mesh-based data parallelism via
`jax.sharding`, GECO constrained optimisation inside the jitted train step,
and Pallas kernels for the hot fused ops.

Capability parity target: applied-ai-lab/genesis (see SURVEY.md).
"""

__version__ = "0.1.0"
