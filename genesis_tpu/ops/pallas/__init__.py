"""Pallas TPU kernels for the hot fused ops (interpret-mode fallback on
CPU). Wired behind the same module APIs as the pure-XLA implementations."""
