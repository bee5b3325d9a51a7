"""Neural-net building blocks, slot-attention processes, losses and kernels.

Layout convention: images are NHWC `[B, H, W, C]` (TPU-native), slot-stacked
tensors are slot-major `[K, B, ...]` so that per-slot recursions map onto
`lax.scan`/axis-0 slicing and reductions.
"""
