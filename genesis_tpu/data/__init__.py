"""Data pipelines.

Batch contract (NHWC, TPU-native): dicts with
  'input':     float32 [B, H, W, C] in [0, 1]
  'instances': int32   [B, H, W, 1] (optional; labels >= 0, ignore < 0)

Each dataset config file declares flags and exposes
`load(cfg) -> (train_loader, val_loader, test_loader)` — the same contract
as the reference datasets/*_config.py, with NCHW->NHWC transposed.
"""
