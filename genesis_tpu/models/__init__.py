"""Model configs. Each file declares its flags at module level and exposes
`load(cfg) -> flax.linen.Module` (the forge config-file contract, reference
models/*_config.py).

Uniform model contract (reference SURVEY.md section 1, L4):
  __call__(x, train=True) -> (recon, losses, stats, att_stats, comp_stats)
  sample(batch_size, K_steps=None) -> (generated_image, stats)

Slot-stacked outputs are slot-major [K, B, ...]; losses hold per-slot arrays
`kl_*_k` of shape [K, B] or scalars-per-batch `kl_*` of shape [B].
"""
