"""Evaluation: vectorised segmentation metrics (ARI, MSC) and FID."""
