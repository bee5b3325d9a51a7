"""Utilities: misc helpers, logging, plotting, colour palettes."""
