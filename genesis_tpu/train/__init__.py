"""Training subsystem: donated-state jitted train step, GECO-in-jit,
mesh data parallelism, Orbax checkpoint/resume, divergence guard."""
