"""Compute ops: intersection kernels (jnp oracle + Pallas TPU kernels)."""
