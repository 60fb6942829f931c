"""Pallas TPU kernels for the engine's hot streaming ops."""
