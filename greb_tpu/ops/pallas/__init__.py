"""Fused Pallas TPU kernels."""
