"""Pallas TPU kernels for the hot augmentation path."""
