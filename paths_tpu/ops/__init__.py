"""Pallas TPU kernels for the renderer's hot ops."""
