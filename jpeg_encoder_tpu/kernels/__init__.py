"""Pallas TPU kernels for the hot per-block ops."""
