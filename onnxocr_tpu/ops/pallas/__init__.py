"""Pallas TPU kernels for the pipeline hot ops."""
