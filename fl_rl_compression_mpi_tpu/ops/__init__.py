"""Codec kernels: NumPy goldens, JAX device paths, Pallas TPU kernels."""
