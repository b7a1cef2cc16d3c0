"""Pallas TPU kernels for hot ops where plain XLA leaves performance behind."""

from .clahe_interp import clahe_interp_pallas  # noqa: F401
