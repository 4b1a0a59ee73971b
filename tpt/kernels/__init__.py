"""Pallas TPU kernels: the production light-transport path."""

from .trace import pallas_trace

__all__ = ["pallas_trace"]
