"""Pallas TPU kernels for the hot ops."""

from .flash_attention import flash_attention
from .fused_block import fused_ln_matmul

__all__ = ["flash_attention", "fused_ln_matmul"]
