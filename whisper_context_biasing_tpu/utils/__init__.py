"""Utilities: process-level JAX setup (persistent compilation cache)."""

from .jax_setup import setup_jax

__all__ = ["setup_jax"]
