"""Shared scalar/vector kernels used across stages."""
