"""Numerical kernels: likelihood tables, truncated-normal MH machinery."""
