"""Host-side helpers: tree-format conversion utilities."""
