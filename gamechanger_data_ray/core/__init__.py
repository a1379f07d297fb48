"""Pure-Arrow core kernels (no Ray dependency)."""
