"""Checkpoint / manifest persistence (driver-side, tiny JSON files)."""
