"""Query surface: reference-parity pipelines exposed to __ray_entry__."""
