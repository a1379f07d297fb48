"""Sources: epoch changelog dirs, I/U/D manifests, crawler-output JSONL."""
