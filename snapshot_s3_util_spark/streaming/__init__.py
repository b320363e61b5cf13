"""streaming package (populated in later phases)."""
