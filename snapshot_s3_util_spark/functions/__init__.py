"""functions package (populated in later phases)."""
