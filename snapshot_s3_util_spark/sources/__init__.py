"""sources package (populated in later phases)."""
