"""plans package (populated in later phases)."""
