"""udf package (populated in later phases)."""
