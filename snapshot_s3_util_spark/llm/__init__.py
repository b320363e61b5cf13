"""llm package (populated in later phases)."""
