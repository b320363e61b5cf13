"""hbase package (populated in later phases)."""
