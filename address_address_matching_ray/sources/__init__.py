"""Sources: parquet readers + deterministic synthetic pages generator."""
