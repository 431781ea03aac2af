"""Sources: parquet readers + deterministic synthetic-web fixture generators."""
