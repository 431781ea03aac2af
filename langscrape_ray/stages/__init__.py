"""Ray Data stages: vectorized map_batches UDFs and stateful actor stages."""
