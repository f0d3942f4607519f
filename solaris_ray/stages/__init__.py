"""Ray Data pipeline stages (map_batches bodies, groupby kernels)."""
