"""Ray Data stage bodies (map_batches functions / actor-pool classes)."""
