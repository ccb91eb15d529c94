"""On-disk index state: layout, manifests, stats, resume."""
