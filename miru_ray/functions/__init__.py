"""Pure deterministic kernels shared by pipeline and oracle."""
