"""Device mesh, sharding specs, and pjit-compiled multi-chip steps."""
