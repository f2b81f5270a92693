"""TPU compute ops: jnp reference paths + fused Pallas kernels for the hot spots."""
