"""LLM layer: conversation store, backends (remote API + local JAX), output processing."""
