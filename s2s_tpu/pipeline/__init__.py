"""Pipeline control plane: typed messages, events, cancellation, speculative turns."""
