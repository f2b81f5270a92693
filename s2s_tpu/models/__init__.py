"""Pure-functional JAX model zoo.

Every model is (init_params, apply/step functions) over explicit pytrees —
no framework modules, no hidden state.  Decode loops carry static-shape KV
caches updated with ``lax.dynamic_update_slice`` so every step is one jitted
dispatch with donated carries.  Weight converters (from HF checkpoints) live
next to each model; tests run on random init (the reference's test suite
never loads real models either — SURVEY §4).
"""
