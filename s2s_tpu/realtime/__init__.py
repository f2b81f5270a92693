"""OpenAI-Realtime protocol layer: types, runtime config, service, server."""
