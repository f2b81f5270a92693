"""VAD layer: streaming iterator, turn-taking handler, Smart Turn classifier."""
