"""Audio frontend: PCM codecs, resampling, framing — bit-exact CPU paths plus
jitted on-device variants."""
