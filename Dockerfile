# s2s-tpu serving image (TPU hosts provide libtpu; CPU fallback works too)
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY s2s_tpu ./s2s_tpu
COPY scripts ./scripts
COPY demo ./demo
RUN pip install --no-cache-dir -e . "jax[tpu]" scipy || pip install --no-cache-dir -e . jax scipy

EXPOSE 8123
ENTRYPOINT ["s2s-tpu"]
CMD ["serve", "--host", "0.0.0.0"]
