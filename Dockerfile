# Container image for the sd CLI (counterpart of the reference Dockerfile,
# which builds the C++ `sd` binary in a 2-stage Ubuntu image and mounts a
# model volume at runtime). On TPU hosts pass the TPU device through and
# install the matching jax[tpu] wheel for your runtime.
#
#   docker build -t onnxstream-tpu .
#   docker run -v /path/to/models:/models onnxstream-tpu \
#       --models-path /models --prompt "a photo of a cat" -o /models/out.png

FROM python:3.12-slim AS build
RUN apt-get update && apt-get install -y --no-install-recommends g++ make curl \
    && rm -rf /var/lib/apt/lists/*
WORKDIR /src
COPY pyproject.toml ./
COPY onnxstream_tpu ./onnxstream_tpu
COPY csrc ./csrc
RUN pip install --no-cache-dir "jax[cpu]" flax optax einops numpy pillow
RUN make -C csrc || true   # native prefetcher (optional; Python fallback exists)

FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends curl \
    && rm -rf /var/lib/apt/lists/*
COPY --from=build /usr/local/lib/python3.12/site-packages /usr/local/lib/python3.12/site-packages
COPY --from=build /src/onnxstream_tpu /app/onnxstream_tpu
COPY --from=build /src/csrc/*.so /app/csrc/
ENV PYTHONPATH=/app
WORKDIR /app
ENTRYPOINT ["python", "-m", "onnxstream_tpu.cli.sd_main"]
