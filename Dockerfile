# Runtime image for allRank-tpu (reference analog: Dockerfile).
# For TPU VMs use a jax[tpu] wheel matching your runtime; this image covers
# CPU development/tests (the suite runs on 8 virtual devices).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /allrank_tpu
COPY . .

RUN pip install --no-cache-dir "jax[cpu]" optax numpy scipy scikit-learn \
        pandas pytest tensorboardX && \
    pip install --no-cache-dir -e . && \
    make native

ENV JAX_PLATFORMS=cpu
CMD ["python", "-m", "pytest", "tests/", "-q"]
