# densefusion-tpu container (packaging parity with the reference's Dockerfile)
#
# TPU hosts: use a base image with libtpu preinstalled and run with
# --privileged on the TPU VM; CPU-only works out of the box (tests run on a
# virtual 8-device mesh).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/densefusion-tpu
COPY pyproject.toml README.md ./
COPY densefusion_tpu ./densefusion_tpu
COPY runtime ./runtime
COPY tools ./tools
COPY experiments ./experiments
COPY tests ./tests
COPY bench.py ./

RUN pip install --no-cache-dir \
        "jax[tpu]" flax optax chex pillow scipy pyyaml pytest || \
    pip install --no-cache-dir jax flax optax chex pillow scipy pyyaml pytest
RUN pip install --no-build-isolation --no-deps -e .
RUN make -C runtime

CMD ["python", "-m", "pytest", "tests/", "-q"]
