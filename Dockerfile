# WIS-TPU server image for TPU VM hosts (v5e and later).
# The reference builds on nvcr.io/nvidia/tensorrt + torch (reference
# Dockerfile:1-33); the TPU image needs only jax[tpu] + the native
# wisaudio library built in-tree.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make openssl \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY . .
RUN make -C native

EXPOSE 19000
ENTRYPOINT ["python", "wisctl.py", "run", "--port", "19000"]
