# TPU-native comfy3d_tpu runtime image.
#
# Role parity with the reference's CUDA Dockerfile (reference Dockerfile:1-60)
# but built for Cloud TPU VMs: no GL/EGL stack, no CUDA wheels — JAX's TPU
# runtime (libtpu) is the only accelerator dependency.
#
# Build:  docker build -t comfy3d-tpu .
# Run  :  docker run --privileged --net=host comfy3d-tpu
#         (--privileged exposes the TPU device nodes on a TPU VM host)

FROM --platform=amd64 ubuntu:22.04

RUN apt-get update && \
    apt-get install --no-install-recommends -y \
        build-essential \
        cmake \
        ninja-build \
        git \
        curl \
        python3.11 \
        python3.11-dev \
        python3.11-venv \
        && \
    curl -sS https://bootstrap.pypa.io/get-pip.py | python3.11 && \
    rm -rf /var/lib/apt/lists/*

RUN ln -sf /usr/bin/python3.11 /usr/bin/python && \
    ln -sf /usr/bin/python3.11 /usr/bin/python3

WORKDIR /opt/comfy3d_tpu
COPY pyproject.toml ./
COPY comfy3d_tpu ./comfy3d_tpu
COPY tests ./tests
COPY bench.py README.md ./

# jax[tpu] pulls libtpu from the Google releases index on TPU VMs.
RUN python -m pip install --upgrade pip && \
    python -m pip install "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    python -m pip install -e ".[test]"

# Build the native mesh-ops library (QEM decimate, clean, BFS inpaint).
RUN bash comfy3d_tpu/native/build.sh

# CPU smoke check at build time: 8 virtual devices, no TPU needed.
RUN JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -c "import comfy3d_tpu, jax; print(jax.devices())"

EXPOSE 8188
CMD ["python", "-m", "comfy3d_tpu.server"]
