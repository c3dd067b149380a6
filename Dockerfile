# Deployment image for the msst_tpu framework (the Docker_Tookit role:
# the reference cross-builds its ROS nodes for edge devices; here one image
# serves CPU hosts and TPU VMs — the JAX backend is selected at runtime).
#
#   docker build -t msst-tpu .
#   docker run msst-tpu msst lio-sim --scans 20
#
# For TPU VMs, base on a TPU-enabled JAX image and the same steps apply.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/msst
COPY pyproject.toml ./
COPY msst_tpu ./msst_tpu
COPY bench.py ./

RUN pip install --no-cache-dir "jax[cpu]" numpy scipy && \
    pip install --no-cache-dir -e . && \
    make -C msst_tpu/native

ENTRYPOINT []
CMD ["msst", "lio-sim", "--scans", "20"]
