# Container image for continuous_clustering_tpu.
#
# The reference ships ROS-noetic catkin Dockerfiles; the equivalent here is
# a pip-based image with the native host components prebuilt.  For TPU VMs,
# base on a libtpu-enabled image and swap the jax install accordingly
# (e.g. pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html).

FROM python:3.12-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ cmake ninja-build \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/cct
COPY continuous_clustering_tpu ./continuous_clustering_tpu
COPY bench.py ./

RUN pip install --no-cache-dir "jax[cpu]" numpy \
    && python -m continuous_clustering_tpu.native.build

ENV PYTHONPATH=/opt/cct
# smoke entrypoint: the KITTI demo CLI (mount a dataset at /data)
ENTRYPOINT ["python", "-m", "continuous_clustering_tpu.tools.kitti_demo"]
CMD ["--help"]
