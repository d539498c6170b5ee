# cyberether-tpu container (reference cognate: /root/reference/Dockerfile,
# README.md:55-59 installers).
#
# Default target runs on CPU (jax[cpu]); pass --build-arg JAX_EXTRA=tpu
# on a Cloud TPU VM to install the libtpu-enabled jax wheel instead.
#
#   docker build -t cyberether-tpu .
#   docker run --rm -p 8765:8765 cyberether-tpu                 # editor UI
#   docker run --rm cyberether-tpu run simple-fm --duration 5
#   docker run --rm cyberether-tpu run flight-tracker --duration 5
#   docker run --rm cyberether-tpu benchmark --format markdown

FROM python:3.12-slim AS build

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /src
COPY pyproject.toml README.md ./
COPY cyberether_tpu ./cyberether_tpu
COPY native ./native
COPY examples ./examples

# native runtime helpers (SPSC ring + readahead IQ reader)
RUN make -C native

ARG JAX_EXTRA=cpu
RUN pip install --no-cache-dir "jax[${JAX_EXTRA}]" && \
    pip install --no-cache-dir ".[remote]"

FROM python:3.12-slim

COPY --from=build /usr/local/lib/python3.12/site-packages \
     /usr/local/lib/python3.12/site-packages
COPY --from=build /src/native /opt/cyberether/native
COPY --from=build /src/examples /opt/cyberether/examples
ENV CYBERETHER_NATIVE_DIR=/opt/cyberether/native

EXPOSE 8765
ENTRYPOINT ["python", "-m", "cyberether_tpu"]
CMD ["run", "spectrum-analyzer", "--serve", "8765"]
