#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh, bypassing the axon TPU
# sitecustomize hook (which dials the TPU tunnel at interpreter start).
if [ $# -eq 0 ]; then set -- tests/ -x -q; fi
exec env -u PYTHONPATH JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "$@"
