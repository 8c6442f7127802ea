#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh, bypassing the axon TPU
# sitecustomize hook (which dials the TPU tunnel at interpreter start).
#
#   ./run_tests.sh            full suite (~30 min)
#   ./run_tests.sh --fast     smoke tier: skips @pytest.mark.slow (<~5 min)
#   ./run_tests.sh <args...>  passed through to pytest verbatim
if [ "$1" = "--fast" ]; then
  shift
  if [ $# -eq 0 ]; then set -- tests/ -x -q; fi
  set -- -m "not slow" "$@"
elif [ $# -eq 0 ]; then
  set -- tests/ -x -q
fi
exec env -u PYTHONPATH JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest "$@"
