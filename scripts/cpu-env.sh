#!/bin/bash
# Run a command on the virtual 8-device CPU backend, skipping the axon TPU
# plugin registration (which costs ~90s/process connecting to the tunnel).
# Usage: scripts/cpu-env.sh python -m pytest tests/ -x -q
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" "$@"
