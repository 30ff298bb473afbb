#!/bin/sh
# Dispatch entrypoint (reference: docker/entrypoint.sh — GPU check + Redis wait
# become a TPU device check; modes: api | grpc | train | healthcheck).
set -e

echo "checking accelerator..."
python -c "import jax; print('devices:', jax.devices())" || true

case "$1" in
  api)
    exec python scripts/deploy.py serve --backend rest --port "${PORT:-8000}"
    ;;
  grpc)
    exec python scripts/deploy.py serve --backend grpc --port "${GRPC_PORT:-50051}"
    ;;
  train)
    shift
    exec python scripts/train.py "$@"
    ;;
  healthcheck)
    exec python /healthcheck.py
    ;;
  *)
    exec "$@"
    ;;
esac
