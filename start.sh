#!/usr/bin/env bash
# Local/TPU-VM launcher (counterpart of the reference's start.sh).
set -euo pipefail
cd "$(dirname "$0")"

export DATA_DIR="${DATA_DIR:-./data}"
export HOST="${HOST:-0.0.0.0}"
export PORT="${PORT:-8712}"

if [ -z "${JWT_SECRET:-}" ]; then
  echo "WARNING: JWT_SECRET not set; using an ephemeral secret" >&2
  export JWT_SECRET="$(python -c 'import os,base64;print(base64.urlsafe_b64encode(os.urandom(32)).decode())')"
fi

# build the optional native analyzer if a toolchain exists
if command -v g++ >/dev/null 2>&1 && [ -f native/Makefile ]; then
  (cd native && make -s) || echo "native analyzer build failed; using Python fallback" >&2
fi

exec python -m super_rag_tpu.app
