#!/bin/bash
# CI lanes. CPU-only (clears PYTHONPATH so the axon TPU plugin is skipped and
# the suite runs on the virtual 8-device CPU mesh — see tests/conftest.py).
#
#   scripts/ci.sh        fast lane: the default suite (~5 min)
#   scripts/ci.sh slow   + the --runslow heavy integration lane (~2 min more:
#                        full GAN step, checkpoint resume, parity-after-
#                        training, NaN watchdog, grad-accum equivalence)
set -euo pipefail
cd "$(dirname "$0")/.."

PYTHONPATH= python -m pytest tests/ -q
if [[ "${1:-}" == "slow" ]]; then
    PYTHONPATH= python -m pytest tests/ -q --runslow -m slow
fi
