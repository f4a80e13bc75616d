#!/bin/sh
# Compiled-on-chip tests (real TPU; everything else runs on the CPU backend
# via conftest.py). Usage: tests/run_tpu_tests.sh [extra pytest args]
cd "$(dirname "$0")/.." || exit 1
RUN_TPU_TESTS=1 python -m pytest tests/ -m tpu -q "$@"
