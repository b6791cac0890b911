#!/usr/bin/env bash
# The round gate: the FULL test suite (including the slow multi-process
# tests — the round-3 regression shipped because a concurrency change
# never re-ran test_multihost.py) plus the entry compile check and the
# 8-device virtual-mesh dryrun.  Everything runs on the CPU backend;
# nothing here touches the TPU relay.
#
#   bash scripts/check.sh
#
# Must be green before every milestone commit that touches the compute
# path, the drivers, or the pipeline.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest (full suite, incl. multiprocess) =="
python -m pytest tests/ -q

echo "== entry compile check + multichip dryrun =="
python __graft_entry__.py

echo "CHECK OK"
