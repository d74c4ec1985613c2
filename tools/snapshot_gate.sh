#!/bin/bash
# Snapshot gate: run this before ending a round / committing a snapshot.
# Fails loudly if the fast tiers are red or the bench entry points rot.
#
#   bash tools/snapshot_gate.sh          # fast tiers + dry bench (~10 min)
#   FULL=1 bash tools/snapshot_gate.sh   # the whole suite
set -e -o pipefail
cd "$(dirname "$0")/.."

echo "== bench.py --dry (import + model-build check)"
JAX_PLATFORMS=cpu python bench.py --dry

echo "== __graft_entry__ import check"
JAX_PLATFORMS=cpu python -c "import __graft_entry__"

echo "== fast test tiers"
if [ -n "$FULL" ]; then
  python -m pytest tests/ -q
else
  # everything except the slow model-zoo forward sweeps
  python -m pytest tests/ -q --ignore=tests/test_models
  python -m pytest tests/test_models -q -x -k "config or metafile or zoo" \
    2>/dev/null || python -m pytest tests/test_models -q
fi
echo "== snapshot gate PASSED"
