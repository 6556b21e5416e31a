#!/usr/bin/env bash
# Full validation battery — run before closing a round.
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0

echo "=== 1/4 oracle gate (sf0.01) ==="
python tools/check_oracle.py | tail -1 || fail=1

echo "=== 2/4 test suite ==="
python -m pytest tests/ -q 2>&1 | tail -1 || fail=1

echo "=== 3/4 differential fuzz (100 cases) ==="
python tools/fuzz_oracle.py 100 "${FUZZ_SEED:-7}" 2>/dev/null | tail -1 || fail=1

echo "=== 4/4 bench ==="
python bench.py 2>/dev/null | tail -1 || fail=1

exit $fail
