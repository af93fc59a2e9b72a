#!/usr/bin/env bash
# Correctness gate at the north-rule launch surface: the full pytest suite
# executed via spark-submit --py-files at two cluster sizes (BASELINE.json:
# "gated by `python -m pytest -x -q` ... launched via spark-submit
# --py-files at two cluster sizes (N and 4N executors)").
#
# The suite's session fixture honors SPARK_GRAFT_TEST_MASTER, so the same
# tests run against local[8] and local[32] task slots.
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=/tmp/secretscraper_spark_tests.zip
rm -f "$ZIP"
zip -qr "$ZIP" secretscraper_spark tests

cat > /tmp/_run_pytest.py <<'EOF'
import sys
import pytest
sys.exit(pytest.main(["tests", "-x", "-q"]))
EOF

for MASTER in 'local[8]' 'local[32]'; do
  echo "=== pytest under spark-submit --master $MASTER ==="
  SPARK_GRAFT_TEST_MASTER="$MASTER" SPARK_GRAFT_TEST_SHUFFLE=8 \
  spark-submit --master "$MASTER" --driver-memory 8g \
    --py-files "$ZIP" /tmp/_run_pytest.py
done
echo "both cluster sizes: PASS"
