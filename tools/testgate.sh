#!/usr/bin/env bash
# Test gate: run the full ScalaTest suite and append one JSON line per
# run to TESTGATE.jsonl (tracked). Round 4 shipped a red suite without
# noticing because the oracle gate alone stayed green; this records the
# suite status alongside each round so a red suite is visible in the
# repo history, not just in a transient sbt invocation.
#
# Usage: tools/testgate.sh <round-label>
set -u
cd "$(dirname "$0")/.."
label="${1:-adhoc}"
out=$(sbt -batch test 2>&1 | tail -40)
line=$(echo "$out" | grep -E "^\[(info|error)\] (Tests:|Failed:|Passed:)" | tr '\n' ' ')
status=fail
echo "$out" | grep -q "All tests passed" && status=pass
commit=$(git rev-parse --short HEAD)
printf '{"round":"%s","commit":"%s","status":"%s","detail":"%s"}\n' \
  "$label" "$commit" "$status" "$(echo "$line" | sed 's/"/\\"/g; s/\[info\] //g; s/\[error\] //g')" \
  >> TESTGATE.jsonl
echo "testgate: $status ($commit)"
[ "$status" = pass ]
