#!/usr/bin/env bash
# Commit gate: a snapshot that does not compile zeroes the whole round
# (round 7 proved it). Install as the repo's pre-commit hook with
#   ln -sf ../../scripts/precommit.sh .git/hooks/pre-commit
# Runs main + test compilation; set GRAFT_PRECOMMIT=off to bypass in an
# emergency (and own the consequences).
set -euo pipefail
if [[ "${GRAFT_PRECOMMIT:-on}" == "off" ]]; then
  echo "precommit: bypassed via GRAFT_PRECOMMIT=off" >&2
  exit 0
fi
cd "$(git rev-parse --show-toplevel)"
echo "precommit: sbt compile Test/compile ..." >&2
sbt -batch compile Test/compile >/tmp/graft_precommit.log 2>&1 || {
  echo "precommit: COMPILATION FAILED — commit blocked." >&2
  tail -30 /tmp/graft_precommit.log >&2
  exit 1
}
echo "precommit: green." >&2
