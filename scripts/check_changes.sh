#!/usr/bin/env bash
# CHANGES-narrative gate, standalone so BOTH presnapshot.sh and the git
# pre-commit hook can run it. Round N = highest N among driver
# artifacts + 1; a commit/snapshot without CHANGES_r{N}.md fails.
# (Round 10's presnapshot gate never fired because nothing forced the
# script to run — the hook makes the check unskippable per-commit.)
#
# It also rejects a CHANGES file that ends in a dangling promise
# ("… re-measure below." with nothing below — the r12 truncation): the
# last non-blank line must not end with a bare colon or with
# "below"/"follows" (+ punctuation), which always announce content that
# is supposed to come after.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="$(ls VERDICT.md CORRECTNESS_r*.json BENCH_r*.json 2>/dev/null \
  | grep -oE 'r[0-9]+' | tr -d r | sort -n | tail -1 || true)"
ROUND="$(( ${ROUND:-0} + 1 ))"
if [[ ! -f "CHANGES_r${ROUND}.md" ]]; then
  echo "FATAL: CHANGES_r${ROUND}.md missing — write the round narrative first" >&2
  exit 1
fi

check_no_dangling_promise() {
  local f="$1"
  local last
  last="$(grep -vE '^[[:space:]]*$' "$f" | tail -1 || true)"
  if [[ "$last" =~ (below|follows)[[:space:]]*[.:]?[[:space:]]*$ || "$last" =~ :[[:space:]]*$ ]]; then
    echo "FATAL: $f ends in a dangling promise: '$last'" >&2
    echo "       Write the promised content (or reword) before committing." >&2
    exit 1
  fi
}
check_no_dangling_promise "CHANGES_r${ROUND}.md"
