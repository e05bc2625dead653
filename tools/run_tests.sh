#!/bin/sh
# Full-suite runner with one retry for compile-crash exits.
#
# r3 shipped without a green full-suite log because the final run died in
# a flaky XLA CPU compile segfault (tests_full_r3.log:
# backend_compile_and_load, SIGSEGV under compile-memory pressure on the
# 2-core host; VERDICT r3 weak #3). pytest exits 139/134/132 on such
# crashes; a retry resumes from the persistent compile cache
# (tests/conftest.py) so the crashing compile usually loads instead of
# recompiling. Genuine test failures (exit 1) are NOT retried.
#
# Usage: tools/run_tests.sh [pytest args...]   (default: tests/ -q)
set -u
cd "$(dirname "$0")/.."
if [ "$#" -eq 0 ]; then
  set -- tests/ -q
fi
python -m pytest "$@"
rc=$?
case "$rc" in
  132|134|135|136|137|138|139)
    echo "=== pytest crashed (exit $rc, likely XLA compile crash);" \
         "retrying once from the compile cache ===" >&2
    python -m pytest "$@"
    rc=$?
    ;;
esac
if [ "$rc" -eq 0 ]; then
  # Doc-vs-bench consistency gate (VERDICT r4 #9): loud drift.
  python "$(dirname "$0")/check_docs.py" || rc=$?
fi
exit $rc
