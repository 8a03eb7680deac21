#!/usr/bin/env bash
# Segfault-resilient test-suite runner.
#
# The hosted VM live-migrates between two host CPU types roughly hourly
# (observed r3/r4). The persistent XLA:CPU AOT cache is scoped per host
# fingerprint (bnpc_tpu/utils/cache.py), but the fingerprint is computed at
# process START — a migration MID-RUN makes the process read entries it
# wrote on the other host, which segfaults deep in
# jax compilation_cache.get_executable_and_time. A monolithic
# `pytest tests/` run therefore dies ~50% of the time through no fault of
# the code.
#
# This runner executes one pytest process PER TEST FILE: each process
# re-fingerprints at start (bounding the poison window to one file), and a
# crashed file is retried once in a fresh process instead of killing the
# whole suite. Ordinary test failures are NOT retried.
#
# Usage: scripts/run_suite.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
args=("$@")
declare -a failed crashed
pass=0
for f in tests/test_*.py; do
  for attempt in 1 2; do
    timeout 3600 python -m pytest "$f" -q -p no:cacheprovider "${args[@]}"
    rc=$?
    if [ $rc -eq 0 ] || [ $rc -eq 5 ]; then  # 5 = no tests collected (ok)
      pass=$((pass + 1))
      break
    elif [ $rc -ge 124 ]; then  # signal (139 = SIGSEGV) or timeout (124)
      echo "== $f crashed (rc=$rc, attempt $attempt)"
      if [ $attempt -eq 2 ]; then crashed+=("$f"); fi
    else
      failed+=("$f")
      break
    fi
  done
done
echo
echo "== suite summary: $pass file(s) green"
[ ${#failed[@]:-0} -gt 0 ] && echo "== FAILED: ${failed[*]}"
[ ${#crashed[@]:-0} -gt 0 ] && echo "== CRASHED twice: ${crashed[*]}"
[ ${#failed[@]:-0} -eq 0 ] && [ ${#crashed[@]:-0} -eq 0 ]
