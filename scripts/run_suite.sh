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
# Usage: scripts/run_suite.sh [--tpu] [extra pytest args...]
#   --tpu  additionally run the TPU-gated hardware parity tests
#          (BNPC_TPU_TESTS=1 tests/test_tpu_hardware.py) on the real chip
#          after the CPU suite. Requires a reachable TPU and no concurrent
#          TPU process.
set -u
cd "$(dirname "$0")/.."
run_tpu=0
if [ "${1:-}" = "--tpu" ]; then run_tpu=1; shift; fi
args=("$@")
failed=()
crashed=()
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
if [ $run_tpu -eq 1 ]; then
  echo
  echo "== running TPU-gated hardware parity tests (real chip)"
  BNPC_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_hardware.py \
    -q -p no:cacheprovider "${args[@]}"
  rc=$?
  if [ $rc -eq 0 ] || [ $rc -eq 5 ]; then
    pass=$((pass + 1))
  else
    failed+=("tests/test_tpu_hardware.py[tpu]")
  fi
fi
echo
echo "== suite summary: $pass file(s) green"
if [ ${#failed[@]} -gt 0 ]; then echo "== FAILED: ${failed[*]}"; fi
if [ ${#crashed[@]} -gt 0 ]; then echo "== CRASHED twice: ${crashed[*]}"; fi
[ ${#failed[@]} -eq 0 ] && [ ${#crashed[@]} -eq 0 ]
