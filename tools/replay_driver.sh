#!/usr/bin/env bash
# Driver-environment correctness replay: run Verify + the DuckDB compare
# at the EXACT driver CPU count, at both verification SFs, and exit
# non-zero on any mismatch — so any "doesn't reproduce locally" claim
# about a driver correctness failure comes with evidence attached.
#
# Usage: tools/replay_driver.sh [cpus] [query ...]
#   cpus   defaults to 4 (the driver's Verify session; see Verify.scala)
#   query  optional names to restrict the run (debugging)
#
# Env: SPARK_GRAFT_REPLAY_SFS overrides the SF list (default "0.01 0.001").
set -u
cd "$(dirname "$0")/.."
CPUS="${1:-4}"
shift || true
QUERIES=("$@")
SFS=${SPARK_GRAFT_REPLAY_SFS:-"0.01 0.001"}

fail=0
for sf in $SFS; do
  out="/tmp/graft_replay_${CPUS}cpu_sf${sf}"
  rm -rf "$out"
  echo "== replay: sf$sf at local[$CPUS] -> $out"
  SPARK_GRAFT_CPUS="$CPUS" sbt -batch \
    "runMain graft.Verify /root/testdata/sf$sf $out ${QUERIES[*]:-}" 2>&1 \
    | grep '\[verify\]' && fail=1  # any per-query failure line is a failure
  if ! python3 tools/compare_oracle.py "/root/testdata/sf$sf" "$out" ${QUERIES[@]:-} \
      | tee "/tmp/graft_replay_sf${sf}.log" | tail -1 | grep -q " 0 fail"; then
    echo "== MISMATCH at sf$sf (see /tmp/graft_replay_sf${sf}.log)"
    # localize: per-column/per-row md5 diff vs the oracle (forensics.py
    # mirrors graft.Forensics' canonical form)
    python3 tools/forensics.py "/root/testdata/sf$sf" "$out" ${QUERIES[@]:-} \
      | grep -v '^PASS' || true
    fail=1
  fi
done
exit $fail
