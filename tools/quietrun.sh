#!/bin/bash
# Run a command only while the host is quiet (this VM shows 10-30 min
# hypervisor-steal storms that wreck benchmark numbers — CLAUDE.md inv. 6).
# Usage: quietrun.sh <max_wait_sec> <cmd...>
#  - probes single-core spin time before starting; waits until it is within
#    ~12% of the quiet-host reference (3.0s for this loop on this box);
#  - re-probes after the run and exits 42 if the host got loaded mid-run
#    (callers should discard the measurement and retry).
set -u
MAXWAIT=$1; shift
probe_ms() {
  local t0=$(date +%s%N)
  if ! python3 -c "
n=0
for i in range(30000000): n+=i" >/dev/null 2>&1; then
    # a broken probe must fail CLOSED (report "loaded"), not open the gate
    echo 999999; return
  fi
  local t1=$(date +%s%N)
  echo $(( (t1-t0)/1000000 ))
}
QUIET_MS=${QUIET_MS:-3350}
waited=0
while :; do
  p=$(probe_ms)
  if [ "$p" -le "$QUIET_MS" ]; then break; fi
  echo "[quietrun] host loaded (probe ${p}ms > ${QUIET_MS}ms), waiting..." >&2
  sleep 60; waited=$((waited+63))
  if [ "$waited" -ge "$MAXWAIT" ]; then
    echo "[quietrun] gave up waiting after ${waited}s" >&2; exit 41
  fi
done
echo "[quietrun] host quiet (probe ${p}ms), starting" >&2
"$@"
rc=$?
post=$(probe_ms)
if [ "$post" -gt "$QUIET_MS" ]; then
  echo "[quietrun] POST-RUN probe ${post}ms > ${QUIET_MS}ms — host got loaded mid-run, measurement suspect" >&2
  # a genuine command failure must win over the retryable host-load signal:
  # exit 42 only when the command itself succeeded (rc=0), else pass rc
  # through so callers don't retry a deterministically-failing command
  if [ "$rc" -eq 0 ]; then exit 42; fi
  echo "[quietrun] (command itself failed rc=${rc} — propagating that, not 42)" >&2
  exit $rc
fi
echo "[quietrun] post-run probe ${post}ms — clean" >&2
exit $rc
