#!/bin/bash
# Quiet-window watcher: sample the pure-CPU control every ~8 min; when it
# clears the floor (default 380M ops/s, ~83% of the round-2 quiet 457M),
# immediately run scaling legs (2/8/32 cycle) and append to the log.
# Stops after MAX_CYCLES quiet cycles or when killed.
FLOOR_M=${FLOOR_M:-380}
LOG=${1:-data/scaling/r5_quietwatch.jsonl}
MAX_CYCLES=${MAX_CYCLES:-4}
cycles=0
cd /root/repo || exit 1
while [ "$cycles" -lt "$MAX_CYCLES" ]; do
  ctl=$(python tools/cpu_control.py --workers 32 --seconds 3 2>/dev/null | python -c "import json,sys
try:
    print(json.loads(sys.stdin.readline())['ops_per_sec_m'])
except Exception:
    print(-1.0)")
  [ -z "$ctl" ] && ctl=-1.0
  echo "{\"ts\": $(date +%s), \"watch_control_m\": $ctl}" >> "$LOG"
  if python -c "import sys; sys.exit(0 if float('$ctl') >= float('$FLOOR_M') else 1)"; then
    python tools/scaling_sampler.py "$LOG" --cores 2,8,32 --rounds 1
    cycles=$((cycles+1))
  else
    sleep 480
  fi
done
