#!/bin/bash
# Multi-thousand-step PCN soak with a mid-run kill + resume (VERDICT r3 #1b).
#
# Phases (run from a directory with a synthetic PCN dataset at the CLI's
# default relative paths — see .claude/skills/verify/SKILL.md; 800 train
# samples -> 67 steps/epoch at B12, 30 epochs ~= 2010 steps):
#   straight : main_pcn.py --epochs N to completion, RSS sampled every 10 s
#   killed   : same run SIGKILLed mid-epoch KILL_AT, then resumed from the
#              NEWEST checkpoint in the run dir (mtime order over ckpt-* —
#              the CheckpointManager.latest() policy; ckpt-best alone can be
#              many epochs stale when the best-val epoch precedes the kill,
#              which would silently redo epochs and weaken the evidence)
# With the (seed,epoch)-keyed deterministic pipeline (commit 38bbe60), the
# resumed run's post-resume per-epoch losses must match the straight run's
# — compare with:  grep "INFO.*Epoch .*losses" straight.log resumed.log
#
# Logs are filtered to >=INFO on the fly: the CLI logs at DEBUG for
# reference parity, and an unfiltered 30-epoch soak log measured 1.7 GB.
#
# Usage: bash tools/soak_pcn.sh <workdir> [epochs=30] [kill_at=16]
set -u
WORK=${1:?workdir with dataset/ + datasets/}
EPOCHS=${2:-30}
KILL_AT=${3:-16}
cd "$WORK"

monitor() { # $1 pid  $2 rss-file
  while kill -0 "$1" 2>/dev/null; do
    awk '/VmRSS/{print strftime("%s"), $2}' "/proc/$1/status" 2>/dev/null
    sleep 10
  done >> "$2"
}

launch() { # $1 logfile ; rest: extra args. Echoes the python pid.
  local log=$1; shift
  PYTHONPATH=/root/repo:$PYTHONPATH python -u /root/repo/main_pcn.py \
    --epochs "$EPOCHS" "$@" \
    > >(grep --line-buffered -v DEBUG > "$log") 2>&1 &
  echo $!
}

newest_ckpt() { # $1 run dir — newest checkpoint by mtime (latest() policy)
  ls -td "$1"/checkpoints/ckpt-* 2>/dev/null | head -1
}

echo "== phase 1: straight $EPOCHS-epoch run"
SPID=$(launch straight.log --out out_straight)
echo "$SPID" > /tmp/straight.pid
monitor "$SPID" straight.rss &
wait "$SPID" 2>/dev/null

echo "== phase 2: killed run (SIGKILL mid-epoch $KILL_AT)"
KPID=$(launch killed.log --out out_killed)
echo "$KPID" > /tmp/killed.pid
monitor "$KPID" killed.rss &
# wait until epoch KILL_AT-1 validation is logged, then strike mid-epoch
PREV=$((KILL_AT - 1))
while ! grep -q "Epoch $PREV val CD" killed.log; do
  kill -0 "$KPID" 2>/dev/null || { echo "killed run died early"; exit 1; }
  sleep 5
done
sleep 8  # a few steps into epoch KILL_AT
kill -9 "$KPID"
RESUME_FROM=$(newest_ckpt out_killed)
echo "== SIGKILLed $KPID mid-epoch $KILL_AT; resuming from $RESUME_FROM"
RPID=$(launch resumed.log --weights "$RESUME_FROM" --out out_killed)
echo "$RPID" > /tmp/resumed.pid
monitor "$RPID" resumed.rss &
wait "$RPID" 2>/dev/null
echo "== done; compare per-epoch losses:"
echo "   grep 'INFO.*Epoch .*losses' straight.log resumed.log"
