#!/bin/bash
# Multi-thousand-step PCN soak with a mid-run kill + resume (VERDICT r3 #1b).
#
# Phases (run from a directory with a synthetic PCN dataset at the CLI's
# default relative paths — see .claude/skills/verify/SKILL.md; 800 train
# models x 8 renderings -> 67 steps/epoch at B12, 30 epochs ~= 2010 steps):
#   straight : main_pcn.py --epochs N to completion, RSS sampled every 10 s
#   killed   : same run SIGKILLed mid-epoch KILL_AT, then resumed from
#              ckpt-best to completion
# With the (seed,epoch)-keyed deterministic pipeline (commit 38bbe60), the
# resumed run's post-resume per-epoch losses must match the straight run's
# — compare with:  grep "INFO.*Epoch .*losses" straight.log resumed.log
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

run_train() { # $1 logfile  $2 rss-file  extra args...
  local log=$1 rss=$2; shift 2
  PYTHONPATH=/root/repo:$PYTHONPATH python -u /root/repo/main_pcn.py \
    --epochs "$EPOCHS" "$@" > "$log" 2>&1 &
  local pid=$!
  monitor "$pid" "$rss" &
  local mon=$!
  echo "$pid"  # caller may kill it
  wait "$pid" 2>/dev/null
  kill "$mon" 2>/dev/null
}

echo "== phase 1: straight $EPOCHS-epoch run"
run_train straight.log straight.rss --out out_straight > /tmp/straight.pid
echo "== phase 2: killed run (SIGKILL mid-epoch $KILL_AT)"
PYTHONPATH=/root/repo:$PYTHONPATH python -u /root/repo/main_pcn.py \
  --epochs "$EPOCHS" --out out_killed > killed.log 2>&1 &
KPID=$!
monitor "$KPID" killed.rss &
# wait until epoch KILL_AT-1 validation is logged, then strike mid-epoch
PREV=$((KILL_AT - 1))
while ! grep -q "Epoch $PREV val CD" killed.log; do
  kill -0 "$KPID" 2>/dev/null || { echo "killed run died early"; exit 1; }
  sleep 5
done
sleep 8  # a few steps into epoch KILL_AT
kill -9 "$KPID"
echo "== SIGKILLed $KPID mid-epoch $KILL_AT; resuming from ckpt-best"
PYTHONPATH=/root/repo:$PYTHONPATH python -u /root/repo/main_pcn.py \
  --epochs "$EPOCHS" --weights out_killed/checkpoints/ckpt-best \
  --out out_killed > resumed.log 2>&1
echo "== done; compare per-epoch losses:"
echo "   grep 'INFO.*Epoch .*losses' straight.log resumed.log"
