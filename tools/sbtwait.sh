#!/bin/bash
# Wait until the sbt tmux pane shows an idle prompt after a command,
# then print the last N lines (default 6). Usage: sbtwait.sh [N] [timeout_s]
N=${1:-6}; T=${2:-300}
for i in $(seq 1 $((T/3))); do
  sleep 3
  last=$(tmux capture-pane -t sbt -p | grep -v '^$' | tail -1)
  case "$last" in
    *"sbt:distributedmapreduceserverspark"*) break;;
  esac
done
tmux capture-pane -t sbt -p -S -2000 | grep -E "\[success\]|\[error\] Total|error\]|PASS|FAIL|failed|\[info\] (Tests|Suites|Run completed|Total number|All tests|.*Spec)" | grep -v "INFO\|WARN" | tail -$N
