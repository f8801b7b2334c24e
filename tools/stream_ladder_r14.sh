#!/bin/bash
# Round-14 streaming state-store ladder (verdict ask #6): the round-5
# throughput protocol pushed up a decade — 200 k AND 2 M events, each
# under the default HDFS-backed heap state store and under RocksDB,
# 3 idle runs per cell. StreamProfile prints per-query state rows AND
# bytes per run; the ladder records ev/s + the largest state operator.
set -u
# round-5 protocol parameters (BASELINE.md r13 streaming row):
# 4 shuffle/state partitions, 1 s trigger, 50 k-event chunks
export GRAFT_PROFILE_PARTITIONS=4 GRAFT_PROFILE_TRIGGER_SEC=1
for n in 200000 2000000; do
  for store in hdfs rocksdb; do
    for rep in 1 2 3; do
      echo "=== n=$n store=$store rep=$rep load=$(cut -d' ' -f1-3 /proc/loadavg) ==="
      if [ "$store" = rocksdb ]; then export GRAFT_ROCKSDB=1; else unset GRAFT_ROCKSDB; fi
      sbt "runMain graft.tools.StreamProfile $n" 2>&1 | grep "\[profile\]"
    done
  done
done
