#!/bin/bash
# sf1 bench: two half-board shards in separate JVMs (r9's single-JVM
# full-board run OOMed at local[32]/24g), merged by tools/merge_bench.py.
set -x
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/repo/target/sf1
export SPARK_GRAFT_CPUS=16
export SPARK_DRIVER_MEM=64g
export SPARK_GRAFT_BENCH_REPS=${SPARK_GRAFT_BENCH_REPS:-1}
for i in 0 1; do
  SPARK_GRAFT_BENCH_SHARD=$i/2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_shard$i.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_sf1_shard$i.log 2>&1
  echo "shard $i exit: $?"
done
python3 tools/merge_bench.py /tmp/bench_sf1_shard0.json /tmp/bench_sf1_shard1.json BENCH_sf1.json
echo DONE
