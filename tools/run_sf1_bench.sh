#!/bin/bash
# sf1 bench: four quarter-board shards in separate JVMs, merged by
# tools/merge_bench.py.
#
# History: r9's single-JVM full board OOMed at local[32]/24g; r10 ran
# two half boards at local[16]/64g; the r11 re-run under the same split
# OOMed again mid-board (more queries, wider frames), so r12 shards
# harder — 4 JVMs at local[8]/48g. Runs java directly against the
# compiled classes (sbt must have compiled first): no sbt daemon lock,
# so the build stays usable while the board runs, and per-shard startup
# drops from ~20 s to ~2 s.
set -x
cd /root/repo
CLASSES=/root/repo/target/scala-2.13/classes
[ -d "$CLASSES/graft" ] || { echo "compile first: sbt compile"; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/repo/target/sf1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8}
MEM=${SPARK_DRIVER_MEM:-48g}
REPS=${SPARK_GRAFT_BENCH_REPS:-1}
SHARDS=${SPARK_GRAFT_BENCH_SHARDS:-4}
outs=""
for i in $(seq 0 $((SHARDS - 1))); do
  SPARK_GRAFT_BENCH_REPS=$REPS \
  SPARK_GRAFT_BENCH_SHARD=$i/$SHARDS \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_shard$i.json \
    java $ADD_OPENS -Xmx$MEM \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
      > /tmp/bench_sf1_shard$i.log 2>&1
  echo "shard $i exit: $?"
  outs="$outs /tmp/bench_sf1_shard$i.json"
done
python3 tools/merge_bench.py $outs BENCH_sf1.json
echo DONE
