#!/bin/bash
# Fork-mode bench launcher — the committed-artifact methodology.
#
# Wraps the direct `java -cp` launch graft.Bench's fork mode requires,
# carrying the SAME JDK-17 --add-opens set build.sbt injects for sbt
# runs (children inherit this JVM's args). Bench refuses to fork
# without them: a bare `java -cp` parent would fork a whole sweep of
# silently degraded children — Spark's Platform/UTF8String reflective
# fast paths fall back to copies, up to 5x on text/codec-heavy queries
# (q230 at sf10: 321 s without, 66 s with) while arithmetic-heavy plans
# barely move, skewing every ratio with zero errors raised.
#
# Heap stays below 32 GB by default so compressed oops stay enabled
# (a 110 GB heap costs doubled pointer width on codec/object-heavy
# paths and buys nothing for noop-sink queries).
#
# Usage (env is graft.Bench's own contract):
#   SPARK_GRAFT_FORK=true SPARK_GRAFT_SF_DIR=tools/sf10 \
#   SPARK_GRAFT_PASSES=1 SPARK_GRAFT_GC_SETTLE=true \
#   SPARK_GRAFT_SINGLE_FILE=true SPARK_GRAFT_CPUS=32 \
#   SPARK_GRAFT_SKIP=q153_ppjoin,q41_distinct_sketch \
#   tools/run_fork.sh > BENCH_sf10_full.json
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
exec java -Xmx"${SPARK_DRIVER_MEM:-28g}" $ADD_OPENS -cp "$CP" graft.Bench "$@"
