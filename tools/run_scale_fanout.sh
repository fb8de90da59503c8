#!/bin/bash
# Fanout-phase scale rehearsal driver (tmux-run; survives tool timeouts).
# Measures the composed seven-surface cadence at the given scales:
# corpus-linear gated build, then the FIXED 500-doc ingest wave, its
# redelivery no-op, the 300-id composed takedown, the incremental
# composed vacuum, and the routed passage probe.
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_PHASES=fanout \
SPARK_GRAFT_REUSE=1 \
SPARK_GRAFT_SCALE_OUT=/root/repo/scale_fanout.jsonl \
java -Xmx24g -XX:+UseG1GC -XX:ReservedCodeCacheSize=1g \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.ScaleRehearsal "$@" 2>/tmp/scale_fanout.err | tee -a /tmp/scale_fanout.log
echo "DONE rc=$?" >> /tmp/scale_fanout.log
