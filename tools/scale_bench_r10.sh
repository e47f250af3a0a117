#!/bin/bash
# Round-10 shadow-bench extension (round-9 verdict task #3): the
# REST/transform family that landed in rounds 8-9 — remote DML (d76),
# SQL hidden-partition lifecycle (d84), hidden-partition row-level DML
# over REST (d86), the REST streaming source (s24), and remote
# maintenance (d80) — at sf0.1 AND the synthetic sf1 fixture
# (tools/gen_scale.py), per-id detail JSONs for SCALE_r10.md.
#
# Usage: tools/scale_bench_r10.sh [SF1_DIR]  (default /root/repo/.scale/sf1)
set -e
cd "$(dirname "$0")/.."
SF1=${1:-/root/repo/.scale/sf1}
SUBSET="d76_rest_dml,d84_sql_transformed_insert,d86_sql_transformed_dml,s24_stream_rest_source,d80_rest_maintenance,d85_sql_add_transform_field"
CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$SUBSET" \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/scale_r10_sf01.json \
  java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  -cp "$CP" graft.Bench | tail -1 > /tmp/scale_r10_sf01.line

SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_ONLY="$SUBSET" \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/scale_r10_sf1.json \
  java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  -cp "$CP" graft.Bench | tail -1 > /tmp/scale_r10_sf1.line

echo "sf0.1: $(cat /tmp/scale_r10_sf01.line)"
echo "sf1:   $(cat /tmp/scale_r10_sf1.line)"
