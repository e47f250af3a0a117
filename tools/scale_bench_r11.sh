#!/bin/bash
# Round-11 FULL-SWEEP shadow-bench (round-10 verdict task #5): every
# declared id at sf0.1 AND the synthetic sf1 fixture
# (tools/gen_scale.py, 10x rows), warm-up + min-of-2 timed passes per
# scale under one protocol (a single cold pass let one multi-second
# GC stall masquerade as a 10x straggler — min-of-2 rejects one-off
# stalls; the driver's round bench keeps warm-up + min-of-3).
# Lifecycle ids are self-contained (each builds its own temp
# warehouse from the fixture), so nothing mutates the fixture and
# nothing needs excluding.
#
# Usage: tools/scale_bench_r11.sh [SF1_DIR]  (default /root/repo/.scale/sf1)
set -e
cd "$(dirname "$0")/.."
SF1=${1:-/root/repo/.scale/sf1}
CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_PASSES=2 \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/scale_r11_sf01.json \
  java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  -cp "$CP" graft.Bench | tail -1 > /tmp/scale_r11_sf01.line

SPARK_GRAFT_SF_DIR="$SF1" \
  SPARK_GRAFT_PASSES=2 \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/scale_r11_sf1.json \
  java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  -cp "$CP" graft.Bench | tail -1 > /tmp/scale_r11_sf1.line

echo "sf0.1: $(cat /tmp/scale_r11_sf01.line)"
echo "sf1:   $(cat /tmp/scale_r11_sf1.line)"
