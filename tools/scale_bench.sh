#!/bin/bash
# 10x scale shadow-bench (round-8 verdict task #1): run the flagship
# analytic + LLM-pipeline subset plus the ingest->compact->expire
# maintenance loop at sf0.1 AND at the synthetic sf1 fixture
# (tools/gen_scale.py), writing per-id detail JSONs for SCALE_r9.md.
#
# Usage: tools/scale_bench.sh [SF1_DIR]   (default /root/repo/.scale/sf1)
set -e
cd "$(dirname "$0")/.."
SF1=${1:-/root/repo/.scale/sf1}
SUBSET="b24_agg_groupby,b20_join_multiway_star,b41_sort_multi_key,c01_dedup_exact,c02_dedup_near_minhash,c12_dedup_ngram_jaccard,c16_dedup_components,c23_semantic_dedup,c25_bm25_rank,c27_substring_dedup,d16_zorder_clustered_scan,d45_connector_dpp,d46_storage_partitioned_join,a11_incremental_append_write,d07_compaction,a12_expire_snapshots"
CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ONLY="$SUBSET" \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/scale_sf01.json \
  java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  -cp "$CP" graft.Bench | tail -1 > /tmp/scale_sf01.line

SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_ONLY="$SUBSET" \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/scale_sf1.json \
  java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
  -cp "$CP" graft.Bench | tail -1 > /tmp/scale_sf1.line

echo "sf0.1: $(cat /tmp/scale_sf01.line)"
echo "sf1:   $(cat /tmp/scale_sf1.line)"
