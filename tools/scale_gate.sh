#!/bin/bash
# STANDING scale gate (round-11 verdict task #5, promoted round 12):
# the 10x shadow-bench, scoped to the ids where a scale-killer plan
# can hide — the 20 fattest ids from the last recorded BENCH_DETAIL
# plus every id the round touched (pass those as args). Run it each
# round after correctness is green; it is what caught c26's
# unpersisted re-explosion (61x) and b65's per-row percentile
# buffers (34x) in round 11 — bugs sf0.1 cannot see.
#
# Protocol (NOTES #52): warm-up + min-of-2 timed passes per scale —
# one cold pass lets a one-off GC stall masquerade as a 10x straggler.
#
# Usage: tools/scale_gate.sh [touched_id ...]
#   env: SF1_DIR  (default /root/repo/.scale/sf1; built on demand)
#        TOP_N    (default 20)
#        RATIO_FLAG (default 4.0 — ids above it are listed for triage;
#                    judge each against its work model: output-
#                    proportional ids legitimately scale superlinearly)
set -e
cd "$(dirname "$0")/.."
SF1=${SF1_DIR:-/root/repo/.scale/sf1}
TOP_N=${TOP_N:-20}
RATIO_FLAG=${RATIO_FLAG:-4.0}

if [ ! -d "$SF1" ]; then
  echo "== building 10x fixture at $SF1 (one-time)"
  python3 tools/gen_scale.py /root/testdata/sf0.1 "$SF1" 10
fi

IDS=$(python3 - "$@" <<'EOF'
import json, sys
detail = json.load(open('BENCH_DETAIL.json'))
q = detail.get('queries', detail)
fattest = sorted(q, key=lambda k: -q[k])[:int(__import__('os').environ.get('TOP_N', '20'))]
ids = list(dict.fromkeys(fattest + sys.argv[1:]))
print(','.join(ids))
EOF
)
echo "== gate ids: $IDS"

CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes"
for SCALE in sf01 sf1; do
  [ "$SCALE" = sf01 ] && DIR=/root/testdata/sf0.1 || DIR="$SF1"
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_PASSES=2 SPARK_GRAFT_ONLY="$IDS" \
    SPARK_GRAFT_BENCH_DETAIL=/tmp/scale_gate_$SCALE.json \
    java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
    -cp "$CP" graft.Bench | tail -1 > /tmp/scale_gate_$SCALE.line
  echo "$SCALE: $(cat /tmp/scale_gate_$SCALE.line)"
done

python3 - <<EOF
import json
a = json.load(open('/tmp/scale_gate_sf01.json')); a = a.get('queries', a)
b = json.load(open('/tmp/scale_gate_sf1.json')); b = b.get('queries', b)
rows = sorted(((b[k] / max(a[k], 1e-9), k, a[k], b[k]) for k in b if k in a), reverse=True)
flagged = [r for r in rows if r[0] > $RATIO_FLAG]
print(f"== {len(rows)} ids swept; {len(flagged)} above {$RATIO_FLAG}x")
for ratio, k, t01, t1 in rows:
    mark = ' <-- TRIAGE' if ratio > $RATIO_FLAG else ''
    print(f"  {k:36s} {t01:7.2f}s -> {t1:7.2f}s  ({ratio:4.1f}x){mark}")
EOF
