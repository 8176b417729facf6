#!/bin/bash
# Capture every bench.py mode into a dated raw JSONL log (VERDICT r3 #1:
# every quoted perf number must be reproducible from a raw capture line).
# Usage: tools/capture_bench.sh docs/bench_r4_capture.jsonl [label]
set -u
OUT=${1:-docs/bench_r4_capture.jsonl}
LABEL=${2:-}
REV=$(git rev-parse --short HEAD 2>/dev/null || echo unknown)

run() {
  local tag="$1"; shift
  local ts=$(date -u +%Y-%m-%dT%H:%M:%SZ)
  local line
  line=$(python bench.py "$@" 2>/tmp/bench_err.log | tail -1)
  if [ -z "$line" ]; then
    line='{"error": "no-output"}'
  fi
  # annotate the raw line with mode/rev/time without disturbing its fields
  python - "$OUT" "$tag" "$ts" "$REV" "$LABEL" "$line" <<'EOF'
import json, sys
out, tag, ts, rev, label, line = sys.argv[1:7]
try:
    d = json.loads(line)
except json.JSONDecodeError:
    d = {"error": "unparseable", "raw": line[:200]}
d = {"mode": tag, "ts": ts, "rev": rev, **({"label": label} if label else {}), **d}
with open(out, "a") as fh:
    fh.write(json.dumps(d) + "\n")
print(json.dumps(d))
EOF
}

# Optional trained weights (VERDICT r3 weak #3: random-init stage 1
# over-segments, making the --refine crop workload denser than production).
# Export PRETRAINED / CROP224 / CROP128 as orbax dirs to bench the
# representative trained-weights workload.
PRE=${PRETRAINED:+--pretrained "$PRETRAINED"}
C224=${CROP224:+--pretrained-crop "$CROP224"}
C128=${CROP128:+--pretrained-crop "$CROP128"}

# numerics gate first: every seeding route must pass the f64-replay
# audit on the real backend before any number is captured (r5: two
# routes were silently bf16-truncated at default MXU precision)
python tools/probe_seed_precision.py --n 50176 --m 100 || {
  echo '{"error": "seed-precision-audit-failed"}' >> "$OUT"; exit 1; }

run stage1_fast
run stage1_parity --parity
run refine224_r34_fast --refine $PRE $C224
run refine224_r34_parity --refine --parity $PRE $C224
run refine128_r18_fast --refine --crop-size 128 --crop-net seg_resnet18_8s_embedding $PRE $C128
run refine128_r18_parity --refine --parity --crop-size 128 --crop-net seg_resnet18_8s_embedding $PRE $C128

# resnet18 STAGE-1 frontier study (r4): export PRETRAINED_R18 to bench the
# lighter backbone end-to-end (stage-1 alone + the all-r18 two-stage route)
if [ -n "${PRETRAINED_R18:-}" ]; then
  R18="--network seg_resnet18_8s_embedding --pretrained $PRETRAINED_R18"
  run stage1_r18_fast $R18
  run stage1_r18_parity --parity $R18
  run refine_allr18_fast --refine --crop-size 128 --crop-net seg_resnet18_8s_embedding $R18 $C128
fi
