#!/usr/bin/env bash
# Smoke test over the CLI in the reference test_all.sh's three modes
# (default / batch / long-form — reference test_all.sh). Success = exit 0
# AND non-trivial WAV bytes on disk (the reference only checked exit codes
# and file counts; a silent WAV would pass there).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=$(mktemp -d)
trap 'rm -rf "$OUT"' EXIT

run() { echo "== $1"; shift; "$@"; }

run "default mode" python -m supertonic_tpu.serve.cli \
    --n-test 1 --total-step 2 --save-dir "$OUT/default"

run "batch mode" python -m supertonic_tpu.serve.cli --batch \
    --text "First test sentence." "Deuxième phrase de test." \
    --lang en fr --voice-style M1 F1 \
    --n-test 1 --total-step 2 --save-dir "$OUT/batch"

LONG="The morning sun rose slowly over the quiet town. Shops opened one by
one, and the smell of fresh bread drifted along the street. By noon, the
square was full of people. Children chased each other around the old
fountain while their parents talked in the shade. A musician played a slow
tune on a worn guitar, and nobody seemed in any hurry at all. When evening
came, lanterns flickered to life along every doorway, and the town settled
into its usual calm."

run "long-form mode" python -m supertonic_tpu.serve.cli \
    --text "$LONG" --n-test 1 --total-step 2 --save-dir "$OUT/longform"

# 4th mode (ours): the ONNX graph-executor serving path over a synthetic
# contract bundle — exercises the real-weights day-one flow with no assets
BUNDLE=$(OUT="$OUT" python - <<'PY'
import os, pathlib, sys, tempfile
sys.path.insert(0, "tests")
import test_onnx_pipeline as T
class F:
    def mktemp(self, name):  # inside $OUT so the EXIT trap cleans it up
        return pathlib.Path(tempfile.mkdtemp(prefix=name,
                                             dir=os.environ["OUT"]))
print(T.onnx_dir.__wrapped__(F()))
PY
)
run "onnx-bundle mode" python -m supertonic_tpu.serve.cli \
    --onnx-dir "$BUNDLE" --n-test 1 --total-step 2 \
    --text "Graph bundle smoke." --save-dir "$OUT/onnx"
rm -rf "$BUNDLE"
# the synthetic bundle emits tiny (sr=80) wavs; exempt from the size gate
for f in "$OUT"/onnx/*.wav; do
  [ -s "$f" ] || { echo "FAIL: $f empty"; exit 1; }
done
rm -rf "$OUT/onnx"

total=0
for f in "$OUT"/*/*.wav; do
  size=$(stat -c %s "$f")
  echo "  $f: $size bytes"
  [ "$size" -gt 1000 ] || { echo "FAIL: $f too small"; exit 1; }
  total=$((total + 1))
done
[ "$total" -ge 4 ] || { echo "FAIL: expected >=4 wavs, got $total"; exit 1; }
echo "SMOKE TEST PASSED ($total wavs)"
