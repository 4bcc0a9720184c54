#!/usr/bin/env bash
# End-to-end demo on a synthetic EATD-shaped corpus (the real corpus is
# restricted-distribution).  Runs extraction + both training tracks +
# checking + baselines.  On a TPU host the first run pays one-time
# compilations (cached persistently afterwards).
set -euo pipefail

ROOT="${1:-/tmp/icassp2022_tpu_demo}"
PY="${PYTHON:-python}"

# fresh model dir: stale artifacts from a previous run would otherwise
# mismatch the idx/checkpoint pairing below
rm -rf "$ROOT/Model"
$PY -m icassp2022_depression_tpu.cli synth-corpus --root "$ROOT" \
    --n-data 114 --n-validation 48 --seconds 4.0 --seed 42
$PY -m icassp2022_depression_tpu.cli extract-audio --root "$ROOT"
$PY -m icassp2022_depression_tpu.cli extract-text  --root "$ROOT"
# the fused product path: extraction -> device-resident fold data ->
# training in ONE command (features never return to the host)
$PY -m icassp2022_depression_tpu.cli train --task audio_clf --root "$ROOT" \
    --corpus "$ROOT" --model-dir "$ROOT/Model/FusedDemo"
$PY -m icassp2022_depression_tpu.cli pipeline --track clf --root "$ROOT"
$PY -m icassp2022_depression_tpu.cli pipeline --track reg --root "$ROOT" --lr 3e-4
$PY -m icassp2022_depression_tpu.cli baselines --task audio_clf --root "$ROOT"

# checking harness consumes the idx artifacts the clf training emitted
AUDIO_DIR="$ROOT/Model/ClassificationWhole/Audio"
IDX=(); CKPT=()
for f in 1 2 3; do
  c=$(ls "$AUDIO_DIR"/*_"$f".npz 2>/dev/null | grep -v train_idxs | head -1 || true)
  [ -n "$c" ] || continue
  # the emitted idx artifact shares the checkpoint's {f1:.2f}_{fold} tail
  f1=$(basename "$c" .npz | awk -F_ '{print $(NF-1)}')
  i="$AUDIO_DIR/train_idxs_${f1}_${f}.npy"
  [ -f "$i" ] && IDX+=("$i") && CKPT+=("$c")
done
if [ "${#IDX[@]}" -eq 3 ]; then
  $PY -m icassp2022_depression_tpu.cli check --task audio_clf --root "$ROOT" \
      --ckpts "${CKPT[@]%.npz}" --idx-files "${IDX[@]}"
fi

# one served prediction from a trained checkpoint
if [ "${#CKPT[@]}" -ge 1 ]; then
  $PY -m icassp2022_depression_tpu.cli predict --task audio_clf --root "$ROOT" \
      --ckpt "${CKPT[0]%.npz}" --speaker Data/1
fi
echo "demo complete; models in $ROOT/Model, metrics JSONL alongside"
