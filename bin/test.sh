#!/usr/bin/env bash
# Installation smoke test — the reference's bin/test.sh equivalent
# (README.md:132-134): run the full 3-stage pipeline for one dev epoch of
# both VIC and VAE on the banana source, then the unit suite.
set -euo pipefail
cd "$(dirname "$0")/.."

export JAX_PLATFORMS="${JAX_PLATFORMS_OVERRIDE:-cpu}"
# drop any TPU-tunnel plugin site from PYTHONPATH for CPU runs: jax's
# backend discovery initializes every registered plugin, so a wedged tunnel
# would hang even a pure-CPU smoke test
if [ "$JAX_PLATFORMS" = "cpu" ] && [ -n "${PYTHONPATH:-}" ]; then
  PYTHONPATH=$(python - <<'PY'
import os
print(os.pathsep.join(p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
                      if p and "axon" not in p))
PY
)
  export PYTHONPATH
fi

OUT=$(mktemp -d)
for preset in banana_viz_VIC banana_viz_VAE; do
  echo "=== $preset (dev) ==="
  python -m lossyless_tpu.cli "$preset" --dev \
    data_feat.kwargs.length=4096 predictor.n_epochs=2 \
    out_dir="$OUT/results" ckpt_dir="$OUT/ckpt"
done

echo "=== aggregating ==="
python -m lossyless_tpu.analysis.aggregate "$OUT/results" --mode summarize

echo "=== deployment CLI round trip (tiny tower) ==="
python - <<PY
import numpy as np
np.savez("$OUT/imgs.npz", x=np.random.default_rng(0).integers(
    0, 256, (6, 64, 64, 3), dtype=np.uint8), y=np.arange(6))
PY
python -m lossyless_tpu.hub.cli compress "$OUT/imgs.npz" "$OUT/ds.bin" \
    --labels "$OUT/y.npy" --arch tiny --batch-size 3
python -m lossyless_tpu.hub.cli info "$OUT/ds.bin"
python -m lossyless_tpu.hub.cli decompress "$OUT/ds.bin" "$OUT/z.npz" \
    --labels "$OUT/y.npy" --arch tiny

echo "=== unit tests (fast subset; run 'pytest tests/' for everything) ==="
python -m pytest tests/ -q -x -m "not slow"

echo "ALL OK"
