#!/bin/sh
# Full training run: dp over all local devices, bf16 inference-ready
# checkpoints, async step saves + SIGTERM-safe resume.
DATA=${DATA:-/path/to/pdbbind}
python -m fabind_tpu.cli.train --preset fabind --data "$DATA" \
    --output runs/base --save-every-steps 500 --keep 3 --resume \
    --workers 8 --prefetch 2
