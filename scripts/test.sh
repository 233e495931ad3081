#!/bin/bash
# Checkpoint accuracy harness (mirrors reference scripts/test_sub.sh)
set -e
# GSLORA_EXTRA_ARGS: optional extra/override flags appended to the
# python invocation (last occurrence wins in argparse) — used by the
# smoke suite (tests/test_scripts.py) to shrink runs; empty by default.
CKPT=${1:?usage: test.sh <ckpt> [outdir]}
python -m gslora_tpu.cli.test_model -d casia100 -n VIT --vit_depth 6 \
    --head CosFace --lora_rank 8 -r "$CKPT" -b 240 \
    --outdir "${2:-./exps/test_out}" $GSLORA_EXTRA_ARGS
