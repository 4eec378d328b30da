#!/bin/bash
# Model-matrix bench at real prefill lengths (len 256) + decode, after the
# tuned table is in place.  Writes CSV lines to the log.
set -x
cd /root/repo
for P in bitnet-3b bitnet-2b-4t trilm-3.9b phi-3-mini llama-2-7b llama-3-8b qwen2-7b; do
  timeout 2500 python -m tmac_tpu.tools.cli bench-e2e --model $P --batch 1 --prompt-len 256 --steps 64
done
timeout 2500 python -m tmac_tpu.tools.cli bench-e2e --model llama-2-7b --bits 4 --batch 1 --prompt-len 256 --steps 64
