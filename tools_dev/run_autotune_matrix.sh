#!/bin/bash
# Autotune the model matrix on the real chip: prefill (N=256) dispatch+bm
# for every family, plus decode (N=1) for the two headline models.
set -x
cd /root/repo
for P in bitnet-3b llama-2-7b llama-3-8b phi-3-mini qwen2-7b trilm-3.9b; do
  timeout 3000 python -m tmac_tpu.tools.autotune --preset $P --n 256 --iters 30
done
timeout 3000 python -m tmac_tpu.tools.autotune --preset llama-2-7b --bits 4 --n 256 --iters 30
