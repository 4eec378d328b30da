#!/bin/bash
# Round-3 autotune sweep for SERVING shapes (VERDICT item 8): the engine
# runs N in {8,16,32,64} decode batches and 16/64/256 prefill buckets,
# but the shipped tune table only covered N=1 and N=256.
set -x
cd /root/repo
# decode/serving batches for the two headline serving models
for P in bitnet-3b llama-2-7b; do
  timeout 4500 python -m tmac_tpu.tools.autotune --preset $P --n 8 16 32 64 --iters 60
done
# prefill buckets for the rest of the matrix (N=16,64; 256 done in round 2)
for P in llama-3-8b phi-3-mini qwen2-7b trilm-3.9b; do
  timeout 3000 python -m tmac_tpu.tools.autotune --preset $P --n 16 64 --iters 60
done
timeout 3000 python -m tmac_tpu.tools.autotune --preset llama-2-7b --bits 4 --n 8 16 32 64 --iters 60
