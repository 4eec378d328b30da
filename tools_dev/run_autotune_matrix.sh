#!/bin/bash
# Autotune headline models first (bitnet prefill, llama-2-7b W2/W4
# prefill); the rest of the matrix runs in a second pass.
set -x
cd /root/repo
timeout 3000 python -m tmac_tpu.tools.autotune --preset bitnet-3b --n 256 --iters 30
timeout 3000 python -m tmac_tpu.tools.autotune --preset llama-2-7b --n 256 --iters 30
timeout 3000 python -m tmac_tpu.tools.autotune --preset llama-2-7b --bits 4 --n 256 --iters 30
