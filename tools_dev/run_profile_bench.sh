#!/bin/bash
set -x
cd /root/repo
bash tools_dev/run_bench_matrix.sh
timeout 2500 python -m tmac_tpu.tools.cli bench-e2e --model bitnet-3b --batch 1 --prompt-len 16 --steps 64
timeout 2500 python -m tmac_tpu.tools.cli bench-e2e --model llama-2-7b --batch 1 --prompt-len 16 --steps 64
timeout 2800 python -m tmac_tpu.tools.profile_kernels --preset all --n 1 256 --iters 60 --out tuned/results.csv
