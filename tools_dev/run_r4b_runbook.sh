#!/bin/bash
# Round-4 continuation runbook (after the step-5 autotune was stopped:
# its 60-iter chained timings at N<=64 measured 0.0 us -- tunnel noise --
# and were seeding the tune table with arbitrary picks; timing.py now
# auto-scales iterations).  Trimmed + reprioritized to fit the remaining
# window:
#   5   core serving autotune (bitnet-3b + llama-2-7b W2/W4, N 8-64)
#   6   bench-serve suite (baseline / int8-KV / prefix-cache A/B)
#   6b  decode breakdown sections 4-5 (full step + ablations; the 2400 s
#       timeout cut them in the first pass)
#   7   len-256 prefill matrix
#   8   speculative decode benches
#   9   MoE decode A/B + MoE HW gates
#   10  full-size gguf round trip
#   11  long-context int8-KV + adaptive-chunk A/B
#   12  parity reruns for rows 1-3 (layer-bisect metrics; they ran
#       before the bisect landed)
#   13  extended autotune (prefill buckets for the other presets)
set -u
cd /root/repo
START=${1:-5}
STAMP() { date -u +%H:%M:%S; }

probe() {
  timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1
}

run_step() {
  local n=$1 log=$2; shift 2
  [ "$n" -lt "$START" ] && return 0
  if ! probe; then
    echo "[$(STAMP)] step $n ABORT (tunnel down; resume: run_r4b_runbook.sh $n)" \
      | tee -a /tmp/r4_runbook.log
    exit 1
  fi
  echo "[$(STAMP)] step $n START: $*" | tee -a /tmp/r4_runbook.log
  if "$@" > "$log" 2>&1; then
    echo "[$(STAMP)] step $n DONE (log: $log)" | tee -a /tmp/r4_runbook.log
  else
    echo "[$(STAMP)] step $n FAILED rc=$? (log: $log) -- continuing" \
      | tee -a /tmp/r4_runbook.log
  fi
}

echo "[$(STAMP)] r4b runbook start (from step $START)" | tee -a /tmp/r4_runbook.log

# 5. core serving-shape autotune
run_step 5 /tmp/r4_autotune_bitnet.log timeout 4200 \
  python -m tmac_tpu.tools.autotune --preset bitnet-3b --n 8 16 32 64 --iters 60
run_step 5 /tmp/r4_autotune_llama.log timeout 4200 \
  python -m tmac_tpu.tools.autotune --preset llama-2-7b --n 8 16 32 64 --iters 60
run_step 5 /tmp/r4_autotune_llama4.log timeout 2400 \
  python -m tmac_tpu.tools.autotune --preset llama-2-7b --bits 4 --n 8 64 --iters 60

# 6. bench-serve suite with the tuned table
run_step 6 /tmp/r4_serve.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b
run_step 6 /tmp/r4_serve_int8kv.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --kv-quant
run_step 6 /tmp/r4_serve_nocache.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --prompt-len 192 --shared-prefix 128
run_step 6 /tmp/r4_serve_cache.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --prompt-len 192 --shared-prefix 128 --prefix-cache 8

# 6b. decode breakdown: full step + in-situ ablations (VERDICT item 2)
run_step 6 /tmp/r4_breakdown2.log timeout 3600 python tools_dev/drive_decode_breakdown.py 4,5

# 7. len-256 prefill matrix
run_step 7 /tmp/r4_matrix.log bash tools_dev/run_bench_matrix.sh

# 8. speculative decode
run_step 8 /tmp/r4_spec.log timeout 2400 python tools_dev/drive_spec_bench.py
run_step 8 /tmp/r4_spec_draft.log env TMAC_SPEC_DRAFT=1 timeout 2400 python tools_dev/drive_spec_bench.py

# 9. MoE on hardware
run_step 9 /tmp/r4_moe_hw.log env TMAC_TEST_TPU=1 timeout 3000 python -m pytest tests/test_moe.py tests/test_expert_kernel.py -q
run_step 9 /tmp/r4_moe_dense.log timeout 2400 python -m tmac_tpu.tools.cli bench-e2e --model mixtral-8x7b --batch 1
run_step 9 /tmp/r4_moe_sel.log env TMAC_MOE_SELECT=1 timeout 2400 python -m tmac_tpu.tools.cli bench-e2e --model mixtral-8x7b --batch 1

# 10. full-size gguf interchange round trip
run_step 10 /tmp/r4_gguf_rt.log timeout 3600 python tools_dev/drive_gguf_roundtrip.py

# 11. long-context int8-KV + engine adaptive-chunk A/B
run_step 11 /tmp/r4_longctx.log timeout 3600 python tools_dev/drive_longctx_ab.py

# 12. parity reruns: rows 1-3 with the layer-bisect metric
for L in llama-2-7b-w4 bitnet-3b-w1.58 llama-2-7b-w2; do
  run_step 12 /tmp/r4_parity2_$L.log timeout 2700 \
    python -m tmac_tpu.tools.cli parity --presets $L --json parity_rows/$L.json
done
run_step 12 /tmp/r4_parity2_merge.log python - <<'EOF'
import glob, json
rows = []
for f in sorted(glob.glob("parity_rows/*.json")):
    rows.extend(json.load(open(f)))
json.dump(rows, open("parity_r04.json", "w"), indent=1)
print(f"re-merged {len(rows)} rows -> parity_r04.json")
EOF

# 13. extended autotune (prefill buckets, remaining presets)
for P in llama-3-8b phi-3-mini qwen2-7b trilm-3.9b; do
  run_step 13 /tmp/r4_autotune_$P.log timeout 3000 \
    python -m tmac_tpu.tools.autotune --preset $P --n 16 64 --iters 60
done

echo "[$(STAMP)] r4b runbook COMPLETE" | tee -a /tmp/r4_runbook.log
