#!/bin/bash
# Round-4 hardware runbook: executes VERDICT.md (round 3) measurement
# directives in priority order.  Serial (ONE axon client at a time); each
# step logs to /tmp and the script exits if the tunnel dies at a step
# boundary (resume with `bash tools_dev/run_r4_runbook.sh <step>`).
# A step whose command fails while the tunnel is up logs FAILED and the
# run continues.
#
# Priority order (VERDICT.md "Next round: do this"):
#   1  full-size parity table  -> parity_rows/*.json -> parity_r04.json
#   2  canonical decode bench  -> /tmp/r4_bench.log
#   3  decode breakdown + deferred-KV A/B
#   4  HW kernel gates (pytest -m tpu)
#   5  serving-shape autotune (writes tuned/tune_table.json)
#   6  bench-serve suite: baseline + int8-KV A/B + prefix-cache A/B
#   7  len-256 prefill matrix (all dense presets)
#   8  speculative decode benches (lookup + draft)
#   9  MoE decode A/B (dense-masked vs expert-select) + MoE HW gates
#  10  full-size gguf interchange round trip parity
set -u
cd /root/repo
START=${1:-1}
STAMP() { date -u +%H:%M:%S; }

probe() {
  timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
    >/dev/null 2>&1
}

run_step() {  # run_step <num> <log> <cmd...>
  local n=$1 log=$2; shift 2
  [ "$n" -lt "$START" ] && return 0
  if ! probe; then
    echo "[$(STAMP)] step $n ABORT (tunnel down; resume: run_r4_runbook.sh $n)" \
      | tee -a /tmp/r4_runbook.log
    exit 1
  fi
  echo "[$(STAMP)] step $n START: $*" | tee -a /tmp/r4_runbook.log
  if "$@" > "$log" 2>&1; then
    echo "[$(STAMP)] step $n DONE (log: $log)" | tee -a /tmp/r4_runbook.log
  else
    local rc=$?
    echo "[$(STAMP)] step $n FAILED rc=$rc (log: $log) -- continuing" \
      | tee -a /tmp/r4_runbook.log
  fi
}

echo "[$(STAMP)] r4 runbook start (from step $START)" | tee -a /tmp/r4_runbook.log

# 1. full-size parity, one preset per invocation so every completed row is
#    an artifact even if the window closes mid-table (VERDICT item 1)
mkdir -p parity_rows
for L in bitnet-3b-w1.58 llama-2-7b-w2 llama-2-7b-w4 llama-3-8b-w2 \
         llama-3.1-8b-w2 llama-3-8b-w3 phi-3-mini-w2 trilm-3.9b-w2 \
         qwen2-7b-w4 mixtral-8x7b-w2 qwen2-moe-w4; do
  run_step 1 /tmp/r4_parity_$L.log timeout 2700 \
    python -m tmac_tpu.tools.cli parity --presets $L --json parity_rows/$L.json
done
run_step 1 /tmp/r4_parity_merge.log python - <<'EOF'
import glob, json
rows = []
for f in sorted(glob.glob("parity_rows/*.json")):
    rows.extend(json.load(open(f)))
json.dump(rows, open("parity_r04.json", "w"), indent=1)
print(f"merged {len(rows)} rows -> parity_r04.json")
EOF

# 2. canonical decode bench (headline)
run_step 2 /tmp/r4_bench.log timeout 1200 python bench.py

# 3. decode breakdown table + deferred-KV A/B (VERDICT item 2)
run_step 3 /tmp/r4_breakdown.log timeout 2400 python tools_dev/drive_decode_breakdown.py
run_step 3 /tmp/r4_bench_defkv.log env TMAC_DEFERRED_KV=1 timeout 1200 python bench.py

# 4. hardware kernel gates
run_step 4 /tmp/r4_tpu_hw.log env TMAC_TEST_TPU=1 timeout 4500 python -m pytest tests/ -q -m tpu

# 5. serving-shape autotune (VERDICT item 3)
run_step 5 /tmp/r4_autotune.log bash tools_dev/run_autotune_serving.sh

# 6. bench-serve suite with the new table: baseline, int8-KV, prefix cache
run_step 6 /tmp/r4_serve.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b
run_step 6 /tmp/r4_serve_int8kv.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --kv-quant
run_step 6 /tmp/r4_serve_nocache.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --prompt-len 192 --shared-prefix 128
run_step 6 /tmp/r4_serve_cache.log timeout 2400 python -m tmac_tpu.tools.cli bench-serve --model bitnet-3b --prompt-len 192 --shared-prefix 128 --prefix-cache 8

# 7. len-256 prefill matrix for every dense preset (VERDICT missing #3)
run_step 7 /tmp/r4_matrix.log bash tools_dev/run_bench_matrix.sh

# 8. speculative decode benches (VERDICT item 5)
run_step 8 /tmp/r4_spec.log timeout 2400 python tools_dev/drive_spec_bench.py
run_step 8 /tmp/r4_spec_draft.log env TMAC_SPEC_DRAFT=1 timeout 2400 python tools_dev/drive_spec_bench.py

# 9. MoE on hardware (VERDICT item 6)
run_step 9 /tmp/r4_moe_hw.log env TMAC_TEST_TPU=1 timeout 3000 python -m pytest tests/test_moe.py tests/test_expert_kernel.py -q
run_step 9 /tmp/r4_moe_dense.log timeout 2400 python -m tmac_tpu.tools.cli bench-e2e --model mixtral-8x7b --batch 1 8
run_step 9 /tmp/r4_moe_sel.log env TMAC_MOE_SELECT=1 timeout 2400 python -m tmac_tpu.tools.cli bench-e2e --model mixtral-8x7b --batch 1 8

# 10. full-size gguf interchange round trip (VERDICT item 8)
run_step 10 /tmp/r4_gguf_rt.log timeout 3600 python tools_dev/drive_gguf_roundtrip.py

# 11. int8-KV long-context A/B (VERDICT item 7): ctx-8192 single stream
run_step 11 /tmp/r4_longctx.log timeout 3000 python tools_dev/drive_longctx_ab.py

echo "[$(STAMP)] r4 runbook COMPLETE" | tee -a /tmp/r4_runbook.log
