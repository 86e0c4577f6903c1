#!/bin/bash
# Prioritized measurement queue for when the TPU relay is up.
# Serial (NEVER two programs on the chip at once — see round-2 notes),
# per-step timeouts, re-entrant: completed steps leave a marker in
# $DIR and are skipped on re-run after a relay drop.
#
# Usage: bash tools/chip_session.sh [step ...]   (default: all, in order)
set -u
cd /root/repo
DIR=/tmp/chip_session
mkdir -p "$DIR"
touch /tmp/stop_probe   # no concurrent probe programs during measurement

run() { # run <name> <timeout> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -f "$DIR/$name.done" ]; then echo "== $name: already done"; return 0; fi
  echo "== $name (timeout ${t}s): $*"
  local t0=$SECONDS
  if timeout "$t" "$@" > "$DIR/$name.log" 2>&1; then
    touch "$DIR/$name.done"
    echo "== $name OK ($((SECONDS-t0))s)"; tail -3 "$DIR/$name.log"
  else
    echo "== $name FAILED rc=$? ($((SECONDS-t0))s)"; tail -5 "$DIR/$name.log"
  fi
}

STEPS=("$@")
sel() { [ ${#STEPS[@]} -eq 0 ] || [[ " ${STEPS[*]} " == *" $1 "* ]]; }

# 1. Compiled-kernel correctness gate (Mosaic lowering of supers/mxu paths)
sel kerneltests && run kerneltests 900 \
  env RTT_TEST_PLATFORM=tpu python -m pytest \
  tests/test_pallas.py tests/test_fused.py tests/test_blocked.py -x -q

# 2. Resident-kernel A/B: MT engine + two-level prepass (decides defaults)
sel abmain && run abmain 1800 \
  python tools/ab_kernel.py 6 base mxu sup8 sup8+mxu \
  sup8+cl32+mxu sup16+cl32 base@bounce1c mxu@bounce1c \
  sup8+cl32+mxu@bounce1c sup16+cl64@bounce1c

# 3. Winner-extraction A/B + attrs path with the new engines
sel abattrs && run abattrs 1500 \
  python tools/ab_kernel.py 6 base+attrs mxu+attrs exmxu+attrs \
  mxu+exmxu+attrs sup8+cl32+mxu+attrs

# 4. Backward profile: MXU scatter kernel vs XLA scatter (VERDICT #2)
sel bwd && run bwd 1800 python tools/profile_bwd.py

# 5. Headline bench (fwd, fwd+bwd, parity, textured)
sel bench && run bench 3600 python bench.py

# 6. Streaming-kernel block-lists A/B (VERDICT #5)
sel blocked && run blocked 1800 python tools/bench_blocked.py

# 2b. Whole-frame extract + supers/cluster A/B (the headline config)
sel abframe && run abframe 2400 \
  python tools/ab_frame.py 16 "EXTRACT=sum" "EXTRACT=mxu" \
  "EXTRACT=sum,SUPERS=16,CLUSTER=32" "EXTRACT=mxu,SUPERS=16,CLUSTER=32"

# 2c. Remaining intersect-only A/B: sup16+cl32 on attrs + bounce-1
sel abmain2 && run abmain2 1800 \
  python tools/ab_kernel.py 6 sup16+cl32+attrs sup16+cl32+exmxu+attrs \
  exmxu+attrs@bounce1c sup16+cl32+exmxu+attrs@bounce1c \
  sup16+cl32@bounce1c sup24+cl32+exmxu+attrs

# 4b. Single-chunk backward ablations (r4: rep-scanned r_ pieces — the
# single-launch pieces carry a ~33 ms relay-sync floor, see PERF_NOTES)
sel bwdchunk && run bwdchunk 2400 \
  env PROF_ONLY=r_fwd,r_grad,r_grad_remat,r_fwd_intersect,r_vjp_intersect,r_rows_grad,r_scatter_mxu \
  python tools/profile_bwd.py

# 4c. Whole-frame gradient programs (the bench fwd+bwd configuration)
sel bwdframe && run bwdframe 2400 \
  env PROF_ONLY=fwd,grad_full,grad_chunked4,grad_remat \
  python tools/profile_bwd.py

# 6b. Streaming block-lists OFF (the A/B against the default-on numbers)
sel blockedab && run blockedab 1200 \
  python tools/bench_blocked.py 4 9 160 8192:nolists

# 6c. Streaming in-block supers A/B (r4 third hierarchy level)
sel blockedsup && run blockedsup 2400 \
  python tools/bench_blocked.py 4 9 160 "8192,8192+SUPERS=0"

# 7. Inverse-rendering north star (VERDICT #9)
sel invert && run invert 3600 python tools/invert_teapot.py

# 8. Scaling (single real chip: 1-chip point + harness sanity)
sel scaling && run scaling 1200 python tools/scaling_bench.py

echo "== chip_session complete; logs in $DIR"
