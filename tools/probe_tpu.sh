#!/bin/bash
# Probe the tunneled TPU backend repeatedly; write status to /tmp/tpu_status.
# Each probe is a fresh python process with a hard timeout (the relay can
# hang jax.devices() indefinitely when down). Stops when /tmp/stop_probe
# exists (bench.py creates it so no probe program ever shares the chip with
# a timed measurement) or after two consecutive UP probes (relay stable).
up_streak=0
while true; do
  [ -f /tmp/stop_probe ] && { echo "STOPPED $(date +%s)" >> /tmp/tpu_status; exit 0; }
  if timeout 120 python -c "
import jax
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((8,)) + 1
import numpy as np
assert np.asarray(x)[0] == 2.0
print(d[0])
" > /tmp/tpu_probe_out 2>&1; then
    echo "UP $(date +%s) $(tail -1 /tmp/tpu_probe_out)" > /tmp/tpu_status
    up_streak=$((up_streak+1))
    [ $up_streak -ge 2 ] && exit 0
  else
    echo "DOWN $(date +%s)" > /tmp/tpu_status
    up_streak=0
  fi
  sleep 60
done
