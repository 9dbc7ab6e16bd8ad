#!/bin/bash
# Probe the axon TPU tunnel every 10 min; exit 0 the moment it is up.
# Writes /tmp/tpu_up when live. Bounded at ~11h (66 iterations).
for i in $(seq 1 66); do
  if timeout 90 python -c "import jax; ds=jax.devices(); assert ds; print(ds)" >/tmp/tpu_probe.log 2>&1; then
    date > /tmp/tpu_up
    echo "TPU UP at iteration $i"
    exit 0
  fi
  sleep 600
done
echo "TPU never came up in 66 probes"
exit 1
