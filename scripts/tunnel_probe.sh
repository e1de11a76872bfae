#!/bin/bash
# Poll the axon TPU tunnel every 10 min; write UP/DOWN + timestamp to .tunnel_status.
# Probes are strictly sequential (one at a time) per tpu-env-quirks.
cd /root/repo
for i in $(seq 1 80); do
  if timeout 150 python -c "import jax; d=jax.devices(); assert d and d[0].platform=='tpu'" >/dev/null 2>&1; then
    echo "UP $(date -u +%FT%TZ)" > .tunnel_status
    exit 0
  else
    echo "DOWN $(date -u +%FT%TZ) probe=$i" > .tunnel_status
  fi
  sleep 600
done
