#!/bin/bash
# Poll the TPU tunnel; after TWO consecutive healthy probes (guards against
# half-recovered states), run the round-3 measurement campaign.
cd "$(dirname "$0")/.."
mkdir -p logs
ok=0
while [ "$ok" -lt 2 ]; do
  if timeout 120 python - <<'PY' >> logs/probe_auto.log 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
(x @ x).block_until_ready()
print("probe ok")
PY
  then
    ok=$((ok + 1))
    echo "$(date -u) probe success ($ok/2)" >> logs/probe_auto.log
    sleep 30
  else
    ok=0
    echo "$(date -u) probe failed" >> logs/probe_auto.log
    sleep 270
  fi
done
echo "$(date -u) TUNNEL HEALTHY — starting campaign" >> logs/probe_auto.log
bash scripts/round3_campaign.sh > logs/campaign_auto.log 2>&1
echo "$(date -u) CAMPAIGN DONE rc=$?" >> logs/probe_auto.log
