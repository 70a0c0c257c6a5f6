#!/usr/bin/env bash
# Bring up the observability stack (reference scripts/start_monitoring.sh:
# docker/podman compose up + health-wait on Prometheus/Grafana).
set -euo pipefail
cd "$(dirname "$0")/../monitoring"
COMPOSE="docker compose"
command -v docker >/dev/null || { command -v podman >/dev/null && COMPOSE="podman compose"; }
$COMPOSE up -d
for svc in "9090/-/ready Prometheus" "3000/api/health Grafana"; do
  port_path=${svc%% *}; name=${svc##* }
  for i in $(seq 1 60); do
    curl -fsS -m 2 "http://127.0.0.1:${port_path}" >/dev/null 2>&1 && { echo "$name ready"; break; }
    sleep 2
  done
done
echo "Grafana: http://localhost:3000 (anonymous)  Prometheus: http://localhost:9090"
