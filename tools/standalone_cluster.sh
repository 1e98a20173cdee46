#!/bin/bash
# Local Spark standalone cluster: 1 master + 4 workers x 8 cores (separate
# executor JVMs — the honest sandbox stand-in for a multi-executor cluster).
# Usage: tools/standalone_cluster.sh start|stop
set -e
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_MASTER_HOST=127.0.0.1
export SPARK_LOG_DIR=/tmp/spark-logs
export SPARK_WORKER_DIR=/tmp/spark-work
# executors take their local (shuffle/spill) dirs from the WORKER env in
# standalone mode — a driver-side spark.local.dir is ignored with a warning.
# Keep shuffle in RAM: the sandbox's virtio disk has host-weather latency.
export SPARK_LOCAL_DIRS=/dev/shm/spark-local

case "$1" in
  start)
    "$SPARK_HOME/sbin/start-master.sh" --host 127.0.0.1 --port 7077 --webui-port 8091
    sleep 4
    for i in 1 2 3 4; do
      "$SPARK_HOME/sbin/spark-daemon.sh" start org.apache.spark.deploy.worker.Worker "$i" \
        --cores 8 --memory 24g --host 127.0.0.1 --webui-port 809$((i+1)) \
        spark://127.0.0.1:7077
    done
    sleep 5
    curl -s http://127.0.0.1:8091/json/ | python -c \
      "import json,sys; d=json.load(sys.stdin); print('workers:', len(d['workers']), 'cores:', d['cores'])"
    ;;
  stop)
    for i in 1 2 3 4; do
      "$SPARK_HOME/sbin/spark-daemon.sh" stop org.apache.spark.deploy.worker.Worker "$i" || true
    done
    "$SPARK_HOME/sbin/stop-master.sh" || true
    ;;
  *) echo "usage: $0 start|stop"; exit 1;;
esac
