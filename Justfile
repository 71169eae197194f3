# Developer entry points (mirrors the reference's Justfile surface with
# this repo's own deployment layout).

default:
    just --list

# Bring the spark-submit runner up against external spark/kafka networks.
up:
    docker compose -f docker/compose.yml up -d --build

down:
    docker compose -f docker/compose.yml down --volumes

logs:
    docker compose -f docker/compose.yml logs --follow

# Validate the eight-variable environment contract without starting Spark.
check-config:
    python3 -m ohlc_spark_streaming_spark --check-config

test:
    python3 -m pytest tests/ -x -q

# Live-broker round-trip (needs a reachable broker + spark-sql-kafka jars).
test-kafka-live bootstrap="localhost:9092":
    SPARK_GRAFT_KAFKA_BOOTSTRAP={{bootstrap}} python3 -m pytest tests/test_kafka_builders.py -q

bench:
    python3 bench.py

# After a clean idle-machine `just bench`: make its timings the
# regression baseline for the next round.
refresh-baseline round:
    python3 tools_refresh_baseline.py {{round}}

# Registry-wide plan lint (physical hazards + hard-broadcast-hint audit).
lint:
    python3 tools_lint.py

scale-check:
    python3 tools_scale_check.py --window --md SCALE.md

scale-check-all:
    python3 tools_scale_check.py --all --md SCALE.md --ledger /tmp/scale_ledger.jsonl

# Driver-contract replica: t1 smoke + strict DuckDB sweep at sf0.01.
verify:
    python3 tools_verify.py

# Exactly the 50-slot correctness window the driver will hash.
verify-window:
    python3 tools_verify.py --window
