#!/usr/bin/env bash
# Full test suite in six sequential chunks, each comfortably under a
# 10-minute harness/CI timeout (the one-shot `pytest tests/` run takes
# ~20 min: 330 oracle differentials + property tests + streaming +
# codecs + the registry-wide plan walkers). Chunks partition tests/
# exactly — no file runs twice, none is skipped; a file added later
# lands in chunk D via the ignore-list construction. r9 rebalance:
# property tests split out of C into their own chunk F after C
# (streaming + properties) solo-timed 7:44 on the r9 box (threshold
# 6:00; the box ran at ~2/3 effective cores, but the split keeps a
# margin on any box). r8 solo times for the other chunks: A 3:31,
# B 3:10, D 3:19, E ~4:00.
set -euo pipefail
cd "$(dirname "$0")/.."

CHUNK_A="tests/test_oracle.py"
CHUNK_B="tests/test_bloom_filter.py tests/test_bucketed_join.py \
tests/test_cleaning.py tests/test_cli_logging.py tests/test_curation.py \
tests/test_curation_depth.py tests/test_dedup_similarity.py \
tests/test_diff.py tests/test_external_io.py tests/test_graph.py \
tests/test_hn_pipeline.py tests/test_incremental_marts.py \
tests/test_kafka_seam.py tests/test_maintenance.py"
CHUNK_C="tests/test_stateful_streaming.py"
CHUNK_E="tests/test_plan_contracts.py"
CHUNK_F="tests/test_properties.py"

echo "== chunk A: oracle differentials =="
python -m pytest $CHUNK_A -q
echo "== chunk B: operator/unit tests (bloom..maintenance) =="
python -m pytest $CHUNK_B -q
echo "== chunk C: streaming tests =="
python -m pytest $CHUNK_C -q
echo "== chunk D: remainder =="
python -m pytest tests/ -q --ignore=tests/test_oracle.py \
  $(for f in $CHUNK_B $CHUNK_C $CHUNK_E $CHUNK_F; do printf -- "--ignore=%s " "$f"; done)
echo "== chunk E: registry-wide plan + schema contracts =="
python -m pytest $CHUNK_E -q
echo "== chunk F: property tests =="
python -m pytest $CHUNK_F -q
echo "== suite green =="
