#!/bin/bash
# Round-5 measurement queue (one TPU process at a time; run AFTER the
# dynamics/4-order batch finishes).  Each run prints one JSON line.
set -x
cd /root/repo

# D=2 backward-block sweep at the headline operating point.
BENCH_BBN=512 BENCH_BBP=256 timeout 900 python bench.py \
  > /tmp/b_d2_bb512x256.json 2>/tmp/b_d2_bb512x256.err
BENCH_BBN=256 BENCH_BBP=512 timeout 900 python bench.py \
  > /tmp/b_d2_bb256x512.json 2>/tmp/b_d2_bb256x512.err

# Chunked D=2 at fine tiles (pair count scales (2r+t)^2; the round-2
# parity was pre-span/compression) with and without the ellipsoid cull.
BENCH_METHOD=chunked BENCH_TILE=0.04 timeout 900 python bench.py \
  > /tmp/b_d2_chunk04.json 2>/tmp/b_d2_chunk04.err
BENCH_METHOD=chunked BENCH_TILE=0.032 BENCH_ELLIP=1 timeout 900 python bench.py \
  > /tmp/b_d2_chunk032e.json 2>/tmp/b_d2_chunk032e.err

# 4-order D=3 re-measure (stale bf16-era row).
BENCH_D=3 BENCH_ORDERS=value,derivative,laplacian,third timeout 1800 \
  python bench.py > /tmp/b_d3_4ord.json 2>/tmp/b_d3_4ord.err

# Config-5 16M-sample D=3 shard re-measure (stale bf16-era row).
BENCH_P=500000 BENCH_N=16000000 BENCH_D=3 BENCH_C=1 BENCH_TILE=0.125 \
  BENCH_SPAN_F=4 BENCH_SPAN_B=4 BENCH_STEPS=3 timeout 3000 \
  python bench.py > /tmp/b_cfg5.json 2>/tmp/b_cfg5.err

# PIGS config-4 phase A re-confirm (94.4 ms/step row); short phase B.
T100K_STEPS=120 T100K_DSTEPS=8 timeout 3000 python tools/train_100k.py \
  > /tmp/b_pigs.json 2>/tmp/b_pigs.err
echo QUEUE_DONE
