#!/bin/bash
# Chip-day queue: run the chip-gated validation/bench jobs in priority
# order, each under a timeout, logging to /tmp/chipq_*.log.  Safe to
# re-run; later steps still run if earlier ones fail.
cd /root/repo
set -x
timeout 2400 python tools/chip_parity.py > /tmp/chipq_parity.log 2>&1
echo "chip_parity rc=$?"
timeout 3600 python tools/chain_scale_bench.py --workdir /tmp/chain_scale \
    > /tmp/chipq_chain.log 2>&1
echo "chain_scale rc=$?"
timeout 5400 python tools/bsw_scale_bench.py --workdir /tmp/bsw_scale \
    > /tmp/chipq_bsw.log 2>&1
echo "bsw_scale rc=$?"
timeout 2400 python tools/run_suite.py > /tmp/chipq_suite.log 2>&1
echo "run_suite rc=$?"
timeout 2400 python bench.py > /tmp/chipq_bench.log 2>&1
echo "bench rc=$?"
