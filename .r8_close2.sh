#!/bin/bash
cd /root/repo
SPARK_GRAFT_CPUS=7 python gate.py > GATE_r08_local7.txt 2> gate_err8c.log
echo "GATE local7 rc=$?" >> .r8_close.status
python bench.py > BENCH_r08_local.json 2> bench_err8.log
echo "BENCH rc=$?" >> .r8_close.status
SPARK_DRIVER_MEM=2g python bench.py > BENCH_lowmem_r08.json 2> bench_err8b.log
echo "LOWMEM rc=$?" >> .r8_close.status
echo DONE >> .r8_close.status
