#!/bin/bash
# Throughput measurement (reference measure_speed.sh): batch 128, warmup 5.
python speed.py --mode dense --batch_size 128
python speed.py --mode mask --batch_size 128
python speed.py --mode dispatch --batch_size 128
python bench.py
