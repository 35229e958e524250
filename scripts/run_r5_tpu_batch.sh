#!/bin/bash
# Round-5 serialized TPU measurement batch (one job at a time: 1 CPU core
# + relay tracing contention, CLAUDE.md). Each stage its own process.
set -x
cd /root/repo

echo "=== 1. swin finetune parity (flash backward on chip) ==="
timeout 2400 python scripts/bench_finetune_swin.py --parity

echo "=== 2. swin finetune A/B flash vs xla ==="
timeout 3600 python scripts/bench_finetune_swin.py --iters 5 --batches 2 8 16

echo "=== 3. vit finetune remat at b8/b12/b16 (flash) ==="
timeout 3600 python scripts/bench_finetune_flash.py --remat --flash_only --iters 5 --batches 8 12 16

echo "=== 4. mae pretrain remat at b8/b12/b16 (flash) ==="
timeout 3600 python scripts/bench_pretrain_flash.py --remat --flash_only --iters 5 --batches 8 12 16

echo "=== 5. media ingest A/B (upload-inclusive) ==="
timeout 3600 python scripts/bench_media_ingest.py --steps 25 --iters 3

echo "=== 6. dropout mask fold A/B (detection bits=8) ==="
timeout 2400 python scripts/bench_dropout_ab.py --task detection --bits 8
TIM_TPU_DROPOUT_MUL=1 timeout 2400 python scripts/bench_dropout_ab.py --task detection --bits 8

echo "=== 7. headline bench ==="
timeout 3600 python bench.py

echo "=== batch done ==="
