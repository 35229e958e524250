#!/bin/bash
# Round-5 TPU batch 2: Swin-backward bisect + remat_mlp measurements.
set -x
cd /root/repo

echo "=== 1. bisect swin backward compile ==="
timeout 2400 python scripts/bisect_swin_bwd.py

echo "=== 2. swin finetune parity + A/B (fixed backward) ==="
timeout 2400 python scripts/bench_finetune_swin.py --parity
timeout 3600 python scripts/bench_finetune_swin.py --iters 5 --batches 2 8 16

echo "=== 3. vit finetune remat_mlp (flash) b8/b12/b16 ==="
timeout 3600 python scripts/bench_finetune_flash.py --remat_mlp --flash_only --iters 5 --batches 8 12 16

echo "=== 4. vit finetune whole-block remat on the XLA path (b8/b16) ==="
timeout 3600 python scripts/bench_finetune_flash.py --remat --iters 5 --batches 8 16

echo "=== 5. mae pretrain remat_mlp (flash) b8/b12/b16 ==="
timeout 3600 python scripts/bench_pretrain_flash.py --remat_mlp --flash_only --iters 5 --batches 8 12 16

echo "=== batch2 done ==="
