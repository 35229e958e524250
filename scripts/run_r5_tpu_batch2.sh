#!/bin/bash
# Round-5 TPU batch 2: Swin-backward fix validation + remat_mlp sweeps +
# media-ingest rerun (cached jits). Strictly serialized (1 CPU core).
set -x
cd /root/repo

echo "=== 1. bisect swin backward compile (vmem-flag variants) ==="
timeout 2400 python scripts/bisect_swin_bwd.py

echo "=== 2. swin finetune parity (vmem options) ==="
timeout 2400 python scripts/bench_finetune_swin.py --parity

echo "=== 3. swin finetune flash b2/b8/b16 ==="
timeout 4800 python scripts/bench_finetune_swin.py --flash_only --iters 5 --batches 2 8 16

echo "=== 4. vit finetune remat_mlp (flash) b8/b12/b16 ==="
timeout 3600 python scripts/bench_finetune_flash.py --remat_mlp --flash_only --iters 5 --batches 8 12 16

echo "=== 5. vit finetune whole-block remat on the XLA path b8/b16 ==="
timeout 3600 python scripts/bench_finetune_flash.py --remat --iters 5 --batches 8 16

echo "=== 6. mae pretrain remat_mlp (flash) b8/b12/b16 ==="
timeout 3600 python scripts/bench_pretrain_flash.py --remat_mlp --flash_only --iters 5 --batches 8 12 16

echo "=== 7. mae pretrain whole-block remat (flash) b12/b16 retry ==="
timeout 3600 python scripts/bench_pretrain_flash.py --remat --flash_only --iters 5 --batches 12 16

echo "=== 8. media ingest A/B rerun (cached jits) ==="
timeout 5400 python scripts/bench_media_ingest.py --steps 25 --iters 3

echo "=== batch2 done ==="
