"""Quick block-size probe for the fast sweep on TPU (no CPU baseline).

    nohup python scripts/bench_block.py > /tmp/bench_block.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402

import bench  # noqa: E402
from ldweaver_tpu.core.snp_tensor import SnpData  # noqa: E402
from ldweaver_tpu.parallel.fast_sweep import fast_lr_topk, prepare_fast_sweep  # noqa: E402

NSNP = int(os.environ.get("BENCH_NSNP", 131072))
codes, pos, uqe, r, w = bench.synth(NSNP, 1024)
acgtn = np.zeros((5, codes.shape[1]), np.int64)
for k in range(5):
    acgtn[k] = (codes == k).sum(axis=0)
sd = SnpData(codes=codes, pos=pos, g=bench.G,
             seq_names=[str(i) for i in range(codes.shape[0])],
             acgtn_table=acgtn, uqe=uqe, r=r)

for blk in (4096, 8192):
    state = prepare_fast_sweep(sd, w, block=blk)
    fast_lr_topk(sr_dist=20000, topk=1024, state=state)  # compile+warm
    t0 = time.time()
    fast_lr_topk(sr_dist=20000, topk=1024, state=state)
    wall = time.time() - t0
    pairs = NSNP * (NSNP - 1) / 2
    print(f"block {blk}: {wall:.3f} s  {pairs/wall/1e9:.2f} G pairs/s",
          flush=True)
print("done", flush=True)
