import sys, time
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/.bench_score_sweep.py").read().split("sa = smart_low_precision_score_arguments()")[0])

import numpy as np
from kronfluence_tpu.utils.platform import fetch_tree
from kronfluence_tpu.utils.common.score_arguments import smart_low_precision_score_arguments

factors = fetch_tree(factors)
eigen = lam = None
import gc; gc.collect()
N_TRAIN = 2048
for QB, ACC, TB in [(10, 4, 16), (8, 6, 16), (8, 7, 16), (14, 4, 16), (8, 6, 32)]:
    sa = smart_low_precision_score_arguments()
    sa.query_gradient_accumulation_steps = ACC
    BLOCK = QB * ACC
    try:
        qd = make_data(BLOCK, 5)
        warm = compute_pairwise_scores_with_loaders(
            model, params, task, BatchLoader(qd, QB), BatchLoader(make_data(2*TB, 6), TB),
            factors, fa, sa)
        t0 = time.time()
        res = compute_pairwise_scores_with_loaders(
            model, params, task, BatchLoader(qd, QB), BatchLoader(make_data(N_TRAIN, 7), TB),
            factors, fa, sa)
        dt = time.time() - t0
        print(f"QB={QB} acc={ACC} (block {BLOCK}) TB={TB}: {BLOCK*N_TRAIN/dt:.0f} pairs/s  ({dt:.1f}s)", flush=True)
    except Exception as e:
        print(f"QB={QB} acc={ACC} (block {BLOCK}) TB={TB}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
