import sys, time
sys.path.insert(0, "/root/repo")
exec(open("/root/repo/.bench_score_sweep.py").read().split("sa = smart_low_precision_score_arguments()")[0])

from kronfluence_tpu.utils.common.score_arguments import smart_low_precision_score_arguments
N_TRAIN = 2048
for QB, TB, remat in [(32, 32, False), (48, 16, False), (40, 32, True), (64, 16, True), (56, 16, False)]:
    sa = smart_low_precision_score_arguments()
    sa.offload_activations_to_cpu = remat
    try:
        qd = make_data(QB, 5)
        warm = compute_pairwise_scores_with_loaders(
            model, params, task, BatchLoader(qd, QB), BatchLoader(make_data(2*TB, 6), TB),
            factors, fa, sa)
        t0 = time.time()
        res = compute_pairwise_scores_with_loaders(
            model, params, task, BatchLoader(qd, QB), BatchLoader(make_data(N_TRAIN, 7), TB),
            factors, fa, sa)
        dt = time.time() - t0
        print(f"QB={QB} TB={TB} remat={remat}: {QB*N_TRAIN/dt:.0f} pairs/s  ({dt:.1f}s)", flush=True)
    except Exception as e:
        print(f"QB={QB} TB={TB} remat={remat}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
try:
    import jax
    print(jax.devices()[0].memory_stats())
except Exception as e:
    print("memory_stats unavailable:", e)
