"""Pre-warm the bench's fused DN+DR compile cache (VERDICT r4 item 7).

Session resets wipe /root/repo/.jax_cache; a cold remote compile of the
parallel-lanes DR graph has taken ~630s — past the driver's 590s bench
budget — so a wiped cache could produce an empty BENCH row for reasons
unrelated to the code. This stage builds bench.py's EXACT workload
(bench.build_bench_strategy — identical HLO, so the persistent-cache keys
hit), compiles both fused phases, runs one epoch, and exits. Run it in the
TPU queue any time before bench.py; afterwards bench warms in ~4 min
instead of ~10 (the 602MB lanes executable deserializes at tunnel speed —
r5 measured 236.9s pure-hit warmup vs 630s cold compile; PERF.md r5
calibration note).

TPU single-client: run alone.
  timeout 1800 python scripts/prewarm_bench.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import bench


def main():
    bench.enable_compile_cache()
    import jax

    t0 = time.time()
    _, strat, _ = bench.build_bench_strategy()
    bench.log("prewarm: compiling fused DN+DR phases...")
    strat.prepare_fused()
    strat.run_fused_epoch()
    # axon: block_until_ready unreliable — scalar readback fences the chain
    float(jax.tree_util.tree_leaves(strat._spec_stack)[3].sum())
    bench.log(f"prewarm: fused DN+DR compiled + 1 epoch in "
              f"{time.time()-t0:.1f}s; .jax_cache populated")


if __name__ == "__main__":
    main()
