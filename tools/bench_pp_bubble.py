"""GPipe bubble vs microbatch count, measured on the 8-device CPU mesh.

The GPipe schedule in parallel/pp.py runs M+S-1 ticks for M microbatches
over S stages, so the idle ("bubble") fraction is (S-1)/(M+S-1) and the
per-step cost model is

    t(M) ~= t_hop_overhead * (M + S - 1) + t_compute        (fixed work)

This tool fits that model empirically at ViT-L DEPTH (24 encoder blocks,
tiny width so the CPU backend can turn it around) on a (data 2, stage 4)
simulated mesh, sweeping --pipeline_microbatches. The relative shape of
the curve — not the absolute CPU milliseconds — is the evidence: per-tick
overhead amortizes exactly as (M+S-1)/M predicts, so on real chips (where
per-tick time is dominated by the stage's block compute) the analytic
bubble column is the efficiency statement. Results table: SCALING.md.

Usage: python tools/bench_pp_bubble.py [--stage 4] [--depth 24]
       [--batch 32] [--micros 1,2,4,8,16] [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=4)
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--micros", default="1,2,4,8,16")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    # CPU with 8 simulated devices (PP needs a multi-device mesh; the
    # axon tunnel exposes one real chip). Both the env var and the
    # config update are required (CLAUDE.md platform gotchas).
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimae_tpu.parallel import pp
    from multimae_tpu.parallel.mesh import shard_batch, use_constraint_mesh
    from multimae_tpu.train.train_state import TrainState
    from test_tp import _build_setup  # tiny pretrain step harness
    from test_train_step import make_batch

    params, tx, step_fn, _ = _build_setup(depth=args.depth)
    batch = make_batch(b=args.batch)
    mesh = pp.create_pp_mesh(stage=args.stage)
    s = args.stage
    micros = [int(m) for m in args.micros.split(",")]

    print(f"# stage={s} depth={args.depth} batch={args.batch} "
          f"(data={mesh.shape['data']}) tiny-width CPU mesh")
    print("| M | ticks M+S-1 | analytic bubble | ms/step | "
          "ms/step x M/(M+S-1) |")
    print("|---|---|---|---|---|")
    for m in micros:
        pp.use_pipeline(None)
        use_constraint_mesh(None)
        state = TrainState.create(
            params=jax.tree.map(jnp.array, params), tx=tx)
        step = pp.jit_pp(step_fn, mesh, n_micro=m)
        sb = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(0)
        state, metrics = step(state, sb, rng)  # compile
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, sb, rng)
        jax.block_until_ready(metrics["loss"])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        bubble = (s - 1) / (m + s - 1)
        # last column: cost with the bubble ticks removed — what a
        # bubble-free schedule of the same per-tick cost would take
        print(f"| {m} | {m + s - 1} | {bubble:.3f} | {ms:.1f} | "
              f"{ms * m / (m + s - 1):.1f} |")
    pp.use_pipeline(None)


if __name__ == "__main__":
    main()
