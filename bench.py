"""Benchmark: MultiMAE ViT-B RGB+D+S pretrain train-step throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (SURVEY.md §6), so the
baseline is this repo's own first recorded measurement, persisted to
BENCH_BASELINE.json on first run; later rounds report speedup vs that.

Measures the FULL jitted training step (masking + fwd + bwd + AdamW) for
the flagship recipe shapes: batch 128/chip, 224px, 98/589 visible
tokens, bf16 compute with fp32 semseg adapter — i.e. the hot loop of
cfgs/pretrain/multimae-b_98_rgb+-depth-semseg_1600e.yaml.

`python bench.py --large` measures pretrain_multimae_large (ViT-L
encoder) at batch 64/chip instead, with its own pinned baseline
(BENCH_BASELINE_LARGE.json).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# --large: same measurement for pretrain_multimae_large (ViT-L encoder,
# 1024/24/16) at batch 64/chip, reported as its own metric with its own
# pinned first-run baseline. The default (driver) contract is untouched.
LARGE = "--large" in sys.argv[1:]
_BASE_NAME = "BENCH_BASELINE_LARGE.json" if LARGE else "BENCH_BASELINE.json"
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             _BASE_NAME)
BATCH = int(os.environ.get("MULTIMAE_TPU_BENCH_BATCH",
                           "64" if LARGE else "128"))
STEPS = 20
WARMUP = 3


def main():
    import threading

    from multimae_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax

    # Backend init goes through the axon tunnel; when the tunnel is
    # down, make_c_api_client blocks FOREVER (see CLAUDE.md platform
    # gotchas). Fail fast and legibly instead of eating the caller's
    # whole timeout; the parent process (below) retries rc=3 with
    # backoff so one transient flap doesn't void the round.
    def _die(phase, secs):
        sys.stderr.write(
            f"bench.py: {phase} timed out after {secs} s — the axon "
            "TPU tunnel is unreachable or hung (infra, not the bench)\n")
        os._exit(3)

    watchdog = threading.Timer(180, _die, ("jax backend init", 180))
    watchdog.daemon = True
    watchdog.start()
    jax.devices()
    watchdog.cancel()
    # Second watchdog: a tunnel flap mid-compile/mid-run also blocks
    # forever (in block_until_ready). First compile through the tunnel
    # is ~5 min; 1200 s is generous for compile + 23 steps.
    watchdog = threading.Timer(1200, _die, ("bench compile/run", 1200))
    watchdog.daemon = True
    watchdog.start()
    import jax.numpy as jnp

    from multimae_tpu.cli.factory import (
        build_pretrain_losses,
        build_pretrain_model,
        make_synthetic_batch,
    )
    from multimae_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from multimae_tpu.train.optim_factory import create_optimizer
    from multimae_tpu.train.pretrain_step import (
        jit_data_parallel,
        make_pretrain_train_step,
    )
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.task_balancing import build_balancer
    from multimae_tpu.train.train_state import TrainState

    n_chips = jax.device_count()
    mesh = create_mesh()
    batch_size = BATCH * n_chips
    if BATCH > 128:
        # mirror the CLI policy (run_pretraining_multimae.py): large
        # per-chip batches save bf16 probs instead of rematerializing
        from multimae_tpu.ops.attention import set_light_attention_residuals

        set_light_attention_residuals(True)

    model = build_pretrain_model(
        model_name=("pretrain_multimae_large" if LARGE
                    else "pretrain_multimae_base"),
        dtype=jnp.bfloat16, fp32_output_adapters=("semseg",),
        decoder_return_patches=True,
    )
    losses = build_pretrain_losses(("rgb", "depth", "semseg"))
    batch = make_synthetic_batch(batch_size)

    out_tasks = ("rgb", "depth", "semseg", "norm_rgb")
    balancer = build_balancer("uncertainty", out_tasks)
    model_params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            jax.tree.map(lambda x: x[:2], batch),
            num_encoded_tokens=98,
        )["params"]
    )()
    bal_params = balancer.init(
        jax.random.PRNGKey(0), {t: jnp.zeros(()) for t in out_tasks}
    )["params"]
    params = {"model": model_params, "balancer": bal_params}

    lr_sched = as_optax_schedule(
        cosine_scheduler(8e-4, 0.0, epochs=1600, niter_per_ep=100, warmup_epochs=40)
    )
    tx = create_optimizer(
        params, opt="adamw", lr_schedule=lr_sched, weight_decay=0.05,
        opt_betas=(0.9, 0.95), filter_bias_and_bn=False,
    )
    state = TrainState.create(params=params, tx=tx)
    state = state.replace(
        params=replicate(state.params, mesh),
        opt_state=replicate(state.opt_state, mesh),
    )

    step_fn = make_pretrain_train_step(
        model, balancer, losses,
        num_encoded_tokens=98, in_domains=("rgb", "depth", "semseg"),
        extra_norm_pix_loss=True,
    )
    dp_step = jit_data_parallel(step_fn, mesh)
    batch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)

    for _ in range(WARMUP):
        state, metrics = dp_step(state, batch, rng)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = dp_step(state, batch, rng)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    samples_per_sec = batch_size * STEPS / dt
    per_chip = samples_per_sec / n_chips

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)["value"]
    else:
        base = per_chip
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {"value": per_chip, "unit": "samples/sec/chip",
                 "note": "first recorded run; reference publishes no throughput"},
                f,
            )

    watchdog.cancel()
    print(json.dumps({
        "metric": ("pretrain_vitl_rgbds_throughput" if LARGE
                   else "pretrain_vitb_rgbds_throughput"),
        "value": round(per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(per_chip / base, 4),
    }))


def retry_wrapper():
    """Run the bench in a child process, retrying rc=3 (tunnel-init or
    mid-run hang) with backoff. The hang is inside a C call
    (make_c_api_client / block_until_ready), so retry MUST be a fresh
    process — the stuck backend can't be reinitialized in-process."""
    import subprocess

    attempts = int(os.environ.get("MULTIMAE_TPU_BENCH_ATTEMPTS", "3"))
    backoff = int(os.environ.get("MULTIMAE_TPU_BENCH_BACKOFF_S", "60"))
    env = dict(os.environ, _MULTIMAE_BENCH_CHILD="1")
    for i in range(attempts):
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env=env,
        ).returncode
        if rc != 3:
            sys.exit(rc)
        if i < attempts - 1:
            sys.stderr.write(
                f"bench.py: attempt {i + 1}/{attempts} hit a tunnel "
                f"timeout; retrying in {backoff} s\n")
            time.sleep(backoff)
    sys.exit(3)


if __name__ == "__main__":
    if os.environ.get("_MULTIMAE_BENCH_CHILD") == "1":
        main()
    else:
        retry_wrapper()
