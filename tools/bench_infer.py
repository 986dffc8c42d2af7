"""Inference/serving throughput benchmark.

Measures jit-compiled bf16 eval-step throughput for the two serving
shapes that matter:
  * cls@224 — MultiViT ViT-B + LinearOutputAdapter (ImageNet head),
    the classification serving path (reference run_finetuning_cls.py
    evaluate()).
  * semseg@512 — MultiViT rgb+depth + ConvNeXt decoder, the dense
    serving path (2049-token regime; exercises the fused attention
    kernel in inference).

Prints one JSON line per shape. Steps are chained through a scan carry
inside one jit, with a host transfer at the end, so the tunnel's async
dispatch cannot hide execution time.

Usage: python tools/bench_infer.py [--batch_cls 256] [--batch_seg 32]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_cls(batch, steps=20, arch="multivit_base"):
    import jax
    import jax.numpy as jnp

    from multimae_tpu.models import LinearOutputAdapter, PatchedInputAdapter
    from multimae_tpu.models.registry import create_model

    model = create_model(
        arch,
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16, image_size=224,
            )
        },
        output_adapters={
            "cls": functools.partial(
                LinearOutputAdapter, num_classes=1000, use_mean_pooling=True,
            )
        },
        dtype=jnp.bfloat16,
    )
    x = {"rgb": jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3))}
    params = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(1)}, x, train=False)[
            "params"]
    )()

    @jax.jit
    def run(p, x0):
        def body(c, _):
            logits = model.apply({"params": p}, {"rgb": c}, train=False)[
                "cls"]
            # fold the output back into the carry: keeps steps dependent
            c = c + 0.0 * logits.astype(c.dtype).sum() / (batch * 1000)
            return c, logits.astype(jnp.float32).mean()
        _, outs = jax.lax.scan(body, x0["rgb"], None, length=steps)
        return outs

    outs = run(params, x); _ = float(outs[-1])
    t0 = time.perf_counter()
    outs = run(params, x); _ = float(outs[-1])
    dt = time.perf_counter() - t0
    return batch * steps / dt


def bench_semseg(batch, steps=10, arch="multivit_base"):
    import jax
    import jax.numpy as jnp

    from multimae_tpu.models import ConvNeXtAdapter, PatchedInputAdapter
    from multimae_tpu.models.registry import create_model

    model = create_model(
        arch,
        input_adapters={
            t: functools.partial(
                PatchedInputAdapter, num_channels=c, stride_level=1,
                patch_size_full=16, image_size=512,
            )
            for t, c in [("rgb", 3), ("depth", 1)]
        },
        output_adapters={
            "semseg": functools.partial(
                ConvNeXtAdapter, num_classes=150, preds_per_patch=16,
                depth=4, embed_dim=6144, patch_size=16, main_tasks=("rgb",),
            )
        },
        dtype=jnp.bfloat16,
    )
    x = {
        "rgb": jax.random.normal(jax.random.PRNGKey(0), (batch, 512, 512, 3)),
        "depth": jax.random.normal(jax.random.PRNGKey(1), (batch, 512, 512, 1)),
    }
    params = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(2)}, x, train=False)[
            "params"]
    )()

    @jax.jit
    def run(p, x0):
        def body(c, _):
            pred = model.apply(
                {"params": p}, {"rgb": c, "depth": x0["depth"]},
                train=False)["semseg"]
            c = c + 0.0 * pred.astype(c.dtype).mean()
            return c, pred.astype(jnp.float32).mean()
        _, outs = jax.lax.scan(body, x0["rgb"], None, length=steps)
        return outs

    outs = run(params, x); _ = float(outs[-1])
    t0 = time.perf_counter()
    outs = run(params, x); _ = float(outs[-1])
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_cls", type=int, default=256)
    ap.add_argument("--batch_seg", type=int, default=32)
    ap.add_argument("--large", action="store_true",
                    help="also measure ViT-L (cls@224 + semseg@512; the "
                         "latter exercises the q-tiled fused block kernel)")
    args = ap.parse_args()

    from multimae_tpu.utils.jax_setup import setup_jax

    setup_jax()
    r = bench_cls(args.batch_cls)
    print(json.dumps({"metric": "infer_cls224_vitb", "value": round(r, 1),
                      "unit": "images/sec/chip"}))
    r = bench_semseg(args.batch_seg)
    print(json.dumps({"metric": "infer_semseg512_rgbd", "value": round(r, 1),
                      "unit": "images/sec/chip"}))
    if args.large:
        r = bench_cls(args.batch_cls, arch="multivit_large")
        print(json.dumps({"metric": "infer_cls224_vitl", "value": round(r, 1),
                          "unit": "images/sec/chip"}))
        r = bench_semseg(max(args.batch_seg // 2, 1), arch="multivit_large")
        print(json.dumps({"metric": "infer_semseg512_rgbd_vitl",
                          "value": round(r, 1), "unit": "images/sec/chip"}))


if __name__ == "__main__":
    main()
