#!/usr/bin/env python
"""MultiMAE inpainting demo (script version of the reference's
MultiMAE_Demo.ipynb).

Loads a pretrained checkpoint (released .pth or our .msgpack), feeds an
RGB(+depth+semseg) example, masks it randomly — or with user-chosen
visible patches via --visible_patches / make_mask — and writes the
per-task reconstructions as PNGs.

Example:
    python demo.py --checkpoint multimae-b_98_rgb+-depth-semseg_1600e.pth \
        --rgb my_image.jpg --depth my_depth.png --semseg my_semseg.png \
        --num_encoded_tokens 98 --out_dir demo_out
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args():
    p = argparse.ArgumentParser("MultiMAE demo")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--rgb", required=True, help="RGB image path")
    p.add_argument("--depth", default=None, help="16-bit depth PNG (optional)")
    p.add_argument("--semseg", default=None, help="palette semseg PNG (optional)")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--num_encoded_tokens", type=int, default=98)
    p.add_argument("--alphas", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--visible_rgb", type=str, default=None,
                   help="comma-separated x,y pairs of visible RGB patches, "
                        "e.g. '0,0 1,0 7,7' (switches to manual masking)")
    p.add_argument("--out_dir", default="demo_out")
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from multimae_tpu.cli.factory import build_pretrain_model
    from multimae_tpu.ops.masking import make_mask
    from multimae_tpu.train.checkpoint import load_pretrained_torch
    from multimae_tpu.utils.data_constants import (
        IMAGENET_DEFAULT_MEAN,
        IMAGENET_DEFAULT_STD,
    )

    s = args.input_size
    mean = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32)
    std = np.asarray(IMAGENET_DEFAULT_STD, np.float32)

    inputs = {}
    rgb = Image.open(args.rgb).convert("RGB").resize((s, s), Image.BICUBIC)
    rgb = np.asarray(rgb, np.float32) / 255.0
    inputs["rgb"] = jnp.asarray(((rgb - mean) / std)[None])
    in_domains = ["rgb"]
    if args.depth:
        depth = Image.open(args.depth).resize((s, s))
        depth = np.asarray(depth, np.float32)
        # robust standardization like the demo
        from multimae_tpu.train.pretrain_step import standardize_depth

        inputs["depth"] = standardize_depth(jnp.asarray(depth[None, ..., None]))
        in_domains.append("depth")
    if args.semseg:
        semseg = Image.open(args.semseg).convert("P").resize(
            (s // 4, s // 4), Image.NEAREST
        )
        inputs["semseg"] = jnp.asarray(np.asarray(semseg, np.int32)[None])
        in_domains.append("semseg")

    model = build_pretrain_model(
        in_domains=in_domains, out_domains=in_domains,
        extra_norm_pix_loss=False, input_size=s,
    )
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            inputs, num_encoded_tokens=args.num_encoded_tokens,
        )
    )["params"]
    template = jax.tree.map(lambda x: jnp.zeros(x.shape, x.dtype), template)
    if args.checkpoint.endswith(".pth"):
        params, report = load_pretrained_torch(args.checkpoint, template)
    else:
        import flax

        with open(args.checkpoint, "rb") as f:
            payload = flax.serialization.msgpack_restore(f.read())
        src = payload["params"].get("model", payload["params"])
        params = flax.serialization.from_state_dict(template, src)

    task_masks = None
    if args.visible_rgb:
        n = s // 16
        coords = [tuple(map(int, c.split(","))) for c in args.visible_rgb.split()]
        task_masks = make_mask(
            n, n, {d: (coords if d == "rgb" else []) for d in in_domains}
        )
        num_visible = int(
            sum((np.asarray(m) == 0).sum() for m in task_masks.values())
        )
    else:
        num_visible = args.num_encoded_tokens

    preds, masks = model.apply(
        {"params": params}, inputs,
        mask_inputs=True, task_masks=task_masks,
        num_encoded_tokens=num_visible, alphas=args.alphas,
        rngs={"masking": jax.random.PRNGKey(args.seed)},
    )

    os.makedirs(args.out_dir, exist_ok=True)
    for task, pred in preds.items():
        arr = np.asarray(pred[0], np.float32)
        if task == "rgb":
            arr = np.clip(arr * std + mean, 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8), "RGB").save(
                os.path.join(args.out_dir, "pred_rgb.png")
            )
        elif task == "depth":
            arr = arr[..., 0]
            arr = (arr - arr.min()) / max(arr.max() - arr.min(), 1e-6)
            Image.fromarray((arr * 255).astype(np.uint8), "L").save(
                os.path.join(args.out_dir, "pred_depth.png")
            )
        elif task == "semseg":
            cls = arr.argmax(-1).astype(np.uint8)
            Image.fromarray(cls, "L").save(
                os.path.join(args.out_dir, "pred_semseg.png")
            )
        m = np.asarray(masks[task][0]) if task in masks else None
        if m is not None:
            n = int(np.sqrt(m.size))
            Image.fromarray(
                (m.reshape(n, n) * 255).astype(np.uint8), "L"
            ).resize((s, s), Image.NEAREST).save(
                os.path.join(args.out_dir, f"mask_{task}.png")
            )
    print(f"Wrote predictions to {args.out_dir}/")


if __name__ == "__main__":
    main()
