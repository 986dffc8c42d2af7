#!/usr/bin/env python
"""timm ViT -> MultiMAE checkpoint key converter.

Parity target: reference tools/vit2multimae_converter.py:14-32.
Operates on torch-format state_dicts as numpy (no torch needed for the
mapping itself; loading .pth uses torch's CPU unpickler when available).

Key mapping:
  cls_token + pos_embed[:, 0]  -> global_tokens
  pos_embed[:, 1:] b(hw)d      -> input_adapters.rgb.pos_emb (b d h w)
  patch_embed.proj.*           -> input_adapters.rgb.proj.*
  blocks.*                     -> encoder.*
"""

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vit_to_multimae(vit_state_dict):
    state_dict = {}
    state_dict["global_tokens"] = np.array(vit_state_dict["cls_token"])
    for k, v in vit_state_dict.items():
        v = np.asarray(v)
        if k == "pos_embed":
            n = int(math.sqrt(v.shape[1]))
            grid = v[:, 1:].reshape(v.shape[0], n, n, v.shape[2])
            state_dict["global_tokens"] = state_dict["global_tokens"] + v[:, 0]
            state_dict["input_adapters.rgb.pos_emb"] = grid.transpose(0, 3, 1, 2)
        elif k == "patch_embed.proj.weight":
            state_dict["input_adapters.rgb.proj.weight"] = v
        elif k == "patch_embed.proj.bias":
            state_dict["input_adapters.rgb.proj.bias"] = v
        elif "blocks." in k:
            state_dict[k.replace("blocks.", "encoder.")] = v
    return state_dict


def main():
    parser = argparse.ArgumentParser(prog="ViT to MultiMAE checkpoint converter")
    parser.add_argument("--vit_ckpt_path", type=str, required=True)
    parser.add_argument("--multimae_ckpt_path", type=str, required=True)
    args = parser.parse_args()

    import torch

    from multimae_tpu.utils.torch_compat import torch_load_checkpoint

    print(f"Loading weights at {args.vit_ckpt_path}")
    ckpt = torch_load_checkpoint(args.vit_ckpt_path)
    model_sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    model_np = {k: v.numpy() for k, v in model_sd.items()}
    print("Converting from ViT weights to MultiMAE weights...")
    converted = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in vit_to_multimae(model_np).items()}
    out = {"model": converted}
    torch.save(out, args.multimae_ckpt_path)
    print(f"Saved converted weights at {args.multimae_ckpt_path}")


if __name__ == "__main__":
    main()
