#!/usr/bin/env python
"""MultiMAE -> timm ViT checkpoint key converter.

Parity target: reference tools/multimae2vit_converter.py:14-51.

Key mapping (multimae_to_vit, single global token):
  global_tokens               -> cls_token
  input_adapters.rgb.pos_emb  -> pos_embed (zero row prepended for cls)
  input_adapters.rgb.proj.*   -> patch_embed.proj.*
  encoder.*                   -> blocks.*
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def multimae_to_vit(multimae_state_dict):
    state_dict = {}
    for k, v in multimae_state_dict.items():
        v = np.asarray(v)
        if k == "global_tokens":
            state_dict["cls_token"] = v
        elif k == "input_adapters.rgb.pos_emb":
            b, d, h, w = v.shape
            pe = v.transpose(0, 2, 3, 1).reshape(b, h * w, d)
            pe = np.concatenate([np.zeros((b, 1, d), pe.dtype), pe], axis=1)
            state_dict["pos_embed"] = pe
        elif k == "input_adapters.rgb.proj.weight":
            state_dict["patch_embed.proj.weight"] = v
        elif k == "input_adapters.rgb.proj.bias":
            state_dict["patch_embed.proj.bias"] = v
        elif "encoder" in k:
            state_dict[k.replace("encoder", "blocks")] = v
    return state_dict


def multimae_to_vitmultimae(multimae_state_dict):
    """timm-style ViTMultiMAE (keeps global_tokens, no zero pos-emb row)."""
    state_dict = {}
    for k, v in multimae_state_dict.items():
        v = np.asarray(v)
        if k == "global_tokens":
            state_dict["global_tokens"] = v
        elif k == "input_adapters.rgb.pos_emb":
            b, d, h, w = v.shape
            state_dict["pos_embed"] = v.transpose(0, 2, 3, 1).reshape(b, h * w, d)
        elif k == "input_adapters.rgb.proj.weight":
            state_dict["patch_embed.proj.weight"] = v
        elif k == "input_adapters.rgb.proj.bias":
            state_dict["patch_embed.proj.bias"] = v
        elif "encoder" in k:
            state_dict[k.replace("encoder", "blocks")] = v
    return state_dict


def main():
    parser = argparse.ArgumentParser(prog="MultiMAE to ViT checkpoint converter")
    parser.add_argument("--multimae_ckpt_path", type=str, required=True)
    parser.add_argument("--vit_ckpt_path", type=str, required=True)
    args = parser.parse_args()

    import torch

    from multimae_tpu.utils.torch_compat import torch_load_checkpoint

    print(f"Loading weights at {args.multimae_ckpt_path}")
    ckpt = torch_load_checkpoint(args.multimae_ckpt_path)
    model_sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    model_np = {k: v.numpy() for k, v in model_sd.items()}
    print("Converting from MultiMAE weights to ViT weights...")
    converted = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in multimae_to_vit(model_np).items()}
    torch.save({"model": converted}, args.vit_ckpt_path)
    print(f"Saved converted weights at {args.vit_ckpt_path}")


if __name__ == "__main__":
    main()
