"""Bit-faithful PyTorch checkpoint loading into flax param pytrees.

Maps the reference's MultiMAE/MultiViT state_dict format (see SURVEY.md
§2.5; keys like `input_adapters.<task>.proj.weight`,
`encoder.<i>.attn.qkv.weight`, `output_adapters.<task>.*`) onto our
flax module tree, applying the layout conversions:

  * Linear  weight (out, in)          -> kernel (in, out)
  * Conv2d  weight (O, I, kh, kw)     -> kernel (kh, kw, I, O)
  * Patch-proj Conv2d -> patchify Dense: (O, I, ph, pw) -> (ph*pw*I, O)
  * ConvTranspose2d (I, O, kh, kw)    -> kernel (kh, kw, O, I)
    (flax ConvTranspose with transpose_kernel=True)
  * pos_emb (1, D, h, w)              -> (1, h, w, D)
  * LayerNorm weight/bias             -> scale/bias (under our `ln` scope)
  * Embedding weight                  -> embedding table (unchanged)

The walk is template-driven: for every leaf in the flax param tree we
derive the torch key from the flax path, so missing/unexpected keys are
reported exactly like the reference's tolerant loader
(utils/checkpoint.py:26-72).
"""

from __future__ import annotations

import io
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import flax
import jax.numpy as jnp

# Flax path component -> torch key component rules.
_PREFIXES = (
    ("input_adapters_", "input_adapters."),
    ("output_adapters_", "output_adapters."),
    ("encoder_", "encoder."),
    ("decoder_transformer_", "decoder_transformer."),
    ("blocks_", "blocks."),
    ("task_embeddings_", "task_embeddings."),
)

# DPT name translations (ours -> torch Sequential indices,
# reference output_adapters.py:661-715, :625-645).
_DPT_RENAMES = {
    "act_1_postprocess_conv": "act_1_postprocess.0",
    "act_1_postprocess_deconv": "act_1_postprocess.1",
    "act_2_postprocess_conv": "act_2_postprocess.0",
    "act_2_postprocess_deconv": "act_2_postprocess.1",
    "act_3_postprocess_conv": "act_3_postprocess.0",
    "act_4_postprocess_conv": "act_4_postprocess.0",
    "act_4_postprocess_downconv": "act_4_postprocess.1",
    "layer1_rn": "scratch.layer1_rn",
    "layer2_rn": "scratch.layer2_rn",
    "layer3_rn": "scratch.layer3_rn",
    "layer4_rn": "scratch.layer4_rn",
    "refinenet1": "scratch.refinenet1",
    "refinenet2": "scratch.refinenet2",
    "refinenet3": "scratch.refinenet3",
    "refinenet4": "scratch.refinenet4",
    # regression head (Sequential: conv, interp, conv, relu, conv)
    "head_conv1": "head.0",
    "head_conv2": "head.2",
    "head_conv3": "head.4",
}

_DPT_SEMSEG_HEAD_RENAMES = {
    # semseg head (Sequential: conv, bn/id, relu, dropout, conv, interp)
    "head_conv1": "head.0",
    "head_bn": "head.1",
    "head_conv2": "head.4",
}

_LEAF_RENAMES = {
    "kernel": "weight",
    "scale": "weight",
    "embedding": "weight",
    "bias": "bias",
    # Our embedding tables are direct params; torch wraps them in
    # nn.Embedding so the key gains a '.weight'.
    "class_emb": "class_emb.weight",
}


def flax_path_to_torch_key(path: Tuple[str, ...], head_type: str = "regression") -> str:
    """Translate a flax param path into the reference torch state_dict key."""
    parts: List[str] = []
    dpt_renames = dict(_DPT_RENAMES)
    if head_type == "semseg":
        dpt_renames.update(_DPT_SEMSEG_HEAD_RENAMES)
    for comp in path:
        if comp == "ln":
            continue  # our LayerNorm wrapper scope
        mapped = None
        for ours, theirs in _PREFIXES:
            if comp.startswith(ours):
                mapped = theirs + comp[len(ours):]
                break
        if mapped is None:
            mapped = dpt_renames.get(comp, comp)
        if mapped is None:
            mapped = comp
        parts.append(mapped)
    leaf = parts[-1]
    parts[-1] = _LEAF_RENAMES.get(leaf, leaf)
    return ".".join(parts)


def _convert_tensor(
    t: np.ndarray, flax_shape: Tuple[int, ...], path: Tuple[str, ...]
) -> np.ndarray:
    """Apply the layout transform implied by source/target shapes."""
    leaf = path[-1]
    flax_shape = tuple(flax_shape)
    if leaf == "pos_emb":
        if t.ndim == 4:  # (1, D, h, w) -> (1, h, w, D)
            t = t.transpose(0, 2, 3, 1)
        if t.shape != flax_shape:
            # Fine-tune at a different resolution: bicubic-resize the grid
            # (reference utils/pos_embed.py:44-58, align_corners=False).
            from multimae_tpu.ops.resize import interpolate_2d

            if t.shape[-1] == flax_shape[-1]:
                t = np.asarray(
                    interpolate_2d(
                        t, (flax_shape[1], flax_shape[2]),
                        mode="bicubic", align_corners=False,
                    )
                )
        if t.shape != flax_shape:
            raise ValueError(f"pos_emb shape {t.shape} != {flax_shape} at {path}")
        return t
    if leaf == "class_emb" and t.ndim == 2 and t.shape[0] + 1 == flax_shape[0]:
        # Void-class row appended for semseg fine-tuning
        # (reference run_finetuning_semseg.py:418-420, zero-padded at end).
        t = np.concatenate([t, np.zeros((1, t.shape[1]), t.dtype)], axis=0)
    if leaf == "kernel":
        if t.ndim == 2:
            t = t.T
            if t.shape == flax_shape:
                return t
            raise ValueError(f"linear {t.shape} != {flax_shape} at {path}")
        if t.ndim == 4:
            is_deconv = "deconv" in path[-2]
            if is_deconv:
                # torch (I, O, kh, kw) -> flax transpose_kernel (kh, kw, O, I)
                t = t.transpose(2, 3, 1, 0)
            else:
                t = t.transpose(2, 3, 1, 0)  # (kh, kw, I, O)
            if t.shape == flax_shape:
                return t
            if len(flax_shape) == 2 and int(np.prod(t.shape[:3])) == flax_shape[0]:
                # patchify Dense: (kh, kw, I, O) -> (kh*kw*I, O)
                return t.reshape(flax_shape)
            raise ValueError(f"conv {t.shape} != {flax_shape} at {path}")
    if t.shape == flax_shape:
        return t
    raise ValueError(f"shape mismatch {t.shape} vs {flax_shape} at {path}")


def torch_load_checkpoint(path: str):
    """torch.load a reference-format .pth tolerantly.

    Released weight files load under the safe weights-only unpickler, but
    real TRAINING checkpoints written by the reference's save_model
    (reference utils/checkpoint.py:80-95) embed `'args':
    argparse.Namespace` (and scaler/optimizer state), which
    weights_only=True rejects. Retry allow-listing Namespace — the only
    non-tensor global the reference payload contains — so auto-resume
    from a reference run works without ever enabling the full unpickler.
    """
    import pickle

    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except pickle.UnpicklingError:
        # Only the weights-only REJECTION retries; corrupt/truncated files
        # (zip or serialization errors) fail single-pass with the real error.
        import argparse

        with torch.serialization.safe_globals([argparse.Namespace]):
            return torch.load(path, map_location="cpu", weights_only=True)


def payload_to_state_dict(ckpt) -> Dict[str, np.ndarray]:
    """Unwrap an already-deserialized .pth payload into a flat
    {key: np.ndarray} dict; handles the reference's {'model': ...}
    wrapping (utils/checkpoint.py:118-127)."""
    for key in ("model", "module", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in ckpt.items()}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth checkpoint into a flat {key: np.ndarray} dict.

    Uses torch (CPU build is available in the image) but converts
    immediately to numpy.
    """
    return payload_to_state_dict(torch_load_checkpoint(path))


def state_dict_to_params(
    state_dict: Dict[str, np.ndarray],
    params_template: Any,
    head_type: str = "regression",
    strict: bool = False,
    verbose: bool = True,
    drop_output_adapters: bool = False,
) -> Tuple[Any, Dict[str, List[str]]]:
    """Fill a flax param template from a torch state_dict.

    Returns (params, report) where report lists 'missing' (template leaves
    with no torch source — left at template values) and 'unexpected'
    (torch keys not consumed). With strict=True raises on missing keys.
    drop_output_adapters=True ignores every `output_adapters.*` source key
    (fine-tune surgery, reference run_finetuning_semseg.py:423-425).
    """
    if drop_output_adapters:
        state_dict = {
            k: v for k, v in state_dict.items()
            if not k.startswith("output_adapters.")
        }
    flat = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(params_template), sep=None
    )
    used = set()
    missing: List[str] = []
    out = {}
    for path, template_leaf in flat.items():
        key = flax_path_to_torch_key(tuple(path), head_type=head_type)
        if key in state_dict:
            arr = _convert_tensor(
                np.asarray(state_dict[key]), np.shape(template_leaf), tuple(path)
            )
            out[path] = jnp.asarray(arr, dtype=jnp.asarray(template_leaf).dtype)
            used.add(key)
        else:
            out[path] = template_leaf
            missing.append(key)
    unexpected = [k for k in state_dict if k not in used]
    # Known reference-side artifacts with no runtime effect:
    #  * scratch.layer_rn.N.* — ModuleList ALIASES of scratch.layer{N+1}_rn
    #    (output_adapter_utils.py:175-180 registers the same convs twice)
    #  * refinenet4.resConfUnit1.* — constructed but never called (the top
    #    fusion block takes a single input, output_adapters.py:751)
    #  * act_postprocess.N.* — ModuleList ALIASES of act_{N+1}_postprocess
    #    (output_adapters.py:710-715)
    ignored = [
        k
        for k in unexpected
        if ".scratch.layer_rn." in k
        or ".refinenet4.resConfUnit1." in k
        or ".act_postprocess." in k
    ]
    unexpected = [k for k in unexpected if k not in set(ignored)]
    report = {"missing": missing, "unexpected": unexpected, "ignored": ignored}
    if strict and missing:
        raise KeyError(f"Missing keys in torch checkpoint: {missing}")
    if verbose and (missing or unexpected):
        print(f"[torch_compat] missing ({len(missing)}): {missing[:10]}...")
        print(f"[torch_compat] unexpected ({len(unexpected)}): {unexpected[:10]}...")
    return flax.traverse_util.unflatten_dict(out), report


def params_to_state_dict(
    params: Any,
    head_type: str = "regression",
    proj_shapes: Optional[Dict[str, Tuple[int, int, int]]] = None,
) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax params -> torch-format state_dict (numpy).

    Enables exporting checkpoints back to the reference ecosystem
    (parity with tools/multimae2vit_converter.py workflows).

    proj_shapes: optional {task: (C, ph, pw)} for the input adapters'
    patchify Dense kernels. Our patchify is a (ph*pw*C, D) matmul (rows
    ordered (ph, pw, c), see _convert_tensor's import reshape); with the
    shape hint the exporter reconstructs the reference's 4-D conv weight
    (D, C, ph, pw). Without it the kernel is exported in flattened
    (D, ph*pw*C) layout (our importer accepts both, torch's
    load_state_dict needs the 4-D form).
    """
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params), sep=None)
    out: Dict[str, np.ndarray] = {}
    for path, leaf in flat.items():
        key = flax_path_to_torch_key(tuple(path), head_type=head_type)
        arr = np.asarray(leaf)
        leafname = path[-1]
        if leafname == "pos_emb" and arr.ndim == 4:
            arr = arr.transpose(0, 3, 1, 2)
        elif leafname == "kernel":
            if arr.ndim == 2:
                arr = arr.T
                if (
                    proj_shapes
                    and len(path) >= 2
                    and path[-2] == "proj"
                    and path[0].startswith("input_adapters_")
                ):
                    task = path[0][len("input_adapters_"):]
                    if task in proj_shapes:
                        # Inverse of the import reshape (_convert_tensor):
                        # torch (D,C,ph,pw) -> (ph,pw,C,D) -> flat (ph*pw*C, D).
                        c, ph, pw = proj_shapes[task]
                        d = arr.shape[0]
                        arr = (
                            arr.T.reshape(ph, pw, c, d).transpose(3, 2, 0, 1)
                        )
            elif arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
                if "deconv" in path[-2]:
                    arr = arr.transpose(1, 0, 2, 3)
        out[key] = arr
    return out
