"""Optimizer param-grouping parity vs the reference get_parameter_groups.

For the cls fine-tune configuration (layer decay 0.65), every parameter's
(lr_scale, weight-decay-on/off) must match the reference's group
assignment (utils/optim_factory.py:49-101) under the torch<->flax key
mapping.
"""

import functools
import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import (
    REFERENCE_DIR,
    install_reference_import_shim,
    requires_reference,
)


@requires_reference
def test_layer_decay_groups_match_reference():
    install_reference_import_shim()
    import torch

    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.output_adapters import LinearOutputAdapter as RefLinear

    spec = importlib.util.spec_from_file_location(
        "ref_optim", f"{REFERENCE_DIR}/utils/optim_factory.py"
    )
    ref_optim = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_optim)

    torch.manual_seed(0)
    depth, layer_decay = 2, 0.65
    ref = RefMultiViT(
        input_adapters={
            "rgb": RefPatched(num_channels=3, stride_level=1, patch_size_full=16)
        },
        output_adapters={"cls": RefLinear(num_classes=10)},
        dim_tokens=64, depth=depth, num_heads=4,
    )
    values = [layer_decay ** (depth + 1 - i) for i in range(depth + 2)]
    assigner = ref_optim.LayerDecayValueAssigner(values)
    # sanity: the reference grouping runs without error on this model
    ref_optim.get_parameter_groups(
        ref, weight_decay=0.05, skip_list=ref.no_weight_decay(),
        get_num_layer=assigner.get_layer_id, get_layer_scale=assigner.get_scale,
    )
    # per-parameter expected (group kind, lr_scale, wd) per the reference
    # rules (utils/optim_factory.py:55-79)
    ref_assignment = {}
    for name, param in ref.named_parameters():
        if not param.requires_grad:
            ref_assignment[name] = ("frozen", 0.0, 0.0)
            continue
        no_decay = (
            len(param.shape) == 1
            or name.endswith(".bias")
            or name in ref.no_weight_decay()
        )
        layer_id = assigner.get_layer_id(name)
        ref_assignment[name] = (
            "nd" if no_decay else "d",
            assigner.get_scale(layer_id),
            0.0 if no_decay else 0.05,
        )

    # ours
    from multimae_tpu.models import LinearOutputAdapter, MultiViT, PatchedInputAdapter
    from multimae_tpu.train.optim_factory import (
        LayerDecayValueAssigner as OurAssigner,
        build_param_labels,
    )
    from multimae_tpu.utils.torch_compat import flax_path_to_torch_key

    ours = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16,
            )
        },
        output_adapters={
            "cls": functools.partial(LinearOutputAdapter, num_classes=10)
        },
        dim_tokens=64, depth=depth, num_heads=4,
    )
    params = ours.init(
        {"params": jax.random.PRNGKey(0)},
        {"rgb": jnp.zeros((1, 224, 224, 3))},
    )["params"]
    lr_scales, wd_flags, _ = build_param_labels(
        params, layer_decay_assigner=OurAssigner(values),
        filter_bias_and_bn=True,
    )

    import flax

    flat_p = flax.traverse_util.flatten_dict(params)
    flat_lr = flax.traverse_util.flatten_dict(lr_scales)
    flat_wd = flax.traverse_util.flatten_dict(wd_flags)
    checked = 0
    for path in flat_p:
        torch_key = flax_path_to_torch_key(tuple(path))
        assert torch_key in ref_assignment, f"no ref param for {torch_key}"
        kind, ref_scale, ref_wd = ref_assignment[torch_key]
        our_scale = flat_lr[path]
        our_wd = flat_wd[path]
        if kind == "frozen":
            assert our_scale == 0.0, f"{torch_key}: expected frozen"
        else:
            assert our_scale == pytest.approx(ref_scale), (
                f"{torch_key}: lr_scale {our_scale} != {ref_scale}"
            )
            assert (our_wd > 0) == (ref_wd > 0), (
                f"{torch_key}: wd flag {our_wd} != {ref_wd}"
            )
        checked += 1
    assert checked >= 30
