"""Stacked decoders must produce identical predictions to the per-adapter
path (fp32, fixed masks)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from multimae_tpu.cli.factory import (
    build_generic_decoder,
    build_pretrain_model,
    make_synthetic_batch,
)
from multimae_tpu.models.stacked_decoder import (
    run_stacked_decoders,
    stack_decoder_params,
    stackable_tasks,
)


def test_stacked_matches_per_adapter():
    model = build_pretrain_model(
        input_size=64, dtype=jnp.float32, decoder_dim=64, decoder_depth=1,
        decoder_num_heads=4, decoder_return_patches=True,
    )
    generic = build_generic_decoder(
        dim_tokens_enc=768, input_size=64, decoder_dim=64, decoder_depth=1,
        decoder_num_heads=4, dtype=jnp.float32,
    )
    batch = make_synthetic_batch(2, input_size=64)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, num_encoded_tokens=12,
    )
    params = variables["params"]
    out_tasks = ["rgb", "depth", "semseg", "norm_rgb"]
    assert stackable_tasks(out_tasks, params)

    rngs = {"masking": jax.random.PRNGKey(7)}
    preds_ref, masks_ref = model.apply(
        variables, batch, num_encoded_tokens=12, rngs=rngs
    )
    enc, masks, ids_keep, ids_restore, info = model.apply(
        variables, batch, num_encoded_tokens=12, rngs=rngs, encode_only=True
    )
    for t in masks_ref:
        np.testing.assert_array_equal(np.asarray(masks[t]), np.asarray(masks_ref[t]))

    preds_stacked = run_stacked_decoders(
        generic, params, enc, info, ids_keep, ids_restore,
        out_tasks, {"rgb": "rgb", "depth": "depth", "semseg": "semseg",
                    "norm_rgb": "rgb"},
    )
    for t in out_tasks:
        np.testing.assert_allclose(
            np.asarray(preds_stacked[t]), np.asarray(preds_ref[t]),
            atol=2e-5, err_msg=f"task {t}",
        )


def test_stack_decoder_params_shapes():
    model = build_pretrain_model(
        input_size=64, dtype=jnp.float32, decoder_dim=64, decoder_depth=1,
        decoder_num_heads=4,
    )
    batch = make_synthetic_batch(1, input_size=64)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, num_encoded_tokens=12,
    )["params"]
    out_tasks = ["rgb", "depth", "semseg", "norm_rgb"]
    stacked = stack_decoder_params(params, out_tasks)
    import flax

    flat = flax.traverse_util.flatten_dict(stacked)
    for k, v in flat.items():
        assert v.shape[0] == 4, k
        assert k[0] != "out_proj"
