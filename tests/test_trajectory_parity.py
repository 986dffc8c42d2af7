"""200-step training-trajectory parity vs the reference (CPU, fp32).

Forward golden parity (test_model_parity.py) proves single-step
equivalence; this test catches optimizer / LR-schedule / masking
interaction drift over many steps (VERDICT.md round-1 weak #5): an
identical tiny MultiMAE is trained for 200 steps on both sides — same
weights, same fixed per-step task masks, same data, same AdamW + cosine
schedule — and the per-step total losses must track.

Reference loop under test: run_pretraining_multimae.py:458-578 (per-step
LR assignment, masked forward, per-task criterion, AdamW update).
"""

import functools

import numpy as np
import pytest

from tests.conftest import install_reference_import_shim, requires_reference

install_reference_import_shim()

import jax
import jax.numpy as jnp

STEPS = 200
IMG = 32
PATCH = 16
N_TOK = (IMG // PATCH) ** 2  # 4 per task
K_VIS = 4  # visible tokens out of 8


def _fixed_masks(rng, n_steps):
    """Per-step 0/1 masks over [rgb|depth] with exactly K_VIS visible."""
    masks = []
    for _ in range(n_steps):
        flat = np.ones((1, 2 * N_TOK), dtype=np.int64)
        vis = rng.choice(2 * N_TOK, size=K_VIS, replace=False)
        flat[:, vis] = 0
        masks.append({"rgb": flat[:, :N_TOK], "depth": flat[:, N_TOK:]})
    return masks


def _fixed_data(rng, n_steps):
    return [
        {
            "rgb": rng.standard_normal((1, IMG, IMG, 3)).astype(np.float32),
            "depth": rng.standard_normal((1, IMG, IMG, 1)).astype(np.float32),
        }
        for _ in range(n_steps)
    ]


def _our_model():
    from multimae_tpu.models import (
        MultiMAE,
        PatchedInputAdapter,
        SpatialOutputAdapter,
    )

    input_adapters = {
        "rgb": functools.partial(
            PatchedInputAdapter, num_channels=3, stride_level=1,
            patch_size_full=PATCH, image_size=IMG,
        ),
        "depth": functools.partial(
            PatchedInputAdapter, num_channels=1, stride_level=1,
            patch_size_full=PATCH, image_size=IMG,
        ),
    }
    output_adapters = {
        t: functools.partial(
            SpatialOutputAdapter, num_channels=c, stride_level=1,
            patch_size_full=PATCH, dim_tokens=32, depth=1, num_heads=2,
            use_task_queries=True, task=t, context_tasks=("rgb", "depth"),
            use_xattn=True, image_size=IMG,
        )
        for t, c in (("rgb", 3), ("depth", 1))
    }
    return MultiMAE(
        input_adapters=input_adapters, output_adapters=output_adapters,
        num_global_tokens=1, dim_tokens=64, depth=2, num_heads=4,
    )


def _ref_model():
    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.multimae import MultiMAE as RefMultiMAE
    from multimae.output_adapters import SpatialOutputAdapter as RefSpatial

    input_adapters = {
        "rgb": RefPatched(num_channels=3, stride_level=1,
                          patch_size_full=PATCH, image_size=IMG),
        "depth": RefPatched(num_channels=1, stride_level=1,
                            patch_size_full=PATCH, image_size=IMG),
    }
    output_adapters = {
        t: RefSpatial(
            num_channels=c, stride_level=1, patch_size_full=PATCH,
            dim_tokens=32, depth=1, num_heads=2, use_task_queries=True,
            task=t, context_tasks=["rgb", "depth"], use_xattn=True,
            image_size=IMG,
        )
        for t, c in (("rgb", 3), ("depth", 1))
    }
    return RefMultiMAE(
        input_adapters=input_adapters, output_adapters=output_adapters,
        num_global_tokens=1, dim_tokens=64, depth=2, num_heads=4,
    )


@requires_reference
def test_50_step_cls_finetune_trajectory_tracks_reference():
    """Layer-decay fine-tune trajectory: pins per-group lr_scale semantics.

    Mirrors run_finetuning_cls.py:506-508 (per-step lr = schedule *
    group lr_scale) and utils/optim_factory.py:50-101 (grouping) over 50
    AdamW steps on an identical tiny MultiViT + label-smoothing CE.
    """
    import torch

    from multimae_tpu.models import (
        LinearOutputAdapter,
        MultiViT,
        PatchedInputAdapter,
    )
    from multimae_tpu.train.cross_entropy import label_smoothing_cross_entropy
    from multimae_tpu.train.finetune_step import make_cls_train_step
    from multimae_tpu.train.optim_factory import (
        LayerDecayValueAssigner,
        create_optimizer,
    )
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.train_state import TrainState
    from multimae_tpu.utils.torch_compat import state_dict_to_params

    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.output_adapters import LinearOutputAdapter as RefLinear
    from utils.optim_factory import get_parameter_groups as ref_param_groups

    NCLS, DEPTH, LD = 5, 2, 0.75
    rng_np = np.random.default_rng(11)
    data = [rng_np.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
            for _ in range(STEPS)]
    labels = [rng_np.integers(0, NCLS, size=(2,)) for _ in range(STEPS)]

    base_lr, min_lr, wd = 1e-3, 1e-5, 0.05
    betas, eps = (0.9, 0.999), 1e-8
    lr_values = cosine_scheduler(
        base_lr, min_lr, epochs=1, niter_per_ep=STEPS, warmup_steps=5
    )
    ld_values = [LD ** (DEPTH + 1 - i) for i in range(DEPTH + 2)]

    # ---- reference model (source of the shared initial weights) ----
    torch.manual_seed(2)
    ref = RefMultiViT(
        input_adapters={
            "rgb": RefPatched(num_channels=3, stride_level=1,
                              patch_size_full=PATCH, image_size=IMG)
        },
        output_adapters={"cls": RefLinear(num_classes=NCLS)},
        dim_tokens=64, depth=DEPTH, num_heads=4,
    )

    # ---- ours ----
    ours = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=PATCH, image_size=IMG,
            )
        },
        output_adapters={
            "cls": functools.partial(LinearOutputAdapter, num_classes=NCLS)
        },
        dim_tokens=64, depth=DEPTH, num_heads=4,
    )
    x0 = {"rgb": jnp.asarray(data[0])}
    template = jax.eval_shape(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, x0)
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = state_dict_to_params(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template
    )
    assert not report["missing"] and not report["unexpected"], report

    tx = create_optimizer(
        params, opt="adamw", lr_schedule=as_optax_schedule(lr_values),
        weight_decay=wd, opt_betas=betas, opt_eps=eps,
        layer_decay_assigner=LayerDecayValueAssigner(ld_values),
        filter_bias_and_bn=True,
    )
    state = TrainState.create(params=params, tx=tx)
    jit_step = jax.jit(
        make_cls_train_step(ours, label_smoothing_cross_entropy)
    )
    key = jax.random.PRNGKey(5)
    ours_losses = []
    for i in range(STEPS):
        batch = {"rgb": jnp.asarray(data[i]),
                 "target": jnp.asarray(labels[i], jnp.int32)}
        state, metrics = jit_step(state, batch, key)
        ours_losses.append(float(metrics["loss"]))

    # ---- reference training loop ----
    assigner_values = ld_values

    def get_num_layer(name):
        from utils.optim_factory import get_num_layer_for_vit
        return get_num_layer_for_vit(name, len(assigner_values))

    def get_layer_scale(layer_id):
        return assigner_values[layer_id]

    skip = ref.no_weight_decay() if hasattr(ref, "no_weight_decay") else set()
    groups = ref_param_groups(ref, wd, skip, get_num_layer, get_layer_scale)
    opt = torch.optim.AdamW(groups, lr=base_lr, betas=betas, eps=eps)
    ref.train()

    def ref_ls_ce(logits, target, smoothing=0.1):
        logp = torch.log_softmax(logits.float(), dim=-1)
        nll = -logp.gather(1, target.unsqueeze(1)).squeeze(1)
        smooth = -logp.mean(dim=-1)
        return ((1.0 - smoothing) * nll + smoothing * smooth).mean()

    ref_losses = []
    for i in range(STEPS):
        for g in opt.param_groups:
            g["lr"] = float(lr_values[i]) * g.get("lr_scale", 1.0)
        x_t = torch.from_numpy(data[i]).permute(0, 3, 1, 2)
        logits = ref(x_t)["cls"]
        loss = ref_ls_ce(logits, torch.from_numpy(labels[i]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(
        np.array(ours_losses), np.array(ref_losses), rtol=1e-2, atol=1e-3
    )


@requires_reference
def test_50_step_taskonomy_trajectory_tracks_reference():
    """Taskonomy fine-tune trajectory: rgb -> surface-normal DPT head
    under the reference's masked L1 (run_finetuning_taskonomy.py:57-64,
    398-400) over 50 AdamW steps on identical weights/data/masks."""
    import torch

    from multimae_tpu.models import (
        DPTOutputAdapter,
        MultiViT,
        PatchedInputAdapter,
    )
    from multimae_tpu.train.finetune_step import make_dense_train_step
    from multimae_tpu.train.optim_factory import create_optimizer
    from multimae_tpu.train.regression_losses import masked_l1_loss
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.train_state import TrainState
    from multimae_tpu.utils.torch_compat import state_dict_to_params

    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.output_adapters import DPTOutputAdapter as RefDPT

    # The reference's masked_l1_loss lives in its top-level script
    # (run_finetuning_taskonomy.py:57-64), whose module-level imports
    # need wandb etc. — execute just that function's source.
    import ast

    _src = open("/root/reference/run_finetuning_taskonomy.py").read()
    _fn_src = next(
        ast.get_source_segment(_src, n) for n in ast.parse(_src).body
        if isinstance(n, ast.FunctionDef) and n.name == "masked_l1_loss"
    )
    _ns = {"torch": torch}
    exec(_fn_src, _ns)
    ref_masked_l1 = _ns["masked_l1_loss"]

    N_STEPS, DEPTH, DIM = 50, 4, 64
    HOOKS, LAYER_DIMS = [0, 1, 2, 3], [16, 32, 64, 128]
    rng_np = np.random.default_rng(13)
    data = [rng_np.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
            for _ in range(N_STEPS)]
    targets = [rng_np.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
               for _ in range(N_STEPS)]
    masks = [(rng_np.random((2, IMG, IMG, 1)) > 0.2).astype(np.float32)
             for _ in range(N_STEPS)]

    base_lr, wd = 1e-3, 0.05
    betas, eps = (0.9, 0.999), 1e-8
    lr_values = cosine_scheduler(
        base_lr, 1e-5, epochs=1, niter_per_ep=N_STEPS, warmup_steps=5
    )

    torch.manual_seed(4)
    ref = RefMultiViT(
        input_adapters={
            "rgb": RefPatched(num_channels=3, stride_level=1,
                              patch_size_full=PATCH, image_size=IMG)
        },
        output_adapters={
            "normal": RefDPT(num_classes=3, main_tasks=["rgb"],
                             head_type="regression", patch_size=PATCH,
                             hooks=HOOKS, layer_dims=LAYER_DIMS)
        },
        dim_tokens=DIM, depth=DEPTH, num_heads=4,
    )

    ours = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=PATCH, image_size=IMG,
            )
        },
        output_adapters={
            "normal": functools.partial(
                DPTOutputAdapter, num_classes=3, main_tasks=("rgb",),
                head_type="regression", patch_size=PATCH,
                hooks=tuple(HOOKS), layer_dims=tuple(LAYER_DIMS),
            )
        },
        dim_tokens=DIM, depth=DEPTH, num_heads=4,
    )
    x0 = {"rgb": jnp.asarray(data[0])}
    template = jax.eval_shape(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, x0)
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = state_dict_to_params(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template,
        head_type="regression",
    )
    assert not report["missing"] and not report["unexpected"], report

    tx = create_optimizer(
        params, opt="adamw", lr_schedule=as_optax_schedule(lr_values),
        weight_decay=wd, opt_betas=betas, opt_eps=eps,
        filter_bias_and_bn=True,
    )
    state = TrainState.create(params=params, tx=tx)
    jit_step = jax.jit(make_dense_train_step(
        ours, "normal", masked_l1_loss, in_domains=("rgb",),
        needs_target_kwargs=True,
    ))
    key = jax.random.PRNGKey(9)
    ours_losses = []
    for i in range(N_STEPS):
        batch = {"rgb": jnp.asarray(data[i]),
                 "target": jnp.asarray(targets[i]),
                 "mask_valid": jnp.asarray(masks[i])}
        state, metrics = jit_step(state, batch, key)
        ours_losses.append(float(metrics["loss"]))

    # ---- reference loop (torch, param groups as the reference CLI) ----
    from utils.optim_factory import get_parameter_groups as ref_param_groups

    skip = ref.no_weight_decay() if hasattr(ref, "no_weight_decay") else set()
    groups = ref_param_groups(ref, wd, skip)
    opt = torch.optim.AdamW(groups, lr=base_lr, betas=betas, eps=eps)
    ref.train()
    ref_losses = []
    for i in range(N_STEPS):
        for g in opt.param_groups:
            g["lr"] = float(lr_values[i]) * g.get("lr_scale", 1.0)
        x_t = torch.from_numpy(data[i]).permute(0, 3, 1, 2)
        pred = ref(x_t, return_all_layers=True)["normal"]
        loss = ref_masked_l1(
            pred.float(),
            torch.from_numpy(targets[i]).permute(0, 3, 1, 2),
            torch.from_numpy(masks[i]).permute(0, 3, 1, 2).bool(),
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(
        np.array(ours_losses), np.array(ref_losses), rtol=1.5e-2, atol=1e-3
    )


@pytest.mark.skipif(
    __import__("os").environ.get("MULTIMAE_RUN_SLOW_TESTS") != "1",
    reason="full-width (dim 768 / 12-block) trajectory parity is a slow "
           "CPU compile; set MULTIMAE_RUN_SLOW_TESTS=1",
)
@requires_reference
def test_full_width_cls_trajectory_tracks_reference():
    """ViT-B-width fine-tune trajectory parity (round-4 verdict item 5).

    The tiny-width trajectories above catch logic drift; this leg runs
    the REAL trunk — dim 768, 12 blocks, layer-decay 0.65 over the real
    depth (utils/optim_factory.py:22-46 get_num_layer_for_vit resolves
    encoder block indices 1..12 here, not 1..2) — for 15 AdamW steps in
    fp32 at B=2, ours vs torch, asserting per-step losses track. IMG=64
    keeps the token count small (the attention-engine dispatch is
    token-count-driven and covered elsewhere); width/depth numerics and
    param-group assignment are what tiny-width cannot exercise.
    Evidence from the recorded run: docs/convergence/full_width_parity.md.
    """
    import torch

    from multimae_tpu.models import (
        LinearOutputAdapter,
        MultiViT,
        PatchedInputAdapter,
    )
    from multimae_tpu.train.cross_entropy import label_smoothing_cross_entropy
    from multimae_tpu.train.finetune_step import make_cls_train_step
    from multimae_tpu.train.optim_factory import (
        LayerDecayValueAssigner,
        create_optimizer,
    )
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.train_state import TrainState
    from multimae_tpu.utils.torch_compat import state_dict_to_params

    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.multimae import MultiViT as RefMultiViT
    from multimae.output_adapters import LinearOutputAdapter as RefLinear
    from utils.optim_factory import (
        get_num_layer_for_vit,
        get_parameter_groups as ref_param_groups,
    )

    N_STEPS, NCLS, DIM, DEPTH, HEADS, LD = 15, 10, 768, 12, 12, 0.65
    SZ = 64
    rng_np = np.random.default_rng(17)
    data = [rng_np.standard_normal((2, SZ, SZ, 3)).astype(np.float32)
            for _ in range(N_STEPS)]
    labels = [rng_np.integers(0, NCLS, size=(2,)) for _ in range(N_STEPS)]

    base_lr, wd = 5e-4, 0.05
    betas, eps = (0.9, 0.999), 1e-8
    lr_values = cosine_scheduler(
        base_lr, 1e-6, epochs=1, niter_per_ep=N_STEPS, warmup_steps=3
    )
    ld_values = [LD ** (DEPTH + 1 - i) for i in range(DEPTH + 2)]

    torch.manual_seed(8)
    ref = RefMultiViT(
        input_adapters={
            "rgb": RefPatched(num_channels=3, stride_level=1,
                              patch_size_full=PATCH, image_size=SZ)
        },
        output_adapters={"cls": RefLinear(num_classes=NCLS)},
        dim_tokens=DIM, depth=DEPTH, num_heads=HEADS,
    )

    ours = MultiViT(
        input_adapters={
            "rgb": functools.partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=PATCH, image_size=SZ,
            )
        },
        output_adapters={
            "cls": functools.partial(LinearOutputAdapter, num_classes=NCLS)
        },
        dim_tokens=DIM, depth=DEPTH, num_heads=HEADS,
    )
    x0 = {"rgb": jnp.asarray(data[0])}
    template = jax.eval_shape(
        lambda: ours.init({"params": jax.random.PRNGKey(0)}, x0)
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = state_dict_to_params(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template
    )
    assert not report["missing"] and not report["unexpected"], report

    assigner = LayerDecayValueAssigner(ld_values)
    # The real-depth grouping itself must agree with the reference's
    # get_num_layer_for_vit before any step runs: encoder block i ->
    # layer id i+1, adapters -> 0, head stays at the top scale.
    for tname, expect in (
        ("input_adapters.rgb.proj.weight", 0),
        ("encoder.0.attn.qkv.weight", 1),
        ("encoder.11.mlp.fc2.weight", 12),
        ("output_adapters.cls.head.weight", DEPTH + 1),
    ):
        assert get_num_layer_for_vit(tname, len(ld_values)) == expect, tname

    tx = create_optimizer(
        params, opt="adamw", lr_schedule=as_optax_schedule(lr_values),
        weight_decay=wd, opt_betas=betas, opt_eps=eps,
        layer_decay_assigner=assigner, filter_bias_and_bn=True,
    )
    state = TrainState.create(params=params, tx=tx)
    jit_step = jax.jit(make_cls_train_step(ours, label_smoothing_cross_entropy))
    key = jax.random.PRNGKey(5)
    ours_losses = []
    for i in range(N_STEPS):
        batch = {"rgb": jnp.asarray(data[i]),
                 "target": jnp.asarray(labels[i], jnp.int32)}
        state, metrics = jit_step(state, batch, key)
        ours_losses.append(float(metrics["loss"]))

    skip = ref.no_weight_decay() if hasattr(ref, "no_weight_decay") else set()
    groups = ref_param_groups(
        ref, wd, skip,
        lambda n: get_num_layer_for_vit(n, len(ld_values)),
        lambda lid: ld_values[lid],
    )
    opt = torch.optim.AdamW(groups, lr=base_lr, betas=betas, eps=eps)
    ref.train()

    def ref_ls_ce(logits, target, smoothing=0.1):
        logp = torch.log_softmax(logits.float(), dim=-1)
        nll = -logp.gather(1, target.unsqueeze(1)).squeeze(1)
        smooth = -logp.mean(dim=-1)
        return ((1.0 - smoothing) * nll + smoothing * smooth).mean()

    ref_losses = []
    for i in range(N_STEPS):
        for g in opt.param_groups:
            g["lr"] = float(lr_values[i]) * g.get("lr_scale", 1.0)
        x_t = torch.from_numpy(data[i]).permute(0, 3, 1, 2)
        loss = ref_ls_ce(ref(x_t)["cls"], torch.from_numpy(labels[i]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

    np.testing.assert_allclose(
        np.array(ours_losses), np.array(ref_losses), rtol=1e-2, atol=2e-3
    )


@pytest.mark.skipif(
    __import__("os").environ.get("MULTIMAE_RUN_SLOW_TESTS") != "1",
    reason="full-width pretrain trajectory parity is a slow CPU compile; "
           "set MULTIMAE_RUN_SLOW_TESTS=1",
)
@requires_reference
def test_full_width_pretrain_trajectory_tracks_reference():
    """ViT-B-width PRETRAIN trajectory parity: dim-768/12-block trunk +
    the real dim-256 spatial decoders (2 blocks, xattn, task queries —
    the released recipe's decoder shape, cfgs/pretrain/*.yaml) for 12
    AdamW steps in fp32 at B=1 on identical weights/data/masks.
    Exercises real-width numerics through the full masked
    encode->decode->masked-loss stack that the dim-64 trajectory can't."""
    import torch

    from multimae_tpu.models import (
        MultiMAE,
        PatchedInputAdapter,
        SpatialOutputAdapter,
    )
    from multimae_tpu.models.criterion import MaskedL1Loss, MaskedMSELoss
    from multimae_tpu.train.optim_factory import create_optimizer
    from multimae_tpu.train.pretrain_step import make_pretrain_train_step
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.task_balancing import build_balancer
    from multimae_tpu.train.train_state import TrainState
    from multimae_tpu.utils.torch_compat import state_dict_to_params

    from multimae.criterion import (
        MaskedL1Loss as RefL1,
        MaskedMSELoss as RefMSE,
    )
    from multimae.input_adapters import PatchedInputAdapter as RefPatched
    from multimae.multimae import MultiMAE as RefMultiMAE
    from multimae.output_adapters import SpatialOutputAdapter as RefSpatial

    N_STEPS, DIM, DEPTH, HEADS = 12, 768, 12, 12
    DEC_DIM, DEC_DEPTH, DEC_HEADS = 256, 2, 8
    SZ = 64
    n_tok = (SZ // PATCH) ** 2  # 16 per task
    k_vis = 16

    rng_np = np.random.default_rng(23)
    data = [
        {"rgb": rng_np.standard_normal((1, SZ, SZ, 3)).astype(np.float32),
         "depth": rng_np.standard_normal((1, SZ, SZ, 1)).astype(np.float32)}
        for _ in range(N_STEPS)
    ]
    masks = []
    for _ in range(N_STEPS):
        flat = np.ones((1, 2 * n_tok), dtype=np.int64)
        vis = rng_np.choice(2 * n_tok, size=k_vis, replace=False)
        flat[:, vis] = 0
        masks.append({"rgb": flat[:, :n_tok], "depth": flat[:, n_tok:]})

    base_lr, wd = 5e-4, 0.05
    betas, eps = (0.9, 0.95), 1e-8
    lr_values = cosine_scheduler(
        base_lr, 0.0, epochs=1, niter_per_ep=N_STEPS, warmup_steps=3
    )

    def _adapters(ctor_in, ctor_out, as_partial):
        wrap = (lambda c, **kw: functools.partial(c, **kw)) if as_partial \
            else (lambda c, **kw: c(**kw))
        ins = {
            "rgb": wrap(ctor_in, num_channels=3, stride_level=1,
                        patch_size_full=PATCH, image_size=SZ),
            "depth": wrap(ctor_in, num_channels=1, stride_level=1,
                          patch_size_full=PATCH, image_size=SZ),
        }
        ctx = ("rgb", "depth") if as_partial else ["rgb", "depth"]
        outs = {
            t: wrap(ctor_out, num_channels=c, stride_level=1,
                    patch_size_full=PATCH, dim_tokens=DEC_DIM,
                    depth=DEC_DEPTH, num_heads=DEC_HEADS,
                    use_task_queries=True, task=t, context_tasks=ctx,
                    use_xattn=True, image_size=SZ)
            for t, c in (("rgb", 3), ("depth", 1))
        }
        return ins, outs

    ours_in, ours_out = _adapters(
        PatchedInputAdapter, SpatialOutputAdapter, True)
    model = MultiMAE(
        input_adapters=ours_in, output_adapters=ours_out,
        num_global_tokens=1, dim_tokens=DIM, depth=DEPTH, num_heads=HEADS,
    )

    torch.manual_seed(6)
    ref_in, ref_out = _adapters(RefPatched, RefSpatial, False)
    ref = RefMultiMAE(
        input_adapters=ref_in, output_adapters=ref_out,
        num_global_tokens=1, dim_tokens=DIM, depth=DEPTH, num_heads=HEADS,
    )

    x0 = {k: jnp.asarray(v) for k, v in data[0].items()}
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
            x0, num_encoded_tokens=k_vis,
        )
    )["params"]
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    params, report = state_dict_to_params(
        {k: v.numpy() for k, v in ref.state_dict().items()}, template
    )
    assert not report["missing"] and not report["unexpected"], report

    losses = {
        "rgb": MaskedMSELoss(patch_size=PATCH, stride=1, norm_pix=False),
        "depth": MaskedL1Loss(patch_size=PATCH, stride=1, norm_pix=False),
    }
    balancer = build_balancer("none", ("rgb", "depth"))
    full_params = {"model": params, "balancer": {}}
    tx = create_optimizer(
        full_params, opt="adamw", lr_schedule=as_optax_schedule(lr_values),
        weight_decay=wd, opt_betas=betas, opt_eps=eps, filter_bias_and_bn=False,
    )
    state = TrainState.create(params=full_params, tx=tx)
    step_fn = make_pretrain_train_step(
        model, balancer, losses, num_encoded_tokens=k_vis,
        in_domains=("rgb", "depth"), standardize_depth_flag=False,
        extra_norm_pix_loss=False,
    )
    jit_step = jax.jit(step_fn)
    key = jax.random.PRNGKey(3)
    ours_losses = []
    for i in range(N_STEPS):
        batch = {k: jnp.asarray(v) for k, v in data[i].items()}
        tm = {k: jnp.asarray(v, jnp.int32) for k, v in masks[i].items()}
        state, metrics = jit_step(state, batch, key, tm)
        ours_losses.append(float(metrics["loss"]))

    ref.train()
    ref_losses_fn = {
        "rgb": RefMSE(patch_size=PATCH, stride=1, norm_pix=False),
        "depth": RefL1(patch_size=PATCH, stride=1, norm_pix=False),
    }
    opt = torch.optim.AdamW(
        ref.parameters(), lr=base_lr, betas=betas, eps=eps, weight_decay=wd
    )
    ref_losses = []
    for i in range(N_STEPS):
        for g in opt.param_groups:
            g["lr"] = float(lr_values[i])
        x_t = {
            "rgb": torch.from_numpy(data[i]["rgb"]).permute(0, 3, 1, 2),
            "depth": torch.from_numpy(data[i]["depth"]).permute(0, 3, 1, 2),
        }
        tm_t = {k: torch.from_numpy(v) for k, v in masks[i].items()}
        preds, out_masks = ref(x_t, mask_inputs=True, task_masks=tm_t)
        total = sum(
            ref_losses_fn[t](preds[t], x_t[t], mask=out_masks.get(t))
            for t in ("rgb", "depth")
        )
        opt.zero_grad()
        total.backward()
        opt.step()
        ref_losses.append(float(total.detach()))

    np.testing.assert_allclose(
        np.array(ours_losses), np.array(ref_losses), rtol=1e-2, atol=2e-3
    )


@requires_reference
def test_50_step_loss_trajectory_tracks_reference():
    import torch

    from multimae_tpu.models.criterion import MaskedL1Loss, MaskedMSELoss
    from multimae_tpu.train.optim_factory import create_optimizer
    from multimae_tpu.train.pretrain_step import make_pretrain_train_step
    from multimae_tpu.train.schedules import as_optax_schedule, cosine_scheduler
    from multimae_tpu.train.task_balancing import build_balancer
    from multimae_tpu.train.train_state import TrainState
    from multimae_tpu.utils.torch_compat import params_to_state_dict

    rng_np = np.random.default_rng(7)
    data = _fixed_data(rng_np, STEPS)
    masks = _fixed_masks(rng_np, STEPS)

    base_lr, min_lr, wd = 1e-3, 0.0, 0.05
    betas, eps = (0.9, 0.95), 1e-8
    lr_values = cosine_scheduler(
        base_lr, min_lr, epochs=1, niter_per_ep=STEPS, warmup_steps=10
    )

    # ---- ours ----
    model = _our_model()
    params = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        {k: jnp.asarray(v) for k, v in data[0].items()},
        num_encoded_tokens=K_VIS,
    )["params"]
    losses = {
        "rgb": MaskedMSELoss(patch_size=PATCH, stride=1, norm_pix=False),
        "depth": MaskedL1Loss(patch_size=PATCH, stride=1, norm_pix=False),
    }
    balancer = build_balancer("none", ("rgb", "depth"))
    full_params = {"model": params, "balancer": {}}
    tx = create_optimizer(
        full_params, opt="adamw", lr_schedule=as_optax_schedule(lr_values),
        weight_decay=wd, opt_betas=betas, opt_eps=eps, filter_bias_and_bn=False,
    )
    state = TrainState.create(params=full_params, tx=tx)
    step_fn = make_pretrain_train_step(
        model, balancer, losses, num_encoded_tokens=K_VIS,
        in_domains=("rgb", "depth"), standardize_depth_flag=False,
        extra_norm_pix_loss=False,
    )
    jit_step = jax.jit(step_fn)

    ours_losses = []
    key = jax.random.PRNGKey(3)
    for i in range(STEPS):
        batch = {k: jnp.asarray(v) for k, v in data[i].items()}
        tm = {k: jnp.asarray(v, jnp.int32) for k, v in masks[i].items()}
        state, metrics = jit_step(state, batch, key, tm)
        ours_losses.append(float(metrics["loss"]))

    # ---- reference ----
    torch.manual_seed(0)
    from multimae.criterion import (
        MaskedL1Loss as RefL1,
        MaskedMSELoss as RefMSE,
    )

    ref = _ref_model()
    sd = params_to_state_dict(
        params, proj_shapes={"rgb": (3, PATCH, PATCH), "depth": (1, PATCH, PATCH)}
    )
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not missing, f"missing: {missing}"
    ref.train()
    ref_losses_fn = {
        "rgb": RefMSE(patch_size=PATCH, stride=1, norm_pix=False),
        "depth": RefL1(patch_size=PATCH, stride=1, norm_pix=False),
    }
    opt = torch.optim.AdamW(
        ref.parameters(), lr=base_lr, betas=betas, eps=eps, weight_decay=wd
    )

    ref_losses = []
    for i in range(STEPS):
        for g in opt.param_groups:
            g["lr"] = float(lr_values[i])
        x_t = {
            "rgb": torch.from_numpy(data[i]["rgb"]).permute(0, 3, 1, 2),
            "depth": torch.from_numpy(data[i]["depth"]).permute(0, 3, 1, 2),
        }
        tm_t = {k: torch.from_numpy(v) for k, v in masks[i].items()}
        preds, out_masks = ref(x_t, mask_inputs=True, task_masks=tm_t)
        total = sum(
            ref_losses_fn[t](preds[t], x_t[t], mask=out_masks.get(t))
            for t in ("rgb", "depth")
        )
        opt.zero_grad()
        total.backward()
        opt.step()
        ref_losses.append(float(total.detach()))

    ours = np.array(ours_losses)
    refs = np.array(ref_losses)
    # Same math in fp32; divergence accumulates slowly through the AdamW
    # trajectory. Track per-step within 1% relative over the first 50
    # steps (early steps much tighter), 3% out to step 200 — slow drift
    # in the optimizer/schedule/masking stack shows up here long before
    # it would move a headline metric.
    np.testing.assert_allclose(ours[:50], refs[:50], rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(ours, refs, rtol=3e-2, atol=1e-3)
    # And both actually trained: mean loss decreased (targets are random
    # noise, so the model mostly learns the mean — the drop is small).
    assert ours[-10:].mean() < ours[:10].mean()
