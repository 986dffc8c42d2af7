"""Round-2 parity nits: attn_drop, URL checkpoints, CIFAR, HostEMA, mixup.

Covers the residual deltas from VERDICT.md "What's missing" / "What's
weak" #8: attention-probability dropout (reference
multimae/multimae_utils.py:164-176), URL checkpoint loading (reference
utils/checkpoint.py:120-123), the CIFAR branch of build_dataset
(reference utils/datasets.py:142-143), --model_ema_force_cpu wiring
(reference utils/model_ema.py device='cpu'), and the mixup NumPy
deprecation fix.
"""

import os
import pickle
import threading
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ---------------------------------------------------------------- attn_drop


def test_attn_drop_deterministic_matches_no_drop():
    from multimae_tpu.models.vit import Attention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    attn0 = Attention(num_heads=4, attn_drop=0.0)
    attn5 = Attention(num_heads=4, attn_drop=0.5)
    params = attn0.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    y0 = attn0.apply({"params": params}, x, deterministic=True)
    y5 = attn5.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y5), rtol=1e-6)


def test_attn_drop_training_applies_dropout():
    from multimae_tpu.models.vit import Attention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    attn = Attention(num_heads=4, attn_drop=0.5)
    params = attn.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    y_det = attn.apply({"params": params}, x, deterministic=True)
    y_trn = attn.apply(
        {"params": params}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert np.all(np.isfinite(np.asarray(y_trn)))
    assert not np.allclose(np.asarray(y_det), np.asarray(y_trn))
    # Different rng -> different mask
    y_trn2 = attn.apply(
        {"params": params}, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert not np.allclose(np.asarray(y_trn), np.asarray(y_trn2))


def test_attn_drop_block_and_decoder_block_run():
    from multimae_tpu.models.vit import Block, DecoderBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 32))
    blk = Block(num_heads=4, attn_drop=0.3)
    p = blk.init({"params": jax.random.PRNGKey(2)}, x)["params"]
    out = blk.apply({"params": p}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.shape == x.shape

    dblk = DecoderBlock(num_heads=4, attn_drop=0.3)
    p = dblk.init({"params": jax.random.PRNGKey(2)}, x, ctx)["params"]
    out = dblk.apply({"params": p}, x, ctx, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.shape == x.shape


@pytest.mark.parametrize("cls_name", ["Attention", "CrossAttention"])
def test_attn_drop_mean_preserving(cls_name):
    """Dropout scales kept probabilities by 1/(1-p) (torch semantics):
    the expected attention output is unchanged, so averaging over many
    rng draws approaches the deterministic output."""
    import multimae_tpu.models.vit as vit

    cls = getattr(vit, cls_name)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 16))
    args = (x,) if cls_name == "Attention" else (x, ctx)
    mod = cls(num_heads=2, attn_drop=0.3)
    params = mod.init({"params": jax.random.PRNGKey(1)}, *args)["params"]
    y_det = np.asarray(mod.apply({"params": params}, *args, deterministic=True))
    acc = np.zeros_like(y_det)
    n = 300
    for i in range(n):
        acc += np.asarray(
            mod.apply({"params": params}, *args, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(10 + i)})
        )
    np.testing.assert_allclose(acc / n, y_det, atol=0.15)


# ---------------------------------------------------------- URL checkpoints


def test_resolve_checkpoint_local_passthrough(tmp_path):
    from multimae_tpu.train.checkpoint import resolve_checkpoint_path

    p = str(tmp_path / "ckpt.msgpack")
    assert resolve_checkpoint_path(p) == p


def test_resolve_checkpoint_url_download_and_cache(tmp_path, monkeypatch):
    import http.server

    from multimae_tpu.train.checkpoint import resolve_checkpoint_path

    src_dir = tmp_path / "srv"
    src_dir.mkdir()
    payload = b"fake-checkpoint-bytes"
    (src_dir / "checkpoint-best.pth").write_bytes(payload)

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(src_dir), **kw
    )
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        cache = tmp_path / "cache"
        monkeypatch.setenv("MULTIMAE_TPU_CKPT_CACHE", str(cache))
        url = f"http://127.0.0.1:{port}/checkpoint-best.pth"
        local = resolve_checkpoint_path(url)
        assert os.path.exists(local)
        assert open(local, "rb").read() == payload
        mtime = os.path.getmtime(local)
        # Second resolve hits the cache (no re-download).
        local2 = resolve_checkpoint_path(url)
        assert local2 == local
        assert os.path.getmtime(local2) == mtime
    finally:
        server.shutdown()


# ------------------------------------------------------------------- CIFAR


def _write_fake_cifar100(root, n_train=20, n_test=10):
    d = os.path.join(root, "cifar-100-python")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for name, n in (("train", n_train), ("test", n_test)):
        entry = {
            b"data": rng.integers(0, 256, (n, 3072), dtype=np.uint8),
            b"fine_labels": [int(v) for v in rng.integers(0, 100, n)],
        }
        with open(os.path.join(d, name), "wb") as f:
            pickle.dump(entry, f)


def test_cifar100_dataset(tmp_path):
    from multimae_tpu.data.dataset_folder import CIFAR100

    _write_fake_cifar100(str(tmp_path))
    train = CIFAR100(str(tmp_path), train=True)
    test = CIFAR100(str(tmp_path), train=False)
    assert len(train) == 20 and len(test) == 10
    img, target = train[0]
    assert img.size == (32, 32) and img.mode == "RGB"
    assert 0 <= target < 100
    assert len(train.class_to_idx) == 100
    # pixel round-trip: PIL image reproduces the HWC array
    arr = train.data[0]
    np.testing.assert_array_equal(np.asarray(img), arr)


def test_cifar100_missing_raises(tmp_path):
    from multimae_tpu.data.dataset_folder import CIFAR100

    with pytest.raises(FileNotFoundError):
        CIFAR100(str(tmp_path), train=True)


# ----------------------------------------------------------------- HostEMA


def test_host_ema_update_and_load():
    from multimae_tpu.train.train_state import HostEMA

    params = {"w": jnp.ones((3,)), "b": {"k": jnp.full((2,), 2.0)}}
    ema = HostEMA(params, decay=0.9)
    new_params = {"w": jnp.full((3,), 2.0), "b": {"k": jnp.zeros((2,))}}
    ema.update(new_params)
    np.testing.assert_allclose(ema.params["w"], 0.9 * 1.0 + 0.1 * 2.0)
    np.testing.assert_allclose(ema.params["b"]["k"], 0.9 * 2.0)
    # load() restores a saved state dict
    ema2 = HostEMA(params, decay=0.9)
    ema2.load(ema.params)
    np.testing.assert_allclose(ema2.params["w"], ema.params["w"])


# ------------------------------------------------------------------- mixup


def test_cutmix_lam_no_numpy_deprecation():
    from multimae_tpu.data.mixup import cutmix_bbox_and_lam

    rng = np.random.default_rng(0)
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        (yl, yu, xl, xu), lam = cutmix_bbox_and_lam(
            (8, 32, 32, 3), 0.7, ratio_minmax=None, correct_lam=True, rng=rng
        )
    assert isinstance(lam, float)
    assert 0.0 <= lam <= 1.0


def test_extract_spp_stats_matches_torch_semantics():
    """SPP stats utility (reference utils/model.py:48-106): fnmatch module
    selection + channel statistics over capture_intermediates."""
    import jax
    import numpy as np

    from multimae_tpu.models import MultiMAE, PatchedInputAdapter
    from multimae_tpu.utils.model_utils import (
        avg_ch_var,
        avg_sq_ch_mean,
        extract_spp_stats,
    )

    model = MultiMAE(
        input_adapters={
            "rgb": __import__("functools").partial(
                PatchedInputAdapter, num_channels=3, stride_level=1,
                patch_size_full=16, image_size=32,
            )
        },
        output_adapters=None,
        dim_tokens=32, depth=2, num_heads=4,
    )
    batch = {"rgb": jax.numpy.ones((2, 32, 32, 3))}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)},
        batch, num_encoded_tokens=3,
    )
    stats = extract_spp_stats(
        model, {"params": variables["params"]}, batch,
        hook_fn_locs=["encoder_*.mlp", "encoder_*.attn"],
        hook_fns=[avg_ch_var, avg_sq_ch_mean],
        num_encoded_tokens=3,
        rngs={"masking": jax.random.PRNGKey(2)},
    )
    assert set(stats) == {"avg_ch_var", "avg_sq_ch_mean"}
    # 2 encoder blocks -> 2 mlp modules and 2 attn modules matched.
    assert [n for n, _ in stats["avg_ch_var"]] == ["encoder_0.mlp", "encoder_1.mlp"]
    assert [n for n, _ in stats["avg_sq_ch_mean"]] == [
        "encoder_0.attn", "encoder_1.attn"]
    for vals in stats.values():
        for _, v in vals:
            assert np.isfinite(v) and v >= 0

    # torch-semantics cross-check of the stat fns on a known array.
    import torch

    x = np.random.default_rng(0).standard_normal((2, 5, 7, 3)).astype(np.float32)
    tx = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW like the reference
    ref_var = float(torch.mean(tx.var(axis=[0, 2, 3])))
    ref_sqm = float(torch.mean(tx.mean(axis=[0, 2, 3]) ** 2))
    np.testing.assert_allclose(avg_ch_var(jax.numpy.asarray(x)), ref_var, rtol=1e-5)
    np.testing.assert_allclose(avg_sq_ch_mean(jax.numpy.asarray(x)), ref_sqm, rtol=1e-5)
