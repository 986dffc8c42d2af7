"""Input-pipeline benchmark: can the host feed the chip?

Measures the REAL pretrain data path — MultiTaskImageFolder (rgb JPEG +
depth uint16 PNG + semseg palette PNG) -> DataAugmentationForMultiMAE
(one consistent RandomResizedCrop/flip across modalities, native fused
crop/resize/normalize for rgb) -> grain loader batching — against the
compute throughput pinned in BENCH_BASELINE.json.

The reference's own known bottleneck is exactly this host-side
decode+augment stage (/root/reference/SETUP.md:21-24). TPU v5e hosts
expose ~28 vCPUs per chip (ct5lp-hightpu-8t: 224 vCPUs / 8 chips), and
grain scales linearly across worker processes, so the decisive metric
is samples/sec/CORE; the headroom ratio reported as `vs_baseline` is

    per_core_rate * CORES_PER_CHIP / compute_samples_per_sec_per_chip

(>1.2 means the pipeline outruns the chip with margin; see PIPELINE.md
for measured numbers and the breakdown).

Prints ONE JSON line:
  {"metric": "input_pipeline_per_core", "value": R, "unit":
   "samples/sec/core", "vs_baseline": headroom_ratio}

--regime selects which REAL host path is measured (VERDICT round-3 #7):
  pretrain   224px DataAugmentationForMultiMAE over rgb+depth+semseg
             (default; compute baseline = BENCH_BASELINE.json)
  semseg512  the 512px LSJ fine-tune path (DataAugmentationForSemSeg:
             hflip + LongestMaxSize + RandomScale(0.1,2) + color jitter
             + crop/pad-to-512, cv2/numpy) over rgb+depth+semseg
             (compute baseline = 39.5 samples/s/chip, bench_finetune)
  cls        the ImageNet-100e path (ClsTrainTransform: RandomResizedCrop
             + RandAugment rand-m9-mstd0.5-inc1 + RandomErasing) over
             rgb only (compute baseline = 745.5 samples/s/chip)

Usage: python bench_data.py [--regime pretrain|semseg512|cls] [--root DIR]
       [--n 300] [--samples 400] [--workers 0] [--compute RATE]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORES_PER_CHIP = int(os.environ.get("MULTIMAE_TPU_HOST_CORES_PER_CHIP", "28"))
BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json"
)


def synthesize_dataset(root: str, n: int, seed: int = 0):
    """ImageNet-layout multitask tree with realistic image sizes/content.

    Natural-image-like JPEGs (smooth gradients + noise compress to
    realistic ~40-120 KB files), uint16 depth PNGs, palette semseg PNGs.
    """
    from PIL import Image

    done_marker = os.path.join(root, f".done_{n}")
    if os.path.exists(done_marker):
        return
    rng = np.random.default_rng(seed)
    for i in range(n):
        cls = f"c{i % 4}"
        name = f"i{i:05d}"
        # Typical ImageNet dims cluster around 500x375.
        w = int(rng.integers(400, 640))
        h = int(rng.integers(300, 520))
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = (
            127
            + 80 * np.sin(xx / rng.uniform(20, 80))
            + 60 * np.cos(yy / rng.uniform(20, 80))[..., None].squeeze(-1)
        )
        img = np.stack(
            [base + rng.normal(0, 25, (h, w)) for _ in range(3)], axis=-1
        )
        img = np.clip(img, 0, 255).astype(np.uint8)
        os.makedirs(f"{root}/rgb/{cls}", exist_ok=True)
        os.makedirs(f"{root}/depth/{cls}", exist_ok=True)
        os.makedirs(f"{root}/semseg/{cls}", exist_ok=True)
        Image.fromarray(img, "RGB").save(
            f"{root}/rgb/{cls}/{name}.jpg", quality=90
        )
        depth = (base / 255.0 * 50000).astype(np.uint16)
        Image.fromarray(depth).save(f"{root}/depth/{cls}/{name}.png")
        seg = (base / 16).astype(np.uint8) % 133
        Image.fromarray(seg, "L").convert("P").save(
            f"{root}/semseg/{cls}/{name}.png"
        )
    with open(done_marker, "w") as f:
        f.write("ok")


# Fine-tune compute baselines (samples/s/chip on v5e-1, CLAUDE.md):
# semseg512 from tools/bench_finetune.py --task semseg, cls from
# --task cls at the ImageNet-100e recipe shape.
_COMPUTE_DEFAULTS = {"semseg512": 39.5, "cls": 745.5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", default="pretrain",
                    choices=("pretrain", "semseg512", "cls"))
    ap.add_argument("--root", default="/tmp/multimae_bench_data")
    ap.add_argument("--n", type=int, default=300, help="dataset size")
    ap.add_argument("--samples", type=int, default=400,
                    help="samples to time per measurement")
    ap.add_argument("--workers", type=int, default=0,
                    help="grain worker processes (0 = in-process)")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--loader_batches", type=int, default=10,
                    help="min batches in the grain timing window (must "
                         "exceed the worker prefetch depth)")
    ap.add_argument("--compute", type=float, default=None,
                    help="compute samples/s/chip to compare against "
                         "(default: BENCH_BASELINE.json for pretrain, "
                         "pinned bench_finetune numbers otherwise)")
    args = ap.parse_args()

    # Keep JAX off the accelerator: this benchmark is host-only (the
    # ambient env pins JAX_PLATFORMS=axon — override, don't setdefault).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from multimae_tpu.data.dataset_folder import ImageFolder, MultiTaskImageFolder
    from multimae_tpu.data.loader import build_loader
    from multimae_tpu.data.pretrain_transforms import DataAugmentationForMultiMAE
    from multimae_tpu import native

    synthesize_dataset(args.root, args.n)
    if args.regime == "semseg512":
        from multimae_tpu.data.semseg_transforms import (
            DataAugmentationForSemSeg,
            SimpleTransform,
        )

        dataset = MultiTaskImageFolder(args.root, ["rgb", "depth", "semseg"])
        transform = DataAugmentationForSemSeg(
            SimpleTransform(train=True, input_size=512),
            seg_num_classes=133,
        )
    elif args.regime == "cls":
        from multimae_tpu.data.cls_transforms import ClsTrainTransform

        cls_ds = ImageFolder(os.path.join(args.root, "rgb"))
        cls_tf = ClsTrainTransform(input_size=224)

        class _ClsAsMultiTask:
            """load_raw -> ({'rgb': PIL}, target) so the timing loop below
            is regime-agnostic; transform unwraps the dict."""

            def __len__(self):
                return len(cls_ds)

            def load_raw(self, i):
                path, target = cls_ds.samples[i]
                from multimae_tpu.data.dataset_folder import pil_loader

                return {"rgb": pil_loader(path)}, target

        dataset = _ClsAsMultiTask()
        transform = lambda d, rng=None: {"rgb": cls_tf(d["rgb"], rng)}  # noqa: E731
    else:
        dataset = MultiTaskImageFolder(args.root, ["rgb", "depth", "semseg"])
        transform = DataAugmentationForMultiMAE(input_size=224)

    # --- stage breakdown (single core, in-process) ---
    idxs = np.arange(args.samples) % len(dataset)
    # warmup (page cache, native lib build)
    for i in idxs[:20]:
        d, _ = dataset.load_raw(int(i))
        transform(d)

    t0 = time.perf_counter()
    raws = [dataset.load_raw(int(i)) for i in idxs]
    t_decode = time.perf_counter() - t0
    # PIL decodes lazily: force pixel access is part of transform; so
    # time decode+transform jointly and transform-on-decoded separately.
    t0 = time.perf_counter()
    for d, _ in raws:
        transform(d)
    t_transform_hot = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in idxs:
        d, _ = dataset.load_raw(int(i))
        transform(d)
    t_total = time.perf_counter() - t0
    per_core = args.samples / t_total

    # --- grain end-to-end (batched; pretrain regime only — the other
    # regimes' decisive number is the per-core rate above) ---
    loader_rate = None
    if args.regime == "pretrain":
        loader = build_loader(
            dataset, transform, global_batch_size=args.batch_size,
            shuffle=True, seed=0, num_epochs=None, worker_count=args.workers,
        )
        # Steady state, not buffer drain: with worker processes the first
        # next() returns while workers have already prefetched several
        # batches, so a short timed window measures queue pops, not
        # production rate (observed 5063/s "rate" on a 1-core host with
        # 4 workers and a 3-batch window). Time enough batches that the
        # producers bound the window.
        nb_warm = 2
        nb = max(args.loader_batches, args.samples // args.batch_size)
        for _ in range(nb_warm):
            next(loader)
        t0 = time.perf_counter()
        for _ in range(nb):
            batch = next(loader)
        t_loader = time.perf_counter() - t0
        loader_rate = nb * args.batch_size / t_loader
        assert batch["rgb"].shape[1:] == (224, 224, 3)

    compute = args.compute or _COMPUTE_DEFAULTS.get(args.regime)
    if compute is None and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            compute = json.load(f)["value"]
    headroom = (per_core * CORES_PER_CHIP / compute) if compute else None

    print(
        f"# native fastimage: {native.available()} | "
        f"open-files: {args.samples / (t_decode or 1e-9):.1f}/s | "
        f"transform(hot): {args.samples / t_transform_hot:.1f}/s | "
        f"full sample: {per_core:.1f}/s/core | "
        + (f"grain({args.workers}w): {loader_rate:.1f}/s | "
           if loader_rate is not None else "")
        + f"implied host ({CORES_PER_CHIP} cores/chip): "
        f"{per_core * CORES_PER_CHIP:.0f}/s/chip vs compute {compute}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"input_pipeline_per_core_{args.regime}",
        "value": round(per_core, 2),
        "unit": "samples/sec/core",
        "vs_baseline": round(headroom, 4) if headroom else None,
    }))


if __name__ == "__main__":
    main()
