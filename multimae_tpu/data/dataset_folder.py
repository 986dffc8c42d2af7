"""Multi-modal folder datasets.

Parity targets (reference: utils/dataset_folder.py):
  * make_dataset / class scanning     — :35-78, :140-156
  * ImageFolder (single modality)     — :81-183, :346-385
  * MultiTaskImageFolder              — :186-314, :387-431
    - aligned per-modality trees root/<task>/<class>/<name>.<ext>
    - per-task folder `prefixes` (e.g. pseudo-labels)
    - `max_images` fixed-seed subsetting (np seed 0 permutation, :259-265)
    - semseg loaded as palette 'P' (:302), rgb converted to RGB
    - corrupt-file retry with a random resample (:166-173)

These are plain random-access sources (no torch); the grain DataLoader in
multimae_tpu.data.loader shards and prefetches them per host.
"""

from __future__ import annotations

import os
import random
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp",
    ".jpx",
)


def has_file_allowed_extension(filename: str, extensions: Tuple[str, ...]) -> bool:
    return filename.lower().endswith(extensions)


def find_classes(directory: str) -> Tuple[List[str], Dict[str, int]]:
    classes = sorted(d.name for d in os.scandir(directory) if d.is_dir())
    return classes, {c: i for i, c in enumerate(classes)}


def make_dataset(
    directory: str,
    class_to_idx: Dict[str, int],
    extensions: Tuple[str, ...] = IMG_EXTENSIONS,
) -> List[Tuple[str, int]]:
    instances = []
    for target_class in sorted(class_to_idx.keys()):
        class_index = class_to_idx[target_class]
        target_dir = os.path.join(directory, target_class)
        if not os.path.isdir(target_dir):
            continue
        for root, _, fnames in sorted(os.walk(target_dir, followlinks=True)):
            for fname in sorted(fnames):
                path = os.path.join(root, fname)
                if has_file_allowed_extension(path, extensions):
                    instances.append((path, class_index))
    return instances


def pil_loader(path: str, convert_rgb: bool = True):
    from PIL import Image

    if convert_rgb and path.lower().endswith((".jpg", ".jpeg")):
        # Native libjpeg-turbo fast path (multimae_tpu/native); identical
        # pixels to PIL's decoder, avoids PIL mode plumbing.
        try:
            from multimae_tpu import native

            if native.available():
                with open(path, "rb") as f:
                    arr = native.decode_jpeg(f.read())
                if arr is not None:
                    return Image.fromarray(arr, "RGB")
        except Exception:
            pass
    if path.lower().endswith(".png"):
        # Native libpng path (depth uint16 / semseg palette / gray):
        # pixel-identical to PIL (tests/test_native.py), modestly faster,
        # and keeps decode in one native layer with the JPEG path.
        try:
            from multimae_tpu import native

            if native.available():
                with open(path, "rb") as f:
                    arr = native.decode_png(f.read(), want_rgb=convert_rgb)
                if arr is not None:
                    img = Image.fromarray(arr)
                    return img.convert("RGB") if convert_rgb else img
        except Exception:
            pass
    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB") if convert_rgb else img.copy()


class ImageFolder:
    """Single-modality class-folder dataset returning (PIL image, target)."""

    def __init__(
        self,
        root: str,
        transform: Optional[Callable] = None,
        extensions: Tuple[str, ...] = IMG_EXTENSIONS,
    ):
        self.root = root
        self.classes, self.class_to_idx = find_classes(root)
        self.samples = make_dataset(root, self.class_to_idx, extensions)
        if not self.samples:
            raise RuntimeError(f"Found 0 files in subfolders of: {root}")
        self.transform = transform

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        while True:
            try:
                path, target = self.samples[index]
                sample = pil_loader(path)
                break
            except Exception as e:  # corrupt-file retry (reference :166-173)
                print(e)
                index = random.randint(0, len(self.samples) - 1)
        if self.transform is not None:
            sample = self.transform(sample)
        return sample, target


class MultiTaskImageFolder:
    """Aligned per-modality folder trees; __getitem__ -> ({task: PIL}, target)."""

    def __init__(
        self,
        root: str,
        tasks: Sequence[str],
        transform: Optional[Callable] = None,
        prefixes: Optional[Dict[str, str]] = None,
        max_images: Optional[int] = None,
        extensions: Tuple[str, ...] = IMG_EXTENSIONS,
    ):
        self.root = root
        self.tasks = list(tasks)
        self.classes, self.class_to_idx = find_classes(
            os.path.join(root, self.tasks[0])
        )
        prefixes = dict(prefixes or {})
        prefixes.update({t: "" for t in self.tasks if t not in prefixes})
        self.samples = {
            t: make_dataset(
                os.path.join(root, f"{prefixes[t]}{t}"), self.class_to_idx, extensions
            )
            for t in self.tasks
        }
        for t, s in self.samples.items():
            if not s:
                raise RuntimeError(f"Found 0 files in subfolders of: {root}/{t}")
        if isinstance(max_images, int):
            total = len(next(iter(self.samples.values())))
            rng = np.random.RandomState(0)  # fixed-seed subset (reference :262)
            permutation = rng.permutation(total)
            for t in self.samples:
                self.samples[t] = [self.samples[t][i] for i in permutation][:max_images]
        self.transform = transform

    def __len__(self) -> int:
        return len(next(iter(self.samples.values())))

    def load_raw(self, index: int) -> Tuple[Dict[str, Any], int]:
        sample_dict = {}
        target = 0
        for t in self.tasks:
            path, target = self.samples[t][index]
            img = pil_loader(path, convert_rgb=(t == "rgb"))
            if "semseg" in t:
                img = img.convert("P")
            sample_dict[t] = img
        return sample_dict, target

    def __getitem__(self, index: int):
        while True:
            try:
                sample_dict, target = self.load_raw(index)
                break
            except Exception as e:
                print(e)
                index = random.randint(0, len(self) - 1)
        if self.transform is not None:
            sample_dict = self.transform(sample_dict)
        return sample_dict, target


class CIFAR100:
    """CIFAR-100 from the standard `cifar-100-python` pickle layout.

    Parity target: the reference's `--data_set CIFAR` branch
    (utils/datasets.py:142-143) builds torchvision's CIFAR100 (fine
    labels, 100 classes). This reads the same on-disk format
    (`<root>/cifar-100-python/{train,test}` pickles with b'data'
    (N, 3072) uint8 rows in CHW order and b'fine_labels') without
    torchvision, returning (PIL image, target) like ImageFolder.
    No downloading: the files must already exist under `root`.
    """

    base_folder = "cifar-100-python"

    def __init__(self, root: str, train: bool = True,
                 transform: Optional[Callable] = None):
        import pickle

        from PIL import Image  # noqa: F401 (used in __getitem__)

        path = os.path.join(root, self.base_folder, "train" if train else "test")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"CIFAR-100 pickle not found: {path} (download is not "
                "supported in this environment; place cifar-100-python/ "
                "under the data path)"
            )
        with open(path, "rb") as f:
            entry = pickle.load(f, encoding="bytes")
        self.data = entry[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        self.targets = list(entry[b"fine_labels"])
        self.transform = transform
        self.classes = [str(i) for i in range(100)]
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}

    def __len__(self) -> int:
        return len(self.targets)

    def load_raw(self, index: int):
        from PIL import Image

        return Image.fromarray(self.data[index]), self.targets[index]

    def __getitem__(self, index: int):
        img, target = self.load_raw(index)
        if self.transform is not None:
            img = self.transform(img)
        return img, target
