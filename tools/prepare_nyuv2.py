#!/usr/bin/env python
"""Convert the NYUv2 .mat release into the MultiMAE folder layout.

Parity target: reference tools/prepare_nyuv2.py — extracts rgb / depth /
semseg (40-class mapping) / mask_valid from nyu_depth_v2_labeled.mat with
the official train/test splits, writing
  <save_path>/{train,test}/{rgb,depth,semseg,mask_valid}/all/<idx>.{png}
aligned trees consumable by MultiTaskImageFolder.

Inputs (downloaded separately, same URLs as the reference):
  --dataset_path       nyu_depth_v2_labeled.mat
  --splits_path        splits.mat
  --class_mapping_path classMapping40.mat
"""

import argparse
import os

import numpy as np
from PIL import Image


def get_args():
    parser = argparse.ArgumentParser("Script to prepare NYUv2 dataset", add_help=True)
    parser.add_argument("--dataset_path", type=str, required=True,
                        help="Path to nyu_depth_v2_labeled.mat")
    parser.add_argument("--splits_path", type=str, required=True,
                        help="Path to splits.mat")
    parser.add_argument("--class_mapping_path", type=str, default=None,
                        help="Path to classMapping40.mat")
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--depth_scale", type=float, default=1000.0,
                        help="Depth metres -> uint16 scale")
    return parser.parse_args()


def read_label_map(path):
    from scipy.io import loadmat

    if path is None:
        return None
    mapping = loadmat(path)["mapClass"][0]
    # 894 fine classes -> 40 coarse classes; 0 stays void.
    label_map = np.zeros(len(mapping) + 1, np.int32)
    label_map[1:] = mapping
    return label_map


def main():
    args = get_args()
    import h5py
    from scipy.io import loadmat

    f = h5py.File(args.dataset_path, "r")
    images = np.asarray(f["images"])     # (N, 3, W, H)
    depths = np.asarray(f["depths"])     # (N, W, H) metres
    labels = np.asarray(f["labels"])     # (N, W, H) fine classes

    label_map = read_label_map(args.class_mapping_path)
    splits = loadmat(args.splits_path)
    train_idx = splits["trainNdxs"].squeeze() - 1
    test_idx = splits["testNdxs"].squeeze() - 1

    for subset, indices in (("train", train_idx), ("test", test_idx)):
        for task in ("rgb", "depth", "semseg", "mask_valid"):
            os.makedirs(os.path.join(args.save_path, subset, task, "all"),
                        exist_ok=True)
        for i in indices:
            rgb = images[i].transpose(2, 1, 0)          # (H, W, 3)
            depth_m = depths[i].transpose(1, 0)          # (H, W)
            label = labels[i].transpose(1, 0)            # (H, W)
            if label_map is not None:
                label = label_map[label]
            depth_u16 = np.clip(depth_m * args.depth_scale, 0, 65535).astype(
                np.uint16
            )
            mask_valid = ((depth_m > 0) * 255).astype(np.uint8)

            name = f"{i:04d}.png"
            Image.fromarray(rgb.astype(np.uint8), "RGB").save(
                os.path.join(args.save_path, subset, "rgb", "all", name)
            )
            Image.fromarray(depth_u16).save(
                os.path.join(args.save_path, subset, "depth", "all", name)
            )
            Image.fromarray(label.astype(np.uint8), "L").convert("P").save(
                os.path.join(args.save_path, subset, "semseg", "all", name)
            )
            Image.fromarray(mask_valid, "L").save(
                os.path.join(args.save_path, subset, "mask_valid", "all", name)
            )
        print(f"{subset}: wrote {len(indices)} examples")


if __name__ == "__main__":
    main()
