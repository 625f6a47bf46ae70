"""Measure the REFERENCE's actual input pipeline throughput on this host.

``bench.py``'s ``vs_baseline`` divides by an ESTIMATED 700 img/s for the
reference's 2-worker PIL DataLoader on an A100 host (bench.py module
docstring). This tool replaces the estimate with a measurement of the real
thing (VERDICT r3 item 9): it imports the reference's own ``GIDataset`` +
``TransformFixMatch`` + ``RandAugmentMC`` from /root/reference/code at
runtime (torch-oracle pattern, nothing copied), drives them with the exact
flagship DataLoader configuration (dataset.py:350-358: RandomSampler,
batch_size B and B*MU, NUM_WORKERS=2 per every reference config), and times
how fast the pair of loaders can produce FixMatch steps' worth of data
(B labeled + B*MU unlabeled items -> B*(1+2*MU) view-images per step — the
same convention bench.py uses for the TPU step).

    python tools/bench_reference_loader.py [--img 112] [--steps 20]

The number is host-class-specific (this is a 1-core VM; the Kaggle/A100
hosts the reference ran on have more cores) — report it alongside, not in
place of, the per-image CPU cost, and scale by core count when rebasing.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REF = "/root/reference/code"


class _NS(dict):
    __getattr__ = dict.__getitem__


def _install_shims() -> None:
    """torchvision/timm are not installed here; the reference transforms are
    thin PIL wrappers, so measurement-faithful PIL implementations stand in
    (JPEG decode + PIL resize/crop/RandAugment dominate the cost either
    way). Only the classes TransformFixMatch constructs are provided."""
    import types

    import numpy as np
    import torch
    from PIL import Image

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size):
            self.size = size if isinstance(size, tuple) else (size, size)

        def __call__(self, img):
            h, w = self.size
            return img.resize((w, h), Image.BILINEAR)

    class CenterCrop:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            w, h = img.size
            s = self.size
            left, top = (w - s) // 2, (h - s) // 2
            return img.crop((left, top, left + s, top + s))

    class RandomHorizontalFlip:
        def __init__(self, p=0.5):
            self.p = p

        def __call__(self, img):
            import random
            return (img.transpose(Image.FLIP_LEFT_RIGHT)
                    if random.random() < self.p else img)

    class RandomCrop:
        def __init__(self, size, padding=0, padding_mode="reflect"):
            self.size, self.padding = size, padding

        def __call__(self, img):
            import random
            a = np.asarray(img)
            p = self.padding
            a = np.pad(a, ((p, p), (p, p), (0, 0)), mode="reflect")
            y = random.randint(0, a.shape[0] - self.size)
            x = random.randint(0, a.shape[1] - self.size)
            return Image.fromarray(a[y:y + self.size, x:x + self.size])

    class ToTensor:
        def __call__(self, img):
            a = np.asarray(img, np.float32) / 255.0
            return torch.from_numpy(a.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(3, 1, 1)
            self.std = torch.tensor(std).view(3, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    tv = types.ModuleType("torchvision")
    tfm = types.ModuleType("torchvision.transforms")
    for cls in (Compose, Resize, CenterCrop, RandomHorizontalFlip,
                RandomCrop, ToTensor, Normalize):
        setattr(tfm, cls.__name__, cls)
    tv.transforms = tfm
    tv.datasets = types.ModuleType("torchvision.datasets")
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tfm
    sys.modules["torchvision.datasets"] = tv.datasets

    timm = types.ModuleType("timm")
    timm_data = types.ModuleType("timm.data")
    timm_data.Mixup = object  # imported by dataset.py, unused on this path
    timm.data = timm_data
    sys.modules.setdefault("timm", timm)
    sys.modules["timm.data"] = timm_data


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=112)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mu", type=int, default=7)
    ap.add_argument("--workers", type=int, default=2)  # every reference cfg
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--data", default="data/loader_bench")
    args = ap.parse_args(argv)

    _install_shims()
    sys.path.insert(0, REF)
    import pandas as pd
    import torch
    from torch.utils.data import DataLoader, RandomSampler

    from dataset import GIDataset, TransformFixMatch  # reference modules
    from torchvision import transforms

    files = sorted(f for f in os.listdir(args.data) if f.endswith(".jpg"))
    assert files, f"no JPEGs under {args.data}"
    df = pd.DataFrame({"image": files, "target": [0] * len(files)})

    config = _NS(
        DATA=_NS(IMG_SIZE=args.img, IS_CROP=True, PATH=args.data,
                 UNANNO_PATH=args.data, INPUT_NAME="image",
                 TARGET_NAME="target", MOCKUP_SSL=True,
                 NUM_WORKERS=args.workers, BATCH_SIZE=args.batch,
                 MU=args.mu),
        MODEL=_NS(NUM_CLASSES=6, IS_TRIPLET=False),
    )
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)

    # labeled pipeline: weak transform + normalize (dataset.py get_transform
    # is_train=True -> the supervised path; the FixMatch labeled loader uses
    # the same resize/crop/flip + normalize family). Unlabeled: the full
    # TransformFixMatch dual-view (weak + strong RandAugmentMC).
    labeled_tf = transforms.Compose([
        transforms.Resize((int(args.img * 1.2), int(args.img * 1.2))),
        transforms.CenterCrop(args.img),
        transforms.RandomHorizontalFlip(),
        transforms.ToTensor(),
        transforms.Normalize(mean=mean, std=std)])
    unlabeled_tf = TransformFixMatch(config, mean, std)

    lab_ds = GIDataset(df=df, config=config, transforms=labeled_tf)
    unl_ds = GIDataset(df=df, config=config, transforms=unlabeled_tf,
                       is_unanno=True)
    lab_dl = DataLoader(lab_ds, sampler=RandomSampler(lab_ds),
                        batch_size=args.batch, num_workers=args.workers)
    unl_dl = DataLoader(unl_ds, sampler=RandomSampler(unl_ds),
                        batch_size=args.batch * args.mu,
                        num_workers=args.workers)

    lab_it, unl_it = iter(lab_dl), iter(unl_dl)
    # warmup: one step (worker spawn + first decode)
    next(lab_it), next(unl_it)

    t0 = time.perf_counter()
    done = view_imgs = decodes = 0
    for _ in range(args.steps):
        try:
            x, _ = next(lab_it)
        except StopIteration:
            lab_it = iter(lab_dl)
            x, _ = next(lab_it)
        try:
            (uw, us), _ = next(unl_it)
        except StopIteration:
            unl_it = iter(unl_dl)
            (uw, us), _ = next(unl_it)
        torch.add(x.sum(), uw.sum() + us.sum())  # touch the tensors
        done += 1
        # count what was actually yielded, not the nominal batch sizes: a
        # data dir smaller than batch*mu yields short batches under
        # RandomSampler and nominal counting would overstate throughput
        view_imgs += int(x.shape[0] + uw.shape[0] + us.shape[0])
        decodes += int(x.shape[0] + uw.shape[0])
    dt = time.perf_counter() - t0

    print(f"host cores: {os.cpu_count()}, workers: {args.workers}")
    print(f"{done} steps in {dt:.1f}s")
    print(f"items (JPEG decodes) per sec: {decodes / dt:.1f}")
    print(f"view-images per sec (bench.py convention): "
          f"{view_imgs / dt:.1f}")
    print(f"per-core view-images per sec: "
          f"{view_imgs / dt / min(args.workers, os.cpu_count()):.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
