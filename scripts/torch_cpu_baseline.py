"""Measure the PyTorch-reference CPU baseline for BASELINE.md / bench.py.

The reference itself can't be imported here (its model files pull torchvision/
torchinfo, absent from this image), so this harness builds an
architecture-identical torch model from the spec in SURVEY.md §2.3
(PoolResnet: k10/s8/p2 stem -> N x [conv3x3+leaky(0.2)]x2 residual blocks with
conditional 2x2 max-pool while dim > 2*grid -> dropout -> k6 valid 5-channel
head -> sigmoid) and times forward (inference) and forward+backward+Adam
(train) on CPU at the benchmark resolution. Written fresh for measurement
only — not part of the framework.

Usage: python scripts/torch_cpu_baseline.py [--size 320] [--filters 128]
Writes JSON to stdout.
"""

import argparse
import json
import time

import torch
from torch import nn


class _Block(nn.Module):
    def __init__(self, width: int, pool_threshold: int):
        super().__init__()
        self.pool_threshold = pool_threshold
        self.a = nn.Conv2d(width, width, 3, padding=1)
        self.b = nn.Conv2d(width, width, 3, padding=1)
        self.act = nn.LeakyReLU(0.2)
        self.drop = nn.Dropout2d(0.25)

    def forward(self, t):
        r = self.drop(self.act(self.b(self.act(self.a(t))))) + t
        if r.shape[-1] > self.pool_threshold:
            r = nn.functional.max_pool2d(r, 2)
        return r


class RefEquivalentDetector(nn.Module):
    """PoolResnet-shaped grid detector (spec: SURVEY.md §2.3)."""

    def __init__(self, width: int, grid: int, blocks: int):
        super().__init__()
        self.stem = nn.Conv2d(3, width, 10, stride=8, padding=2)
        self.blocks = nn.ModuleList(
            _Block(width, 2 * grid) for _ in range(blocks)
        )
        self.head_drop = nn.Dropout2d(0.5)
        self.head = nn.Conv2d(width, 5, 6)

    def forward(self, t):
        t = self.stem(t)
        for blk in self.blocks:
            t = blk(t)
        return torch.sigmoid(self.head(self.head_drop(t)))


def time_loop(fn, iters: int, warmup: int = 2) -> float:
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--filters", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    torch.manual_seed(0)
    grid = 15 if args.size == 320 else 10
    model = RefEquivalentDetector(args.filters, grid, args.blocks)
    x = torch.rand(args.batch, 3, args.size, args.size)

    model.eval()
    with torch.no_grad():
        infer_s = time_loop(lambda: model(x), args.iters)

    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    target = torch.rand_like(model(x))

    def train_step():
        opt.zero_grad()
        loss = ((model(x) - target) ** 2).sum()
        loss.backward()
        opt.step()

    train_s = time_loop(train_step, args.iters)

    print(
        json.dumps(
            {
                "size": args.size,
                "filters": args.filters,
                "batch": args.batch,
                "infer_images_per_sec": args.batch / infer_s,
                "train_images_per_sec": args.batch / train_s,
            }
        )
    )


if __name__ == "__main__":
    main()
