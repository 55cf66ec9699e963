"""Measure the PyTorch-reference CPU baseline for BASELINE.md / bench.py.

The reference itself can't be imported here (its model files pull torchvision/
timm/torchinfo, absent from this image), so this harness builds
architecture-identical torch models from the specs in SURVEY.md §2.3 and
times forward (inference) and forward+backward+Adam (train) on CPU at the
benchmark resolution. Written fresh for measurement only — not part of the
framework.

Rows (matching scripts/bench_grid.py / BASELINE.json "configs"):
  poolresnet_infer / poolresnet_train — PoolResnet-128 (k10/s8/p2 stem ->
    10x residual blocks w/ conditional pool -> k6 head, PoolResnet.py)
  ssd_train        — SSD-16 multi-scale (SSD.py:84-255 filter schedule)
  mobilenetv3_train— MobileNetV3-Small backbone + 5ch head
                     (MobilenetV3Backbone.py:33-46)
  separable_train  — SeparableCNN-128 (SeparableCNN.py:54-112)
  pruned_infer     — 20% L1-pruned PoolResnet (128 -> 102 ch, pruner.py)
  exported_infer   — torch.jit.script'ed PoolResnet forward
                     (convert_checkpoint_to_scripted_model.py analogue)

Usage: python scripts/torch_cpu_baseline.py [--size 320] [--batch 8]
       [--rows poolresnet,ssd,...]   (default: all)
Writes one JSON line to stdout.
"""

import argparse
import json
import time

import torch
from torch import nn


class _Block(nn.Module):
    """PoolResnet residual block: [conv3x3+leaky(0.2)]x2 + skip, conditional
    2x2 max-pool while spatial dim > threshold."""

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


class _SSDBlock(nn.Module):
    """SSD's block (SSD.py:14-81): two dense 3x3 convs + leaky(0.2), 1x1 skip
    projection when channel counts differ, explicit max-pool flag."""

    def __init__(self, in_f: int, out_f: int, pool: bool = False):
        super().__init__()
        self.proj = nn.Conv2d(in_f, out_f, 1) if in_f != out_f else None
        self.a = nn.Conv2d(in_f, out_f, 3, padding=1)
        self.b = nn.Conv2d(out_f, out_f, 3, padding=1)
        self.act = nn.LeakyReLU(0.2)
        self.drop = nn.Dropout2d(0.25)
        self.pool = pool

    def forward(self, t):
        skip = self.proj(t) if self.proj is not None else t
        r = self.drop(self.act(self.b(self.act(self.a(t))))) + skip
        if self.pool:
            r = nn.functional.max_pool2d(r, 2)
        return r


class RefEquivalentSSD(nn.Module):
    """SSD-16 multi-scale detector (spec: SSD.py:84-255 / SURVEY.md §2.3):
    stride-2 stem, 9-block extractor with two pools, per-scale continue
    blocks with position-wise Linear(ch -> 5) heads, concat + sigmoid scores."""

    def __init__(self, f: int, size: int):
        super().__init__()
        max_f = 16 * f
        self.stem = nn.Conv2d(3, f, 3, stride=2, padding=1)
        ext = [_SSDBlock(f, 2 * f, pool=True), _SSDBlock(2 * f, 2 * f, pool=True)]
        ext += [_SSDBlock(2 * f, 2 * f) for _ in range(6)]
        ext += [_SSDBlock(2 * f, 4 * f)]
        self.extractor = nn.ModuleList(ext)
        self.scales = nn.ModuleList()
        self.heads = nn.ModuleList()
        for i in range(4):
            in_f = min(4 * f * 2**i, max_f)
            out_f = min(2 * in_f, max_f)
            self.scales.append(_SSDBlock(in_f, out_f, pool=(i != 0)))
            self.heads.append(nn.Linear(out_f, 5))

    def forward(self, t):
        t = self.stem(t)
        for blk in self.extractor:
            t = blk(t)
        outs = []
        for blk, head in zip(self.scales, self.heads):
            t = blk(t)
            z = head(t.permute(0, 2, 3, 1).flatten(1, 2))
            outs.append(z)
        z = torch.cat(outs, dim=1)
        return torch.cat([torch.sigmoid(z[..., :1]), z[..., 1:]], dim=-1)


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _SqueezeExcite(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        red = _make_divisible(ch * 0.25)
        self.reduce = nn.Conv2d(ch, red, 1)
        self.expand = nn.Conv2d(red, ch, 1)

    def forward(self, t):
        s = t.mean((2, 3), keepdim=True)
        s = torch.relu(self.reduce(s))
        return t * nn.functional.hardsigmoid(self.expand(s))


class _InvertedResidual(nn.Module):
    def __init__(self, in_ch, exp, out, k, stride, se, act):
        super().__init__()
        self.use_res = stride == 1 and in_ch == out
        a = nn.Hardswish() if act == "hswish" else nn.ReLU()
        layers = []
        if exp != in_ch:
            layers += [nn.Conv2d(in_ch, exp, 1, bias=False),
                       nn.BatchNorm2d(exp, eps=1e-3), a]
        layers += [
            nn.Conv2d(exp, exp, k, stride=stride, padding=k // 2, groups=exp,
                      bias=False),
            nn.BatchNorm2d(exp, eps=1e-3), a,
        ]
        if se:
            layers.append(_SqueezeExcite(exp))
        layers += [nn.Conv2d(exp, out, 1, bias=False),
                   nn.BatchNorm2d(out, eps=1e-3)]
        self.body = nn.Sequential(*layers)

    def forward(self, t):
        r = self.body(t)
        return r + t if self.use_res else r


# (kernel, exp, out, SE, act, stride) — MobileNetV3-Small (Howard et al. 2019)
_MNV3_SMALL = (
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hswish", 2),
    (5, 240, 40, True, "hswish", 1),
    (5, 240, 40, True, "hswish", 1),
    (5, 120, 48, True, "hswish", 1),
    (5, 144, 48, True, "hswish", 1),
    (5, 288, 96, True, "hswish", 2),
    (5, 576, 96, True, "hswish", 1),
    (5, 576, 96, True, "hswish", 1),
)


class RefEquivalentMobileNetV3(nn.Module):
    """MobileNetV3-Small backbone + 5-channel detection head
    (spec: MobilenetV3Backbone.py:33-46 wrapping timm's
    tf_mobilenetv3_small_100 stem+blocks, 576ch @ stride 32)."""

    def __init__(self):
        super().__init__()
        blocks = [nn.Conv2d(3, 16, 3, stride=2, padding=1, bias=False),
                  nn.BatchNorm2d(16, eps=1e-3), nn.Hardswish()]
        in_ch = 16
        for (k, exp, out, se, act, s) in _MNV3_SMALL:
            blocks.append(_InvertedResidual(in_ch, exp, out, k, s, se, act))
            in_ch = out
        blocks += [nn.Conv2d(in_ch, 576, 1, bias=False),
                   nn.BatchNorm2d(576, eps=1e-3), nn.Hardswish()]
        self.backbone = nn.Sequential(*blocks)
        self.head = nn.Conv2d(576, 5, 3, padding=1)

    def forward(self, t):
        return torch.sigmoid(self.head(self.backbone(t)))


class _SepBlock(nn.Module):
    """SeparableCNN residual block (SeparableCNN.py:10-51): bias-free
    pointwise -> leaky -> depthwise3x3 -> leaky -> pointwise -> dropout2d
    -> +skip -> pool while spatial dim > pool_until."""

    def __init__(self, width: int, pool_until: int):
        super().__init__()
        self.pool_until = pool_until
        self.pw1 = nn.Conv2d(width, width, 1, bias=False)
        self.dw = nn.Conv2d(width, width, 3, padding=1, groups=width, bias=False)
        self.pw2 = nn.Conv2d(width, width, 1, bias=False)
        self.act = nn.LeakyReLU(0.2)
        self.drop = nn.Dropout2d(0.25)

    def forward(self, t):
        r = self.drop(self.pw2(self.act(self.dw(self.act(self.pw1(t)))))) + t
        if r.shape[-1] > self.pool_until:
            r = nn.functional.max_pool2d(r, 2)
        return r


class RefEquivalentSeparableCNN(nn.Module):
    """SeparableCNN-128 grid detector (spec: SeparableCNN.py:54-112)."""

    def __init__(self, width: int, grid: int = 16, blocks: int = 10):
        super().__init__()
        self.stem = nn.Conv2d(3, width, 10, stride=8, padding=2)
        self.blocks = nn.ModuleList(_SepBlock(width, grid) for _ in range(blocks))
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


def measure_train(model, x, iters):
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    with torch.no_grad():
        target = torch.rand_like(model(x))

    def train_step():
        opt.zero_grad()
        loss = ((model(x) - target) ** 2).sum()
        loss.backward()
        opt.step()

    return time_loop(train_step, iters, warmup=1)


def measure_infer(model, x, iters):
    model.eval()
    with torch.no_grad():
        return time_loop(lambda: model(x), iters, warmup=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--filters", type=int, default=128)
    ap.add_argument("--blocks", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--rows", default="poolresnet,ssd,mobilenetv3,separable,pruned,exported",
        help="comma list: poolresnet,ssd,mobilenetv3,separable,pruned,exported",
    )
    args = ap.parse_args()
    rows = set(args.rows.split(","))

    torch.manual_seed(0)
    grid = 15 if args.size == 320 else 10
    x = torch.rand(args.batch, 3, args.size, args.size)
    results = {"size": args.size, "batch": args.batch}

    if "poolresnet" in rows:
        model = RefEquivalentDetector(args.filters, grid, args.blocks)
        results["poolresnet_infer_img_s"] = round(
            args.batch / measure_infer(model, x, args.iters), 2)
        results["poolresnet_train_img_s"] = round(
            args.batch / measure_train(model, x, args.iters), 2)
        # legacy keys kept for bench.py vs_baseline lookups
        results["infer_images_per_sec"] = results["poolresnet_infer_img_s"]
        results["train_images_per_sec"] = results["poolresnet_train_img_s"]

    if "ssd" in rows:
        model = RefEquivalentSSD(16, args.size)
        results["ssd_train_img_s"] = round(
            args.batch / measure_train(model, x, max(2, args.iters // 2)), 2)

    if "mobilenetv3" in rows:
        model = RefEquivalentMobileNetV3()
        results["mobilenetv3_train_img_s"] = round(
            args.batch / measure_train(model, x, args.iters), 2)

    if "separable" in rows:
        model = RefEquivalentSeparableCNN(args.filters, 16, args.blocks)
        results["separable_train_img_s"] = round(
            args.batch / measure_train(model, x, args.iters), 2)

    if "pruned" in rows:
        # pruner.py removes 20% of channels by L1 norm: 128 -> 102 wide
        model = RefEquivalentDetector(round(args.filters * 0.8), grid, args.blocks)
        results["pruned_infer_img_s"] = round(
            args.batch / measure_infer(model, x, args.iters), 2)

    if "exported" in rows:
        model = RefEquivalentDetector(args.filters, grid, args.blocks).eval()
        scripted = torch.jit.script(model)
        with torch.no_grad():
            results["exported_infer_img_s"] = round(
                args.batch / time_loop(lambda: scripted(x), args.iters, warmup=2), 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
