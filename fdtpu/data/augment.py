"""On-device, box-aware image augmentation (the Albumentations replacement).

The reference augments on the host in DataLoader worker processes through
Albumentations/OpenCV (``/root/reference/datasets/WIDERFace/datamodule.py:
105-125``) — on this machine a single CPU core. Here the train-time pipeline
is split by what each processor is good at:

==========================  =====  =========================================
reference op                p      fdtpu implementation
==========================  =====  =========================================
RandomResizedCrop           0.2    device: separable MXU resampling (the
                                   contraction ``jax.image.scale_and_translate``
                                   lowers to, weight mats built closed-form —
                                   see :func:`_crop_weight_mat`)
Resize                      1.0    host decode-time resize (pipeline.py;
                                   native libjpeg path when built)
HorizontalFlip              0.5    device: lane reverse
RandomBrightnessContrast    0.2    device: fused multiply-add
Rotate(20)                  0.2    **host** (PIL, reflect-pad) — see below
GaussNoise(var<=400)        0.2    device: additive normal noise
GlassBlur                   0.2    device: 5x5 Gaussian blur (approximation —
                                   the original's local pixel shuffle is
                                   gather-bound with negligible accuracy
                                   effect at p=0.2)
MotionBlur                  0.2    device: random-angle 7x7 line kernel conv
==========================  =====  =========================================

Rotation placement: arbitrary-affine resampling needs either gathers
(measured 1249 ms per 64x320 batch — TPU gathers are pathological) or
per-row dense weight contractions, whose einsum forms triggered
200-600-second Mosaic compiles at some shapes. Rotating on the host costs
~0.5 ms/image amortized (p=0.2, PIL's C path) and keeps the exact
per-sample Bernoulli distribution — see
``fdtpu.data.pipeline.WIDERFaceDataSource(rotate_prob=...)``. The einsum
warp (:func:`_sample_affine`) is retained for CPU use and as the candidate
for a round-2 Pallas warp kernel.

Boxes are clipped and filtered by ``min_area=10`` (``datamodule.py:121``)
and rounded (``dataset.py:88``); images are scaled to [0, 1]
(``dataset.py:146``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_AREA = 10.0  # datamodule.py:121

P_CROP, P_FLIP, P_BC, P_NOISE, P_GLASS, P_MOTION = 0.2, 0.5, 0.2, 0.2, 0.2, 0.2
P_ROTATE, ROTATE_LIMIT_DEG = 0.2, 20.0  # applied host-side (pipeline.py)


# -- photometric / filter ops ------------------------------------------------


def _gaussian_kernel5(sigma: float = 0.7) -> jnp.ndarray:
    r = jnp.arange(-2, 3, dtype=jnp.float32)
    k = jnp.exp(-(r**2) / (2 * sigma**2))
    k = k / k.sum()
    return jnp.outer(k, k)


def _motion_kernel7(angle) -> jnp.ndarray:
    """7x7 line kernel at ``angle`` (radians) — MotionBlur's random line."""
    return _motion_kernel7_xy(jnp.cos(angle), jnp.sin(angle))


def _motion_kernel7_xy(dx, dy) -> jnp.ndarray:
    """7x7 line kernel from a unit direction (dx, dy)."""
    r = jnp.arange(-3, 4, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    dist = jnp.abs(-dy * xx + dx * yy)
    along = jnp.abs(dx * xx + dy * yy)
    k = jnp.maximum(0.0, 1.0 - dist) * (along <= 3.0)
    return k / jnp.maximum(k.sum(), 1e-6)


def _depthwise_filter(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Apply one 2-D kernel to every channel of an (H, W, C) image."""
    c = img.shape[-1]
    lhs = img[None].transpose(0, 3, 1, 2)  # NCHW
    rhs = jnp.tile(kernel[None, None].astype(img.dtype), (c, 1, 1, 1))
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="SAME", feature_group_count=c
    )
    return out.transpose(0, 2, 3, 1)[0]


def _sample_crop(keys, h: int, w: int, gate: bool = True):
    """RandomResizedCrop window (p=P_CROP, Albumentations default
    scale=(0.08, 1.0), ratio=(3/4, 4/3)): -> (cx, cy, cw, ch), identity
    window (0, 0, w, h) when the gate doesn't fire. ``gate=False`` always
    crops (the exact-k batched path handles the probability by subset
    selection). Split out so the distribution is unit-testable."""
    do_crop = jax.random.bernoulli(keys[0], P_CROP) if gate else jnp.bool_(True)
    area = jax.random.uniform(keys[1], minval=0.08, maxval=1.0) * (w * h)
    log_r = jax.random.uniform(
        keys[2], minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0)
    )
    ratio = jnp.exp(log_r)
    cw = jnp.where(do_crop, jnp.clip(jnp.sqrt(area * ratio), 8.0, w), float(w))
    ch = jnp.where(do_crop, jnp.clip(jnp.sqrt(area / ratio), 8.0, h), float(h))
    cx = jnp.where(do_crop, jax.random.uniform(keys[3]) * (w - cw), 0.0)
    cy = jnp.where(do_crop, jax.random.uniform(keys[4]) * (h - ch), 0.0)
    return cx, cy, cw, ch


# -- the device pipeline -------------------------------------------------------


def _crop_weight_mat(size: int, offset, span):
    """Closed-form linear-resize weight matrix for a crop window
    ``[offset, offset + span)`` resampled back to ``size`` samples.

    Numerically equivalent (to ~1 ulp on the f32 weights) to
    ``jax.image.compute_weight_mat`` with the triangle kernel,
    ``antialias=False`` and the same geometry, but built in two fused
    elementwise passes instead of jax's five (abs-diff, kernel, a
    sum-reduction over the input axis, a normalizing divide, and an
    out-of-range mask): crops always upsample (``span <= size``), so every
    interior sample's two triangle taps already sum to 1 and jax's
    normalization only acts at the half-pixel borders — where dividing a
    lone clipped tap by itself equals clamping the sample position into
    ``[0, size - 1]``. The per-step construction of these matrices (the
    window changes every step, so nothing can be hoisted) measured ~0.8 ms
    of the 1.0 ms crop-resample row at b128/320px
    (``logs/round5/crop_arms.json``); this form cuts the construction to
    the two passes XLA fuses into one. Equivalence is gated by
    ``tests/test_data.py::test_crop_resample_matches_jax_image``.
    """
    pos = offset + (jnp.arange(size, dtype=jnp.float32) + 0.5) * (
        span / size
    ) - 0.5
    pos = jnp.clip(pos, 0.0, float(size - 1))
    x = jnp.abs(pos[None, :] - jnp.arange(size, dtype=jnp.float32)[:, None])
    return jnp.maximum(0.0, 1.0 - x)  # (in, out)


def _apply_crop(img, boxes, mask, cx, cy, cw, ch):
    """Resample the crop window to full size and transform boxes."""
    h, w = img.shape[0], img.shape[1]
    sy, sx = h / ch, w / cw
    # output[o] samples input[c + o/s]; same contraction jax.image's
    # scale_and_translate lowers to, with the weight mats built cheaply
    # (weights cast to the image dtype exactly as jax's implementation does)
    wy = _crop_weight_mat(h, cy, ch).astype(img.dtype)
    wx = _crop_weight_mat(w, cx, cw).astype(img.dtype)
    img = jnp.einsum("hwc,ho,wp->opc", img, wy, wx, precision="highest")
    bx = (boxes[:, 1] - cx) * sx
    by = (boxes[:, 2] - cy) * sy
    bw = boxes[:, 3] * sx
    bh = boxes[:, 4] * sy
    x0 = jnp.clip(bx, 0, w)
    y0 = jnp.clip(by, 0, h)
    x1 = jnp.clip(bx + bw, 0, w)
    y1 = jnp.clip(by + bh, 0, h)
    bw, bh = x1 - x0, y1 - y0
    boxes = jnp.stack([boxes[:, 0], x0, y0, bw, bh], axis=1)
    mask = mask & (bw * bh >= MIN_AREA) & (bw > 0) & (bh > 0)
    return img, boxes, mask


def _post_crop_sample(key, img, boxes, mask):
    """Everything after the crop: flip + photometric, one sample.

    Runs in bfloat16: the photometric chain is HBM-bound full-image passes,
    pixel values are 0..255 (bf16 ulp <= 1 intensity level), and the model
    casts its input to bf16 anyway.
    """
    h, w = img.shape[0], img.shape[1]
    img = img.astype(jnp.bfloat16)
    ks = jax.random.split(key, 12)
    x0, y0 = boxes[:, 1], boxes[:, 2]
    bw, bh = boxes[:, 3], boxes[:, 4]

    # ---- HorizontalFlip ----
    do_flip = jax.random.bernoulli(ks[5], P_FLIP)
    img = jnp.where(do_flip, img[:, ::-1, :], img)
    x0 = jnp.where(do_flip, w - x0 - bw, x0)  # bbox_hflip: x' = W - x - w
    boxes = jnp.stack([boxes[:, 0], x0, y0, bw, bh], axis=1)

    # ---- photometric ----
    do_bc = jax.random.bernoulli(ks[6], P_BC)
    alpha = jnp.where(
        do_bc, 1.0 + jax.random.uniform(ks[7], minval=-0.2, maxval=0.2), 1.0
    )
    beta = jnp.where(
        do_bc, jax.random.uniform(ks[8], minval=-0.2, maxval=0.2) * 255.0, 0.0
    )
    img = img * alpha.astype(img.dtype) + beta.astype(img.dtype)

    do_noise = jax.random.bernoulli(ks[9], P_NOISE)
    sigma = jnp.sqrt(jax.random.uniform(ks[10], minval=10.0, maxval=400.0))
    noise = jax.random.normal(ks[11], img.shape, dtype=img.dtype) * sigma.astype(
        img.dtype
    )
    img = img + jnp.where(do_noise, 1.0, 0.0).astype(img.dtype) * noise

    kn = jax.random.split(jax.random.fold_in(key, 7), 3)
    do_glass = jax.random.bernoulli(kn[0], P_GLASS)
    blurred = _depthwise_filter(img, _gaussian_kernel5())
    img = jnp.where(do_glass, blurred, img)

    do_motion = jax.random.bernoulli(kn[1], P_MOTION)
    mangle = jax.random.uniform(kn[2], minval=0.0, maxval=jnp.pi)
    motion = _depthwise_filter(img, _motion_kernel7(mangle))
    img = jnp.where(do_motion, motion, img)

    img = jnp.clip(img.astype(jnp.float32), 0.0, 255.0) / 255.0  # dataset.py:146
    boxes = jnp.concatenate(
        [boxes[:, :1], jnp.round(boxes[:, 1:])], axis=1
    )  # dataset.py:88 rounds transformed boxes
    return img, boxes, mask


def augment_sample(
    key: jax.Array,
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Augment one ``(H, W, 3)`` uint8/float image + padded cxywh boxes with
    the exact per-sample Bernoulli gates (the reference's distribution).

    Returns ``(image in [0,1] float32, boxes, mask)``. Unbatched; vmap.
    ``augment_batch_fast`` is the production batched variant.
    """
    img = img.astype(jnp.float32)
    h, w = img.shape[0], img.shape[1]
    ks = jax.random.split(key, 5)
    cx, cy, cw, ch = _sample_crop(ks, h, w)
    img, boxes, mask = _apply_crop(img, boxes, mask, cx, cy, cw, ch)
    return _post_crop_sample(key, img, boxes, mask)


def _sample_photometric_params(key, b):
    """Draw the per-sample gates/parameters shared by the Pallas and XLA
    photometric paths: -> (scalars (B, 8) f32 [flip, alpha, beta, sigma,
    glass, motion, mdx, mdy], seeds (B*3,) i32)."""
    ks = jax.random.split(key, 8)
    do_flip = jax.random.bernoulli(ks[0], P_FLIP, (b,)).astype(jnp.float32)
    do_bc = jax.random.bernoulli(ks[1], P_BC, (b,))
    alpha = jnp.where(
        do_bc, 1.0 + jax.random.uniform(ks[2], (b,), minval=-0.2, maxval=0.2), 1.0
    )
    beta = jnp.where(
        do_bc, jax.random.uniform(ks[3], (b,), minval=-0.2, maxval=0.2) * 255.0, 0.0
    )
    do_noise = jax.random.bernoulli(ks[4], P_NOISE, (b,))
    sigma = jnp.where(
        do_noise,
        jnp.sqrt(jax.random.uniform(ks[5], (b,), minval=10.0, maxval=400.0)),
        0.0,
    )
    do_glass = jax.random.bernoulli(ks[6], P_GLASS, (b,)).astype(jnp.float32)
    km, ka = jax.random.split(ks[7])
    do_motion = jax.random.bernoulli(km, P_MOTION, (b,)).astype(jnp.float32)
    # motion direction quantized to 16 bins (the Pallas kernel selects a
    # static line kernel per bin; U(0, pi) quantized is indistinguishable
    # from albumentations' rasterized random line)
    mdir = jax.random.randint(ka, (b,), 0, 16).astype(jnp.float32)
    scalars = jnp.stack(
        [do_flip, alpha, beta, sigma, do_glass, do_motion,
         mdir, jnp.zeros((b,))],
        axis=1,
    )
    seeds = jax.random.randint(
        jax.random.fold_in(key, 11), (b * 3,), 0, 2**31 - 1, dtype=jnp.int32
    )
    return scalars, seeds


def _depthwise_filter_batch(imgs: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Depthwise-filter a ``(K, H, W, C)`` stack, one 2-D kernel per image
    (``kernels`` is ``(K, kh, kw)`` or a shared ``(kh, kw)``), as a SINGLE
    grouped convolution: the batch is folded into the channel dimension so
    XLA sees one static conv with ``feature_group_count = K*C`` instead of a
    vmapped loop of tiny convs."""
    kb, h, w, c = imgs.shape
    lhs = imgs.transpose(0, 3, 1, 2).reshape(1, kb * c, h, w)
    if kernels.ndim == 2:
        kernels = jnp.broadcast_to(kernels, (kb,) + kernels.shape)
    rhs = jnp.repeat(kernels, c, axis=0)[:, None].astype(imgs.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="SAME",
        feature_group_count=kb * c,
    )
    return out.reshape(kb, c, h, w).transpose(0, 2, 3, 1)


def _photometric_counts(b: int) -> tuple[int, int, int]:
    """Exact-k subset sizes per op from each op's own constant (they
    currently coincide at 0.2, but the marginals must track their constants
    independently)."""
    count = lambda p: max(1, round(p * b)) if b > 1 else 1
    return count(P_NOISE), count(P_GLASS), count(P_MOTION)


def _sample_photometric_params_exact_k(key, b, start=None):
    """Exact-k variant of :func:`_sample_photometric_params`: the three
    expensive gates (noise, glass, motion) select exactly ``round(p*B)``
    batch members via a fresh permutation each — same marginal probability,
    fixed per-batch count — so the applier can restrict the threefry noise
    generation and the two depthwise convs to static-shape subsets.

    Returns ``(scalars (B, 8), seeds, (noise_sel, glass_sel, motion_sel))``.
    The scalar table encodes the same gates (sigma/glass/motion columns are
    zero off-subset), so the Pallas kernel path can consume it unchanged.

    The three subsets are disjoint slices of ONE shared permutation
    (falling back to independent permutations when ``3k > B``): each
    sample's marginal probability per op stays exactly ``p``, but the ops
    become mutually exclusive within a step (the reference's independent
    Bernoulli gates co-fire on ~4% of samples). Bought: the applier can
    gather/scatter ONE ``3k``-row block instead of three, and run both
    blurs as one grouped conv — measured ~1 ms/batch at b128/320px, where
    TPU row gather/scatter dominated the photometric cost. Recorded in the
    README faithful-vs-fixed ledger.
    """
    ks = jax.random.split(key, 8)
    n_noise, n_glass, n_motion = _photometric_counts(b)

    if start is not None and start + n_noise + n_glass + n_motion <= b:
        # positional subsets (round 5): contiguous ranges at ``start`` —
        # valid only under shuffled feeds, where batch position is already a
        # uniform permutation (the positional-crop argument, round 4). The
        # 3k-row block then moves as STATIC slices instead of a row
        # gather/scatter. Marginals stay exactly p per op; the ops become
        # disjoint from the crop rows [0:start) too (ledger'd: the
        # reference's independent gates co-fire crop x noise on ~4%).
        noise_sel = jnp.arange(start, start + n_noise)
        glass_sel = jnp.arange(start + n_noise, start + n_noise + n_glass)
        motion_sel = jnp.arange(
            start + n_noise + n_glass, start + n_noise + n_glass + n_motion
        )
    elif n_noise + n_glass + n_motion <= b:
        perm = jax.random.permutation(ks[4], b)
        noise_sel = perm[:n_noise]
        glass_sel = perm[n_noise : n_noise + n_glass]
        motion_sel = perm[n_noise + n_glass : n_noise + n_glass + n_motion]
    else:  # tiny batches: keep the independent exact-k permutations
        noise_sel = jax.random.permutation(ks[4], b)[:n_noise]
        glass_sel = jax.random.permutation(ks[5], b)[:n_glass]
        motion_sel = jax.random.permutation(ks[6], b)[:n_motion]

    do_flip = jax.random.bernoulli(ks[0], P_FLIP, (b,)).astype(jnp.float32)
    do_bc = jax.random.bernoulli(ks[1], P_BC, (b,))
    alpha = jnp.where(
        do_bc, 1.0 + jax.random.uniform(ks[2], (b,), minval=-0.2, maxval=0.2), 1.0
    )
    beta = jnp.where(
        do_bc, jax.random.uniform(ks[3], (b,), minval=-0.2, maxval=0.2) * 255.0, 0.0
    )
    sigma = jnp.zeros((b,), jnp.float32).at[noise_sel].set(
        jnp.sqrt(
            jax.random.uniform(
                jax.random.fold_in(ks[4], 1),
                noise_sel.shape,
                minval=10.0,
                maxval=400.0,
            )
        )
    )
    glass = jnp.zeros((b,), jnp.float32).at[glass_sel].set(1.0)
    motion = jnp.zeros((b,), jnp.float32).at[motion_sel].set(1.0)
    mdir = jax.random.randint(ks[7], (b,), 0, 16).astype(jnp.float32)
    scalars = jnp.stack(
        [do_flip, alpha, beta, sigma, glass, motion, mdir, jnp.zeros((b,))],
        axis=1,
    )
    seeds = jax.random.randint(
        jax.random.fold_in(key, 11), (b * 3,), 0, 2**31 - 1, dtype=jnp.int32
    )
    return scalars, seeds, (noise_sel, glass_sel, motion_sel)


def _apply_photometric_xla_subset(key, imgs, scalars, sels,
                                  positional_start=None,
                                  positional_flip=False):
    """Production batched photometric chain: flip + brightness/contrast run
    whole-batch (bandwidth-trivial), while noise generation and the 5x5/7x7
    depthwise blurs run only on their exact-k subsets from
    :func:`_sample_photometric_params_exact_k`.

    When the subsets are disjoint (the shared-permutation case, ``3k <= B``)
    the three ops commute, so the whole block moves as ONE gather + ONE
    scatter and both blurs run as a single grouped conv with per-row
    kernels (the 5x5 Gaussian zero-padded to 7x7 is tap-exact under SAME
    padding). Noise uses the hardware ``rbg`` generator — threefry costs
    ~0.6 ms/batch more on TPU for statistically equivalent augmentation
    noise. Overlapping subsets (tiny batches) keep the sequential
    reference order (``datamodule.py:105-125``): noise -> glass -> motion."""
    noise_sel, glass_sel, motion_sel = sels
    b = imgs.shape[0]
    n = noise_sel.shape[0]
    n_sel3 = n + glass_sel.shape[0] + motion_sel.shape[0]
    imgs = imgs.astype(jnp.bfloat16)
    if positional_flip:
        # P_FLIP is exactly 1/2, so under shuffled feeds the flip subset can
        # be positional too: odd batch rows flip, a STATIC pairwise reverse
        # (one read/row) instead of the where-select (two reads/row, the
        # reverse operand materializes whole-batch). Caller has already set
        # scalars[:, 0] to the row parity so _flip_boxes and this agree.
        x = imgs.reshape(b // 2, 2, *imgs.shape[1:])
        lin = jnp.concatenate(
            [x[:, :1], x[:, 1:, :, ::-1, :]], axis=1
        ).reshape(imgs.shape)
    else:
        lin = jnp.where(
            scalars[:, 0, None, None, None] > 0.5, imgs[:, :, ::-1, :], imgs
        )
    lin = lin * scalars[:, 1, None, None, None].astype(
        lin.dtype
    ) + scalars[:, 2, None, None, None].astype(lin.dtype)

    # stay in bf16: the models cast their input to bf16 anyway, and the f32
    # round-trip is a whole-batch HBM pass (the public jitted augment_batch
    # restores the float32 API dtype for callers outside the train step).
    # clip/scale is folded into the SAME whole-batch pass as flip+fma (the
    # subset rows are re-finalized after their noise/blur and scattered over
    # it) — one fewer full-batch HBM round-trip than clipping after the
    # scatter, bit-identical per element.
    def _finish(x):
        return jnp.clip(x, 0.0, 255.0) / jnp.bfloat16(255.0)

    def _noise_for(shape):
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        return jax.random.normal(
            jax.random.key(seed, impl="rbg"), shape, dtype=imgs.dtype
        )

    if n_sel3 <= b:  # disjoint slices of one permutation: fuse the movement
        if positional_start is not None:
            # contiguous subsets (shuffled feeds, round 5): the 3k-row block
            # moves as STATIC slices — no row gather, and the write-back is
            # one dynamic-update-slice instead of a scatter
            s0 = positional_start
            sub = lin[s0 : s0 + n_sel3]
            sigma = scalars[s0 : s0 + n, 3].astype(imgs.dtype)
        else:
            sel3 = jnp.concatenate([noise_sel, glass_sel, motion_sel])
            sub = lin[sel3]
            sigma = scalars[noise_sel, 3].astype(imgs.dtype)
        noised = sub[:n] + sigma[:, None, None, None] * _noise_for(sub[:n].shape)
        g7 = jnp.zeros((7, 7), jnp.float32).at[1:6, 1:6].set(_gaussian_kernel5())
        ang = (scalars[motion_sel, 6] + 0.5) * jnp.pi / 16.0
        kerns = jnp.concatenate(
            [jnp.broadcast_to(g7, (glass_sel.shape[0], 7, 7)),
             jax.vmap(_motion_kernel7)(ang)]
        )
        blurred = _depthwise_filter_batch(sub[n:], kerns)
        done = _finish(jnp.concatenate([noised, blurred]))
        if positional_start is not None:
            return _finish(lin).at[s0 : s0 + n_sel3].set(done)
        return _finish(lin).at[sel3].set(done)
    imgs = lin
    sub = imgs[noise_sel]
    sigma = scalars[noise_sel, 3].astype(imgs.dtype)
    imgs = imgs.at[noise_sel].set(
        sub + sigma[:, None, None, None] * _noise_for(sub.shape)
    )
    imgs = imgs.at[glass_sel].set(
        _depthwise_filter_batch(imgs[glass_sel], _gaussian_kernel5())
    )
    ang = (scalars[motion_sel, 6] + 0.5) * jnp.pi / 16.0
    kerns = jax.vmap(_motion_kernel7)(ang)
    imgs = imgs.at[motion_sel].set(
        _depthwise_filter_batch(imgs[motion_sel], kerns)
    )
    return _finish(imgs)


def _apply_photometric_xla(key, imgs, scalars):
    """XLA twin of the fused Pallas kernel (CPU fallback): same scalar table,
    threefry noise."""

    def one(k, img, sc):
        img = img.astype(jnp.bfloat16)
        img = jnp.where(sc[0] > 0.5, img[:, ::-1, :], img)
        img = img * sc[1].astype(img.dtype) + sc[2].astype(img.dtype)
        noise = jax.random.normal(k, img.shape, dtype=img.dtype)
        img = img + sc[3].astype(img.dtype) * noise
        blurred = _depthwise_filter(img, _gaussian_kernel5())
        img = jnp.where(sc[4] > 0.5, blurred, img)
        ang = (sc[6] + 0.5) * jnp.pi / 16.0  # quantized direction bin
        motion = _depthwise_filter(img, _motion_kernel7(ang))
        img = jnp.where(sc[5] > 0.5, motion, img)
        return jnp.clip(img.astype(jnp.float32), 0.0, 255.0) / 255.0

    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(one)(keys, imgs, scalars)


def _flip_boxes(boxes, masks, do_flip, w):
    x0 = jnp.where(
        do_flip[:, None] > 0.5, w - boxes[..., 1] - boxes[..., 3], boxes[..., 1]
    )
    return jnp.concatenate(
        [boxes[..., :1], x0[..., None], boxes[..., 2:]], axis=-1
    )


def augment_batch_fast(key, imgs, boxes, masks, rotate: bool = False,
                       positional_crop: bool = False):
    """Batched augmentation with **exact-k subset cropping**: the crop
    resample is the pipeline's dominant cost (scale_and_translate over every
    image cost ~35%% of the whole SAM train step) but fires with p=0.2, so
    instead of resampling everything and selecting, exactly
    ``round(P_CROP * B)`` randomly-chosen batch members are cropped (batch
    membership re-randomized every step). Deviation from per-sample
    Bernoulli: the per-batch crop COUNT is fixed at its expectation; each
    sample's marginal crop probability stays P_CROP. Measured +2% train
    throughput at batch 128 — the remaining augmentation cost is the
    photometric chain's full-batch HBM passes (round-2 candidate: one fused
    Pallas augmentation kernel).

    ``positional_crop=True`` crops the FIRST ``k`` batch rows instead of a
    device-sampled random subset, replacing the k-row gather + scatter
    (expensive on TPU — the round-1 gather findings) with contiguous slice
    ops. Distributionally identical to the random subset whenever the feed
    shuffles: both the streamed loader and the resident epochs assign each
    sample's batch position from a fresh uniform permutation every epoch,
    so "the first k positions" IS a uniform random k-subset, independent of
    the photometric/rotate subsets (drawn from device permutations over
    positions). Only valid for shuffled feeds — with ``shuffle=False`` the
    same samples would be cropped every epoch, so the Trainer enables it
    from the loader's shuffle flag and it defaults off here.

    ``rotate=True`` additionally applies the reference's Rotate op (p=0.2,
    limit 20 degrees, ``datamodule.py:115``) ON DEVICE via the three-shear
    Pallas kernels (:mod:`fdtpu.kernels.rotate_pallas`) to an exact-k
    subset drawn from its own permutation — use with
    ``WIDERFaceDataSource(rotate_prob=0.0)`` so rotation isn't applied
    twice. Chain order becomes crop -> rotate -> flip -> bc -> noise/blurs;
    the reference rotates after flip+bc, but flip commutes with rotation in
    distribution (the angle law is symmetric) and brightness/contrast is
    pixelwise, so the sampled-image distribution is unchanged.
    """
    import os

    b = imgs.shape[0]
    if b < 16:
        # Exact-k rounding distorts tiny-batch marginals badly (round(0.2*2)
        # forced to 1 means p=0.5); below 16 samples the per-sample Bernoulli
        # path is cheap, so use the reference's exact distribution instead.
        keys = jax.random.split(jax.random.fold_in(key, 23), b)
        out_i, out_b, out_m = jax.vmap(augment_sample)(keys, imgs, boxes, masks)
        if rotate:
            from fdtpu.kernels import pallas_nms_available
            from fdtpu.kernels.rotate_pallas import rotate_batch, rotate_boxes

            kg, ka = jax.random.split(jax.random.fold_in(key, 29))
            gate = jax.random.bernoulli(kg, P_ROTATE, (b,))
            ang = jnp.where(
                gate,
                jax.random.uniform(
                    ka, (b,),
                    minval=-jnp.deg2rad(ROTATE_LIMIT_DEG),
                    maxval=jnp.deg2rad(ROTATE_LIMIT_DEG),
                ),
                0.0,
            )
            rot_i = rotate_batch(
                out_i * 255.0, ang, interpret=not pallas_nms_available()
            ) / 255.0
            rot_b, rot_m = rotate_boxes(out_b, out_m, ang, imgs.shape[2])
            rot_b = jnp.concatenate(
                [rot_b[..., :1], jnp.round(rot_b[..., 1:])], axis=-1
            )  # dataset.py:88 rounds post-rotation coords
            # ungated samples keep their originals untouched: rotate_boxes'
            # min-area filter must not fire at angle 0 on sub-10px2 boxes
            out_i = jnp.where(gate[:, None, None, None], rot_i, out_i)
            out_b = jnp.where(gate[:, None, None], rot_b, out_b)
            out_m = jnp.where(gate[:, None], rot_m, out_m)
        return out_i, out_b, out_m

    kperm, kcrop, kpost = jax.random.split(key, 3)
    k = round(P_CROP * b)

    use_pallas = os.environ.get("FDTPU_PALLAS_AUGMENT") == "1"
    # The batch lives in bf16 end to end (uint8 pixel range is exact in bf16;
    # the model casts to bf16 anyway) — halves every full-batch HBM pass.
    # The crop resample is geometry-exact in bf16 too: _apply_crop builds
    # its weight matrices in f32 and only casts the finished weights to
    # the image dtype (mirroring jax _scale_and_translate), so bf16 costs
    # ~0.4% on pixel blending, nothing on box coordinates (transformed
    # separately in f32). The Mosaic photometric kernel only rolls f32, so
    # that path stays f32.
    imgs = imgs.astype(jnp.float32 if use_pallas else jnp.bfloat16)
    h, w = imgs.shape[1], imgs.shape[2]
    crop_keys = jax.random.split(kcrop, k)
    if positional_crop:
        sub_i, sub_b, sub_m = imgs[:k], boxes[:k], masks[:k]
    else:
        sel = jax.random.permutation(kperm, b)[:k]
        sub_i, sub_b, sub_m = imgs[sel], boxes[sel], masks[sel]

    def crop_one(ck, im, bx, mk):
        cx, cy, cw, ch = _sample_crop(jax.random.split(ck, 5), h, w, gate=False)
        return _apply_crop(im, bx, mk, cx, cy, cw, ch)

    ci, cb, cm = jax.vmap(crop_one)(crop_keys, sub_i, sub_b, sub_m)
    if positional_crop:
        imgs = imgs.at[:k].set(ci)       # contiguous dynamic-update-slice,
        boxes = boxes.at[:k].set(cb)     # no scatter
        masks = masks.at[:k].set(cm)
    else:
        imgs = imgs.at[sel].set(ci)
        boxes = boxes.at[sel].set(cb)
        masks = masks.at[sel].set(cm)

    if rotate:
        from fdtpu.kernels import pallas_nms_available
        from fdtpu.kernels.rotate_pallas import rotate_batch, rotate_boxes

        krsel, kang = jax.random.split(jax.random.fold_in(key, 17))
        rk = round(P_ROTATE * b)  # b >= 16 here, so rk >= 3
        rsel = jax.random.permutation(krsel, b)[:rk]
        ang = jax.random.uniform(
            kang, (rk,),
            minval=-jnp.deg2rad(ROTATE_LIMIT_DEG),
            maxval=jnp.deg2rad(ROTATE_LIMIT_DEG),
        )
        # planes ride in the batch dtype (bf16 on the production path):
        # rotation is bandwidth-bound, so this halves all five passes'
        # traffic; the kernel interpolates in f32 registers either way
        rot = rotate_batch(
            imgs[rsel], ang, interpret=not pallas_nms_available(),
        )
        rb, rm = rotate_boxes(boxes[rsel], masks[rsel], ang, w)
        imgs = imgs.at[rsel].set(rot.astype(imgs.dtype))
        boxes = boxes.at[rsel].set(rb)
        masks = masks.at[rsel].set(rm)

    # photometric: shared scalar table with exact-k gates (noise and the two
    # blurs run on ~p*B gather/scatter subsets — the whole-batch where-gated
    # chain cost 30% of the train step at b128). Default = the XLA bf16
    # chain, which measured FASTER end-to-end than the fused Pallas kernel
    # (4677 vs 3844 train img/s at b128/320px: Mosaic only rolls f32 and
    # per-plane program overhead outweighs the saved HBM passes); the kernel
    # stays available via FDTPU_PALLAS_AUGMENT=1
    # (fdtpu/kernels/augment_pallas.py).
    # positional subsets ride the same shuffled-feed argument as
    # positional_crop: ranges start after the crop rows [0:k) (so the block
    # fits at b128 alongside the rotate subset; co-fire crop x noise drops
    # ~4% -> 0, ledger'd with the round-2 exclusivity row)
    photo_start = (
        k if positional_crop and k + sum(_photometric_counts(b)) <= b
        else None
    )
    scalars, seeds, sels = _sample_photometric_params_exact_k(
        kpost, b, start=photo_start)
    # flip subset goes positional with the others (P_FLIP is exactly 1/2):
    # odd rows flip. Marginal stays 1/2 under shuffled feeds (positions are
    # a fresh uniform permutation per epoch); pairwise co-fire with the
    # crop rows [0:k) is (k/2)/b = P_FLIP*P_CROP exactly (k even at b128),
    # and the batch flip COUNT pins at b/2 — the same exact-k deviation
    # class as the crop subset (README ledger). Buys a static pairwise
    # reverse instead of a whole-batch two-read where-select.
    positional_flip = bool(positional_crop) and b % 2 == 0 and not use_pallas
    if positional_flip:
        scalars = scalars.at[:, 0].set(
            (jnp.arange(b) % 2).astype(scalars.dtype)
        )
    if use_pallas:
        from fdtpu.kernels import pallas_nms_available
        from fdtpu.kernels.augment_pallas import pallas_photometric_batch

        # flip in XLA (Mosaic has no reverse lowering), the rest fused
        imgs = jnp.where(
            scalars[:, 0, None, None, None] > 0.5, imgs[:, :, ::-1, :], imgs
        )
        imgs = pallas_photometric_batch(
            imgs, scalars, seeds, not pallas_nms_available()
        )
    else:
        imgs = _apply_photometric_xla_subset(
            jax.random.fold_in(kpost, 3), imgs, scalars, sels,
            positional_start=photo_start, positional_flip=positional_flip,
        )
    boxes = _flip_boxes(boxes, masks, scalars[:, 0], imgs.shape[2])
    boxes = jnp.concatenate(
        [boxes[..., :1], jnp.round(boxes[..., 1:])], axis=-1
    )  # dataset.py:88
    return imgs, boxes, masks


@jax.jit
def augment_batch(key, imgs, boxes, masks):
    """Jitted :func:`augment_batch_fast` over ``(B, H, W, 3)`` batches
    (float32 images; the raw fast path may return bf16 for in-step fusion)."""
    imgs, boxes, masks = augment_batch_fast(key, imgs, boxes, masks)
    return imgs.astype(jnp.float32), boxes, masks


@jax.jit
def resize_only_batch(imgs, boxes, masks):
    """Val/test path (``datamodule.py:127-135``): normalize only (the resize
    already happened at host decode), plus the min-area filter the reference's
    bbox_params applies to every compose."""
    imgs = imgs.astype(jnp.float32) / 255.0
    valid = masks & (boxes[..., 3] * boxes[..., 4] >= MIN_AREA)
    return imgs, boxes, valid


# -- general affine warp (CPU/testing; TPU hot path avoids it, see module doc) --


def _reflect101(t: jnp.ndarray, size: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 coordinate folding (no edge repeat)."""
    period = 2.0 * (size - 1)
    t = jnp.mod(jnp.abs(t), period)
    return jnp.where(t > size - 1, period - t, t)


def _sample_affine(img: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-style resample of ``(H, W, C)`` through an inverse affine
    (output -> input coords), reflect-101 border, gather-free.

    Two 1-D resampling passes (Catmull-Smith): each builds triangle weights
    from the source coordinates and contracts them with an einsum. Exact for
    the geometry (linear functions reproduced); the filter differs from
    joint bilinear only in high-frequency content. NOTE: on the TPU backend
    some shapes of the first pass trigger pathological Mosaic compile times
    (minutes); production augmentation therefore rotates on the host and
    this function serves CPU paths and tests.
    """
    h, w = img.shape[0], img.shape[1]
    m00, m01, m02 = inv[0, 0], inv[0, 1], inv[0, 2]
    m10, m11, m12 = inv[1, 0], inv[1, 1], inv[1, 2]

    # pass A (along y): t[yo, x] = in[a1*x + b1*yo + c1, x]
    a1 = m10 / m00
    b1 = m11 - m10 * m01 / m00
    c1 = m12 - m10 * m02 / m00
    xs = jnp.arange(w, dtype=jnp.float32)
    yo = jnp.arange(h, dtype=jnp.float32)
    src_y = _reflect101(a1 * xs[None, :] + b1 * yo[:, None] + c1, h)  # (Ho, W)
    yi = jnp.arange(h, dtype=jnp.float32)
    w_a = jnp.maximum(0.0, 1.0 - jnp.abs(src_y[:, :, None] - yi))
    t = jnp.einsum(
        "oxi,ixc->oxc", w_a.astype(jnp.bfloat16), img.astype(jnp.bfloat16)
    )

    # pass B (along x): out[yo, xo] = t[yo, m00*xo + m01*yo + m02]
    xo = jnp.arange(w, dtype=jnp.float32)
    src_x = _reflect101(m00 * xo[None, :] + m01 * yo[:, None] + m02, w)
    xi = jnp.arange(w, dtype=jnp.float32)
    w_b = jnp.maximum(0.0, 1.0 - jnp.abs(src_x[:, :, None] - xi))
    out = jnp.einsum("owi,oic->owc", w_b.astype(jnp.bfloat16), t)
    return out.astype(jnp.float32)
