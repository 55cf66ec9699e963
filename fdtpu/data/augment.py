"""On-device, box-aware image augmentation (the Albumentations replacement).

The reference augments on the host in DataLoader worker processes through
Albumentations/OpenCV (``/root/reference/datasets/WIDERFace/datamodule.py:
105-125``) — on this machine a single CPU core. Here the whole train-time
pipeline is a jitted, vmapped JAX program that runs **on the TPU** after a
cheap host decode+resize, with the same op inventory and probabilities:

==========================  =====  =========================================
reference op                p      fdtpu implementation
==========================  =====  =========================================
RandomResizedCrop           0.2    affine term (scale+translate)
Resize                      1.0    host decode-time resize (see pipeline.py)
HorizontalFlip              0.5    affine term
RandomBrightnessContrast    0.2    fused multiply-add
Rotate(20)                  0.2    affine term, reflect-101 border
GaussNoise(var<=400)        0.2    additive normal noise
GlassBlur                   0.2    5x5 Gaussian blur (approximation — the
                                   original's local pixel shuffle is a
                                   gather-heavy op with negligible accuracy
                                   effect at p=0.2)
MotionBlur                  0.2    random-angle 7x7 line kernel conv
==========================  =====  =========================================

All geometric ops (crop, flip, rotate) **compose into a single affine
matrix**, so the image is resampled exactly once (bilinear, reflect-101
border) regardless of how many fire — one fused gather instead of
Albumentations' sequential OpenCV passes. Boxes go through the same affine
(corners -> AABB like Albumentations' rotate), are clipped, filtered by
``min_area=10`` (``datamodule.py:121``) and rounded
(``dataset.py:88`` rounds post-transform), and images are scaled to [0, 1]
(``dataset.py:146``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# -- affine helpers ----------------------------------------------------------


def _affine_identity():
    return jnp.eye(3, dtype=jnp.float32)


def _compose(*mats):
    out = mats[0]
    for m in mats[1:]:
        out = out @ m
    return out


def _reflect101(t: jnp.ndarray, size: int) -> jnp.ndarray:
    """OpenCV BORDER_REFLECT_101 coordinate folding (no edge repeat)."""
    period = 2.0 * (size - 1)
    t = jnp.mod(jnp.abs(t), period)
    return jnp.where(t > size - 1, period - t, t)


def _sample_affine(img: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-resample ``(H, W, C)`` through the inverse affine (output ->
    input coords), reflect-101 border, **gather-free**.

    TPU gathers are catastrophic — a ``map_coordinates`` warp of a 64x320px
    batch measured 1249 ms vs 11 ms for the whole SAM train step. Instead the
    affine is factored into two 1-D resampling passes (Catmull-Smith): each
    pass builds triangle (bilinear) weights from the source coordinates and
    contracts them against the image with an einsum — pure MXU work, ~7 ms
    per 64-batch per pass. Valid while ``|inv[0,0]| > 0`` (crop scales > 0,
    flip = -1, rotation <= 20 degrees keeps it well away from 0).

    Weights are computed in f32 (coordinate differences need the mantissa)
    then cast to bf16 for the contraction (weight quantization ~0.4%, below
    one intensity level).
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
    w_a = jnp.maximum(0.0, 1.0 - jnp.abs(src_y[:, :, None] - yi))  # (Ho, W, Hi)
    t = jnp.einsum(
        "oxi,ixc->oxc",
        w_a.astype(jnp.bfloat16),
        img.astype(jnp.bfloat16),
    )

    # pass B (along x): out[yo, xo] = t[yo, m00*xo + m01*yo + m02]
    xo = jnp.arange(w, dtype=jnp.float32)
    src_x = _reflect101(m00 * xo[None, :] + m01 * yo[:, None] + m02, w)  # (Ho, Wo)
    xi = jnp.arange(w, dtype=jnp.float32)
    w_b = jnp.maximum(0.0, 1.0 - jnp.abs(src_x[:, :, None] - xi))  # (Ho, Wo, Wi)
    out = jnp.einsum("owi,oic->owc", w_b.astype(jnp.bfloat16), t)
    return out.astype(jnp.float32)


def _transform_boxes(boxes: jnp.ndarray, mask: jnp.ndarray, fwd: jnp.ndarray,
                     width: int, height: int, min_area: float = 10.0):
    """Push cxywh pixel boxes through a forward affine: corners -> AABB ->
    clip to image -> min-area filter (Albumentations bbox_params semantics,
    ``datamodule.py:121``)."""
    x, y = boxes[:, 1], boxes[:, 2]
    w, h = boxes[:, 3], boxes[:, 4]
    corners_x = jnp.stack([x, x + w, x, x + w], axis=1)  # (K, 4)
    corners_y = jnp.stack([y, y, y + h, y + h], axis=1)
    tx = fwd[0, 0] * corners_x + fwd[0, 1] * corners_y + fwd[0, 2]
    ty = fwd[1, 0] * corners_x + fwd[1, 1] * corners_y + fwd[1, 2]
    x0 = jnp.clip(tx.min(axis=1), 0, width)
    x1 = jnp.clip(tx.max(axis=1), 0, width)
    y0 = jnp.clip(ty.min(axis=1), 0, height)
    y1 = jnp.clip(ty.max(axis=1), 0, height)
    nw, nh = x1 - x0, y1 - y0
    out = jnp.stack([boxes[:, 0], x0, y0, nw, nh], axis=1)
    valid = mask & (nw * nh >= min_area) & (nw > 0) & (nh > 0)
    return out, valid


# -- photometric / filter ops ------------------------------------------------


def _gaussian_kernel5(sigma: float = 0.7) -> jnp.ndarray:
    r = jnp.arange(-2, 3, dtype=jnp.float32)
    k = jnp.exp(-(r**2) / (2 * sigma**2))
    k = k / k.sum()
    return jnp.outer(k, k)


def _motion_kernel7(angle: jnp.ndarray) -> jnp.ndarray:
    """7x7 line kernel at ``angle`` (radians) — MotionBlur's random line."""
    r = jnp.arange(-3, 4, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    dx, dy = jnp.cos(angle), jnp.sin(angle)
    # distance from each cell to the line through the origin
    dist = jnp.abs(-dy * xx + dx * yy)
    along = jnp.abs(dx * xx + dy * yy)
    k = jnp.maximum(0.0, 1.0 - dist) * (along <= 3.0)
    return k / jnp.maximum(k.sum(), 1e-6)


def _depthwise_filter(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Apply one 2-D kernel to every channel of an (H, W, C) image."""
    kh, kw = kernel.shape
    c = img.shape[-1]
    lhs = img[None].transpose(0, 3, 1, 2)  # NCHW
    rhs = jnp.tile(kernel[None, None], (c, 1, 1, 1))  # (C, 1, kh, kw)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="SAME", feature_group_count=c
    )
    return out.transpose(0, 2, 3, 1)[0]


# -- the fused pipeline -------------------------------------------------------


P_CROP, P_FLIP, P_BC, P_ROTATE, P_NOISE, P_GLASS, P_MOTION = (
    0.2, 0.5, 0.2, 0.2, 0.2, 0.2, 0.2,
)  # datamodule.py:106-124


def augment_sample(
    key: jax.Array,
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Augment one ``(H, W, 3)`` uint8/float image + padded boxes.

    Returns ``(image in [0,1] float32, boxes, mask)``. Unbatched; vmap.
    """
    h, w = img.shape[0], img.shape[1]
    img = img.astype(jnp.float32)
    ks = jax.random.split(key, 12)

    # ---- geometric: build one affine (forward) and its inverse ----
    # RandomResizedCrop (scale/ratio ranges are Albumentations defaults)
    do_crop = jax.random.bernoulli(ks[0], P_CROP)
    area = jax.random.uniform(ks[1], minval=0.08, maxval=1.0) * (w * h)
    log_r = jax.random.uniform(
        ks[2], minval=jnp.log(3.0 / 4.0), maxval=jnp.log(4.0 / 3.0)
    )
    ratio = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * ratio), 8.0, w)
    ch = jnp.clip(jnp.sqrt(area / ratio), 8.0, h)
    cx = jax.random.uniform(ks[3]) * (w - cw)
    cy = jax.random.uniform(ks[4]) * (h - ch)
    sx = jnp.where(do_crop, w / cw, 1.0)
    sy = jnp.where(do_crop, h / ch, 1.0)
    tx = jnp.where(do_crop, -cx * w / cw, 0.0)
    ty = jnp.where(do_crop, -cy * h / ch, 0.0)
    m_crop = jnp.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32
    ).at[0, 0].set(sx).at[1, 1].set(sy).at[0, 2].set(tx).at[1, 2].set(ty)

    # HorizontalFlip
    do_flip = jax.random.bernoulli(ks[5], P_FLIP)
    fx = jnp.where(do_flip, -1.0, 1.0)
    fb = jnp.where(do_flip, jnp.float32(w - 1), 0.0)
    m_flip = _affine_identity().at[0, 0].set(fx).at[0, 2].set(fb)

    # Rotate(limit=20)
    do_rot = jax.random.bernoulli(ks[6], P_ROTATE)
    angle = jnp.where(
        do_rot,
        jax.random.uniform(ks[7], minval=-20.0, maxval=20.0) * jnp.pi / 180.0,
        0.0,
    )
    c, s = jnp.cos(angle), jnp.sin(angle)
    cxc, cyc = (w - 1) / 2.0, (h - 1) / 2.0
    m_rot = jnp.array(
        [
            [c, -s, cxc - c * cxc + s * cyc],
            [s, c, cyc - s * cxc - c * cyc],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )

    fwd = _compose(m_rot, m_flip, m_crop)
    inv = jnp.linalg.inv(fwd)
    img = _sample_affine(img, inv)
    boxes, mask = _transform_boxes(boxes, mask, fwd, w, h)

    # ---- photometric ----
    # RandomBrightnessContrast (limits 0.2/0.2)
    do_bc = jax.random.bernoulli(ks[8], P_BC)
    alpha = jnp.where(do_bc, 1.0 + jax.random.uniform(ks[9], minval=-0.2, maxval=0.2), 1.0)
    beta = jnp.where(do_bc, jax.random.uniform(ks[10], minval=-0.2, maxval=0.2) * 255.0, 0.0)
    img = img * alpha + beta

    kn = jax.random.split(ks[11], 6)
    # GaussNoise(var_limit=400)
    do_noise = jax.random.bernoulli(kn[0], P_NOISE)
    sigma = jnp.sqrt(jax.random.uniform(kn[1], minval=10.0, maxval=400.0))
    noise = jax.random.normal(kn[2], img.shape) * sigma
    img = img + jnp.where(do_noise, 1.0, 0.0) * noise

    # GlassBlur (approximated) + MotionBlur
    do_glass = jax.random.bernoulli(kn[3], P_GLASS)
    blurred = _depthwise_filter(img, _gaussian_kernel5())
    img = jnp.where(do_glass, blurred, img)

    do_motion = jax.random.bernoulli(kn[4], P_MOTION)
    mangle = jax.random.uniform(kn[5], minval=0.0, maxval=jnp.pi)
    motion = _depthwise_filter(img, _motion_kernel7(mangle))
    img = jnp.where(do_motion, motion, img)

    img = jnp.clip(img, 0.0, 255.0) / 255.0  # dataset.py:146
    boxes = jnp.concatenate(
        [boxes[:, :1], jnp.round(boxes[:, 1:])], axis=1
    )  # dataset.py:88 rounds transformed boxes
    return img, boxes, mask


@jax.jit
def augment_batch(key, imgs, boxes, masks):
    """Vmapped :func:`augment_sample` over ``(B, H, W, 3)`` batches."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(augment_sample)(keys, imgs, boxes, masks)


@jax.jit
def resize_only_batch(imgs, boxes, masks):
    """Val/test path (``datamodule.py:127-135``): normalize only (the resize
    already happened at host decode), plus the min-area filter the reference's
    bbox_params applies to every compose."""
    imgs = imgs.astype(jnp.float32) / 255.0
    valid = masks & (boxes[..., 3] * boxes[..., 4] >= 10.0)
    return imgs, boxes, valid
