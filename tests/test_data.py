"""Data pipeline tests: synthetic WIDERFace-format dataset, annotation parser
semantics (``/root/reference/datasets/WIDERFace/datamodule.py:69-103``), host
loader shapes, and the on-device augmentation pipeline's box-consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdtpu.data import (
    BatchLoader,
    WIDERFaceDataSource,
    augment_batch,
    load_targets,
    make_synthetic_widerface,
    parse_wider_annotations,
    resize_only_batch,
)


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    return make_synthetic_widerface(
        tmp_path_factory.mktemp("wider"), num_images=12, max_faces=3
    )


def test_parser_structure(data_dir):
    targets = parse_wider_annotations(data_dir, "train")
    assert len(targets) == 12
    for t in targets:
        assert t["img_path"].exists()
        assert t["bbx"].shape[1] == 5
        assert t["number_faces"] == t["bbx"].shape[0]
        assert (t["bbx"][:, 0] == 1.0).all()  # class confidence prepended


def test_crowding_filter(data_dir):
    # < 3 faces filter (datamodule.py:102)
    targets = load_targets(data_dir, "train", max_faces=3)
    assert all(t["bbx"].shape[0] < 3 for t in targets)
    assert len(targets) < 12  # fixture includes 3-face images


def test_source_resize_and_padding(data_dir):
    targets = load_targets(data_dir, "train", max_faces=3)
    src = WIDERFaceDataSource(targets, (320, 320), box_capacity=4)
    img, boxes, mask = src.get(0)
    assert img.shape == (320, 320, 3) and img.dtype == np.uint8
    assert boxes.shape == (4, 5) and mask.shape == (4,)
    n = targets[0]["bbx"].shape[0]
    assert mask.sum() == n
    # boxes scaled into the resized frame
    assert (boxes[mask][:, 1] + boxes[mask][:, 3] <= 321).all()


def test_batch_loader_shapes_and_partial_batch(data_dir):
    targets = load_targets(data_dir, "train", max_faces=3)
    src = WIDERFaceDataSource(targets, (160, 160), box_capacity=4)
    loader = BatchLoader(src, batch_size=4, drop_last=False)
    batches = list(loader)
    assert len(batches) == len(loader)
    total = sum(b.sample_mask.sum() for b in batches)
    assert total == len(targets)
    for b in batches:
        assert b.images.shape == (4, 160, 160, 3)
        assert b.boxes.shape == (4, 4, 5)


def test_augment_batch_box_consistency(data_dir):
    """Augmented boxes must stay inside the image and keep fixed shapes;
    with flips/crops/rotations disabled by seed selection we can't assert
    exact coords, so assert invariants over many seeds."""
    targets = load_targets(data_dir, "train", max_faces=3)
    src = WIDERFaceDataSource(targets, (160, 160), box_capacity=4)
    img, boxes, mask = src.get(0)
    imgs = jnp.asarray(img[None].repeat(8, 0))
    bx = jnp.asarray(boxes[None].repeat(8, 0))
    mk = jnp.asarray(mask[None].repeat(8, 0))
    out_img, out_boxes, out_mask = augment_batch(jax.random.PRNGKey(3), imgs, bx, mk)
    assert out_img.shape == (8, 160, 160, 3) and out_img.dtype == jnp.float32
    assert float(out_img.min()) >= 0.0 and float(out_img.max()) <= 1.0
    ob, om = np.asarray(out_boxes), np.asarray(out_mask)
    assert not om[~np.asarray(mk)].any()  # padding never becomes valid
    valid = ob[om]
    assert (valid[:, 1] >= 0).all() and (valid[:, 2] >= 0).all()
    assert (valid[:, 1] + valid[:, 3] <= 160.5).all()
    assert (valid[:, 3] * valid[:, 4] >= 10).all()  # min_area
    np.testing.assert_array_equal(valid[:, 1:], np.round(valid[:, 1:]))


def test_augment_no_op_paths_keep_boxes(data_dir):
    """With all random gates off (probability 0 via direct call of the val
    path), boxes pass through unchanged."""
    targets = load_targets(data_dir, "train", max_faces=3)
    src = WIDERFaceDataSource(targets, (160, 160), box_capacity=4)
    img, boxes, mask = src.get(0)
    out_img, out_boxes, out_mask = resize_only_batch(
        jnp.asarray(img[None]), jnp.asarray(boxes[None]), jnp.asarray(mask[None])
    )
    np.testing.assert_allclose(np.asarray(out_boxes)[0], boxes)
    assert float(out_img.max()) <= 1.0


def test_photometric_subset_matches_whole_batch_twin():
    """The exact-k subset applier must produce the same pixels as the
    whole-batch where-gated twin given the SAME scalar table, when sigma=0
    (noise threefry keys legitimately differ between the two paths)."""
    from fdtpu.data.augment import (
        _apply_photometric_xla,
        _apply_photometric_xla_subset,
        _sample_photometric_params_exact_k,
    )

    key = jax.random.PRNGKey(7)
    imgs = jax.random.uniform(key, (16, 32, 32, 3), maxval=255.0)
    scalars, _, sels = _sample_photometric_params_exact_k(
        jax.random.PRNGKey(1), 16
    )
    scalars = scalars.at[:, 3].set(0.0)  # sigma=0: kill the noise term
    got = _apply_photometric_xla_subset(jax.random.PRNGKey(2), imgs, scalars, sels)
    want = _apply_photometric_xla(jax.random.PRNGKey(3), imgs, scalars)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_positional_flip_is_row_parity():
    """With ``positional_crop=True`` (shuffled feeds) the flip subset is
    positional too: odd batch rows flip, even rows don't — visible in the
    box x-coordinates of the un-cropped rows (crop rows [0:k) rescale their
    boxes; photometric ops never touch boxes)."""
    from fdtpu.data.augment import P_CROP, augment_batch_fast

    b, h, w = 16, 32, 32
    k = round(P_CROP * b)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.integers(0, 255, (b, h, w, 3)).astype(np.float32))
    boxes = jnp.tile(jnp.asarray([[1.0, 10.0, 5.0, 4.0, 6.0]]), (b, 1))[:, None]
    masks = jnp.ones((b, 1), bool)
    _, out_b, _ = augment_batch_fast(
        jax.random.PRNGKey(2), imgs, boxes, masks, positional_crop=True
    )
    out_b = np.asarray(out_b)
    for i in range(k, b):
        want_x = w - 10.0 - 4.0 if i % 2 == 1 else 10.0
        assert out_b[i, 0, 1] == want_x, (i, out_b[i, 0])
        assert out_b[i, 0, 3] == 4.0 and out_b[i, 0, 4] == 6.0


def test_crop_resample_matches_jax_image():
    """The closed-form crop weight construction (``_crop_weight_mat``) must
    reproduce ``jax.image.scale_and_translate`` — jax's normalize-by-sum at
    the half-pixel borders equals clamping the sample position for
    upsampling crops, and interior triangle taps already sum to 1, so the
    only residual is ~1-ulp f32 weight rounding (jax divides by a
    1.0±1ulp sum; amplified at most one bf16 ulp per weight after the
    image-dtype cast)."""
    from fdtpu.data.augment import _apply_crop, _crop_weight_mat, _sample_crop

    h = w = 64
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.integers(0, 255, (h, w, 3)).astype(np.float32))
    boxes = jnp.zeros((4, 5), jnp.float32)
    mask = jnp.zeros((4,), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)

    def jax_image_crop(im, cx, cy, cw, ch):
        sy, sx = h / ch, w / cw
        return jax.image.scale_and_translate(
            im, (h, w, 3), (0, 1), jnp.stack([sy, sx]),
            jnp.stack([-cy * sy, -cx * sx]), method="linear",
            antialias=False,
        )

    for k in keys:
        cx, cy, cw, ch = _sample_crop(jax.random.split(k, 5), h, w,
                                      gate=False)
        got = _apply_crop(img, boxes, mask, cx, cy, cw, ch)[0]
        want = jax_image_crop(img, cx, cy, cw, ch)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-3, rtol=0)
        # bf16 images (the batched production dtype): both paths cast the
        # f32 weights to the image dtype, so they stay within one bf16 ulp
        # of each other per weight (<= ~2 intensity levels after blending)
        got16 = _apply_crop(img.astype(jnp.bfloat16), boxes, mask,
                            cx, cy, cw, ch)[0].astype(np.float32)
        want16 = np.asarray(
            jax_image_crop(img.astype(jnp.bfloat16), cx, cy, cw, ch)
        ).astype(np.float32)
        np.testing.assert_allclose(got16, want16, atol=2.0, rtol=0)

    # identity window (cw=w, ch=h, offsets 0): weights are exactly the
    # identity matrix, pixels pass through bit-exact
    ident = _crop_weight_mat(h, jnp.float32(0.0), jnp.float32(h))
    np.testing.assert_array_equal(np.asarray(ident), np.eye(h, dtype=np.float32))
    out = _apply_crop(img, boxes, mask, jnp.float32(0.0), jnp.float32(0.0),
                      jnp.float32(w), jnp.float32(h))[0]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_positional_crop_first_k_rows_only():
    """``positional_crop=True`` must crop exactly the first ``round(P_CROP*B)``
    rows: later rows keep their box w/h (flip/photometric never rescale),
    while the cropped slice rescales at least one box. Both paths share all
    other semantics (shapes, clipping, rounding)."""
    from fdtpu.data.augment import P_CROP, augment_batch_fast

    b, k = 32, round(0.2 * 32)
    assert k == round(P_CROP * b)
    key = jax.random.PRNGKey(11)
    imgs = jax.random.uniform(key, (b, 64, 64, 3), maxval=255.0)
    boxes = jnp.tile(jnp.asarray([[1.0, 10, 12, 20, 24]], jnp.float32), (b, 1))[
        :, None, :
    ]
    masks = jnp.ones((b, 1), bool)
    oi, ob, om = augment_batch_fast(
        jax.random.PRNGKey(5), imgs, boxes, masks, positional_crop=True
    )
    assert oi.shape == (b, 64, 64, 3)
    ob, om = np.asarray(ob), np.asarray(om)
    tail = ob[k:, 0]
    # un-cropped rows: w/h untouched (flip moves x only; photometric is
    # pixel-wise)
    np.testing.assert_array_equal(tail[:, 3], 20.0)
    np.testing.assert_array_equal(tail[:, 4], 24.0)
    head = ob[:k, 0][om[:k, 0]]
    assert (head[:, 3] != 20.0).any() or (head[:, 4] != 24.0).any()


def test_photometric_fused_clip_bit_identical():
    """The round-4 fused finish (clip/scale inside the flip+fma whole-batch
    pass, subset rows re-finalized before the scatter) must be bit-identical
    to the pre-round-4 order (clip as its own pass after the scatter)."""
    from fdtpu.data.augment import (
        _apply_photometric_xla_subset,
        _depthwise_filter_batch,
        _gaussian_kernel5,
        _motion_kernel7,
        _sample_photometric_params_exact_k,
    )

    b = 32
    key = jax.random.PRNGKey(3)
    imgs = jax.random.uniform(key, (b, 32, 32, 3), maxval=300.0)  # force clip
    scalars, _, sels = _sample_photometric_params_exact_k(
        jax.random.PRNGKey(1), b
    )
    kf = jax.random.PRNGKey(2)
    got = _apply_photometric_xla_subset(kf, imgs, scalars, sels)

    # the old order, inline
    noise_sel, glass_sel, motion_sel = sels
    n = noise_sel.shape[0]
    out = imgs.astype(jnp.bfloat16)
    out = jnp.where(
        scalars[:, 0, None, None, None] > 0.5, out[:, :, ::-1, :], out
    )
    out = out * scalars[:, 1, None, None, None].astype(out.dtype) + scalars[
        :, 2, None, None, None
    ].astype(out.dtype)
    sel3 = jnp.concatenate([noise_sel, glass_sel, motion_sel])
    sub = out[sel3]
    sigma = scalars[noise_sel, 3].astype(out.dtype)
    seed = jax.random.randint(kf, (), 0, 2**31 - 1)
    noise = jax.random.normal(
        jax.random.key(seed, impl="rbg"), sub[:n].shape, dtype=out.dtype
    )
    noised = sub[:n] + sigma[:, None, None, None] * noise
    g7 = jnp.zeros((7, 7), jnp.float32).at[1:6, 1:6].set(_gaussian_kernel5())
    ang = (scalars[motion_sel, 6] + 0.5) * jnp.pi / 16.0
    kerns = jnp.concatenate(
        [jnp.broadcast_to(g7, (glass_sel.shape[0], 7, 7)),
         jax.vmap(_motion_kernel7)(ang)]
    )
    blurred = _depthwise_filter_batch(sub[n:], kerns)
    out = out.at[sel3].set(jnp.concatenate([noised, blurred]))
    want = jnp.clip(out, 0.0, 255.0) / jnp.bfloat16(255.0)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_photometric_exact_k_gate_counts():
    """Exact-k sampler: each expensive gate selects exactly round(p*B)
    members, and the scalar table's gate columns agree with the index sets."""
    from fdtpu.data.augment import (
        P_GLASS,
        P_MOTION,
        P_NOISE,
        _sample_photometric_params_exact_k,
    )

    b = 64
    scalars, _, (nsel, gsel, msel) = _sample_photometric_params_exact_k(
        jax.random.PRNGKey(0), b
    )
    sc = np.asarray(scalars)
    assert nsel.shape == (round(P_NOISE * b),)
    assert gsel.shape == (round(P_GLASS * b),)
    assert msel.shape == (round(P_MOTION * b),)
    assert (sc[np.asarray(nsel), 3] > 0).all() and np.count_nonzero(sc[:, 3]) == len(nsel)
    assert set(np.flatnonzero(sc[:, 4] > 0.5)) == set(np.asarray(gsel).tolist())
    assert set(np.flatnonzero(sc[:, 5] > 0.5)) == set(np.asarray(msel).tolist())


def test_decoded_frame_cache_matches_recode(tmp_path):
    """RAM-cached epochs must produce the same samples as re-decoding, on
    both the per-sample and native-batch paths; host rotation still draws
    fresh angles after the cache read."""
    root = make_synthetic_widerface(tmp_path, num_images=4)
    targets = load_targets(root, "train", max_faces=3)
    cached = WIDERFaceDataSource(targets, (160, 160), 4, cache_decoded=True)
    plain = WIDERFaceDataSource(targets, (160, 160), 4, cache_decoded=False)
    for i in range(4):
        cached.get(i)  # epoch 1: fill
    for i in range(4):
        ia, ba, ma = cached.get(i)  # epoch 2: hits
        ib, bb, mb = plain.get(i)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(ma, mb)
    for got, i in zip(cached.get_batch(np.arange(4)), range(4)):
        np.testing.assert_array_equal(got[0], plain.get(i)[0])

    rot = WIDERFaceDataSource(
        targets, (160, 160), 4, rotate_prob=1.0, cache_decoded=True
    )
    first = rot.get(0)[0].copy()
    second = rot.get(0)[0]
    assert not np.array_equal(first, second)  # fresh angle per epoch


def test_degenerate_box_fallback(tmp_path):
    root = make_synthetic_widerface(tmp_path, num_images=3)
    targets = parse_wider_annotations(root, "train")
    # poison index 1 with an all-zero box (dataset.py:97-99 fallback)
    targets[1]["bbx"] = np.zeros((1, 5), dtype=np.float32)
    targets[1]["bbx"][0, 0] = 1.0
    src = WIDERFaceDataSource(targets, (160, 160), box_capacity=4, error_log=None)
    img1, boxes1, mask1 = src.get(1)
    img0, boxes0, mask0 = src.get(0)
    np.testing.assert_array_equal(boxes1, boxes0)


def test_warp_affine_exact_on_linear_ramp(rng):
    """Triangle-weight resampling reproduces linear functions exactly, so a
    coordinate ramp warped by the two-pass einsum path must equal the ramp
    evaluated at the affine's source coordinates (interior pixels). This
    pins the geometry; the filter itself is the classic two-pass
    (Catmull-Smith) warp, which differs from joint bilinear only in
    high-frequency content."""
    from fdtpu.data.augment import _sample_affine

    h = w = 64
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    img = np.stack([xx, yy, xx + 2 * yy], axis=-1)
    theta = 0.3
    c, s = np.cos(theta), np.sin(theta)
    cx, cy = (w - 1) / 2, (h - 1) / 2
    inv = np.array(
        [
            [c, -s, cx - c * cx + s * cy],
            [s, c, cy - s * cx - c * cy],
            [0, 0, 1],
        ],
        dtype=np.float32,
    )
    got = np.asarray(_sample_affine(jnp.asarray(img), jnp.asarray(inv)))
    xi = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2]
    yi = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2]
    want = np.stack([xi, yi, xi + 2 * yi], axis=-1)
    # interior only (borders reflect); both the image and the weights pass
    # through bf16 in the contraction, so tolerance = ~2 ulp at value ~190
    interior = (xi > 1) & (xi < w - 2) & (yi > 1) & (yi < h - 2)
    err = np.abs(got - want)[(interior)]
    assert err.max() < 2.5
    assert err.mean() < 0.3


def test_warp_affine_identity(rng):
    from fdtpu.data.augment import _sample_affine

    img = rng.uniform(0, 255, size=(32, 32, 3)).astype(np.float32)
    out = np.asarray(_sample_affine(jnp.asarray(img), jnp.eye(3)))
    assert np.abs(out - img).max() < 2.0  # bf16 pixel rounding only


def test_augment_gate_probabilities():
    """Statistical check that the augmentation gates fire at the reference's
    probabilities (datamodule.py:106-124): flip p=0.5 measured on a
    half-black/half-white probe; crop p=0.2 and window distribution measured
    directly on the parameter sampler."""
    from fdtpu.data.augment import _sample_crop, augment_sample

    h = w = 32
    img = np.zeros((h, w, 3), np.float32)
    img[:, w // 2 :] = 255.0  # white right half
    boxes = jnp.zeros((2, 5))
    mask = jnp.zeros((2,), bool)

    n = 300
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    outs, _, _ = jax.jit(
        jax.vmap(lambda k: augment_sample(k, jnp.asarray(img), boxes, mask))
    )(keys)
    outs = np.asarray(outs)
    # flip fired iff the left half is brighter (crop never swaps sides;
    # photometric ops are side-symmetric)
    left = outs[:, :, : w // 2].mean(axis=(1, 2, 3))
    right = outs[:, :, w // 2 :].mean(axis=(1, 2, 3))
    flip_rate = float((left > right).mean())
    assert 0.40 < flip_rate < 0.60, flip_rate

    # crop gate distribution, tested on the sampler itself
    cx, cy, cw, ch = jax.jit(
        jax.vmap(lambda k: _sample_crop(jax.random.split(k, 5), 320, 320))
    )(keys)
    cw, ch = np.asarray(cw), np.asarray(ch)
    fired = cw < 320
    rate = float(fired.mean())
    assert 0.13 < rate < 0.28, rate
    # windows within Albumentations' scale/ratio ranges
    area = (cw[fired] / 320) * (ch[fired] / 320)
    assert area.min() >= 0.05 and area.max() <= 1.01
    ratio = cw[fired] / ch[fired]
    assert ratio.min() >= 0.74 and ratio.max() <= 1.36
    assert (np.asarray(cx)[fired] >= 0).all()
    assert (np.asarray(cx)[fired] + cw[fired] <= 320.01).all()


def test_batch_loader_process_shard_partitions(data_dir):
    """Multi-host feed recipe: per-process loaders with the same seed slice
    each global batch disjointly and exhaustively."""
    targets = load_targets(data_dir, "train", max_faces=3)
    src = WIDERFaceDataSource(targets, (160, 160), box_capacity=4)

    def collect(pid, n):
        loader = BatchLoader(
            src, batch_size=4, shuffle=True, seed=7, process_shard=(pid, n)
        )
        assert loader._local_batch == 4 // n
        return list(loader)

    full = BatchLoader(src, batch_size=4, shuffle=True, seed=7, drop_last=True)
    full_batches = list(full)
    parts = [collect(pid, 2) for pid in range(2)]
    assert len(parts[0]) == len(parts[1]) == len(full_batches)
    for fb, p0, p1 in zip(full_batches, parts[0], parts[1]):
        recombined = np.concatenate([p0.images, p1.images])
        np.testing.assert_array_equal(recombined, fb.images)
        np.testing.assert_array_equal(
            np.concatenate([p0.boxes, p1.boxes]), fb.boxes
        )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        BatchLoader(src, batch_size=5, process_shard=(0, 2))


def test_photometric_positional_matches_permutation_path():
    """The positional (static-slice) photometric path must be bit-identical
    to the gather/scatter path given the SAME subsets: feed the permutation
    applier the arange selections the positional sampler produces."""
    from fdtpu.data.augment import (
        _apply_photometric_xla_subset,
        _photometric_counts,
        _sample_photometric_params_exact_k,
    )

    b, start = 32, 6
    key = jax.random.PRNGKey(13)
    imgs = jax.random.uniform(key, (b, 32, 32, 3), maxval=255.0)
    scalars, _, sels = _sample_photometric_params_exact_k(
        jax.random.PRNGKey(1), b, start=start
    )
    nn_, ng, nm = _photometric_counts(b)
    np.testing.assert_array_equal(np.asarray(sels[0]),
                                  np.arange(start, start + nn_))
    np.testing.assert_array_equal(
        np.asarray(sels[2]),
        np.arange(start + nn_ + ng, start + nn_ + ng + nm))
    kf = jax.random.PRNGKey(2)
    got = _apply_photometric_xla_subset(kf, imgs, scalars, sels,
                                        positional_start=start)
    want = _apply_photometric_xla_subset(kf, imgs, scalars, sels)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_photometric_positional_production_wiring():
    """augment_batch_fast(positional_crop=True) routes the photometric block
    positionally when crop-k + 3k fits the batch: rows outside
    [0, k_crop + 3k) keep their pixels up to flip/bc only (no noise/blur),
    and the run is distribution-sane (pixels in [0, 1])."""
    from fdtpu.data.augment import (
        P_CROP, _photometric_counts, augment_batch_fast,
    )

    b = 32
    k = round(P_CROP * b)
    n3 = sum(_photometric_counts(b))
    assert k + n3 <= b
    key = jax.random.PRNGKey(17)
    imgs = jax.random.uniform(key, (b, 32, 32, 3), maxval=255.0)
    boxes = jnp.tile(jnp.asarray([[1.0, 4, 5, 8, 9]], jnp.float32),
                     (b, 1))[:, None, :]
    masks = jnp.ones((b, 1), bool)
    oi, _, _ = augment_batch_fast(key, imgs, boxes, masks,
                                  positional_crop=True)
    oi = np.asarray(oi, np.float32)
    assert oi.min() >= 0.0 and oi.max() <= 1.0
    # tail rows past the positional windows: only flip (x-reverse) and/or
    # bc (a*x+b then clip) may have touched them — per-row pixel multisets
    # of clip(a*x+b)/255 vs original (possibly mirrored) must agree for
    # rows where bc didn't saturate; at minimum the blur/noise subsets
    # must NOT extend past k + n3 (blur correlates neighbours, noise is
    # additive — both change the per-row variance structure). Check the
    # untouched-tail invariant loosely: every tail row equals a clipped
    # affine map of its input or its mirror.
    src = np.asarray(imgs, np.float32)
    for r in range(k + n3, b):
        row = oi[r] * 255.0
        cands = [src[r], src[r][:, ::-1]]
        ok = False
        for c in cands:
            mask = (row > 1e-3) & (row < 254.9) & (c > 1e-3)
            if mask.sum() < 100:
                ok = True  # saturated row: can't identify, skip
                break
            a = np.polyfit(c[mask].ravel(), row[mask].ravel(), 1)
            pred = np.clip(a[0] * c + a[1], 0, 255)
            if np.abs(pred[mask] - row[mask]).max() < 3.0:
                ok = True
                break
        assert ok, f"tail row {r} was touched by noise/blur"
