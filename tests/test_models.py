"""Model zoo shape/geometry tests against the reference's arithmetic
(SURVEY.md §2.3): output grids, prior counts, predict API, dropout behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdtpu.models import (
    Detector,
    MobileNetV3Backbone,
    PoolResnet,
    Resnet,
    SeparableCNN,
    SSD,
    ssd_patch_sizes,
)

KEY = jax.random.PRNGKey(0)


def _fwd(module, size, batch=1, train=False, rngs=None, mutable=False):
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = module.init(KEY, x, train=False)
    kwargs = {}
    if mutable:
        kwargs["mutable"] = ["batch_stats"]
    out = module.apply(variables, x, train=train, rngs=rngs, **kwargs)
    return out[0] if mutable else out


SMALL = dict(filters=8, num_residual_blocks=3)


def test_poolresnet_480_grid10():
    # train_model.py:27-32 config arithmetic: 480/8=60 -> pool to 15 -> k6 -> 10
    m = PoolResnet(input_shape=(480, 480), num_patches=10, **SMALL)
    assert m.grid_size() == 10
    out = _fwd(m, 480)
    assert out.shape == (1, 10, 10, 5)
    assert float(out.min()) >= 0 and float(out.max()) <= 1  # post-sigmoid


def test_poolresnet_320_grid15():
    m = PoolResnet(input_shape=(320, 320), num_patches=15, **SMALL)
    # 320 -> stem 40 -> (40 > 30) pool -> 20 -> k6 valid -> 15
    assert m.grid_size() == 15
    assert _fwd(m, 320).shape == (1, 15, 15, 5)


def test_poolresnet_fast_stem_matches_plain():
    """The two-stage stem (TwoStageStemConv) is the same dot-product set as
    the plain k10/s8 stem — identical param tree, outputs equal up to
    summation-order rounding. Checkpoints must move freely between modes."""
    kw = dict(input_shape=(320, 320), num_patches=15, filters=8,
              num_residual_blocks=3)
    plain = PoolResnet(**kw)
    fast = PoolResnet(fast_stem=True, **kw)
    x = jax.random.uniform(KEY, (2, 320, 320, 3), jnp.float32)
    p_plain = plain.init(KEY, x[:1])["params"]
    p_fast = fast.init(KEY, x[:1])["params"]
    assert jax.tree_util.tree_structure(p_plain) == \
        jax.tree_util.tree_structure(p_fast)
    assert jax.tree_util.tree_map(jnp.shape, p_plain) == \
        jax.tree_util.tree_map(jnp.shape, p_fast)
    y_plain = plain.apply({"params": p_plain}, x)
    y_fast = fast.apply({"params": p_plain}, x)  # same params, both paths
    np.testing.assert_allclose(
        np.asarray(y_plain), np.asarray(y_fast), atol=3e-2)
    # f32 end-to-end pins it near-exact (order-of-summation only)
    plain32 = PoolResnet(dtype=jnp.float32, **kw)
    fast32 = PoolResnet(fast_stem=True, dtype=jnp.float32, **kw)
    y1 = plain32.apply({"params": p_plain}, x)
    y2 = fast32.apply({"params": p_plain}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_separable_fast_stem_matches_plain():
    """SeparableCNN shares the k10/s8 stem; same checkpoint-compat gate."""
    from fdtpu.models.separable import SeparableCNN

    kw = dict(input_shape=(320, 320), num_patches=15, filters=8,
              num_residual_blocks=3, dtype=jnp.float32)
    plain = SeparableCNN(**kw)
    fast = SeparableCNN(fast_stem=True, **kw)
    x = jax.random.uniform(KEY, (2, 320, 320, 3), jnp.float32)
    p = plain.init(KEY, x[:1])["params"]
    assert jax.tree_util.tree_map(jnp.shape, p) == \
        jax.tree_util.tree_map(jnp.shape, fast.init(KEY, x[:1])["params"])
    np.testing.assert_allclose(
        np.asarray(plain.apply({"params": p}, x)),
        np.asarray(fast.apply({"params": p}, x)), atol=1e-5)


def test_resnet_grid_arithmetic():
    # Resnet.py __main__ config: stem 240 -> pools to 15 -> k3 pad1 -> 15
    # (4 pooling blocks needed: 240 -> 120 -> 60 -> 30 -> 15)
    m = Resnet(input_shape=(480, 480), num_patches=15, filters=8, num_residual_blocks=4)
    assert m.grid_size() == 15
    # run the forward at a small size: 160 -> stem 80 -> pools to 10
    m = Resnet(input_shape=(160, 160), num_patches=10, **SMALL)
    assert m.grid_size() == 10
    assert _fwd(m, 160).shape == (1, 10, 10, 5)


def test_separable_grid():
    m = SeparableCNN(input_shape=(480, 480), num_patches=16, **SMALL)
    assert m.grid_size() == 10  # stem 60, pools 60->30->15 (>16), head k6: 15-6+1
    m = SeparableCNN(input_shape=(160, 160), num_patches=16, **SMALL)
    assert _fwd(m, 160).shape == (1, m.grid_size(), m.grid_size(), 5)


def test_ssd_480_prior_arithmetic():
    assert ssd_patch_sizes((480, 480)) == (60, 30, 15, 7)  # SSD.py:99
    assert sum(p * p for p in ssd_patch_sizes((480, 480))) == 4774


def test_ssd_forward():
    ps = ssd_patch_sizes((160, 160))
    m = SSD(filters=4, input_shape=(160, 160), patch_sizes=ps)
    out = _fwd(m, 160)
    assert out.shape == (1, sum(p * p for p in ps), 5)
    s = np.asarray(out[0, :, 0])
    assert (s >= 0).all() and (s <= 1).all()  # sigmoid on scores only


def test_ssd_default_init_is_torch():
    """SSD defaults to torch nn.Conv2d/Linear init (kaiming_uniform +
    uniform bias). Guards the round-3 convergence finding: flax's zero-bias
    lecun_normal puts every initial sigmoid confidence at exactly 0.5, which
    starves -log(conf) hard-negative mining of a ranking signal (synthetic
    AP@0.5 0.24-0.30 vs 0.72-0.73 with torch init — BASELINE.md SSD
    control)."""
    ps = ssd_patch_sizes((160, 160))
    m = SSD(filters=4, input_shape=(160, 160), patch_sizes=ps)
    assert m.torch_init
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    params = m.init(KEY, x, train=False)["params"]
    stem = params["Conv_0"]
    fan_in = 3 * 3 * 3
    bound = 1.0 / np.sqrt(fan_in)
    b = np.asarray(stem["bias"])
    assert (np.abs(b) <= bound).all() and np.abs(b).max() > 0  # uniform, nonzero
    assert np.abs(np.asarray(stem["kernel"])).max() <= bound
    # initial confidences must be spread, not pinned at 0.5
    out = m.apply({"params": params}, x, train=False)
    s = np.asarray(out[0, :, 0])
    assert s.std() > 1e-3


def test_ssd_fast_blocks_matches_plain():
    """fast_blocks (WidthFoldedConv lowering of the lane-starved cout<128
    convs) is the same dot-product set — identical param tree, outputs equal
    up to summation-order rounding; f32 pins it near-exact. Mirrors the
    fast-stem gate."""
    ps = ssd_patch_sizes((160, 160))
    kw = dict(filters=16, input_shape=(160, 160), patch_sizes=ps)
    plain = SSD(**kw)
    fast = SSD(fast_blocks=True, **kw)
    x = jax.random.uniform(KEY, (2, 160, 160, 3), jnp.float32)
    p = plain.init(KEY, x[:1], train=False)["params"]
    p_fast = fast.init(KEY, x[:1], train=False)["params"]
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)), p, p_fast))
    np.testing.assert_allclose(
        np.asarray(plain.apply({"params": p}, x, train=False)),
        np.asarray(fast.apply({"params": p}, x, train=False)), atol=3e-2)
    plain32 = SSD(dtype=jnp.float32, **kw)
    fast32 = SSD(fast_blocks=True, dtype=jnp.float32, **kw)
    np.testing.assert_allclose(
        np.asarray(plain32.apply({"params": p}, x, train=False)),
        np.asarray(fast32.apply({"params": p}, x, train=False)), atol=1e-4)


def test_ssd_320_patch_sizes():
    ps = ssd_patch_sizes((320, 320))
    assert ps == (40, 20, 10, 5)
    m = SSD(filters=4, input_shape=(320, 320), patch_sizes=ps)
    n = sum(p * p for p in ps)
    assert _fwd(m, 320).shape == (1, n, 5)


def test_mobilenetv3_grid():
    assert MobileNetV3Backbone(input_shape=(480, 480), num_patches=15).grid_size() == 15
    m = MobileNetV3Backbone(input_shape=(160, 160), num_patches=5)
    x = jnp.zeros((1, 160, 160, 3), jnp.float32)
    variables = m.init(KEY, x, train=False)
    assert "batch_stats" in variables  # BN running stats
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 5, 5, 5)
    # 576-channel feature map before the head (MobilenetV3Backbone.py:40)
    assert variables["params"]["head"]["kernel"].shape == (3, 3, 576, 5)


def test_dropout_active_in_train_mode():
    m = PoolResnet(input_shape=(160, 160), num_patches=10, **SMALL)
    x = jnp.ones((1, 160, 160, 3), jnp.float32)
    variables = m.init(KEY, x, train=False)
    a = m.apply(variables, x, train=False)
    b = m.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = m.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    d = m.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_detector_predict_api():
    m = PoolResnet(input_shape=(480, 480), num_patches=10, **SMALL)
    det = Detector(m, probability_threshold=0.5, iou_threshold=0.5, nms_capacity=16)
    det.init(KEY)
    # arbitrary-size uint8 input, like BaseModel.predict (BaseModel.py:56-71)
    img = (np.random.default_rng(0).uniform(0, 255, (600, 800, 3))).astype(np.uint8)
    norm, boxes, mask = det.predict(img)
    assert norm.shape == (480, 480, 3)
    assert boxes.shape == (16, 5) and mask.shape == (16,)
    assert float(norm.max()) <= 1.0


def test_detector_batch_nms():
    m = SSD(filters=4, input_shape=(160, 160), patch_sizes=ssd_patch_sizes((160, 160)))
    det = Detector(m, nms_capacity=8)
    det.init(KEY)
    out = det.apply(jnp.zeros((2, 160, 160, 3)))
    boxes, mask = det.non_max_suppression(out)
    assert boxes.shape == (2, 8, 5) and mask.shape == (2, 8)


def test_detector_summary():
    """nn.tabulate layer/param table (torchinfo + ptflops equivalent,
    BaseModel.py:36-45, BaseSSDModel.py:34-42)."""
    m = PoolResnet(input_shape=(160, 160), num_patches=10, **SMALL)
    det = Detector(m)
    table = det.summary()
    assert "Conv" in table and "flops" in table.lower()
