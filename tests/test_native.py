"""Native C++ loader: build, decode parity vs PIL, error paths, batch API."""

from pathlib import Path

import numpy as np
import pytest

from fdtpu.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain / libjpeg"
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("jpgs")
    paths = []
    for i, size in enumerate([(300, 200), (641, 480), (1024, 768)]):
        arr = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        p = d / f"img{i}.jpg"
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    # grayscale source must come back as RGB
    g = d / "gray.jpg"
    Image.fromarray(
        rng.integers(0, 255, size=(200, 300), dtype=np.uint8), mode="L"
    ).save(g)
    paths.append(g)
    return paths


def test_decode_resize_shapes_and_dims(jpegs):
    from fdtpu.native import decode_resize

    img, (w, h) = decode_resize(jpegs[1].read_bytes(), 320, 320)
    assert img.shape == (320, 320, 3) and img.dtype == np.uint8
    assert (w, h) == (641, 480)


def test_decode_matches_pil_roughly(jpegs):
    """Native decode (IFAST DCT + non-antialiased bilinear, matching cv2's
    INTER_LINEAR — what the reference's Albumentations resize actually uses)
    vs PIL (antialiased): images must agree structurally."""
    from PIL import Image

    from fdtpu.native import decode_resize

    got, _ = decode_resize(jpegs[0].read_bytes(), 160, 160)
    want = np.asarray(
        Image.open(jpegs[0]).convert("RGB").resize((160, 160), Image.BILINEAR)
    )
    # random-noise jpegs are worst case for filter differences
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 20


def test_grayscale_source(jpegs):
    from fdtpu.native import decode_resize

    img, _ = decode_resize(jpegs[-1].read_bytes(), 100, 100)
    assert img.shape == (100, 100, 3)
    # all three channels equal for a grayscale source
    assert (img[..., 0] == img[..., 1]).all()


def test_bad_jpeg_raises():
    from fdtpu.native import decode_resize

    with pytest.raises(ValueError):
        decode_resize(b"definitely not a jpeg", 64, 64)


def test_batch_decode(jpegs):
    from fdtpu.native import decode_resize_batch

    blobs = [p.read_bytes() for p in jpegs] + [b"broken"]
    imgs, dims, fails = decode_resize_batch(blobs, 128, 128, num_threads=2)
    assert imgs.shape == (len(blobs), 128, 128, 3)
    assert fails == 1
    assert tuple(dims[-1]) == (-1, -1)
    assert tuple(dims[1]) == (641, 480)
    assert (imgs[-1] == 0).all()


def test_source_retry_cap(tmp_path):
    """All-bad data must raise instead of recursing forever (the reference
    loops unboundedly when sample 0 is bad, dataset.py:150)."""
    from fdtpu.data.pipeline import WIDERFaceDataSource

    targets = [
        {"img_path": tmp_path / "missing.jpg", "bbx": np.ones((1, 5), np.float32)}
    ] * 2
    src = WIDERFaceDataSource(targets, (64, 64), 4, error_log=None)
    with pytest.raises(RuntimeError):
        src.get(0)
