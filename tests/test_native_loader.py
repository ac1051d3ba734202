"""Native (C++) image loader: build, decode parity vs PIL, threaded batches."""
import os

import numpy as np
import pytest
from PIL import Image

from consistentid_tpu.io.native_loader import (NativeImageLoader,
                                               decode_resize_normalize,
                                               get_lib)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = rng.randint(0, 255, (48 + i, 40 + i, 3), np.uint8)
        p = d / f"im{i}.{'jpg' if i % 2 else 'png'}"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_native_lib_builds():
    assert get_lib() is not None, "C++ loader failed to build"


def test_decode_matches_cv2(image_dir):
    """The native resize implements standard half-pixel bilinear, i.e. cv2
    INTER_LINEAR semantics (PIL's BILINEAR antialiases when downscaling)."""
    cv2 = pytest.importorskip("cv2")
    if get_lib() is None:
        pytest.skip("no native lib")
    for path in image_dir:
        out = decode_resize_normalize(path, 32, 32)
        assert out is not None and out.shape == (32, 32, 3)
        decoded = np.asarray(Image.open(path).convert("RGB"))
        ref = cv2.resize(decoded, (32, 32),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32) / 255.0
        # JPEG decoders may differ by a few LSBs before resizing
        tol = 0.02 if path.endswith(".jpg") else 0.005
        assert np.abs(out - ref).mean() < tol, path


def test_batched_loader(image_dir):
    if get_lib() is None:
        pytest.skip("no native lib")
    loader = NativeImageLoader(image_dir, 32, 32, batch=4, threads=2)
    batches = list(loader)
    assert len(batches) == 2   # 6 images, batch 4 -> 2 batches (last padded)
    assert batches[0].images.shape == (4, 32, 32, 3)
    assert np.isfinite(batches[0].images).all()
    # at least the first image decoded to non-zero content
    assert np.abs(batches[0].images[0]).sum() > 0
    # in-order delivery with per-image ok flags; padded tail slots are not-ok
    assert [b.start for b in batches] == [0, 4]
    assert batches[0].ok.all()
    assert list(batches[1].ok) == [True, True, False, False]
    assert np.abs(batches[1].images[2:]).sum() == 0
    loader.close()


def test_loader_order_and_pairing_under_contention(image_dir, tmp_path):
    """Many small batches + more workers than batches in flight: completion
    order is scrambled but delivery must stay in path order, and failed
    decodes must be flagged rather than silently zero-filled."""
    if get_lib() is None:
        pytest.skip("no native lib")
    bad = tmp_path / "corrupt.jpg"
    bad.write_bytes(b"not an image")
    # 25 paths, one bad, batch 2 -> 13 batches, workers race for slots
    paths = (image_dir * 4)[:24]
    paths.insert(7, str(bad))
    loader = NativeImageLoader(paths, 16, 16, batch=2, threads=6)
    starts, oks = [], []
    for b in loader:
        starts.append(b.start)
        oks.extend(b.ok[: max(0, min(2, len(paths) - b.start))])
    assert starts == list(range(0, 25, 2))
    expected_ok = [i != 7 for i in range(25)]
    assert oks == expected_ok
    loader.close()


def test_center_crop_matches_pil(image_dir):
    """center_crop=True samples the centered square (ArcFace-style crop)."""
    cv2 = pytest.importorskip("cv2")
    if get_lib() is None:
        pytest.skip("no native lib")
    for path in image_dir:
        out = decode_resize_normalize(path, 16, 16, center_crop=True)
        assert out is not None
        im = Image.open(path).convert("RGB")
        w, h = im.size
        side = min(w, h)
        crop = np.asarray(im)[(h - side) // 2:(h - side) // 2 + side,
                              (w - side) // 2:(w - side) // 2 + side]
        ref = cv2.resize(crop, (16, 16),
                         interpolation=cv2.INTER_LINEAR).astype(
                             np.float32) / 255.0
        tol = 0.02 if path.endswith(".jpg") else 0.005
        assert np.abs(out - ref).mean() < tol, path
