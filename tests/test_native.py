"""Native batched FITS decoder: parity with the NumPy decoder + throughput."""

import numpy as np
import pytest

from applecider_tpu.native import decode_stamps_batch, get_lib
from applecider_tpu.preprocessing.fitsio import decode_stamp, write_fits_image


def _stamps(rng, n=32, hw=63, gz=True):
    imgs = [rng.normal(size=(hw, hw)).astype(np.float32) for _ in range(n)]
    blobs = [write_fits_image(im, gzip_compress=gz) for im in imgs]
    return imgs, blobs


def test_native_lib_builds():
    assert get_lib() is not None, "C++ decoder failed to build"


def test_batch_decode_matches_python(rng):
    imgs, blobs = _stamps(rng, n=16)
    out, ok = decode_stamps_batch(blobs, hw=63)
    assert ok.all()
    for i, im in enumerate(imgs):
        ref = decode_stamp(blobs[i])
        np.testing.assert_allclose(out[i], ref, rtol=1e-6)
        np.testing.assert_allclose(out[i], im, rtol=1e-6)


def test_batch_decode_uncompressed_and_mixed(rng):
    imgs, blobs = _stamps(rng, n=4, gz=False)
    mixed = blobs + [imgs[0], b"garbage", None]
    out, ok = decode_stamps_batch([m for m in mixed if m is not None], hw=63)
    assert ok[:5].all()
    assert not ok[5]  # garbage


def test_batch_decode_int16(rng):
    # int16 BITPIX path through the native decoder
    from applecider_tpu.preprocessing import fitsio

    img = (rng.integers(-100, 100, size=(63, 63))).astype(np.int16)
    cards = [
        "SIMPLE  =                    T",
        "BITPIX  =                   16",
        "NAXIS   =                    2",
        "NAXIS1  =                   63",
        "NAXIS2  =                   63",
        "BSCALE  =                  0.5",
        "BZERO   =                 10.0",
        "END",
    ]
    header = "".join(c.ljust(80) for c in cards)
    header += " " * (-len(header) % 2880)
    data = img.astype(">i2").tobytes()
    data += b"\x00" * (-len(data) % 2880)
    blob = header.encode() + data
    out, ok = decode_stamps_batch([blob], hw=63)
    assert ok[0]
    np.testing.assert_allclose(out[0], img.astype(np.float32) * 0.5 + 10.0, rtol=1e-6)


@pytest.mark.parametrize("n", [256])
def test_native_faster_than_python(rng, n):
    import time

    _, blobs = _stamps(rng, n=n)
    # warm the build
    decode_stamps_batch(blobs[:2], hw=63)

    t0 = time.perf_counter()
    out, ok = decode_stamps_batch(blobs, hw=63)
    native_t = time.perf_counter() - t0
    assert ok.all()

    t0 = time.perf_counter()
    for b in blobs:
        decode_stamp(b)
    python_t = time.perf_counter() - t0
    # informational only — wall-clock asserts are flaky under parallel load
    print(f"native={native_t*1e3:.1f}ms python={python_t*1e3:.1f}ms")
