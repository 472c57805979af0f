"""Golden thumbhash tests — hashes must byte-match the rust reference
implementation's output (same fixtures/expectations as the reference's
thumbhash_test.go:63-82). This transitively pins the JPEG/PNG decoders,
EXIF orientation normalization, and the Transform path."""
import base64

import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder  # noqa: E402

GOLD = {
    "sunrise.jpg": "1QcSHQRnh493V4dIh4eXh1h4kJUI",
    "sunset.jpg": "3PcNNYSFeXh/d3eld0iHZoZgVwh2",
    "field.jpg": "3OcRJYB4d3h/iIeHeEh3eIhw+j3A",
    "fall.jpg": "HBkSHYSIeHiPiHh8eJd4eTN0EEQG",
    "street.jpg": "VggKDYAW6lZvdYd6d2iZh/p4GE/k",
    "mountain.jpg": "2fcZFIB3iId/h3iJh4aIYJ2V8g==",
    "coast.jpg": "IQgSLYZ6iHePh4h1eFeHh4dwgwg3",
    "firefox.png": "YJqGPQw7sFlslqhFafSE+Q6oJ1h2iHB2Rw==",
    "opera.png": "mYqDBQQnxnj0JoLYdN7f8JhpuDeHiHdwZw==",
    "firefox-16bit.png": "YJqGPQw7oFlslqhGafOE+Q6oJ1h2iHBlVw==",
    "firefox-16bit-alpha.png": "YJqGPQw7sFlslqhFafSE+Q6oJ1h2iHB2Rw==",
    "firefox-gray.jpg": "FwgOBwAxOWl4l3aQpFiIN5iHBgAAAAAA",
    "opera-gray-alpha.png": "EwiCBQAnwnjzJpHIZAAAAAAAuDeHiHdwZw==",
    "large-sunrise.jpg": "VvYRNQRod3x3B4iHeHhYiHeAeQUo",
}


@pytest.mark.parametrize("name", sorted(GOLD), ids=str)
def test_golden_thumbhash(name):
    buf = open(f"/root/reference/data/{name}", "rb").read()
    d = new_decoder(buf)
    h = d.header()
    out = ImageOps(8192).transform(d, ImageOptions(
        file_type=".thumbhash", width=h.width, height=h.height,
        resize_method=ResizeMethod.NO_RESIZE, encode_timeout=300.0))
    assert base64.b64encode(out).decode() == GOLD[name]


def test_batched_thumbhash_matches_single():
    import numpy as np

    from lilliput_tpu.codecs.thumbhash import ThumbhashEncoder, thumbhash_batch
    from lilliput_tpu.framebuffer import Framebuffer
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 90, 100, 4), dtype=np.uint8)
    batch = thumbhash_batch(imgs)
    singles = [ThumbhashEncoder().encode(Framebuffer.from_array(imgs[i]), {})
               for i in range(4)]
    assert batch == singles
