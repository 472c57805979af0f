import numpy as np
import cv2

def test_measure_device_stages():
    from lilliput_tpu.pipeline import JpegTranscodePipeline
    from lilliput_tpu.utils.profiling import measure_device_stages
    from lilliput_tpu.utils.metrics import Metrics
    rng = np.random.default_rng(0)
    img = cv2.resize(rng.integers(0, 256, (10, 10, 3), np.uint8), (320, 200),
                     interpolation=cv2.INTER_CUBIC)
    ok, b = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 88])
    buf = b.tobytes()
    pipe = JpegTranscodePipeline(buf, 64, 64, quality=85)
    reg = Metrics()
    out = measure_device_stages(pipe, [buf] * 2, iters=2, registry=reg)
    assert out["decode_ms"] > 0 and out["full_step_ms"] > 0
    snap = reg.snapshot()["stages"]
    for k in ("device.decode", "device.full_step", "device.dispatch",
              "device.fetch"):
        assert snap[k]["count"] == 1
    # grayscale path
    g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    ok, gb = cv2.imencode(".jpg", g, [cv2.IMWRITE_JPEG_QUALITY, 88])
    gp = JpegTranscodePipeline(gb.tobytes(), 32, 32, quality=85)
    out2 = measure_device_stages(gp, [gb.tobytes()], iters=1, registry=reg)
    assert out2["decode_ms"] > 0
