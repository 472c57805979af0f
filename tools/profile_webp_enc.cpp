// Probe: where does libwebp lossy encode time go at serving shapes?
// (a) WebPPictureImportBGRA + ARGB->YUV(sharpyuv-less) conversion
// (b) pure VP8 encode from preconverted YUV
#include <webp/encode.h>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>

static int null_writer(const uint8_t*, size_t, const WebPPicture*) { return 1; }

int main() {
    const int w = 256, h = 256, iters = 60;
    std::vector<uint8_t> px(w * h * 4);
    srand(7);
    for (size_t i = 0; i < px.size(); i++) px[i] = (i * 31 + (i >> 8) * 17) & 0xFF;
    WebPConfig cfg;
    WebPConfigInit(&cfg);
    cfg.quality = 85;
    using clk = std::chrono::steady_clock;

    // full path: import BGRA (RGB->YUV inside) + encode
    auto t0 = clk::now();
    for (int it = 0; it < iters; it++) {
        WebPPicture pic; WebPPictureInit(&pic);
        pic.width = w; pic.height = h; pic.use_argb = 1;
        WebPPictureImportBGRA(&pic, px.data(), w * 4);
        pic.writer = null_writer;
        WebPEncode(&cfg, &pic);
        WebPPictureFree(&pic);
    }
    double full_ms = std::chrono::duration<double, std::milli>(clk::now() - t0).count() / iters;

    // conversion-only: import + ARGBToYUVA
    t0 = clk::now();
    for (int it = 0; it < iters; it++) {
        WebPPicture pic; WebPPictureInit(&pic);
        pic.width = w; pic.height = h; pic.use_argb = 1;
        WebPPictureImportBGRA(&pic, px.data(), w * 4);
        WebPPictureARGBToYUVA(&pic, WEBP_YUV420);
        WebPPictureFree(&pic);
    }
    double conv_ms = std::chrono::duration<double, std::milli>(clk::now() - t0).count() / iters;

    // sharp yuv conversion (what -sharp_yuv / quality paths use)
    t0 = clk::now();
    for (int it = 0; it < iters; it++) {
        WebPPicture pic; WebPPictureInit(&pic);
        pic.width = w; pic.height = h; pic.use_argb = 1;
        WebPPictureImportBGRA(&pic, px.data(), w * 4);
        WebPPictureSharpARGBToYUVA(&pic);
        WebPPictureFree(&pic);
    }
    double sharp_ms = std::chrono::duration<double, std::milli>(clk::now() - t0).count() / iters;

    // encode from preconverted YUV (conversion outside the loop)
    WebPPicture yuv; WebPPictureInit(&yuv);
    yuv.width = w; yuv.height = h; yuv.use_argb = 1;
    WebPPictureImportBGRA(&yuv, px.data(), w * 4);
    WebPPictureARGBToYUVA(&yuv, WEBP_YUV420);
    t0 = clk::now();
    for (int it = 0; it < iters; it++) {
        WebPPicture pic; WebPPictureInit(&pic);
        WebPPictureCopy(&yuv, &pic);
        pic.writer = null_writer;
        WebPEncode(&cfg, &pic);
        WebPPictureFree(&pic);
    }
    double yuv_ms = std::chrono::duration<double, std::milli>(clk::now() - t0).count() / iters;
    WebPPictureFree(&yuv);

    printf("{\"full_ms\": %.3f, \"conv_simple_ms\": %.3f, \"conv_sharp_ms\": %.3f, \"encode_from_yuv_ms\": %.3f}\n",
           full_ms, conv_ms, sharp_ms, yuv_ms);
    return 0;
}
