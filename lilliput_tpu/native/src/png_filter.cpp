// PNG row unfiltering (host stage of the PNG codec).
//
// PNG's five row filters form a serial recurrence (each reconstructed byte
// depends on the byte to its left and the row above), so this is host-C++
// like the other entropy-ish stages; palette expansion, 16->8 conversion and
// channel swizzles then run on device (lilliput_tpu/codecs/png.py).
// Replaces the libpng row-defilter inside the reference's OpenCV PNG decode
// (/root/reference/opencv.cpp:93-146 via cv::ImageDecoder).

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// In-place unfilter of `rows` rows of `stride` bytes each, where the input
// layout is (filter_byte || row_bytes) per row, `bpp` = bytes per pixel
// (filter unit). in: rows*(stride+1) bytes; out: rows*stride bytes.
// Returns 0 on success, -1 on bad filter type.
int lp_png_unfilter(const uint8_t* in, uint8_t* out,
                    int64_t rows, int64_t stride, int32_t bpp) {
    const uint8_t* prev = nullptr;
    for (int64_t y = 0; y < rows; y++) {
        const uint8_t* src = in + y * (stride + 1);
        uint8_t* dst = out + y * stride;
        const uint8_t ft = src[0];
        src++;
        switch (ft) {
            case 0:  // None
                std::memcpy(dst, src, stride);
                break;
            case 1:  // Sub
                for (int64_t x = 0; x < bpp && x < stride; x++) dst[x] = src[x];
                for (int64_t x = bpp; x < stride; x++)
                    dst[x] = static_cast<uint8_t>(src[x] + dst[x - bpp]);
                break;
            case 2:  // Up
                if (prev) {
                    for (int64_t x = 0; x < stride; x++)
                        dst[x] = static_cast<uint8_t>(src[x] + prev[x]);
                } else {
                    std::memcpy(dst, src, stride);
                }
                break;
            case 3:  // Average
                for (int64_t x = 0; x < stride; x++) {
                    const int a = x >= bpp ? dst[x - bpp] : 0;
                    const int b = prev ? prev[x] : 0;
                    dst[x] = static_cast<uint8_t>(src[x] + ((a + b) >> 1));
                }
                break;
            case 4:  // Paeth
                for (int64_t x = 0; x < stride; x++) {
                    const int a = x >= bpp ? dst[x - bpp] : 0;
                    const int b = prev ? prev[x] : 0;
                    const int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
                    const int p = a + b - c;
                    const int pa = std::abs(p - a);
                    const int pb = std::abs(p - b);
                    const int pc = std::abs(p - c);
                    const int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                    dst[x] = static_cast<uint8_t>(src[x] + pred);
                }
                break;
            default:
                return -1;
        }
        prev = dst;
    }
    return 0;
}

// Encode-side adaptive filtering: picks the minimum-sum-of-abs filter per row
// (libpng's default heuristic) and writes (filter_byte || filtered_row)*rows.
void lp_png_filter(const uint8_t* in, uint8_t* out,
                   int64_t rows, int64_t stride, int32_t bpp) {
    uint8_t* tmp = static_cast<uint8_t*>(std::malloc(stride * 5));
    for (int64_t y = 0; y < rows; y++) {
        const uint8_t* src = in + y * stride;
        const uint8_t* prev = y > 0 ? in + (y - 1) * stride : nullptr;
        uint64_t best_sum = UINT64_MAX;
        int best = 0;
        for (int f = 0; f < 5; f++) {
            uint8_t* t = tmp + f * stride;
            uint64_t sum = 0;
            for (int64_t x = 0; x < stride; x++) {
                const int raw = src[x];
                const int a = x >= bpp ? src[x - bpp] : 0;
                const int b = prev ? prev[x] : 0;
                const int c = (prev && x >= bpp) ? prev[x - bpp] : 0;
                int v;
                switch (f) {
                    case 0: v = raw; break;
                    case 1: v = raw - a; break;
                    case 2: v = raw - b; break;
                    case 3: v = raw - ((a + b) >> 1); break;
                    default: {
                        const int p = a + b - c;
                        const int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
                        v = raw - ((pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c));
                    }
                }
                const uint8_t u = static_cast<uint8_t>(v);
                t[x] = u;
                sum += u < 128 ? u : 256 - u;  // minimize |signed|
            }
            if (sum < best_sum) {
                best_sum = sum;
                best = f;
            }
        }
        uint8_t* dst = out + y * (stride + 1);
        dst[0] = static_cast<uint8_t>(best);
        std::memcpy(dst + 1, tmp + best * stride, stride);
    }
    std::free(tmp);
}

}  // extern "C"
