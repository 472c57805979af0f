// JPEG host entropy stage.
//
// TPU-native split of the JPEG codec (SURVEY.md §7 step 3): the serial
// Huffman/arithmetic entropy coding runs here on the host via libjpeg-turbo,
// exchanging *quantized DCT coefficients* with the device. Everything dense
// (dequant, IDCT, chroma upsampling, YCbCr->BGR, and the encode-side fDCT,
// quantization, downsampling) runs on the TPU as batched matmul/elementwise
// kernels (lilliput_tpu/ops/jpeg_kernels.py).
//
// This replaces the reference's use of OpenCV's imgcodecs JPEG wrapper
// (/root/reference/opencv.cpp:93-188) where libjpeg performs the full
// decode on CPU; here the CPU only touches the bitstream.
//
// Plain C ABI (ctypes-friendly), no globals, safe for concurrent calls from
// multiple Python threads (each call owns its libjpeg structs).

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>
#include <jerror.h>

extern "C" {

// ---------------------------------------------------------------------------
// error handling: convert libjpeg longjmp-style errors into return codes
// ---------------------------------------------------------------------------

struct lp_error_mgr {
    jpeg_error_mgr pub;
    jmp_buf jump;
    char msg[JMSG_LENGTH_MAX];
};

static void lp_error_exit(j_common_ptr cinfo) {
    lp_error_mgr* err = reinterpret_cast<lp_error_mgr*>(cinfo->err);
    (*cinfo->err->format_message)(cinfo, err->msg);
    longjmp(err->jump, 1);
}

static void lp_emit_message(j_common_ptr, int) {}  // silence warnings

// ---------------------------------------------------------------------------
// info struct shared with Python (keep in sync with codecs/jpeg.py)
// ---------------------------------------------------------------------------

#define LP_JPEG_MAX_COMPONENTS 4

struct lp_jpeg_info {
    int32_t width;
    int32_t height;
    int32_t num_components;
    int32_t progressive;
    int32_t icc_length;          // 0 when absent
    int32_t comp_h_samp[LP_JPEG_MAX_COMPONENTS];
    int32_t comp_v_samp[LP_JPEG_MAX_COMPONENTS];
    int32_t comp_quant_tbl[LP_JPEG_MAX_COMPONENTS];
    int32_t comp_blocks_w[LP_JPEG_MAX_COMPONENTS];  // width_in_blocks
    int32_t comp_blocks_h[LP_JPEG_MAX_COMPONENTS];  // height_in_blocks
    int32_t comp_downsampled_w[LP_JPEG_MAX_COMPONENTS];
    int32_t comp_downsampled_h[LP_JPEG_MAX_COMPONENTS];
    int32_t jpeg_color_space;    // JCS_* of the compressed data
    int32_t restart_interval;
};

// Parse header only. Returns 0 on success, negative on failure.
int lp_jpeg_get_info(const uint8_t* buf, size_t len, lp_jpeg_info* out) {
    jpeg_decompress_struct cinfo;
    lp_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = lp_error_exit;
    jerr.pub.emit_message = lp_emit_message;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
    jpeg_save_markers(&cinfo, JPEG_APP0 + 2, 0xFFFF);  // ICC
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    // jpeg_read_header does not fill comp block geometry; calc it.
    jpeg_calc_output_dimensions(&cinfo);

    std::memset(out, 0, sizeof(*out));
    out->width = static_cast<int32_t>(cinfo.image_width);
    out->height = static_cast<int32_t>(cinfo.image_height);
    out->num_components = cinfo.num_components;
    out->progressive = cinfo.progressive_mode ? 1 : 0;
    out->jpeg_color_space = cinfo.jpeg_color_space;
    out->restart_interval = static_cast<int32_t>(cinfo.restart_interval);
    if (cinfo.num_components > LP_JPEG_MAX_COMPONENTS) {
        jpeg_destroy_decompress(&cinfo);
        return -3;
    }
    int max_h = 1, max_v = 1;
    for (int c = 0; c < cinfo.num_components; c++) {
        if (cinfo.comp_info[c].h_samp_factor > max_h) max_h = cinfo.comp_info[c].h_samp_factor;
        if (cinfo.comp_info[c].v_samp_factor > max_v) max_v = cinfo.comp_info[c].v_samp_factor;
    }
    for (int c = 0; c < cinfo.num_components; c++) {
        jpeg_component_info* ci = &cinfo.comp_info[c];
        out->comp_h_samp[c] = ci->h_samp_factor;
        out->comp_v_samp[c] = ci->v_samp_factor;
        out->comp_quant_tbl[c] = ci->quant_tbl_no;
        // geometry as the coefficient arrays will be laid out
        long cw = (static_cast<long>(cinfo.image_width) * ci->h_samp_factor + (8L * max_h) - 1) / (8L * max_h);
        long ch = (static_cast<long>(cinfo.image_height) * ci->v_samp_factor + (8L * max_v) - 1) / (8L * max_v);
        out->comp_blocks_w[c] = static_cast<int32_t>(cw);
        out->comp_blocks_h[c] = static_cast<int32_t>(ch);
        out->comp_downsampled_w[c] =
            static_cast<int32_t>((static_cast<long>(cinfo.image_width) * ci->h_samp_factor + max_h - 1) / max_h);
        out->comp_downsampled_h[c] =
            static_cast<int32_t>((static_cast<long>(cinfo.image_height) * ci->v_samp_factor + max_v - 1) / max_v);
    }
    // ICC length (concatenated APP2 payload)
    JOCTET* icc_data = nullptr;
    unsigned int icc_len = 0;
    if (jpeg_read_icc_profile(&cinfo, &icc_data, &icc_len)) {
        out->icc_length = static_cast<int32_t>(icc_len);
        free(icc_data);
    }
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Decode quantized DCT coefficients.
//   coefs:   array of per-component pointers (int16, blocks_h*blocks_w*64 each)
//   qtables: uint16[NUM_QUANT_TBLS*64] = 4*64, natural (row-major) order
//   icc:     optional output buffer for ICC payload (icc_cap bytes)
// Returns 0 on success.
int lp_jpeg_decode_coefs(const uint8_t* buf, size_t len,
                         int16_t** coefs, uint16_t* qtables,
                         uint8_t* icc, int32_t icc_cap) {
    jpeg_decompress_struct cinfo;
    lp_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = lp_error_exit;
    jerr.pub.emit_message = lp_emit_message;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
    jpeg_save_markers(&cinfo, JPEG_APP0 + 2, 0xFFFF);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    jvirt_barray_ptr* barrays = jpeg_read_coefficients(&cinfo);
    if (!barrays) {
        jpeg_destroy_decompress(&cinfo);
        return -3;
    }
    for (int c = 0; c < cinfo.num_components && c < LP_JPEG_MAX_COMPONENTS; c++) {
        jpeg_component_info* ci = &cinfo.comp_info[c];
        const JDIMENSION bw = ci->width_in_blocks;
        const JDIMENSION bh = ci->height_in_blocks;
        int16_t* dst = coefs[c];
        for (JDIMENSION row = 0; row < bh; row++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                reinterpret_cast<j_common_ptr>(&cinfo), barrays[c], row, 1, FALSE);
            std::memcpy(dst + static_cast<size_t>(row) * bw * DCTSIZE2,
                        rows[0], sizeof(JCOEF) * bw * DCTSIZE2);
        }
    }
    // quant tables (zigzag stored in natural order inside libjpeg already)
    for (int t = 0; t < NUM_QUANT_TBLS; t++) {
        if (cinfo.quant_tbl_ptrs[t]) {
            for (int i = 0; i < DCTSIZE2; i++)
                qtables[t * DCTSIZE2 + i] = cinfo.quant_tbl_ptrs[t]->quantval[i];
        } else {
            std::memset(qtables + t * DCTSIZE2, 0, sizeof(uint16_t) * DCTSIZE2);
        }
    }
    if (icc && icc_cap > 0) {
        JOCTET* icc_data = nullptr;
        unsigned int icc_len = 0;
        if (jpeg_read_icc_profile(&cinfo, &icc_data, &icc_len)) {
            if (static_cast<int32_t>(icc_len) <= icc_cap)
                std::memcpy(icc, icc_data, icc_len);
            free(icc_data);
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Entropy-encode quantized coefficients produced on device.
//   ncomp 1 (gray) or 3 (YCbCr). h_samp/v_samp per component.
//   coefs per component: int16[blocks_h*blocks_w*64] (natural order)
//   qtable_luma / qtable_chroma: uint16[64] natural order
//   progressive: emit progressive scan script
//   icc: optional ICC profile to embed
// Returns number of bytes written into out, or negative error.
long lp_jpeg_encode_coefs(int32_t width, int32_t height, int32_t ncomp,
                          const int32_t* h_samp, const int32_t* v_samp,
                          int16_t** coefs,
                          const uint16_t* qtable_luma, const uint16_t* qtable_chroma,
                          int32_t progressive, int32_t optimize,
                          const uint8_t* icc, int32_t icc_len,
                          uint8_t* out, size_t out_cap) {
    jpeg_compress_struct cinfo;
    lp_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = lp_error_exit;
    jerr.pub.emit_message = lp_emit_message;

    unsigned char* mem_out = nullptr;
    unsigned long mem_size = 0;

    if (setjmp(jerr.jump)) {
        jpeg_destroy_compress(&cinfo);
        if (mem_out) free(mem_out);
        return -1;
    }
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &mem_out, &mem_size);

    cinfo.image_width = static_cast<JDIMENSION>(width);
    cinfo.image_height = static_cast<JDIMENSION>(height);
    cinfo.input_components = ncomp;
    cinfo.in_color_space = ncomp == 1 ? JCS_GRAYSCALE : JCS_YCbCr;
    jpeg_set_defaults(&cinfo);
    jpeg_set_colorspace(&cinfo, ncomp == 1 ? JCS_GRAYSCALE : JCS_YCbCr);

    // install the exact tables the device quantized with
    unsigned int ql[DCTSIZE2], qc[DCTSIZE2];
    for (int i = 0; i < DCTSIZE2; i++) {
        ql[i] = qtable_luma[i];
        qc[i] = ncomp > 1 ? qtable_chroma[i] : 0;
    }
    jpeg_add_quant_table(&cinfo, 0, ql, 100, FALSE);
    if (ncomp > 1) jpeg_add_quant_table(&cinfo, 1, qc, 100, FALSE);
    for (int c = 0; c < ncomp; c++) {
        cinfo.comp_info[c].h_samp_factor = h_samp[c];
        cinfo.comp_info[c].v_samp_factor = v_samp[c];
        cinfo.comp_info[c].quant_tbl_no = c == 0 ? 0 : 1;
    }
    if (progressive) jpeg_simple_progression(&cinfo);
    if (optimize) cinfo.optimize_coding = TRUE;

    // build virtual coefficient arrays and fill from device output
    jvirt_barray_ptr barrays[LP_JPEG_MAX_COMPONENTS];
    int max_h = 1, max_v = 1;
    for (int c = 0; c < ncomp; c++) {
        if (h_samp[c] > max_h) max_h = h_samp[c];
        if (v_samp[c] > max_v) max_v = v_samp[c];
    }
    for (int c = 0; c < ncomp; c++) {
        long bw = (static_cast<long>(width) * h_samp[c] + 8L * max_h - 1) / (8L * max_h);
        long bh = (static_cast<long>(height) * v_samp[c] + 8L * max_v - 1) / (8L * max_v);
        // round rows up to v_samp (MCU alignment) as libjpeg requires
        JDIMENSION arr_rows = static_cast<JDIMENSION>((bh + v_samp[c] - 1) / v_samp[c] * v_samp[c]);
        JDIMENSION arr_cols = static_cast<JDIMENSION>((bw + h_samp[c] - 1) / h_samp[c] * h_samp[c]);
        barrays[c] = (*cinfo.mem->request_virt_barray)(
            reinterpret_cast<j_common_ptr>(&cinfo), JPOOL_IMAGE, FALSE,
            arr_cols, arr_rows, static_cast<JDIMENSION>(v_samp[c]));
    }
    (*cinfo.mem->realize_virt_arrays)(reinterpret_cast<j_common_ptr>(&cinfo));
    for (int c = 0; c < ncomp; c++) {
        long bw = (static_cast<long>(width) * h_samp[c] + 8L * max_h - 1) / (8L * max_h);
        long bh = (static_cast<long>(height) * v_samp[c] + 8L * max_v - 1) / (8L * max_v);
        JDIMENSION arr_rows = static_cast<JDIMENSION>((bh + v_samp[c] - 1) / v_samp[c] * v_samp[c]);
        JDIMENSION arr_cols = static_cast<JDIMENSION>((bw + h_samp[c] - 1) / h_samp[c] * h_samp[c]);
        for (JDIMENSION row = 0; row < arr_rows; row++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                reinterpret_cast<j_common_ptr>(&cinfo), barrays[c], row, 1, TRUE);
            std::memset(rows[0], 0, sizeof(JBLOCK) * arr_cols);
            if (row < static_cast<JDIMENSION>(bh)) {
                std::memcpy(rows[0], coefs[c] + static_cast<size_t>(row) * bw * DCTSIZE2,
                            sizeof(JCOEF) * bw * DCTSIZE2);
            }
        }
    }

    jpeg_write_coefficients(&cinfo, barrays);
    if (icc && icc_len > 0)
        jpeg_write_icc_profile(&cinfo, icc, static_cast<unsigned int>(icc_len));
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);

    long written = static_cast<long>(mem_size);
    if (static_cast<size_t>(written) > out_cap) {
        free(mem_out);
        return -2;
    }
    std::memcpy(out, mem_out, mem_size);
    free(mem_out);
    return written;
}

// Scale a base quant table by libjpeg quality semantics (quality 1..100).
void lp_jpeg_scale_qtable(const uint16_t* base, int32_t quality, int32_t force_baseline,
                          uint16_t* out) {
    long scale = jpeg_quality_scaling(quality);
    for (int i = 0; i < DCTSIZE2; i++) {
        long v = (static_cast<long>(base[i]) * scale + 50L) / 100L;
        if (v <= 0) v = 1;
        if (v > 32767) v = 32767;
        if (force_baseline && v > 255) v = 255;
        out[i] = static_cast<uint16_t>(v);
    }
}

}  // extern "C"
