// yolosharp_native: host-side C++ hot paths.
//
// The reference's runtime work (checkpoint parsing, NMS) runs inside
// LibTorch/torchvision native code; this library is our first-party
// equivalent for the host side of the TPU framework:
//   - LEB128 .bin checkpoint codec (YoloSharp format, Utils/Lib.cs:9-54):
//     single-pass streaming parse/serialize, no per-tensor Python overhead.
//   - Exact greedy NMS (torchvision.ops.nms semantics, Utils/Ops.cs:357)
//     for the CPU predict path and for verifying the on-device NMS.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>
#include <algorithm>
#include <thread>

extern "C" {

// ---------------------------------------------------------------------------
// LEB128 .bin codec
//
// parse_bin: scans the file once and returns a packed index:
//   out_index layout per tensor:
//     name_offset (u64, into out_names blob), dtype (i64), rank (i64),
//     dims[8] (i64, zero padded), data_offset (u64), data_nbytes (u64)
// Returns tensor count, or -1 on error.

struct BinCursor {
    const uint8_t* p;
    const uint8_t* end;
};

static int64_t read_leb128(BinCursor* c) {
    int64_t num = 0;
    int shift = 0;
    while (c->p < c->end) {
        uint8_t b = *c->p++;
        num += (int64_t)(b & 0x7F) << (shift * 7);
        if ((b & 0x80) == 0) return num;
        shift++;
    }
    return -1;
}

static int64_t read_7bit_length(BinCursor* c) {
    int64_t len = 0;
    int shift = 0;
    while (c->p < c->end) {
        uint8_t b = *c->p++;
        len |= (int64_t)(b & 0x7F) << shift;
        if ((b & 0x80) == 0) return len;
        shift += 7;
    }
    return -1;
}

static const int64_t DTYPE_SIZE[16] = {1, 1, 2, 4, 8, 2, 4, 8,
                                       4, 8, 16, 1, 1, 1, 4, 2};

int64_t ys_parse_bin(const uint8_t* data, int64_t nbytes,
                     int64_t* out_index, int64_t index_capacity,
                     char* out_names, int64_t names_capacity) {
    BinCursor c{data, data + nbytes};
    int64_t count = read_leb128(&c);
    if (count < 0) return -1;
    int64_t name_off = 0;
    for (int64_t i = 0; i < count; i++) {
        if (i * 13 + 13 > index_capacity) return -2;
        int64_t nlen = read_7bit_length(&c);
        if (nlen < 0 || c.p + nlen > c.end) return -1;
        if (name_off + nlen + 1 > names_capacity) return -3;
        memcpy(out_names + name_off, c.p, (size_t)nlen);
        out_names[name_off + nlen] = '\0';
        c.p += nlen;

        int64_t dtype = read_leb128(&c);
        int64_t rank = read_leb128(&c);
        if (dtype < 0 || dtype > 15 || rank < 0 || rank > 8) return -1;
        int64_t numel = 1;
        int64_t dims[8] = {0};
        for (int64_t d = 0; d < rank; d++) {
            dims[d] = read_leb128(&c);
            if (dims[d] < 0) return -1;
            numel *= dims[d];
        }
        int64_t bytes = numel * DTYPE_SIZE[dtype];
        if (c.p + bytes > c.end) return -1;

        int64_t* row = out_index + i * 13;
        row[0] = name_off;
        row[1] = dtype;
        row[2] = rank;
        for (int d = 0; d < 8; d++) row[3 + d] = dims[d];
        row[11] = (int64_t)(c.p - data);
        row[12] = bytes;
        name_off += nlen + 1;
        c.p += bytes;
    }
    return count;
}

// ---------------------------------------------------------------------------
// Exact greedy NMS (xyxy boxes, scores already sorted descending by caller
// or not — we sort internally). Returns number of kept indices.

int64_t ys_nms(const float* boxes, const float* scores, int64_t n,
               float iou_thresh, int64_t* keep_out, int64_t max_det) {
    std::vector<int64_t> order(n);
    for (int64_t i = 0; i < n; i++) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        return scores[a] > scores[b];
    });
    std::vector<char> suppressed(n, 0);
    std::vector<float> areas(n);
    for (int64_t i = 0; i < n; i++) {
        const float* b = boxes + i * 4;
        areas[i] = std::max(0.f, b[2] - b[0]) * std::max(0.f, b[3] - b[1]);
    }
    int64_t kept = 0;
    for (int64_t oi = 0; oi < n && kept < max_det; oi++) {
        int64_t i = order[oi];
        if (suppressed[i]) continue;
        keep_out[kept++] = i;
        const float* bi = boxes + i * 4;
        for (int64_t oj = oi + 1; oj < n; oj++) {
            int64_t j = order[oj];
            if (suppressed[j]) continue;
            const float* bj = boxes + j * 4;
            float xx1 = std::max(bi[0], bj[0]);
            float yy1 = std::max(bi[1], bj[1]);
            float xx2 = std::min(bi[2], bj[2]);
            float yy2 = std::min(bi[3], bj[3]);
            float w = std::max(0.f, xx2 - xx1);
            float h = std::max(0.f, yy2 - yy1);
            float inter = w * h;
            float iou = inter / (areas[i] + areas[j] - inter + 1e-7f);
            if (iou > iou_thresh) suppressed[j] = 1;
        }
    }
    return kept;
}

// ---------------------------------------------------------------------------
// Batched uint8 HWC letterbox: nearest-free bilinear resize + pad. Used by
// the loader to move per-sample image prep out of Python.

void ys_letterbox_u8(const uint8_t* src, int64_t sh, int64_t sw,
                     uint8_t* dst, int64_t dh, int64_t dw,
                     int64_t new_h, int64_t new_w,
                     int64_t pad_top, int64_t pad_left, uint8_t fill) {
    memset(dst, fill, (size_t)(dh * dw * 3));
    const double ry = (double)sh / new_h;
    const double rx = (double)sw / new_w;
    for (int64_t y = 0; y < new_h; y++) {
        double fy = (y + 0.5) * ry - 0.5;
        int64_t y0 = (int64_t)fy;
        if (fy < 0) { fy = 0; y0 = 0; }
        int64_t y1 = std::min(y0 + 1, sh - 1);
        double wy = fy - y0;
        uint8_t* out_row = dst + ((y + pad_top) * dw + pad_left) * 3;
        const uint8_t* r0 = src + y0 * sw * 3;
        const uint8_t* r1 = src + y1 * sw * 3;
        for (int64_t x = 0; x < new_w; x++) {
            double fx = (x + 0.5) * rx - 0.5;
            int64_t x0 = (int64_t)fx;
            if (fx < 0) { fx = 0; x0 = 0; }
            int64_t x1 = std::min(x0 + 1, sw - 1);
            double wx = fx - x0;
            for (int ch = 0; ch < 3; ch++) {
                double v = (1 - wy) * ((1 - wx) * r0[x0 * 3 + ch]
                                       + wx * r0[x1 * 3 + ch])
                           + wy * ((1 - wx) * r1[x0 * 3 + ch]
                                   + wx * r1[x1 * 3 + ch]);
                out_row[x * 3 + ch] = (uint8_t)(v + 0.5);
            }
        }
    }
}

// ---------------------------------------------------------------------------
// 2x2 space-to-depth pack of a uint8 HWC image batch:
// (B, H, W, 3) -> (B, H/2, W/2, 12), channel = (py*2+px)*3 + c
// (matches nn/common.py space_to_depth2). Feeds the packed-input predict
// path: the stem's stride-2 conv then runs as an exact stride-1 repacked
// conv with no in-graph transpose. Memory-bound; threaded over rows.

static void s2d_pack_rows(const uint8_t* src, uint8_t* dst,
                          int64_t h2, int64_t w2, int64_t w,
                          int64_t r0, int64_t r1) {
    for (int64_t y = r0; y < r1; y++) {
        const uint8_t* row0 = src + (2 * y) * w * 3;
        const uint8_t* row1 = row0 + w * 3;
        uint8_t* out = dst + y * w2 * 12;
        for (int64_t x = 0; x < w2; x++) {
            memcpy(out, row0 + 2 * x * 3, 6);       // (0,0) c0..2 (0,1) c0..2
            memcpy(out + 6, row1 + 2 * x * 3, 6);   // (1,0) c0..2 (1,1) c0..2
            out += 12;
        }
    }
}

void ys_s2d_pack_u8(const uint8_t* src, uint8_t* dst,
                    int64_t b, int64_t h, int64_t w, int64_t n_threads) {
    const int64_t h2 = h / 2, w2 = w / 2;
    const int64_t rows = b * h2;
    int64_t nt = n_threads > 0 ? n_threads
                               : (int64_t)std::thread::hardware_concurrency();
    nt = std::max<int64_t>(1, std::min(nt, rows));
    // view the batch as one (B*H2) row range: image i's packed row y reads
    // source rows 2y, 2y+1 of image i — contiguous in the batched layout
    auto work = [&](int64_t t) {
        int64_t r0 = rows * t / nt, r1 = rows * (t + 1) / nt;
        for (int64_t r = r0; r < r1; r++) {
            int64_t i = r / h2, y = r % h2;
            s2d_pack_rows(src + i * h * w * 3, dst + i * h2 * w2 * 12,
                          h2, w2, w, y, y + 1);
        }
    };
    if (nt == 1) { work(0); return; }
    std::vector<std::thread> ts;
    for (int64_t t = 0; t < nt; t++) ts.emplace_back(work, t);
    for (auto& th : ts) th.join();
}

}  // extern "C"
