// Native host-side runtime kernels for HumanoidVision-TPU.
//
// The TPU owns the compute path (JAX/XLA/Pallas); these C++ kernels cover the
// host-side hot spots of the serving runtime, where Python/numpy overhead
// matters on small-core hosts:
//   * letterbox_u8     — aspect-preserving bilinear resize + center pad of
//                        uint8 HWC images (the per-request host cost in front
//                        of every TPU inference; reference analogue:
//                        src/inference/preprocessing.py letterbox path)
//   * greedy_nms       — exact greedy NMS on the host (fallback/oracle path;
//                        the production NMS runs on-device in XLA)
//   * iou_matrix       — pairwise IoU for the host tracker
//
// Built as a plain shared library (no pybind11 — ctypes binds it; see
// hvs_tpu/native/__init__.py). Compile: make -C hvs_tpu/native

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Aspect-preserving bilinear resize of src (h x w x c, uint8) into the center
// of dst (size x size x c), padding with pad_value. Returns the scale used;
// pad offsets are ((size - new_w)/2, (size - new_h)/2) like the Python path.
double letterbox_u8(const uint8_t* src, int h, int w, int c,
                    uint8_t* dst, int size, int pad_value) {
    // double precision so the geometry (nh/nw/pads) matches the Python path
    // bit-for-bit (it computes in float64).
    const double scale = static_cast<double>(size) / static_cast<double>(std::max(h, w));
    const int nh = static_cast<int>(h * scale + 0.5);
    const int nw = static_cast<int>(w * scale + 0.5);
    const int pad_x = (size - nw) / 2;
    const int pad_y = (size - nh) / 2;

    std::memset(dst, pad_value, static_cast<size_t>(size) * size * c);

    const float inv_scale_y = static_cast<float>(h) / nh;
    const float inv_scale_x = static_cast<float>(w) / nw;

    for (int y = 0; y < nh; ++y) {
        // Align sampling with cv2.INTER_LINEAR: sample at (y + 0.5) * inv - 0.5.
        float sy = (y + 0.5f) * inv_scale_y - 0.5f;
        if (sy < 0) sy = 0;
        int y0 = static_cast<int>(sy);
        int y1 = std::min(y0 + 1, h - 1);
        float fy = sy - y0;
        uint8_t* drow = dst + (static_cast<size_t>(y + pad_y) * size + pad_x) * c;
        const uint8_t* srow0 = src + static_cast<size_t>(y0) * w * c;
        const uint8_t* srow1 = src + static_cast<size_t>(y1) * w * c;
        for (int x = 0; x < nw; ++x) {
            float sx = (x + 0.5f) * inv_scale_x - 0.5f;
            if (sx < 0) sx = 0;
            int x0 = static_cast<int>(sx);
            int x1 = std::min(x0 + 1, w - 1);
            float fx = sx - x0;
            const float w00 = (1 - fy) * (1 - fx), w01 = (1 - fy) * fx;
            const float w10 = fy * (1 - fx), w11 = fy * fx;
            for (int k = 0; k < c; ++k) {
                const float v = w00 * srow0[x0 * c + k] + w01 * srow0[x1 * c + k] +
                                w10 * srow1[x0 * c + k] + w11 * srow1[x1 * c + k];
                drow[x * c + k] = static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
    return scale;
}

static inline float iou_xyxy(const float* a, const float* b) {
    const float ix1 = std::max(a[0], b[0]);
    const float iy1 = std::max(a[1], b[1]);
    const float ix2 = std::min(a[2], b[2]);
    const float iy2 = std::min(a[3], b[3]);
    const float iw = std::max(ix2 - ix1, 0.0f);
    const float ih = std::max(iy2 - iy1, 0.0f);
    const float inter = iw * ih;
    const float area_a = std::max(a[2] - a[0], 0.0f) * std::max(a[3] - a[1], 0.0f);
    const float area_b = std::max(b[2] - b[0], 0.0f) * std::max(b[3] - b[1], 0.0f);
    const float uni = area_a + area_b - inter;
    return uni > 0 ? inter / uni : 0.0f;
}

// Exact greedy NMS. boxes: n x 4 xyxy; keep_out must hold max_out ints.
// Returns the number of kept boxes (indices into the input arrays).
int greedy_nms(const float* boxes, const float* scores, const int* classes,
               int n, float iou_threshold, float score_threshold,
               int max_out, int class_aware, int* keep_out) {
    std::vector<int> order(n);
    for (int i = 0; i < n; ++i) order[i] = i;
    std::sort(order.begin(), order.end(),
              [scores](int a, int b) { return scores[a] > scores[b]; });

    std::vector<int> kept;
    kept.reserve(max_out);
    for (int oi = 0; oi < n && static_cast<int>(kept.size()) < max_out; ++oi) {
        const int i = order[oi];
        if (scores[i] < score_threshold) break;  // sorted: all later are lower
        bool suppressed = false;
        for (int j : kept) {
            if (class_aware && classes[i] != classes[j]) continue;
            if (iou_xyxy(boxes + 4 * i, boxes + 4 * j) > iou_threshold) {
                suppressed = true;
                break;
            }
        }
        if (!suppressed) kept.push_back(i);
    }
    std::copy(kept.begin(), kept.end(), keep_out);
    return static_cast<int>(kept.size());
}

// Pairwise IoU: a (n x 4) vs b (m x 4) -> out (n x m).
void iou_matrix(const float* a, int n, const float* b, int m, float* out) {
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < m; ++j)
            out[i * m + j] = iou_xyxy(a + 4 * i, b + 4 * j);
}

}  // extern "C"
