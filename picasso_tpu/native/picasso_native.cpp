// picasso_tpu native runtime kernels.
//
// Host-side hot paths that are either inherently sequential (greedy
// link chaining) or memory-bound staging work feeding the TPU (ROI
// gather from movie buffers). The TPU compute path itself is JAX/XLA;
// these are the native runtime pieces around it, replacing the
// reference's numba-JITed host loops (picasso/postprocess.py:2441
// _get_link_groups, picasso/localize.py:917 _cut_spots_numba).
//
// Exposed with a plain C ABI and loaded via ctypes.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Greedy spatiotemporal chaining of localizations into binding events.
//
// Semantics (matching the reference exactly): locs are sorted by
// frame; process in order; an unassigned loc starts a new chain; a
// chain repeatedly claims the FIRST unassigned loc of the same group
// within d_max (Euclidean) in frames (f+1, f+max_dark_time+1].
//
// frame:      (n) int64, sorted ascending
// x, y:       (n) float32
// group:      (n) int32
// min_idx:    (n) int64 — first index with frame >= frame[i] + 1
//             (precomputed via searchsorted on the host)
// out:        (n) int32 — chain id per loc (written)
// Returns the number of chains.
int64_t link_groups(
    const int64_t* frame,
    const float* x,
    const float* y,
    const int32_t* group,
    const int64_t* min_idx,
    int64_t n,
    double d_max,
    int64_t max_dark_time,
    int32_t* out)
{
    const double d_max_2 = d_max * d_max;
    for (int64_t i = 0; i < n; ++i) out[i] = -1;
    int32_t current = -1;
    for (int64_t i = 0; i < n; ++i) {
        if (out[i] != -1) continue;
        ++current;
        out[i] = current;
        int64_t ci = i;
        for (;;) {
            const int64_t f = frame[ci];
            const double cx = x[ci];
            const double cy = y[ci];
            const int32_t cg = group[ci];
            const int64_t lo = min_idx[ci];
            const int64_t max_frame = f + max_dark_time + 1;
            int64_t nxt = -1;
            for (int64_t j = lo; j < n; ++j) {
                if (frame[j] > max_frame) break;
                if (out[j] != -1 || group[j] != cg) continue;
                const double dx = cx - x[j];
                const double dx2 = dx * dx;
                if (dx2 > d_max_2) continue;
                const double dy = cy - y[j];
                const double dy2 = dy * dy;
                if (dy2 > d_max_2) continue;
                if (dx2 + dy2 <= d_max_2) { nxt = j; break; }
            }
            if (nxt < 0) break;
            out[nxt] = current;
            ci = nxt;
        }
    }
    return current + 1;
}

// Gather (n_spots, box, box) ROIs out of a contiguous movie buffer.
// Identifications must be in-bounds (guaranteed by the identifier's
// border margin). One memcpy per ROI row.
//
// movie: (n_frames, height, width) of element size `itemsize`
// out:   (n_spots, box, box) same dtype
void cut_spots(
    const uint8_t* movie,
    int64_t height,
    int64_t width,
    const int64_t* ids_frame,
    const int64_t* ids_x,
    const int64_t* ids_y,
    int64_t n_spots,
    int64_t box,
    int64_t itemsize,
    uint8_t* out)
{
    const int64_t r = box / 2;
    const int64_t frame_bytes = height * width * itemsize;
    const int64_t row_bytes = width * itemsize;
    const int64_t roi_row_bytes = box * itemsize;
    for (int64_t s = 0; s < n_spots; ++s) {
        const uint8_t* frame = movie + ids_frame[s] * frame_bytes;
        const int64_t y0 = ids_y[s] - r;
        const int64_t x0 = ids_x[s] - r;
        uint8_t* dst = out + s * box * roi_row_bytes;
        const uint8_t* src =
            frame + y0 * row_bytes + x0 * itemsize;
        for (int64_t row = 0; row < box; ++row) {
            std::memcpy(dst, src, roi_row_bytes);
            dst += roi_row_bytes;
            src += row_bytes;
        }
    }
}

// Fused uint16 -> photon-converted float32 ROI gather:
// out = (raw - baseline) * sensitivity / gain, avoiding the
// intermediate integer spot array entirely (one pass over the data).
void cut_spots_to_photons_u16(
    const uint16_t* movie,
    int64_t height,
    int64_t width,
    const int64_t* ids_frame,
    const int64_t* ids_x,
    const int64_t* ids_y,
    int64_t n_spots,
    int64_t box,
    float baseline,
    float sensitivity,
    float gain,
    float* out)
{
    const int64_t r = box / 2;
    const int64_t frame_px = height * width;
    const float scale = sensitivity / gain;
    for (int64_t s = 0; s < n_spots; ++s) {
        const uint16_t* frame = movie + ids_frame[s] * frame_px;
        const int64_t y0 = ids_y[s] - r;
        const int64_t x0 = ids_x[s] - r;
        float* dst = out + s * box * box;
        for (int64_t row = 0; row < box; ++row) {
            const uint16_t* src = frame + (y0 + row) * width + x0;
            for (int64_t col = 0; col < box; ++col) {
                dst[col] =
                    (static_cast<float>(src[col]) - baseline) * scale;
            }
            dst += box;
        }
    }
}

// Next-frame-neighbor distance histogram fill for NeNA — kept as a
// native fallback for very large datasets where the KDTree embedding
// becomes memory-heavy. Assumes locs sorted by frame.
void nfndh(
    const int64_t* frame,
    const float* x,
    const float* y,
    const int32_t* group,
    const int64_t* next_start,  // first idx with frame >= frame[i]+1
    const int64_t* next_end,    // first idx with frame > frame[i]+1
    int64_t n,
    double d_max,
    double bin_size,
    int64_t n_bins,
    int64_t* hist)
{
    const double d_max_2 = d_max * d_max;
    for (int64_t i = 0; i < n; ++i) {
        const double xi = x[i];
        const double yi = y[i];
        const int32_t gi = group[i];
        for (int64_t j = next_start[i]; j < next_end[i]; ++j) {
            if (group[j] != gi) continue;
            const double dx2 = (xi - x[j]) * (xi - x[j]);
            if (dx2 > d_max_2) continue;
            const double dy2 = (yi - y[j]) * (yi - y[j]);
            if (dy2 > d_max_2) continue;
            const double d = std::sqrt(dx2 + dy2);
            if (d <= d_max) {
                const int64_t b =
                    static_cast<int64_t>(d / bin_size);
                if (b < n_bins) ++hist[b];
            }
        }
    }
}

}  // extern "C"
