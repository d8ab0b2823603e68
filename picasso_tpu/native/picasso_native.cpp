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
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

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

}  // extern "C" (helpers below need C++ linkage)

// Full SMLM-clusterer core (reference picasso/clusterer.py:114-201):
// fixed-radius neighbor counting + neighborhood-max test on a sorted
// cell grid (cell edge = radius, so neighbors lie in the 3^d adjacent
// cells; cells are found by binary search on sorted cell keys — no
// dense grid, so any FOV/radius ratio works), then the reference's
// sequential label sweep over local maxima in ascending index order.
// Counting passes are OpenMP-parallel; the sweep is inherently
// sequential. z == nullptr selects 2D.
//
// labels (out, n): raw sweep labels (-1 unassigned); the caller
// applies the min_locs cluster-size discard and frame analysis.
// Returns the number of local maxima.
namespace {

// Cell-sorted point store (cell edge = radius): points are
// counting-sorted by flattened cell key and their coordinates COPIED
// into contiguous arrays, so a fixed-radius neighbor scan touches 3
// (2D) / 9 (3D) contiguous row ranges of the sorted coordinates. The
// previous layout scanned through a permutation (`order[]`
// indirection into the original arrays), which missed cache on
// nearly every point and made the counting passes memory-latency
// bound at bench scale.
struct SortedGrid {
    std::vector<float> xs, ys, zs;       // coords in sorted order
    std::vector<int64_t> order;          // sorted idx -> original idx
    std::vector<int64_t> pos;            // original idx -> sorted idx
    std::vector<int64_t> skey;           // sorted cell key per point
    std::vector<int32_t> cxs, cys, czs;  // per-sorted-point cells
    std::vector<int64_t> cell_start;     // dense CSR (ncells+1) or
                                         // empty -> binary search
    int64_t ncx = 1, ncy = 1, ncz = 1;
};

inline void build_sorted_grid(
    const float* x, const float* y, const float* z,
    int64_t n, double cell, SortedGrid& g)
{
    float xmin = x[0], ymin = y[0], zmin = 0.0f;
    for (int64_t i = 1; i < n; ++i) {
        xmin = std::min(xmin, x[i]);
        ymin = std::min(ymin, y[i]);
    }
    if (z) {
        zmin = z[0];
        for (int64_t i = 1; i < n; ++i) zmin = std::min(zmin, z[i]);
    }
    std::vector<int64_t> key(n);
    std::vector<int32_t> cx0(n), cy0(n), cz0;
    if (z) cz0.resize(n);
    int64_t ncx = 1, ncy = 1, ncz = 1;
    for (int64_t i = 0; i < n; ++i) {
        const int32_t cx =
            static_cast<int32_t>((x[i] - xmin) / cell);
        const int32_t cy =
            static_cast<int32_t>((y[i] - ymin) / cell);
        cx0[i] = cx; cy0[i] = cy;
        ncx = std::max<int64_t>(ncx, cx + 1);
        ncy = std::max<int64_t>(ncy, cy + 1);
        if (z) {
            const int32_t cz =
                static_cast<int32_t>((z[i] - zmin) / cell);
            cz0[i] = cz;
            ncz = std::max<int64_t>(ncz, cz + 1);
        }
    }
    for (int64_t i = 0; i < n; ++i) {
        const int64_t cz = z ? cz0[i] : 0;
        key[i] = (cz * ncy + cy0[i]) * ncx + cx0[i];
    }
    g.order.resize(n);
    const int64_t ncells_total = ncx * ncy * ncz;
    const bool dense = ncells_total <= 16 * n + 4096;
    if (dense) {
        // stable counting sort by cell key: O(n + ncells), beats the
        // comparison sort from ~1M points up
        g.cell_start.assign(ncells_total + 1, 0);
        for (int64_t i = 0; i < n; ++i) ++g.cell_start[key[i] + 1];
        for (int64_t c = 0; c < ncells_total; ++c)
            g.cell_start[c + 1] += g.cell_start[c];
        std::vector<int64_t> cursor(
            g.cell_start.begin(), g.cell_start.end() - 1);
        for (int64_t i = 0; i < n; ++i)
            g.order[cursor[key[i]]++] = i;
    } else {
        for (int64_t i = 0; i < n; ++i) g.order[i] = i;
        std::sort(g.order.begin(), g.order.end(),
                  [&key](int64_t a, int64_t b) {
                      return key[a] < key[b];
                  });
    }
    g.ncx = ncx; g.ncy = ncy; g.ncz = ncz;
    g.xs.resize(n); g.ys.resize(n);
    if (z) g.zs.resize(n);
    g.skey.resize(n);
    g.pos.resize(n);
    g.cxs.resize(n); g.cys.resize(n);
    if (z) g.czs.resize(n);
    for (int64_t s = 0; s < n; ++s) {
        const int64_t i = g.order[s];
        g.pos[i] = s;
        g.xs[s] = x[i]; g.ys[s] = y[i];
        if (z) g.zs[s] = z[i];
        g.skey[s] = key[i];
        g.cxs[s] = cx0[i]; g.cys[s] = cy0[i];
        if (z) g.czs[s] = cz0[i];
    }
}

// Visit every point within `radius` of SORTED point si (including
// itself); fn receives SORTED indices. Each (z-layer, y-row) pair is
// one contiguous sorted range found by two binary searches.
template <typename F>
inline void scan_neighbors(
    const SortedGrid& g, bool is3d, double r2, int64_t si, F&& fn)
{
    const int64_t cx = g.cxs[si], cy = g.cys[si];
    const int64_t cz = is3d ? g.czs[si] : 0;
    const int64_t z0 = is3d ? std::max<int64_t>(cz - 1, 0) : 0;
    const int64_t z1 = is3d ? std::min(cz + 1, g.ncz - 1) : 0;
    const int64_t x0 = std::max<int64_t>(cx - 1, 0);
    const int64_t x1 = std::min(cx + 1, g.ncx - 1);
    const int64_t y0 = std::max<int64_t>(cy - 1, 0);
    const int64_t y1 = std::min(cy + 1, g.ncy - 1);
    const float xi = g.xs[si], yi = g.ys[si];
    const float zi = is3d ? g.zs[si] : 0.0f;
    for (int64_t zz = z0; zz <= z1; ++zz) {
        for (int64_t yy = y0; yy <= y1; ++yy) {
            const int64_t klo = (zz * g.ncy + yy) * g.ncx + x0;
            const int64_t khi = (zz * g.ncy + yy) * g.ncx + x1;
            int64_t lo, hi;
            if (!g.cell_start.empty()) {
                lo = g.cell_start[klo];
                hi = g.cell_start[khi + 1];
            } else {
                lo = std::lower_bound(
                    g.skey.begin(), g.skey.end(), klo)
                    - g.skey.begin();
                hi = std::upper_bound(
                    g.skey.begin() + lo, g.skey.end(), khi)
                    - g.skey.begin();
            }
            for (int64_t sj = lo; sj < hi; ++sj) {
                const float dx = xi - g.xs[sj];
                const float dy = yi - g.ys[sj];
                float d2 = dx * dx + dy * dy;
                if (is3d) {
                    const float dz = zi - g.zs[sj];
                    d2 += dz * dz;
                }
                if (d2 <= r2) fn(sj);
            }
        }
    }
}

}  // namespace

extern "C" {

int64_t cluster_smlm(
    const float* x,
    const float* y,
    const float* z,   // nullptr for 2D
    int64_t n,
    double radius,
    int64_t min_locs,
    int32_t* labels)
{
    if (n == 0) return 0;
    const bool is3d = z != nullptr;
    const double r2 = radius * radius;
    SortedGrid g;
    build_sorted_grid(x, y, z, n, radius, g);

    std::vector<int32_t> counts(n, 0), max_nb(n, 0);
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1024)
#endif
    for (int64_t s = 0; s < n; ++s) {
        int32_t c = 0;
        scan_neighbors(g, is3d, r2, s,
                       [&c](int64_t) { ++c; });
        counts[s] = c;
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1024)
#endif
    for (int64_t s = 0; s < n; ++s) {
        int32_t m = 0;
        scan_neighbors(g, is3d, r2, s,
                       [&m, &counts](int64_t sj) {
                           m = std::max(m, counts[sj]);
                       });
        max_nb[s] = m;
    }

    // Sequential label sweep in ASCENDING ORIGINAL index order
    // (reference picasso/clusterer.py:176-187); labels live in
    // sorted space during the sweep and are un-permuted at the end.
    std::vector<int32_t> labels_s(n, -1);
    int32_t k = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t s = g.pos[i];
        if (counts[s] <= min_locs || counts[s] != max_nb[s])
            continue;
        if (labels_s[s] == -1) {
            const int32_t mine = k++;
            scan_neighbors(g, is3d, r2, s,
                           [&labels_s, mine](int64_t sj) {
                               labels_s[sj] = mine;
                           });
            labels_s[s] = mine;
        } else {
            ++k;
            const int32_t label = labels_s[s];
            scan_neighbors(g, is3d, r2, s,
                           [&labels_s, label](int64_t sj) {
                               if (labels_s[sj] == -1)
                                   labels_s[sj] = label;
                           });
        }
    }
    for (int64_t s = 0; s < n; ++s)
        labels[g.order[s]] = labels_s[s];
    return k;
}

// Sequential label sweep of the SMLM clusterer (reference
// picasso/clusterer.py:176-187 semantics): maxima are processed in
// order; an unassigned maximum overwrites its whole neighborhood
// (assigned or not) with its own index, an already-assigned one only
// fills unassigned neighbors. Neighbor lists arrive as CSR.
//
// lm_idx:       (m) int64 — local-maximum indices, sweep order
// starts/stops: (m) int64 — CSR ranges into cols per maximum
// cols:         int64 — concatenated neighbor indices
// labels:       (n) int32 — inout, pre-filled with -1
void cluster_label_sweep(
    const int64_t* lm_idx,
    const int64_t* starts,
    const int64_t* stops,
    const int64_t* cols,
    int64_t m,
    int32_t* labels)
{
    for (int64_t k = 0; k < m; ++k) {
        const int64_t i = lm_idx[k];
        const int32_t label = labels[i];
        if (label == -1) {
            const int32_t mine = static_cast<int32_t>(k);
            for (int64_t p = starts[k]; p < stops[k]; ++p)
                labels[cols[p]] = mine;
            labels[i] = mine;
        } else {
            for (int64_t p = starts[k]; p < stops[k]; ++p) {
                const int64_t j = cols[p];
                if (labels[j] == -1) labels[j] = label;
            }
        }
    }
}

}  // extern "C"
