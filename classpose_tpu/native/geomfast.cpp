// Native geometry core for the host post-processing hot path.
//
// The WSI pipeline extracts and validates one polygon per detected cell
// (reference PostProcessor, predict_wsi.py:509-656, via shapely/GEOS —
// a C library); at production cell densities the pure-numpy equivalents
// in geometry/polygons.py spend most of their time in per-call numpy
// machinery on ~40-point rings. This file provides the same primitives
// as plain C++ loops behind an extern "C" ABI, loaded with ctypes
// (no Python.h / numpy-API coupling); geometry/polygons.py falls back
// to the numpy implementations when the shared object is unavailable.
//
// Semantics are kept identical to the numpy versions:
//   - ring_simple: proper-intersection test with the 1e-12 orientation
//     epsilon; endpoint touching and collinear overlap do not count;
//     adjacent segments (incl. the 0 <-> n-1 wraparound) are skipped.
//   - ring_metrics: shoelace signed area, area-weighted centroid with
//     the |2A| < 2e-12 vertex-mean fallback, perimeter.
//   - points_in_ring: the same ray-casting parity rule
//     ((yi > y) != (yj > y), x < xcross) as _points_in_ring.
//
// Build: g++ -O2 -shared -fPIC geomfast.cpp -o _geomfast.so
// (done on demand by classpose_tpu/native/__init__.py).

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

inline int orient(double ax, double ay, double bx, double by, double cx,
                  double cy) {
    double v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
    if (v > 1e-12) return 1;
    if (v < -1e-12) return -1;
    return 0;
}

}  // namespace

extern "C" {

// 1 if the ring has no proper self-intersection, 0 otherwise.
// xy: n points, interleaved x0,y0,x1,y1,...
int ring_simple(const double* xy, long n) {
    if (n < 4) return 1;
    for (long i = 0; i < n; ++i) {
        long i2 = (i + 1 == n) ? 0 : i + 1;
        double ax = xy[2 * i], ay = xy[2 * i + 1];
        double bx = xy[2 * i2], by = xy[2 * i2 + 1];
        double lox = ax < bx ? ax : bx, hix = ax < bx ? bx : ax;
        double loy = ay < by ? ay : by, hiy = ay < by ? by : ay;
        for (long j = i + 2; j < n; ++j) {
            if (i == 0 && j == n - 1) continue;  // wraparound adjacency
            long j2 = (j + 1 == n) ? 0 : j + 1;
            double cx = xy[2 * j], cy = xy[2 * j + 1];
            double dx = xy[2 * j2], dy = xy[2 * j2 + 1];
            // bbox reject
            if ((cx < lox && dx < lox) || (cx > hix && dx > hix) ||
                (cy < loy && dy < loy) || (cy > hiy && dy > hiy))
                continue;
            int o1 = orient(ax, ay, bx, by, cx, cy);
            int o2 = orient(ax, ay, bx, by, dx, dy);
            if (o1 == o2 || o1 == 0 || o2 == 0) continue;
            int o3 = orient(cx, cy, dx, dy, ax, ay);
            int o4 = orient(cx, cy, dx, dy, bx, by);
            if (o3 != o4 && o3 != 0 && o4 != 0) return 0;
        }
    }
    return 1;
}

// out[0] = signed area, out[1] = cx, out[2] = cy, out[3] = perimeter
void ring_metrics(const double* xy, long n, double* out) {
    double a2 = 0.0, cx6 = 0.0, cy6 = 0.0, per = 0.0;
    double sx = 0.0, sy = 0.0;
    for (long i = 0; i < n; ++i) {
        long i2 = (i + 1 == n) ? 0 : i + 1;
        double x0 = xy[2 * i], y0 = xy[2 * i + 1];
        double x1 = xy[2 * i2], y1 = xy[2 * i2 + 1];
        double c = x0 * y1 - x1 * y0;
        a2 += c;
        cx6 += (x0 + x1) * c;
        cy6 += (y0 + y1) * c;
        per += std::sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0));
        sx += x0;
        sy += y0;
    }
    out[0] = 0.5 * a2;
    if (std::fabs(a2) < 2e-12) {
        out[1] = sx / (double)n;
        out[2] = sy / (double)n;
    } else {
        out[1] = cx6 / (3.0 * a2);
        out[2] = cy6 / (3.0 * a2);
    }
    out[3] = per;
}

// Batched ring metrics + simplicity over m rings packed into one xy
// buffer (offs: m+1 vertex offsets; ring k is vertices
// offs[k]..offs[k+1]). out is m×5: [signed_area, cx, cy, perimeter,
// simple] — one library call per tile instead of 3 ctypes round trips
// per detected cell (the ctypes marshalling dominated the per-cell
// polygon validity cost at ~900 cells/tile).
void rings_batch(const double* xy, const long* offs, long m,
                 double* out) {
    for (long k = 0; k < m; ++k) {
        const double* r = xy + 2 * offs[k];
        long n = offs[k + 1] - offs[k];
        ring_metrics(r, n, out + 5 * k);
        out[5 * k + 4] = (double)ring_simple(r, n);
    }
}

// Per-instance majority class vote (runner/model.py
// compute_class_masks_from_pixels, itself the reference
// models.py:191-230 bincount vote): counts[inst][cls] over foreground
// pixels, per-instance argmax with first-max (lowest class) tie-break
// exactly like np.argmax, out[px] = major[inst[px]] (0 for background).
// inst: npx int32 in [0, nmax]; cls: npx int8 in [0, n_classes);
// out: npx int32.
void class_vote(const int32_t* inst, const int8_t* cls, long npx,
                long n_classes, int32_t* out) {
    int32_t nmax = 0;
    for (long k = 0; k < npx; ++k)
        if (inst[k] > nmax) nmax = inst[k];
    std::vector<int64_t> counts((int64_t)(nmax + 1) * n_classes, 0);
    for (long k = 0; k < npx; ++k)
        if (inst[k] > 0) ++counts[(int64_t)inst[k] * n_classes + cls[k]];
    std::vector<int32_t> major(nmax + 1, 0);
    for (int64_t i = 1; i <= nmax; ++i) {
        const int64_t* row = counts.data() + i * n_classes;
        int32_t best = 0;
        for (long c = 1; c < n_classes; ++c)
            if (row[c] > row[best]) best = (int32_t)c;
        major[i] = best;
    }
    for (long k = 0; k < npx; ++k) out[k] = major[inst[k]];
}

// Per-instance hole fill + min-size filter + sequential relabel.
// Identical semantics to dynamics/masks.py
// fill_holes_and_remove_small_masks (itself the cellpose
// utils.fill_holes_and_remove_small_masks contract, reference
// models.py:171-174): iterate instance ids ASCENDING; skip ids with
// fewer than max(min_size, 1) pixels; fill 4-connected background
// components of the bbox crop not reachable from the (padded) crop
// border; write the filled region as the next sequential id,
// overwriting anything written earlier (later instances win inside
// overlapping bboxes, as the numpy loop does).
// masks: H*W int32 labels in [0, nmax]; out: H*W int32 (pre-zeroed by
// the caller). Returns the kept-instance count.
long fill_holes_relabel(const int32_t* masks, long H, long W,
                        long min_size, int32_t* out) {
    long npx = H * W;
    int32_t nmax = 0;
    for (long k = 0; k < npx; ++k)
        if (masks[k] > nmax) nmax = masks[k];
    if (nmax <= 0) return 0;
    if (min_size < 1) min_size = 1;

    // one pass: per-id bbox + pixel count
    std::vector<long> y0(nmax + 1, H), y1(nmax + 1, -1);
    std::vector<long> x0(nmax + 1, W), x1(nmax + 1, -1);
    std::vector<long> cnt(nmax + 1, 0);
    for (long y = 0; y < H; ++y) {
        const int32_t* row = masks + y * W;
        for (long x = 0; x < W; ++x) {
            int32_t v = row[x];
            if (v <= 0) continue;
            ++cnt[v];
            if (y < y0[v]) y0[v] = y;
            if (y > y1[v]) y1[v] = y;
            if (x < x0[v]) x0[v] = x;
            if (x > x1[v]) x1[v] = x;
        }
    }

    long max_crop = 0;
    for (int32_t i = 1; i <= nmax; ++i)
        if (cnt[i] >= min_size) {
            long a = (y1[i] - y0[i] + 3) * (x1[i] - x0[i] + 3);
            if (a > max_crop) max_crop = a;
        }
    // crop buffer with a 1-px pad ring: 0 = unvisited background,
    // 1 = instance pixel, 2 = border-reachable background
    std::vector<uint8_t> buf(max_crop > 0 ? max_crop : 1);
    std::vector<long> stack(max_crop > 0 ? max_crop : 1);

    int32_t new_id = 0;
    for (int32_t i = 1; i <= nmax; ++i) {
        if (cnt[i] < min_size) continue;
        ++new_id;
        long by = y0[i], bx = x0[i];
        long bh = y1[i] - by + 1, bw = x1[i] - bx + 1;
        long ph = bh + 2, pw = bw + 2;
        for (long k = 0; k < ph * pw; ++k) buf[k] = 0;
        for (long y = 0; y < bh; ++y) {
            const int32_t* row = masks + (by + y) * W + bx;
            uint8_t* brow = buf.data() + (y + 1) * pw + 1;
            for (long x = 0; x < bw; ++x)
                if (row[x] == i) brow[x] = 1;
        }
        // flood the background from the pad corner, 4-connected
        long sp = 0;
        stack[sp++] = 0;
        buf[0] = 2;
        while (sp) {
            long p = stack[--sp];
            long y = p / pw, x = p % pw;
            if (y > 0 && buf[p - pw] == 0) { buf[p - pw] = 2; stack[sp++] = p - pw; }
            if (y + 1 < ph && buf[p + pw] == 0) { buf[p + pw] = 2; stack[sp++] = p + pw; }
            if (x > 0 && buf[p - 1] == 0) { buf[p - 1] = 2; stack[sp++] = p - 1; }
            if (x + 1 < pw && buf[p + 1] == 0) { buf[p + 1] = 2; stack[sp++] = p + 1; }
        }
        // filled = instance pixels + unreached background (holes)
        for (long y = 0; y < bh; ++y) {
            const uint8_t* brow = buf.data() + (y + 1) * pw + 1;
            int32_t* orow = out + (by + y) * W + bx;
            for (long x = 0; x < bw; ++x)
                if (brow[x] != 2) orow[x] = new_id;
        }
    }
    return new_id;
}

// Ray-cast containment of m points against an n-point ring.
// out[k] = 1 if pts[k] is inside. Matches _points_in_ring's parity rule.
void points_in_ring(const double* ring, long n, const double* pts, long m,
                    uint8_t* out) {
    for (long k = 0; k < m; ++k) out[k] = 0;
    for (long i = 0; i < n; ++i) {
        long i2 = (i + 1 == n) ? 0 : i + 1;
        double xi = ring[2 * i], yi = ring[2 * i + 1];
        double xj = ring[2 * i2], yj = ring[2 * i2 + 1];
        if (yi == yj) continue;  // (yi>y)!=(yj>y) is impossible
        double inv = 1.0 / (yj - yi);
        for (long k = 0; k < m; ++k) {
            double x = pts[2 * k], y = pts[2 * k + 1];
            if ((yi > y) != (yj > y)) {
                double xcross = xi + (y - yi) * inv * (xj - xi);
                if (x < xcross) out[k] ^= 1;
            }
        }
    }
}

}  // extern "C"
