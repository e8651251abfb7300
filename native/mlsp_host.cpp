// mlsp_host: native host-side point-cloud preprocessing.
//
// TPU-native framework's counterpart to the reference's native
// dependencies on the *host* side of the pipeline (pointnet2_ops FPS,
// PCL kd-tree radius search, PCL NormalEstimation): used by the data
// layer for offline dataset standardisation and by the test suite as an
// independent oracle for the device kernels. Compute-path equivalents
// live on-device (mlsp_tpu/ops); this library exists so host
// preprocessing of large raw datasets doesn't round-trip the chip.
//
// C ABI, loaded via ctypes (no pybind11 in the image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// Center at centroid, scale max norm to 1. In place. [n, 3]
void mlsp_scale_to_unit_cube(float* pts, int64_t n) {
    double c[3] = {0, 0, 0};
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) c[d] += pts[3 * i + d];
    for (int d = 0; d < 3; ++d) c[d] /= (double)n;
    double maxn = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double s = 0.0;
        for (int d = 0; d < 3; ++d) {
            double v = pts[3 * i + d] - c[d];
            s += v * v;
        }
        maxn = std::max(maxn, s);
    }
    const double inv = 1.0 / std::max(std::sqrt(maxn), 1e-12);
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d)
            pts[3 * i + d] = (float)((pts[3 * i + d] - c[d]) * inv);
}

// Greedy farthest-point sampling. pts [n,3], out_idx [npoint].
void mlsp_fps(const float* pts, int64_t n, int64_t npoint, int64_t start,
              int64_t* out_idx) {
    std::vector<float> mind(n, std::numeric_limits<float>::infinity());
    int64_t far = start;
    for (int64_t s = 0; s < npoint; ++s) {
        out_idx[s] = far;
        const float fx = pts[3 * far], fy = pts[3 * far + 1], fz = pts[3 * far + 2];
        float best = -1.0f;
        int64_t arg = 0;
        for (int64_t i = 0; i < n; ++i) {
            const float dx = pts[3 * i] - fx, dy = pts[3 * i + 1] - fy,
                        dz = pts[3 * i + 2] - fz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < mind[i]) mind[i] = d;
            if (mind[i] > best) { best = mind[i]; arg = i; }
        }
        far = arg;
    }
}

// Neighbour count within radius per point (PCL-quirk compatible:
// results capped at `cap`, index-0 hit excluded). pts [n,3] -> out [n].
void mlsp_radius_count(const float* pts, int64_t n, float radius, int64_t cap,
                       float* out) {
    const float r2 = radius * radius;
    // Uniform grid binning: cell = radius, neighbours within 27 cells.
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int64_t i = 0; i < n; ++i)
        for (int d = 0; d < 3; ++d) {
            lo[d] = std::min(lo[d], pts[3 * i + d]);
            hi[d] = std::max(hi[d], pts[3 * i + d]);
        }
    const float cell = std::max(radius, 1e-6f);
    int gx = std::max(1, (int)((hi[0] - lo[0]) / cell) + 1);
    int gy = std::max(1, (int)((hi[1] - lo[1]) / cell) + 1);
    int gz = std::max(1, (int)((hi[2] - lo[2]) / cell) + 1);
    // Cap grid size for pathological inputs.
    if ((int64_t)gx * gy * gz > 4 * n + 64) { gx = gy = gz = 1; }
    const int64_t ncell = (int64_t)gx * gy * gz;
    std::vector<int32_t> cell_of(n), count(ncell + 1, 0);
    auto cell_id = [&](const float* p) {
        int cx = std::min(gx - 1, std::max(0, (int)((p[0] - lo[0]) / cell)));
        int cy = std::min(gy - 1, std::max(0, (int)((p[1] - lo[1]) / cell)));
        int cz = std::min(gz - 1, std::max(0, (int)((p[2] - lo[2]) / cell)));
        return (int64_t)(cx * gy + cy) * gz + cz;
    };
    for (int64_t i = 0; i < n; ++i) {
        cell_of[i] = (int32_t)cell_id(&pts[3 * i]);
        count[cell_of[i] + 1]++;
    }
    for (int64_t cid = 0; cid < ncell; ++cid) count[cid + 1] += count[cid];
    std::vector<int32_t> order(n);
    {
        std::vector<int32_t> cur(count.begin(), count.end() - 1);
        for (int64_t i = 0; i < n; ++i) order[cur[cell_of[i]]++] = (int32_t)i;
    }
    for (int64_t i = 0; i < n; ++i) {
        const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
        int cx = std::min(gx - 1, std::max(0, (int)((px - lo[0]) / cell)));
        int cy = std::min(gy - 1, std::max(0, (int)((py - lo[1]) / cell)));
        int cz = std::min(gz - 1, std::max(0, (int)((pz - lo[2]) / cell)));
        // PCL/FLANN semantics: the `cap` NEAREST in-radius neighbours are
        // returned; the caller then discards index 0. Point 0 is only
        // discarded when it makes the top-`cap` cut, so rank it by
        // counting in-radius points strictly closer than it.
        const float z0x = pts[0] - px, z0y = pts[1] - py, z0z = pts[2] - pz;
        const float d0 = z0x * z0x + z0y * z0y + z0z * z0z;
        int64_t total = 0, closer = 0;
        bool zero_hit = false;
        for (int ax = std::max(0, cx - 1); ax <= std::min(gx - 1, cx + 1); ++ax)
            for (int ay = std::max(0, cy - 1); ay <= std::min(gy - 1, cy + 1); ++ay)
                for (int az = std::max(0, cz - 1); az <= std::min(gz - 1, cz + 1); ++az) {
                    const int64_t cid = (int64_t)(ax * gy + ay) * gz + az;
                    for (int32_t s = count[cid]; s < count[cid + 1]; ++s) {
                        const int32_t j = order[s];
                        const float dx = pts[3 * j] - px, dy = pts[3 * j + 1] - py,
                                    dz = pts[3 * j + 2] - pz;
                        const float dsq = dx * dx + dy * dy + dz * dz;
                        if (dsq <= r2) {
                            ++total;
                            if (dsq < d0) ++closer;
                            if (j == 0) zero_hit = true;
                        }
                    }
                }
        const bool zero_returned = zero_hit && closer < (int64_t)cap;
        float cnt = (float)std::min(total, (int64_t)cap) - (zero_returned ? 1.0f : 0.0f);
        out[i] = std::max(cnt, 0.0f);
    }
}

// kNN-PCA surface normals (self included in the k neighbourhood),
// flipped toward the origin viewpoint. pts [n,3] -> out [n,3].
void mlsp_estimate_normals(const float* pts, int64_t n, int64_t k, float* out) {
    if (k > n) k = n;
    std::vector<std::pair<float, int64_t>> heap(k);
    std::vector<float> d(n);
    for (int64_t i = 0; i < n; ++i) {
        const float px = pts[3 * i], py = pts[3 * i + 1], pz = pts[3 * i + 2];
        // partial selection of k smallest distances
        for (int64_t j = 0; j < n; ++j) {
            const float dx = pts[3 * j] - px, dy = pts[3 * j + 1] - py,
                        dz = pts[3 * j + 2] - pz;
            d[j] = dx * dx + dy * dy + dz * dz;
        }
        std::vector<int64_t> idx(n);
        for (int64_t j = 0; j < n; ++j) idx[j] = j;
        std::nth_element(idx.begin(), idx.begin() + k - 1, idx.end(),
                         [&](int64_t a, int64_t b) { return d[a] < d[b]; });
        // covariance of the k nearest
        double m[3] = {0, 0, 0};
        for (int64_t s = 0; s < k; ++s)
            for (int dd = 0; dd < 3; ++dd) m[dd] += pts[3 * idx[s] + dd];
        for (int dd = 0; dd < 3; ++dd) m[dd] /= (double)k;
        double c00 = 0, c01 = 0, c02 = 0, c11 = 0, c12 = 0, c22 = 0;
        for (int64_t s = 0; s < k; ++s) {
            const double x0 = pts[3 * idx[s]] - m[0];
            const double x1 = pts[3 * idx[s] + 1] - m[1];
            const double x2 = pts[3 * idx[s] + 2] - m[2];
            c00 += x0 * x0; c01 += x0 * x1; c02 += x0 * x2;
            c11 += x1 * x1; c12 += x1 * x2; c22 += x2 * x2;
        }
        // smallest eigenvector via trigonometric eigenvalues + cross rows
        const double q = (c00 + c11 + c22) / 3.0;
        const double p1 = c01 * c01 + c02 * c02 + c12 * c12;
        const double p2 = (c00 - q) * (c00 - q) + (c11 - q) * (c11 - q) +
                          (c22 - q) * (c22 - q) + 2.0 * p1;
        double nx = 0, ny = 0, nz = 1;
        if (p2 > 1e-18) {
            const double p = std::sqrt(p2 / 6.0);
            const double b00 = (c00 - q) / p, b11 = (c11 - q) / p,
                         b22 = (c22 - q) / p;
            const double b01 = c01 / p, b02 = c02 / p, b12 = c12 / p;
            double detB = b00 * (b11 * b22 - b12 * b12) -
                          b01 * (b01 * b22 - b12 * b02) +
                          b02 * (b01 * b12 - b11 * b02);
            double r = std::min(1.0, std::max(-1.0, detB / 2.0));
            const double phi = std::acos(r) / 3.0;
            const double lam = q + 2.0 * p * std::cos(phi + 2.0 * M_PI / 3.0);
            const double r0[3] = {c00 - lam, c01, c02};
            const double r1[3] = {c01, c11 - lam, c12};
            const double r2v[3] = {c02, c12, c22 - lam};
            double cand[3][3] = {
                {r0[1] * r1[2] - r0[2] * r1[1], r0[2] * r1[0] - r0[0] * r1[2],
                 r0[0] * r1[1] - r0[1] * r1[0]},
                {r0[1] * r2v[2] - r0[2] * r2v[1], r0[2] * r2v[0] - r0[0] * r2v[2],
                 r0[0] * r2v[1] - r0[1] * r2v[0]},
                {r1[1] * r2v[2] - r1[2] * r2v[1], r1[2] * r2v[0] - r1[0] * r2v[2],
                 r1[0] * r2v[1] - r1[1] * r2v[0]}};
            int best = 0;
            double bestn = -1;
            for (int t = 0; t < 3; ++t) {
                const double nn = cand[t][0] * cand[t][0] +
                                  cand[t][1] * cand[t][1] +
                                  cand[t][2] * cand[t][2];
                if (nn > bestn) { bestn = nn; best = t; }
            }
            if (bestn > 1e-24) {
                const double inv = 1.0 / std::sqrt(bestn);
                nx = cand[best][0] * inv;
                ny = cand[best][1] * inv;
                nz = cand[best][2] * inv;
            }
        }
        // flip toward origin viewpoint (PCL default)
        if (nx * px + ny * py + nz * pz > 0) { nx = -nx; ny = -ny; nz = -nz; }
        out[3 * i] = (float)nx;
        out[3 * i + 1] = (float)ny;
        out[3 * i + 2] = (float)nz;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Threaded .npy point-cloud ingest (the native data-loader).
//
// The reference's data loading runtime is a torch DataLoader with 4
// worker processes re-doing per-sample numpy work every epoch
// (PointDA/data/dataloader.py:79-95 via PointDA/trainer.py:228-236).
// Here raw-file ingest is a one-time pass: a thread pool parses npy
// headers, decodes f4/f8 payloads, takes xyz, unit-cube normalises and
// applies the dataset alignment rotation, and repeat-pads each cloud to
// the caller's bucket size. FPS down to num_points stays on device
// (mlsp_tpu/ops/fps.py) — the host never re-implements the compute path.
// ---------------------------------------------------------------------------

namespace {

// Minimal strict npy parser: v1/v2/v3 header, little-endian f4/f8,
// C-order, 2-D [P, D>=3]. Returns 0 on success.
int parse_npy_header(FILE* f, int64_t* rows, int64_t* cols, int* itemsize) {
    unsigned char magic[8];
    if (fread(magic, 1, 8, f) != 8) return -1;
    if (memcmp(magic, "\x93NUMPY", 6) != 0) return -2;
    const int major = magic[6];
    uint32_t hlen = 0;
    if (major == 1) {
        unsigned char b[2];
        if (fread(b, 1, 2, f) != 2) return -3;
        hlen = b[0] | (b[1] << 8);
    } else {
        unsigned char b[4];
        if (fread(b, 1, 4, f) != 4) return -3;
        hlen = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
        if (hlen > (1u << 20)) return -3;
    }
    std::string h(hlen, '\0');
    if (fread(&h[0], 1, hlen, f) != hlen) return -4;
    if (h.find("'fortran_order': False") == std::string::npos) return -5;
    size_t dp = h.find("'descr':");
    if (dp == std::string::npos) return -6;
    if (h.find("<f4", dp) != std::string::npos ||
        h.find("|f4", dp) != std::string::npos)
        *itemsize = 4;
    else if (h.find("<f8", dp) != std::string::npos)
        *itemsize = 8;
    else
        return -6;
    size_t sp = h.find("'shape':");
    if (sp == std::string::npos) return -7;
    sp = h.find('(', sp);
    if (sp == std::string::npos) return -7;
    long long r = -1, c = -1;
    if (sscanf(h.c_str() + sp, "(%lld, %lld", &r, &c) != 2) return -7;
    if (r <= 0 || c < 3) return -8;
    *rows = r;
    *cols = c;
    return 0;
}

// Row-vector convention `x @ M`, matrices as in
// mlsp_tpu/data/pipeline.py::_rot (the reference's rotate_shape,
// utils/pc_utils.py).
void rotate_inplace(float* p, int64_t n, int axis, float angle) {
    const float c = std::cos(angle), s = std::sin(angle);
    for (int64_t i = 0; i < n; ++i) {
        float* q = p + 3 * i;
        float a, b;
        switch (axis) {
            case 0: a = q[1]; b = q[2]; q[1] = a * c + b * s; q[2] = -a * s + b * c; break;
            case 1: a = q[0]; b = q[2]; q[0] = a * c - b * s; q[2] = a * s + b * c; break;
            default: a = q[0]; b = q[1]; q[0] = a * c + b * s; q[1] = -a * s + b * c; break;
        }
    }
}

// Load one npy cloud: xyz as f32, unit-cube, optional rotation,
// repeat-pad/tile to pad_points rows. Returns 0 on success.
int load_one(const char* path, int64_t pad_points, int unit_cube, int rot_axis,
             float angle, int rotate_this, float* out, int64_t* npoints) {
    FILE* f = fopen(path, "rb");
    if (!f) return -10;
    int64_t rows = 0, cols = 0;
    int itemsize = 0;
    int rc = parse_npy_header(f, &rows, &cols, &itemsize);
    if (rc != 0) { fclose(f); return rc; }
    if (rows > pad_points) { fclose(f); return -9; }  // caller bucketing bug
    std::vector<unsigned char> raw((size_t)rows * cols * itemsize);
    if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
        fclose(f);
        return -11;
    }
    fclose(f);
    // xyz columns -> f32 rows at the head of `out`
    for (int64_t i = 0; i < rows; ++i)
        for (int d = 0; d < 3; ++d)
            out[3 * i + d] =
                (itemsize == 4)
                    ? ((const float*)raw.data())[i * cols + d]
                    : (float)((const double*)raw.data())[i * cols + d];
    if (unit_cube) mlsp_scale_to_unit_cube(out, rows);
    if (rot_axis >= 0 && rotate_this) rotate_inplace(out, rows, rot_axis, angle);
    for (int64_t i = rows; i < pad_points; ++i)  // tile-pad (pipeline.py:147-149)
        memcpy(out + 3 * i, out + 3 * (i % rows), 3 * sizeof(float));
    *npoints = rows;
    return 0;
}

}  // namespace

extern "C" {

// Header-only pass: rows per file (for host-side size bucketing).
// Returns 0, or (negative parse code * 1e6 - file index) on failure.
int64_t mlsp_npy_sizes(const char** paths, int64_t n_files, int32_t n_threads,
                       int64_t* out_rows) {
    std::atomic<int64_t> next(0), err(0);
    auto work = [&] {
        for (;;) {
            const int64_t i = next.fetch_add(1);
            if (i >= n_files || err.load()) return;
            FILE* f = fopen(paths[i], "rb");
            int64_t r = 0, c = 0;
            int isz = 0;
            int rc = f ? parse_npy_header(f, &r, &c, &isz) : -10;
            if (f) fclose(f);
            if (rc != 0) err.store((int64_t)rc * 1000000 - i);
            out_rows[i] = r;
        }
    };
    const int nt = std::max(1, std::min<int>(n_threads, (int)n_files));
    std::vector<std::thread> ts;
    for (int t = 1; t < nt; ++t) ts.emplace_back(work);
    work();
    for (auto& t : ts) t.join();
    return err.load();
}

// Batched ingest into out [n_files, pad_points, 3] (pre-bucketed by the
// caller so every file has rows <= pad_points). rot_mask selects which
// files get the alignment rotation (NULL = all; the ShapeNet "plant"
// exception, dataloader.py:206-209). Returns 0 or encoded error.
int64_t mlsp_load_npy_clouds(const char** paths, int64_t n_files,
                             int64_t pad_points, int32_t unit_cube,
                             int32_t rot_axis, float angle,
                             const uint8_t* rot_mask, int32_t n_threads,
                             float* out, int64_t* out_npoints) {
    std::atomic<int64_t> next(0), err(0);
    auto work = [&] {
        for (;;) {
            const int64_t i = next.fetch_add(1);
            if (i >= n_files || err.load()) return;
            const int rot = rot_mask ? (int)rot_mask[i] : 1;
            int rc = load_one(paths[i], pad_points, unit_cube, rot_axis, angle,
                              rot, out + i * pad_points * 3, &out_npoints[i]);
            if (rc != 0) err.store((int64_t)rc * 1000000 - i);
        }
    };
    const int nt = std::max(1, std::min<int>(n_threads, (int)n_files));
    std::vector<std::thread> ts;
    for (int t = 1; t < nt; ++t) ts.emplace_back(work);
    work();
    for (auto& t : ts) t.join();
    return err.load();
}

}  // extern "C"
