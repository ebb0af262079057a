// Native host runtime for xrslam_tpu: the hot host-side (non-accelerator)
// paths of the pipeline, C++ equivalents of what the reference does with
// OpenCV/stdio on its host threads:
//
//   - PNG decoding to grayscale float32 (reference loads frames with
//     cv::imread, xrslam-pc/player/src/IO/euroc_dataset_reader.cpp:60)
//   - bilinear undistortion remap (cv::undistort, same file :60-73)
//   - EuRoC CSV parsing (CameraCsv/ImuCsv fscanf loops,
//     euroc_dataset_reader.h:36-106)
//   - gyro→accel linear-interpolation IMU fusion (the sample
//     synchronizer of xrslam/src/xrslam/core/detail.cpp:46-101)
//   - Poisson-disk spacing filter (utility/poisson_disk_filter.h:8-117)
//
// Exposed as a flat C ABI consumed from Python via ctypes
// (xrslam_tpu/native). Built with `make` (g++ + zlib only).

#include <zlib.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#define XR_API extern "C" __attribute__((visibility("default")))

// ---------------------------------------------------------------------------
// PNG decode (8/16-bit gray/RGB/(A), non-interlaced) → float32 gray [0,1]
// ---------------------------------------------------------------------------

namespace {

struct PngImage {
    int w = 0, h = 0, bit_depth = 0, color_type = 0, channels = 0;
    std::vector<uint8_t> raw;  // unfiltered scanline data
};

uint32_t be32(const uint8_t *p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

int decode_png(const char *path, PngImage &img) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> buf(n);
    if (fread(buf.data(), 1, n, f) != size_t(n)) {
        fclose(f);
        return -2;
    }
    fclose(f);
    static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (n < 8 || memcmp(buf.data(), magic, 8) != 0) return -3;

    std::vector<uint8_t> idat;
    size_t off = 8;
    while (off + 8 <= size_t(n)) {
        uint32_t len = be32(&buf[off]);
        const char *type = reinterpret_cast<const char *>(&buf[off + 4]);
        const uint8_t *data = &buf[off + 8];
        if (off + 12 + len > size_t(n)) return -4;
        if (!memcmp(type, "IHDR", 4)) {
            img.w = int(be32(data));
            img.h = int(be32(data + 4));
            img.bit_depth = data[8];
            img.color_type = data[9];
            if (data[12] != 0) return -5;  // interlaced unsupported
        } else if (!memcmp(type, "IDAT", 4)) {
            idat.insert(idat.end(), data, data + len);
        } else if (!memcmp(type, "IEND", 4)) {
            break;
        }
        off += 12 + len;
    }
    if (img.w <= 0 || img.h <= 0) return -6;
    switch (img.color_type) {
    case 0: img.channels = 1; break;
    case 2: img.channels = 3; break;
    case 4: img.channels = 2; break;
    case 6: img.channels = 4; break;
    default: return -7;  // palette unsupported
    }
    if (img.bit_depth != 8 && img.bit_depth != 16) return -8;

    const int bpp = img.channels * img.bit_depth / 8;
    const size_t stride = size_t(img.w) * bpp;
    std::vector<uint8_t> infl((stride + 1) * img.h);
    uLongf dst_len = infl.size();
    if (uncompress(infl.data(), &dst_len, idat.data(), idat.size()) != Z_OK)
        return -9;
    if (dst_len != infl.size()) return -10;

    img.raw.resize(stride * img.h);
    for (int y = 0; y < img.h; ++y) {
        const uint8_t *src = &infl[(stride + 1) * y];
        uint8_t filter = src[0];
        const uint8_t *line = src + 1;
        uint8_t *out = &img.raw[stride * y];
        const uint8_t *prev = y > 0 ? &img.raw[stride * (y - 1)] : nullptr;
        for (size_t x = 0; x < stride; ++x) {
            int a = x >= size_t(bpp) ? out[x - bpp] : 0;
            int b = prev ? prev[x] : 0;
            int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
            int v = line[x];
            switch (filter) {
            case 0: break;
            case 1: v += a; break;
            case 2: v += b; break;
            case 3: v += (a + b) / 2; break;
            case 4: v += paeth(a, b, c); break;
            default: return -11;
            }
            out[x] = uint8_t(v & 0xff);
        }
    }
    return 0;
}

float sample_chan(const PngImage &img, size_t base, int chan) {
    if (img.bit_depth == 8)
        return img.raw[base + chan] / 255.0f;
    size_t i = base + size_t(chan) * 2;
    return ((uint32_t(img.raw[i]) << 8) | img.raw[i + 1]) / 65535.0f;
}

}  // namespace

XR_API int xr_png_probe(const char *path, int *w, int *h) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t head[33];
    size_t got = fread(head, 1, sizeof(head), f);
    fclose(f);
    if (got < 33) return -2;
    *w = int(be32(head + 16));
    *h = int(be32(head + 20));
    return 0;
}

// out: caller buffer of w*h float32; grayscale via ITU-R 601 (the
// cv::cvtColor BGR2GRAY weights the reference uses)
XR_API int xr_png_load_gray(const char *path, float *out, int cap) {
    PngImage img;
    int rc = decode_png(path, img);
    if (rc != 0) return rc;
    if (img.w * img.h > cap) return -12;
    const int bpp = img.channels * img.bit_depth / 8;
    const size_t stride = size_t(img.w) * bpp;
    for (int y = 0; y < img.h; ++y) {
        for (int x = 0; x < img.w; ++x) {
            size_t base = stride * y + size_t(x) * bpp;
            float g;
            if (img.color_type == 0 || img.color_type == 4) {
                g = sample_chan(img, base, 0);
            } else {
                float r = sample_chan(img, base, 0);
                float gg = sample_chan(img, base, 1);
                float b = sample_chan(img, base, 2);
                g = 0.299f * r + 0.587f * gg + 0.114f * b;
            }
            out[size_t(y) * img.w + x] = g;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// bilinear remap (undistortion) — zero border
// ---------------------------------------------------------------------------

XR_API void xr_remap_bilinear(const float *img, int h, int w,
                              const float *src_u, const float *src_v,
                              float *out) {
    for (int i = 0; i < h * w; ++i) {
        float u = src_u[i], v = src_v[i];
        int u0 = int(std::floor(u)), v0 = int(std::floor(v));
        float du = u - u0, dv = v - v0;
        float acc = 0.0f;
        for (int k = 0; k < 4; ++k) {
            int uu = u0 + (k & 1), vv = v0 + (k >> 1);
            if (uu < 0 || uu >= w || vv < 0 || vv >= h) continue;
            float wgt = ((k & 1) ? du : 1.0f - du) * ((k >> 1) ? dv : 1.0f - dv);
            acc += wgt * img[size_t(vv) * w + uu];
        }
        out[i] = acc;
    }
}

// ---------------------------------------------------------------------------
// EuRoC CSVs (ns → s)
// ---------------------------------------------------------------------------

XR_API int xr_imu_csv_load(const char *path, double *t, double *w, double *a,
                           int cap) {
    FILE *f = fopen(path, "r");
    if (!f) return -1;
    char line[2048];
    int n = 0;
    while (fgets(line, sizeof(line), f)) {
        double ts, v[6];
        if (sscanf(line, "%lf,%lf,%lf,%lf,%lf,%lf,%lf", &ts, &v[0], &v[1],
                   &v[2], &v[3], &v[4], &v[5]) != 7)
            continue;  // header/comment
        if (n >= cap) break;
        t[n] = ts * 1e-9;
        for (int k = 0; k < 3; ++k) {
            w[n * 3 + k] = v[k];
            a[n * 3 + k] = v[3 + k];
        }
        ++n;
    }
    fclose(f);
    return n;
}

// filenames written as fixed-width records of `name_cap` bytes
XR_API int xr_cam_csv_load(const char *path, double *t, char *names,
                           int name_cap, int cap) {
    FILE *f = fopen(path, "r");
    if (!f) return -1;
    char line[2048], fn[1024];
    int n = 0;
    while (fgets(line, sizeof(line), f)) {
        double ts;
        if (sscanf(line, "%lf,%1023[^,\r\n]", &ts, fn) != 2) continue;
        if (n >= cap) break;
        t[n] = ts * 1e-9;
        snprintf(names + size_t(n) * name_cap, name_cap, "%s", fn);
        ++n;
    }
    fclose(f);
    return n;
}

// ---------------------------------------------------------------------------
// IMU fusion: interpolate gyro to accel timestamps
// (reference detail.cpp:46-101)
// ---------------------------------------------------------------------------

XR_API int xr_fuse_imu(const double *tg, const double *wg, int ng,
                       const double *ta, const double *aa, int na,
                       double *out_t, double *out_w, double *out_a) {
    int n = 0, j = 0;
    for (int i = 0; i < na; ++i) {
        double t = ta[i];
        while (j + 1 < ng && tg[j + 1] <= t) ++j;
        if (t < tg[0] || j + 1 >= ng) continue;  // outside gyro coverage
        double t0 = tg[j], t1 = tg[j + 1];
        double lam = t1 > t0 ? (t - t0) / (t1 - t0) : 0.0;
        if (t > t1) continue;
        out_t[n] = t;
        for (int k = 0; k < 3; ++k) {
            out_w[n * 3 + k] =
                (1.0 - lam) * wg[j * 3 + k] + lam * wg[(j + 1) * 3 + k];
            out_a[n * 3 + k] = aa[i * 3 + k];
        }
        ++n;
    }
    return n;
}

// ---------------------------------------------------------------------------
// Poisson-disk spacing filter (grid hash, reference
// utility/poisson_disk_filter.h) — candidates visited in `order`,
// accepted iff >= min_dist from every previously accepted point.
// ---------------------------------------------------------------------------

XR_API void xr_poisson_filter(const double *pts, const int64_t *order,
                              const uint8_t *keep_ok, int n, double min_dist,
                              uint8_t *accept) {
    const double cell = min_dist / std::sqrt(2.0);
    const double r2 = min_dist * min_dist;
    std::unordered_map<uint64_t, std::vector<int>> grid;
    grid.reserve(size_t(n) * 2);
    auto key_of = [&](double x, double y) {
        int64_t gx = int64_t(std::floor(x / cell));
        int64_t gy = int64_t(std::floor(y / cell));
        return (uint64_t(uint32_t(gx)) << 32) | uint64_t(uint32_t(gy));
    };
    memset(accept, 0, n);
    for (int oi = 0; oi < n; ++oi) {
        int i = int(order[oi]);
        if (!keep_ok[i]) continue;
        double x = pts[i * 2], y = pts[i * 2 + 1];
        int64_t gx = int64_t(std::floor(x / cell));
        int64_t gy = int64_t(std::floor(y / cell));
        bool ok = true;
        for (int64_t dx = -2; dx <= 2 && ok; ++dx) {
            for (int64_t dy = -2; dy <= 2 && ok; ++dy) {
                uint64_t k = (uint64_t(uint32_t(gx + dx)) << 32) |
                             uint64_t(uint32_t(gy + dy));
                auto it = grid.find(k);
                if (it == grid.end()) continue;
                for (int ji : it->second) {
                    double ddx = pts[ji * 2] - x, ddy = pts[ji * 2 + 1] - y;
                    if (ddx * ddx + ddy * ddy < r2) {
                        ok = false;
                        break;
                    }
                }
            }
        }
        if (ok) {
            accept[i] = 1;
            grid[key_of(x, y)].push_back(i);
        }
    }
}
