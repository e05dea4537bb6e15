// Fast COLMAP binary model parser (points3D.bin / images.bin).
//
// Native-runtime component of fastergs_tpu: the reference delegates dataset
// IO to its host framework's loaders; this replaces the Python struct-loop
// parser (fastergs_tpu/data/colmap.py) for large scenes, where points3D.bin
// carries millions of track entries. Exposed via ctypes (no pybind11
// dependency); data/colmap.py falls back to pure Python when the shared
// library is unavailable.
//
// Build: make -C fastergs_tpu/native  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct Reader {
    FILE* f;
    explicit Reader(const char* path) : f(std::fopen(path, "rb")) {}
    ~Reader() { if (f) std::fclose(f); }
    bool ok() const { return f != nullptr; }

    template <typename T>
    bool read(T* out, size_t count = 1) {
        return std::fread(out, sizeof(T), count, f) == count;
    }
    bool skip(long bytes) { return std::fseek(f, bytes, SEEK_CUR) == 0; }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------- //
// points3D.bin: [n:u64] then per point:
//   id:u64, xyz:3xf64, rgb:3xu8, error:f64, track_len:u64, track:2xu32 each
// ---------------------------------------------------------------------- //

long long colmap_count_points(const char* path) {
    Reader r(path);
    if (!r.ok()) return -1;
    uint64_t n = 0;
    if (!r.read(&n)) return -1;
    return static_cast<long long>(n);
}

// xyz: (n, 3) float32; rgb: (n, 3) float32 in [0, 1]. Returns 0 on success.
int colmap_read_points(const char* path, float* xyz, float* rgb,
                       long long n_expected) {
    Reader r(path);
    if (!r.ok()) return 1;
    uint64_t n = 0;
    if (!r.read(&n) || static_cast<long long>(n) != n_expected) return 2;
    for (uint64_t i = 0; i < n; ++i) {
        uint64_t point_id, track_len;
        double pos[3], error;
        uint8_t color[3];
        if (!r.read(&point_id)) return 3;
        if (!r.read(pos, 3)) return 3;
        if (!r.read(color, 3)) return 3;
        if (!r.read(&error)) return 3;
        if (!r.read(&track_len)) return 3;
        if (!r.skip(static_cast<long>(track_len) * 8)) return 3;
        for (int k = 0; k < 3; ++k) {
            xyz[i * 3 + k] = static_cast<float>(pos[k]);
            rgb[i * 3 + k] = static_cast<float>(color[k]) / 255.0f;
        }
    }
    return 0;
}

// ---------------------------------------------------------------------- //
// images.bin: [n:u64] then per image:
//   id:i32, qvec:4xf64, tvec:3xf64, camera_id:i32, name:cstr,
//   n_points2d:u64, points2d: (2xf64 + u64) each
// ---------------------------------------------------------------------- //

long long colmap_count_images(const char* path) {
    Reader r(path);
    if (!r.ok()) return -1;
    uint64_t n = 0;
    if (!r.read(&n)) return -1;
    return static_cast<long long>(n);
}

// qvecs: (n, 4) f64; tvecs: (n, 3) f64; camera_ids: (n,) i32;
// names: (n, name_stride) bytes (NUL-terminated, truncated to stride-1).
int colmap_read_images(const char* path, double* qvecs, double* tvecs,
                       int* camera_ids, char* names, int name_stride,
                       long long n_expected) {
    Reader r(path);
    if (!r.ok()) return 1;
    uint64_t n = 0;
    if (!r.read(&n) || static_cast<long long>(n) != n_expected) return 2;
    for (uint64_t i = 0; i < n; ++i) {
        int32_t image_id, camera_id;
        if (!r.read(&image_id)) return 3;
        if (!r.read(qvecs + i * 4, 4)) return 3;
        if (!r.read(tvecs + i * 3, 3)) return 3;
        if (!r.read(&camera_id)) return 3;
        camera_ids[i] = camera_id;
        // name: NUL-terminated string
        char* dst = names + static_cast<size_t>(i) * name_stride;
        int pos = 0;
        while (true) {
            int c = std::fgetc(r.f);
            if (c == EOF) return 3;
            if (c == '\0') break;
            if (pos < name_stride - 1) dst[pos++] = static_cast<char>(c);
        }
        dst[pos] = '\0';
        uint64_t n_pts = 0;
        if (!r.read(&n_pts)) return 3;
        if (!r.skip(static_cast<long>(n_pts) * 24)) return 3;
    }
    return 0;
}

}  // extern "C"
