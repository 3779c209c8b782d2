// fls_native: host-side runtime support for the TPU SLAM engine.
//
// The reference's host runtime is C++ (ROS node + PCL I/O); here the native
// layer owns the latency-critical host work that feeds the TPU:
//   * batched KITTI-style .bin scan decoding (mmap + memcpy, no Python loop)
//   * a background prefetcher (thread pool + ring buffer) that stages
//     fixed-capacity padded scan buffers ahead of the device feed
//   * fast binary PCD x/y/z extraction for map tooling
//
// Exposed with a plain C ABI for ctypes (pybind11 is not in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread fls_native.cpp -o libfls_native.so

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <mutex>
#include <queue>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// KITTI .bin: float32 x,y,z,intensity records
// ---------------------------------------------------------------------------

// Read one .bin into a padded (capacity, 4) float buffer; returns the number
// of valid points or -1 on error. Pad lanes get the sentinel (1e6).
int fls_read_bin(const char* path, float* out, int capacity) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -1; }
    size_t n_pts = (size_t)st.st_size / (4 * sizeof(float));
    size_t n = n_pts < (size_t)capacity ? n_pts : (size_t)capacity;
    void* m = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (m == MAP_FAILED) return -1;
    memcpy(out, m, n * 4 * sizeof(float));
    munmap(m, st.st_size);
    for (size_t i = n; i < (size_t)capacity; ++i) {
        out[i * 4 + 0] = 1e6f;
        out[i * 4 + 1] = 1e6f;
        out[i * 4 + 2] = 1e6f;
        out[i * 4 + 3] = 0.0f;
    }
    return (int)n;
}

// Batched read of `count` files (newline-joined paths) with a thread pool.
// out has shape (count, capacity, 4); counts receives per-file point counts.
int fls_read_bins(const char* joined_paths, int count, float* out,
                  int capacity, int* counts, int n_threads) {
    std::vector<std::string> paths;
    {
        const char* p = joined_paths;
        for (int i = 0; i < count; ++i) {
            const char* e = strchr(p, '\n');
            size_t len = e ? (size_t)(e - p) : strlen(p);
            paths.emplace_back(p, len);
            p += len + (e ? 1 : 0);
        }
    }
    std::atomic<int> next{0};
    std::atomic<int> errors{0};
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= count) return;
            int n = fls_read_bin(paths[i].c_str(),
                                 out + (size_t)i * capacity * 4, capacity);
            counts[i] = n;
            if (n < 0) errors.fetch_add(1);
        }
    };
    int nt = n_threads > 0 ? n_threads : 4;
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return errors.load() == 0 ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Filtered + quantized decode: the production reader path.
//
// The FAST-LIO preprocess contract (`kitti.yaml: blind`, `kitti.launch:
// point_filter_num`) applied HOST-SIDE during decode, so bytes the device
// would immediately mask out never cross the host->device link, and xyz is
// quantized to int16 fixed point (out = round(x / scale)); at the default
// scale 1/256 (3.9 mm steps, +/-128 m span) quantization is ~5x below
// LiDAR noise while halving upload bytes vs float32 — the link is the
// reader bottleneck on a remote-attached accelerator.
// ---------------------------------------------------------------------------

static inline int16_t q16_clamp(float v) {
    long r = lrintf(v);
    if (r > 32767) return 32767;
    if (r < -32767) return -32767;
    return (int16_t)r;
}

// Decode one .bin with stride / blind / max-range filtering and int16
// quantization. out is (capacity, 3) int16, padded with zeros (the consumer
// masks by count). Returns the kept-point count or -1 on error.
int fls_read_bin_q16(const char* path, int16_t* out, int capacity, int stride,
                     float blind, float max_range, float inv_scale) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -1; }
    size_t n_pts = (size_t)st.st_size / (4 * sizeof(float));
    void* m = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (m == MAP_FAILED) return -1;
    const float* p = (const float*)m;
    float blind2 = blind * blind;
    float max2 = max_range > 0.0f ? max_range * max_range : 0.0f;
    int kept = 0;
    for (size_t i = 0; i < n_pts && kept < capacity; ++i) {
        if (stride > 1 && (i % (size_t)stride) != 0) continue;
        float x = p[i * 4 + 0], y = p[i * 4 + 1], z = p[i * 4 + 2];
        float r2 = x * x + y * y + z * z;
        if (r2 <= blind2) continue;
        if (max2 > 0.0f && r2 >= max2) continue;
        out[kept * 3 + 0] = q16_clamp(x * inv_scale);
        out[kept * 3 + 1] = q16_clamp(y * inv_scale);
        out[kept * 3 + 2] = q16_clamp(z * inv_scale);
        ++kept;
    }
    munmap(m, st.st_size);
    memset(out + (size_t)kept * 3, 0,
           ((size_t)capacity - kept) * 3 * sizeof(int16_t));
    return kept;
}

// Batched filtered+quantized decode with a thread pool; out has shape
// (count, capacity, 3) int16.
int fls_read_bins_q16(const char* joined_paths, int count, int16_t* out,
                      int capacity, int* counts, int stride, float blind,
                      float max_range, float inv_scale, int n_threads) {
    std::vector<std::string> paths;
    {
        const char* p = joined_paths;
        for (int i = 0; i < count; ++i) {
            const char* e = strchr(p, '\n');
            size_t len = e ? (size_t)(e - p) : strlen(p);
            paths.emplace_back(p, len);
            p += len + (e ? 1 : 0);
        }
    }
    std::atomic<int> next{0};
    std::atomic<int> errors{0};
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= count) return;
            int n = fls_read_bin_q16(paths[i].c_str(),
                                     out + (size_t)i * capacity * 3, capacity,
                                     stride, blind, max_range, inv_scale);
            counts[i] = n;
            if (n < 0) errors.fetch_add(1);
        }
    };
    int nt = n_threads > 0 ? n_threads : 4;
    std::vector<std::thread> pool;
    for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
    for (auto& t : pool) t.join();
    return errors.load() == 0 ? 0 : -1;
}

// ---------------------------------------------------------------------------
// Prefetcher: stages decoded scans ahead of the consumer
// ---------------------------------------------------------------------------

struct Prefetcher {
    std::vector<std::string> paths;
    int capacity;            // points per scan
    int depth;               // ring size
    std::vector<std::vector<float>> ring;
    std::vector<int> counts;
    std::queue<int> ready;   // produced slot order
    std::queue<int> free_slots;
    std::mutex mu;
    std::condition_variable cv_ready, cv_free;
    std::thread worker;
    std::atomic<bool> stop{false};
    size_t produced = 0;

    void run() {
        for (size_t i = 0; i < paths.size() && !stop.load(); ++i) {
            int slot;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_free.wait(lk, [&] { return !free_slots.empty() || stop.load(); });
                if (stop.load()) return;
                slot = free_slots.front();
                free_slots.pop();
            }
            counts[slot] = fls_read_bin(paths[i].c_str(), ring[slot].data(),
                                        capacity);
            {
                std::lock_guard<std::mutex> lk(mu);
                ready.push(slot);
            }
            cv_ready.notify_one();
        }
    }
};

void* fls_prefetcher_create(const char* joined_paths, int count, int capacity,
                            int depth) {
    auto* p = new Prefetcher();
    const char* s = joined_paths;
    for (int i = 0; i < count; ++i) {
        const char* e = strchr(s, '\n');
        size_t len = e ? (size_t)(e - s) : strlen(s);
        p->paths.emplace_back(s, len);
        s += len + (e ? 1 : 0);
    }
    p->capacity = capacity;
    p->depth = depth;
    p->ring.resize(depth);
    p->counts.resize(depth);
    for (int i = 0; i < depth; ++i) {
        p->ring[i].resize((size_t)capacity * 4);
        p->free_slots.push(i);
    }
    p->worker = std::thread([p] { p->run(); });
    return p;
}

// Copy the next staged scan into out (capacity*4 floats). Returns the point
// count, or -2 when the sequence is exhausted.
int fls_prefetcher_next(void* handle, float* out) {
    auto* p = (Prefetcher*)handle;
    if (p->produced >= p->paths.size()) return -2;
    int slot;
    {
        std::unique_lock<std::mutex> lk(p->mu);
        p->cv_ready.wait(lk, [&] { return !p->ready.empty(); });
        slot = p->ready.front();
        p->ready.pop();
    }
    memcpy(out, p->ring[slot].data(), (size_t)p->capacity * 4 * sizeof(float));
    int n = p->counts[slot];
    {
        std::lock_guard<std::mutex> lk(p->mu);
        p->free_slots.push(slot);
    }
    p->cv_free.notify_one();
    p->produced++;
    return n;
}

void fls_prefetcher_destroy(void* handle) {
    auto* p = (Prefetcher*)handle;
    p->stop.store(true);
    p->cv_free.notify_all();
    if (p->worker.joinable()) p->worker.join();
    delete p;
}

// ---------------------------------------------------------------------------
// Binary PCD fast path: extract x/y/z into a padded float buffer
// ---------------------------------------------------------------------------

int fls_read_pcd_xyz(const char* path, float* out, int capacity) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char line[1024];
    int n_pts = 0, point_step = 0, x_off = -1, y_off = -1, z_off = -1;
    bool binary = false;
    std::vector<std::string> fields;
    std::vector<int> sizes, cnts;
    while (fgets(line, sizeof(line), f)) {
        std::string l(line);
        auto starts = [&](const char* k) { return l.rfind(k, 0) == 0; };
        if (starts("FIELDS")) {
            fields.clear();
            char* tok = strtok(line + 7, " \n");
            while (tok) { fields.push_back(tok); tok = strtok(nullptr, " \n"); }
        } else if (starts("SIZE")) {
            sizes.clear();
            char* tok = strtok(line + 5, " \n");
            while (tok) { sizes.push_back(atoi(tok)); tok = strtok(nullptr, " \n"); }
        } else if (starts("COUNT")) {
            cnts.clear();
            char* tok = strtok(line + 6, " \n");
            while (tok) { cnts.push_back(atoi(tok)); tok = strtok(nullptr, " \n"); }
        } else if (starts("POINTS")) {
            n_pts = atoi(line + 7);
        } else if (starts("DATA")) {
            // "binary_compressed" must NOT take the raw-binary fast path
            binary = strstr(line, "binary") != nullptr &&
                     strstr(line, "compressed") == nullptr;
            break;
        }
    }
    if (!binary || fields.empty() || sizes.size() != fields.size()) {
        fclose(f);
        return -1;
    }
    if (cnts.empty()) cnts.assign(fields.size(), 1);
    int off = 0;
    for (size_t i = 0; i < fields.size(); ++i) {
        if (fields[i] == "x") x_off = off;
        if (fields[i] == "y") y_off = off;
        if (fields[i] == "z") z_off = off;
        off += sizes[i] * cnts[i];
    }
    point_step = off;
    if (x_off < 0 || y_off < 0 || z_off < 0) { fclose(f); return -1; }
    int n = n_pts < capacity ? n_pts : capacity;
    std::vector<char> buf((size_t)point_step * n);
    size_t got = fread(buf.data(), 1, buf.size(), f);
    fclose(f);
    if (got < buf.size()) n = (int)(got / point_step);
    for (int i = 0; i < n; ++i) {
        const char* rec = buf.data() + (size_t)i * point_step;
        memcpy(out + i * 3 + 0, rec + x_off, 4);
        memcpy(out + i * 3 + 1, rec + y_off, 4);
        memcpy(out + i * 3 + 2, rec + z_off, 4);
    }
    for (int i = n; i < capacity; ++i) {
        out[i * 3] = out[i * 3 + 1] = out[i * 3 + 2] = 1e6f;
    }
    return n;
}

}  // extern "C"
