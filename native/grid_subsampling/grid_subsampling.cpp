// Voxel-grid subsampling of point clouds — native host-side preprocessing.
//
// TPU-native equivalent of the reference CPython extension
// /root/reference/cpp_wrappers/cpp_subsampling/ (grid_subsampling.cpp:50-102):
// hash points into sampleDl-sized voxels, emit per-voxel barycenters, mean
// features, and majority-vote labels.  Exposed through a plain C ABI consumed
// via ctypes (no pybind11 in this image); same algorithm, fresh
// implementation with a flat open-addressing hash map instead of std::
// unordered_map-of-structs for cache friendliness on room-scale clouds.
//
// Build: g++ -O3 -march=native -shared -fPIC grid_subsampling.cpp -o libgridsubsample.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct Accum {
    int64_t key;
    int32_t count;
    int32_t first;  // index of first point (stable ordering of output)
};

// open-addressing hash table over voxel keys
class VoxelMap {
  public:
    explicit VoxelMap(size_t expected) {
        size_t cap = 16;
        while (cap < expected * 2) cap <<= 1;
        mask_ = cap - 1;
        slots_.assign(cap, -1);
    }

    // returns the dense cell id for a voxel key, inserting if new
    int32_t lookup(int64_t key, int32_t point_idx, std::vector<Accum>& cells) {
        size_t h = static_cast<size_t>(key * 0x9E3779B97F4A7C15ULL) & mask_;
        while (true) {
            int32_t slot = slots_[h];
            if (slot < 0) {
                slots_[h] = static_cast<int32_t>(cells.size());
                cells.push_back({key, 0, point_idx});
                return static_cast<int32_t>(cells.size()) - 1;
            }
            if (cells[slot].key == key) return slot;
            h = (h + 1) & mask_;
        }
    }

  private:
    size_t mask_;
    std::vector<int32_t> slots_;
};

}  // namespace

extern "C" {

// First pass: assign each point to a dense voxel id.  Returns the number of
// occupied voxels.  cell_ids must have room for n entries.
int32_t voxelize(const float* points, int32_t n, float sample_dl,
                 int32_t* cell_ids) {
    float minv[3] = {1e30f, 1e30f, 1e30f};
    for (int32_t i = 0; i < n; ++i) {
        for (int d = 0; d < 3; ++d) {
            float v = points[i * 3 + d];
            if (v < minv[d]) minv[d] = v;
        }
    }
    const float inv = 1.0f / sample_dl;
    VoxelMap map(static_cast<size_t>(n));
    std::vector<Accum> cells;
    cells.reserve(n / 4 + 16);
    for (int32_t i = 0; i < n; ++i) {
        int64_t ix = static_cast<int64_t>(
            std::floor((points[i * 3 + 0] - minv[0]) * inv));
        int64_t iy = static_cast<int64_t>(
            std::floor((points[i * 3 + 1] - minv[1]) * inv));
        int64_t iz = static_cast<int64_t>(
            std::floor((points[i * 3 + 2] - minv[2]) * inv));
        int64_t key = (ix & 0x1FFFFF) | ((iy & 0x1FFFFF) << 21)
                      | ((iz & 0x1FFFFF) << 42);
        cell_ids[i] = map.lookup(key, i, cells);
    }
    return static_cast<int32_t>(cells.size());
}

// Second pass: reduce points/features/labels into per-cell outputs.
// out_points [n_cells*3] barycenters; out_features [n_cells*f_dim] means;
// out_labels [n_cells] majority vote over labels in [0, n_labels).
void reduce_cells(const float* points, const float* features,
                  const int32_t* labels, const int32_t* cell_ids,
                  int32_t n, int32_t f_dim, int32_t n_labels,
                  int32_t n_cells, float* out_points, float* out_features,
                  int32_t* out_labels) {
    std::vector<int32_t> counts(n_cells, 0);
    std::memset(out_points, 0, sizeof(float) * n_cells * 3);
    if (features && f_dim > 0)
        std::memset(out_features, 0, sizeof(float) * n_cells * f_dim);
    std::vector<int32_t> votes;
    if (labels && n_labels > 0)
        votes.assign(static_cast<size_t>(n_cells) * n_labels, 0);

    for (int32_t i = 0; i < n; ++i) {
        int32_t c = cell_ids[i];
        counts[c] += 1;
        for (int d = 0; d < 3; ++d)
            out_points[c * 3 + d] += points[i * 3 + d];
        if (features && f_dim > 0)
            for (int32_t d = 0; d < f_dim; ++d)
                out_features[c * f_dim + d] += features[i * f_dim + d];
        if (labels && n_labels > 0) {
            int32_t l = labels[i];
            if (l >= 0 && l < n_labels)
                votes[static_cast<size_t>(c) * n_labels + l] += 1;
        }
    }
    for (int32_t c = 0; c < n_cells; ++c) {
        float invc = 1.0f / static_cast<float>(counts[c]);
        for (int d = 0; d < 3; ++d) out_points[c * 3 + d] *= invc;
        if (features && f_dim > 0)
            for (int32_t d = 0; d < f_dim; ++d)
                out_features[c * f_dim + d] *= invc;
        if (labels && n_labels > 0) {
            int32_t best = 0, best_cnt = -1;
            for (int32_t l = 0; l < n_labels; ++l) {
                int32_t v = votes[static_cast<size_t>(c) * n_labels + l];
                if (v > best_cnt) { best_cnt = v; best = l; }
            }
            out_labels[c] = best;
        }
    }
}

}  // extern "C"
