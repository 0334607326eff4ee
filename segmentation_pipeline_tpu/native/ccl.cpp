// Native connected-component labeling + morphology for 3D label volumes.
//
// The reference delegates these to scikit-image's C internals
// (post_processing.py:1, instance_segmentation_evaluator.py:4); this is the
// framework-owned native equivalent: a two-pass union-find labeler with
// 6/18/26-connectivity and a cross-footprint grey dilation, exposed via a C
// ABI for ctypes.  Outputs match scipy.ndimage exactly (labels numbered by
// first occurrence in C order) — verified by tests/test_native.py.
//
// Build: make -C segmentation_pipeline_tpu/native  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct UnionFind {
    std::vector<int32_t> parent;

    explicit UnionFind(size_t n) : parent(n) {
        for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
    }

    int32_t find(int32_t x) {
        int32_t root = x;
        while (parent[root] != root) root = parent[root];
        while (parent[x] != root) {
            int32_t next = parent[x];
            parent[x] = root;
            x = next;
        }
        return root;
    }

    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a == b) return;
        if (a < b) parent[b] = a; else parent[a] = b;
    }
};

// "previous" neighbor offsets in C-order (W slowest, D fastest) for a given
// connectivity (1=6, 2=18, 3=26 neighborhood).
static int build_prev_offsets(int connectivity, int offsets[13][3]) {
    int n = 0;
    for (int dw = -1; dw <= 1; ++dw) {
        for (int dh = -1; dh <= 1; ++dh) {
            for (int dd = -1; dd <= 1; ++dd) {
                if (dw == 0 && dh == 0 && dd == 0) continue;
                int manhattan = (dw != 0) + (dh != 0) + (dd != 0);
                if (manhattan > connectivity) continue;
                // keep only lexicographically-previous neighbors
                if (dw > 0) continue;
                if (dw == 0 && dh > 0) continue;
                if (dw == 0 && dh == 0 && dd > 0) continue;
                offsets[n][0] = dw;
                offsets[n][1] = dh;
                offsets[n][2] = dd;
                ++n;
            }
        }
    }
    return n;
}

}  // namespace

extern "C" {

// Label foreground (img != 0) components of a (W, H, D) C-order volume.
// Returns the number of components; writes labels 1..N into out.
int32_t label_components(const uint8_t* img, int32_t* out,
                         int64_t W, int64_t H, int64_t D, int connectivity) {
    const int64_t n = W * H * D;
    int offsets[13][3];
    const int n_off = build_prev_offsets(connectivity, offsets);

    // provisional labels: one per foreground voxel run-start; we use a
    // union-find over provisional ids.
    std::vector<int32_t> provisional(n, 0);
    UnionFind uf(1);  // slot 0 unused (background)
    int32_t next_label = 1;

    for (int64_t w = 0; w < W; ++w) {
        for (int64_t h = 0; h < H; ++h) {
            const int64_t base = (w * H + h) * D;
            for (int64_t d = 0; d < D; ++d) {
                const int64_t idx = base + d;
                if (!img[idx]) continue;
                int32_t assigned = 0;
                for (int k = 0; k < n_off; ++k) {
                    const int64_t nw = w + offsets[k][0];
                    const int64_t nh = h + offsets[k][1];
                    const int64_t nd = d + offsets[k][2];
                    if (nw < 0 || nh < 0 || nd < 0 || nh >= H || nd >= D) continue;
                    const int64_t nidx = (nw * H + nh) * D + nd;
                    const int32_t nlab = provisional[nidx];
                    if (nlab == 0) continue;
                    if (assigned == 0) {
                        assigned = uf.find(nlab);
                    } else {
                        uf.unite(assigned, nlab);
                        assigned = uf.find(assigned);
                    }
                }
                if (assigned == 0) {
                    uf.parent.push_back(next_label);
                    assigned = next_label++;
                }
                provisional[idx] = assigned;
            }
        }
    }

    // second pass: resolve roots, renumber by first occurrence in C order
    std::vector<int32_t> remap(next_label, 0);
    int32_t count = 0;
    for (int64_t idx = 0; idx < n; ++idx) {
        const int32_t lab = provisional[idx];
        if (lab == 0) { out[idx] = 0; continue; }
        const int32_t root = uf.find(lab);
        if (remap[root] == 0) remap[root] = ++count;
        out[idx] = remap[root];
    }
    return count;
}

// Grey dilation with the 6-neighborhood cross footprint (+ center), matching
// scipy.ndimage.grey_dilation(footprint=generate_binary_structure(3, 1)).
void grey_dilate_cross(const int32_t* img, int32_t* out,
                       int64_t W, int64_t H, int64_t D) {
    for (int64_t w = 0; w < W; ++w) {
        for (int64_t h = 0; h < H; ++h) {
            const int64_t base = (w * H + h) * D;
            for (int64_t d = 0; d < D; ++d) {
                const int64_t idx = base + d;
                int32_t m = img[idx];
                if (w > 0)      m = std::max(m, img[idx - H * D]);
                if (w < W - 1)  m = std::max(m, img[idx + H * D]);
                if (h > 0)      m = std::max(m, img[idx - D]);
                if (h < H - 1)  m = std::max(m, img[idx + D]);
                if (d > 0)      m = std::max(m, img[idx - 1]);
                if (d < D - 1)  m = std::max(m, img[idx + 1]);
                out[idx] = m;
            }
        }
    }
}

// Component voxel counts: out_counts must have space for (num_labels + 1).
void component_counts(const int32_t* labels, int64_t n,
                      int64_t* out_counts, int32_t num_labels) {
    std::memset(out_counts, 0, sizeof(int64_t) * (num_labels + 1));
    for (int64_t i = 0; i < n; ++i) {
        const int32_t lab = labels[i];
        if (lab >= 0 && lab <= num_labels) ++out_counts[lab];
    }
}

}  // extern "C"

// Joint confusion histogram for segmentation metrics: one streaming pass
// over int32 target/pred label maps. lut maps raw value -> dense index in
// [0, L] (bucket L = "not a named label"); values outside [0, lut_len)
// clamp into bucket L. counts: (L+1)*(L+1) int64, zeroed by the caller.
extern "C" void confusion_joint_hist(const int32_t* target,
                                     const int32_t* pred,
                                     int64_t n,
                                     const int32_t* lut, int64_t lut_len,
                                     int32_t L,
                                     int64_t* counts) {
    const int64_t stride = (int64_t)L + 1;
    for (int64_t i = 0; i < n; ++i) {
        int32_t t = target[i];
        int32_t p = pred[i];
        int32_t ti = (t >= 0 && t < lut_len) ? lut[t] : L;
        int32_t pi = (p >= 0 && p < lut_len) ? lut[p] : L;
        counts[(int64_t)ti * stride + pi]++;
    }
}
