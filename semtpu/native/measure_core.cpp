// semtpu native measurement core.
//
// Host-side postprocessing kernels for the particle-analysis hot path:
// two-pass union-find connected-component labeling, fused per-component
// statistics (area / intensity sum / bbox), component filtering, and the
// sequential 8->4-connectivity fixer (exact semantics of the reference's
// Python double loop, `Releases/Version 1.2.0/HelperFunctions.py:144-152`).
//
// The reference implements these as per-pixel Python loops and repeated
// cv2.findContours/drawContours full-image passes (`HelperFunctions.py:163-185`,
// `Measurements.py:321-342`); filtering 1000 simulated masks with ~1e3
// particles each makes this the dominant host cost of pipeline step 5.
//
// Build: g++ -O3 -march=native -shared -fPIC measure_core.cpp -o libsemtpu_native.so
// (semtpu/native/__init__.py builds lazily and falls back to numpy paths.)

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
    std::vector<int32_t> parent;
    explicit UnionFind(size_t cap) { parent.reserve(cap); }
    int32_t make() {
        parent.push_back(static_cast<int32_t>(parent.size()));
        return parent.back();
    }
    int32_t find(int32_t x) {
        int32_t root = x;
        while (parent[root] != root) root = parent[root];
        while (parent[x] != root) {  // path compression
            int32_t next = parent[x];
            parent[x] = root;
            x = next;
        }
        return root;
    }
    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a < b) parent[b] = a;   // keep the smaller (earlier) provisional id
        else if (b < a) parent[a] = b;
    }
};

}  // namespace

extern "C" {

// Label connected components of a nonzero-foreground mask.
// connectivity: 1 = 4-connected, 2 = 8-connected.
// labels_out must hold h*w int32. Returns the number of components; labels
// are 1..n in raster order of each component's first pixel (scipy-compatible).
int32_t semtpu_cc_label(const uint8_t* mask, int32_t h, int32_t w,
                        int32_t connectivity, int32_t* labels_out) {
    UnionFind uf(static_cast<size_t>(h) * w / 4 + 16);
    // pass 1: provisional labels + merges
    for (int32_t y = 0; y < h; ++y) {
        for (int32_t x = 0; x < w; ++x) {
            const int64_t i = static_cast<int64_t>(y) * w + x;
            if (!mask[i]) { labels_out[i] = -1; continue; }
            int32_t lbl = -1;
            // scan already-visited neighbors
            if (x > 0 && labels_out[i - 1] >= 0) lbl = labels_out[i - 1];
            if (y > 0) {
                const int64_t up = i - w;
                if (labels_out[up] >= 0) {
                    if (lbl < 0) lbl = labels_out[up];
                    else uf.unite(lbl, labels_out[up]);
                }
                if (connectivity == 2) {
                    if (x > 0 && labels_out[up - 1] >= 0) {
                        if (lbl < 0) lbl = labels_out[up - 1];
                        else uf.unite(lbl, labels_out[up - 1]);
                    }
                    if (x + 1 < w && labels_out[up + 1] >= 0) {
                        if (lbl < 0) lbl = labels_out[up + 1];
                        else uf.unite(lbl, labels_out[up + 1]);
                    }
                }
            }
            labels_out[i] = (lbl < 0) ? uf.make() : lbl;
        }
    }
    // pass 2: compact to consecutive ids in raster order of component roots
    std::vector<int32_t> remap(uf.parent.size(), 0);
    int32_t n = 0;
    for (int64_t i = 0; i < static_cast<int64_t>(h) * w; ++i) {
        if (labels_out[i] < 0) { labels_out[i] = 0; continue; }
        const int32_t root = uf.find(labels_out[i]);
        if (remap[root] == 0) remap[root] = ++n;
        labels_out[i] = remap[root];
    }
    return n;
}

// Fused per-component statistics over a label map (labels 1..n):
// areas[k-1] = pixel count, sums[k-1] = intensity sum over `gray`
// (gray may be null -> sums untouched), bbox[(k-1)*4 +{0,1,2,3}] = y0,x0,y1,x1.
void semtpu_cc_stats(const int32_t* labels, const uint8_t* gray,
                     int32_t h, int32_t w, int32_t n,
                     int64_t* areas, double* sums, int32_t* bbox) {
    for (int32_t k = 0; k < n; ++k) {
        areas[k] = 0;
        if (sums) sums[k] = 0.0;
        if (bbox) { bbox[k * 4] = h; bbox[k * 4 + 1] = w; bbox[k * 4 + 2] = -1; bbox[k * 4 + 3] = -1; }
    }
    for (int32_t y = 0; y < h; ++y) {
        for (int32_t x = 0; x < w; ++x) {
            const int64_t i = static_cast<int64_t>(y) * w + x;
            const int32_t l = labels[i];
            if (l <= 0) continue;
            const int32_t k = l - 1;
            ++areas[k];
            if (gray && sums) sums[k] += gray[i];
            if (bbox) {
                if (y < bbox[k * 4]) bbox[k * 4] = y;
                if (x < bbox[k * 4 + 1]) bbox[k * 4 + 1] = x;
                if (y > bbox[k * 4 + 2]) bbox[k * 4 + 2] = y;
                if (x > bbox[k * 4 + 3]) bbox[k * 4 + 3] = x;
            }
        }
    }
}

// Rewrite mask keeping only components with keep[label] != 0 (keep has n+1
// entries, keep[0] ignored). Sets kept pixels to 255, dropped to 0.
void semtpu_cc_filter(const int32_t* labels, int32_t h, int32_t w,
                      const uint8_t* keep, uint8_t* mask_out) {
    for (int64_t i = 0; i < static_cast<int64_t>(h) * w; ++i) {
        const int32_t l = labels[i];
        mask_out[i] = (l > 0 && keep[l]) ? 255 : 0;
    }
}

// Exact sequential 8->4-connectivity fixer (reference HelperFunctions.py:144-152).
void semtpu_eight_to_four(uint8_t* img, int32_t h, int32_t w) {
    int64_t nonzero = 0;
    const int64_t total = static_cast<int64_t>(h) * w;
    for (int64_t i = 0; i < total; ++i) nonzero += (img[i] != 0);
    if (!(nonzero > 2 || nonzero < total - 2)) return;
    for (int32_t x = 0; x < h - 1; ++x) {
        uint8_t* row = img + static_cast<int64_t>(x) * w;
        uint8_t* nxt = row + w;
        for (int32_t y = 0; y < w - 1; ++y) {
            if (row[y] == 0 && nxt[y + 1] == 0 && nxt[y] != 0 && row[y + 1] != 0)
                nxt[y] = 0;
            else if (nxt[y] == 0 && row[y + 1] == 0 && row[y] != 0 && nxt[y + 1] != 0)
                row[y] = 0;
        }
    }
}

}  // extern "C"
