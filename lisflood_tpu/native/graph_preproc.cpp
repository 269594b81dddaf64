// Native drainage-graph preprocessing.
//
// The reference leans on the PCRaster C++ library for its init-time map
// algebra (lddrepair/accuflux/catchment..., routing.py:90-178) and on
// Numba for the up/down lookups (kinematic_wave_parallel_tools.py:111-130).
// This translation unit provides the same O(P) graph passes natively for
// continental-scale grids (1e8+ cells) where the NumPy fallbacks in
// graph/ldd.py become the init bottleneck. Exposed via ctypes
// (graph/native.py); every function has a NumPy reference implementation
// and an equivalence test.
//
// Build: make -C lisflood_tpu/native
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// LDD keypad code -> (row, col) shift; 5 = pit, 0 = missing.
static const int DR[10] = {0, 1, 1, 1, 0, 0, 0, -1, -1, -1};
static const int DC[10] = {0, -1, 0, 1, -1, 0, 1, -1, 0, 1};

// Compressed-space downstream index from an LDD grid.
// ldd:    (nrows*ncols) int8 keypad codes (0 where missing/out of mask)
// land:   (nrows*ncols) int64, compressed index per cell or -1
// out:    (P) int32 downstream compressed index, -1 for pits/outside
void build_downstream(const int8_t* ldd, const int64_t* land,
                      int64_t nrows, int64_t ncols, int32_t* out, int64_t P) {
    for (int64_t i = 0; i < P; ++i) out[i] = -1;
    for (int64_t r = 0; r < nrows; ++r) {
        for (int64_t c = 0; c < ncols; ++c) {
            int64_t flat = r * ncols + c;
            int64_t p = land[flat];
            if (p < 0) continue;
            int code = ldd[flat];
            if (code < 1 || code > 9 || code == 5) continue;
            int64_t r2 = r + DR[code], c2 = c + DC[code];
            if (r2 < 0 || r2 >= nrows || c2 < 0 || c2 >= ncols) continue;
            int64_t q = land[r2 * ncols + c2];
            if (q >= 0) out[p] = (int32_t)q;
        }
    }
}

// Hop distance to the terminal pit (pits = 1), via memoized path walks.
void topo_distance(const int32_t* down, int64_t P, int64_t* dist) {
    for (int64_t i = 0; i < P; ++i) dist[i] = -1;
    std::vector<int64_t> stack;
    for (int64_t i = 0; i < P; ++i) {
        if (dist[i] != -1) continue;
        int64_t p = i;
        stack.clear();
        while (p >= 0 && dist[p] == -1) {
            stack.push_back(p);
            p = down[p];
        }
        int64_t base = (p < 0) ? 0 : dist[p];
        for (auto it = stack.rbegin(); it != stack.rend(); ++it) {
            dist[*it] = ++base;
        }
    }
}

// Flow accumulation: acc[p] = sum of material over upstream incl. self.
// Processes pixels in decreasing topological distance (headwaters first).
void accuflux(const int32_t* down, const int64_t* order_up_first,
              const double* material, int64_t P, double* acc) {
    std::memcpy(acc, material, P * sizeof(double));
    for (int64_t k = 0; k < P; ++k) {
        int64_t p = order_up_first[k];
        int32_t d = down[p];
        if (d >= 0) acc[d] += acc[p];
    }
}

// Catchment labels: id of the terminal pit (pits numbered 1..Npits in
// compressed order), filled downstream-first.
void catchment_labels(const int32_t* down, const int64_t* order_down_first,
                      int64_t P, int32_t* labels) {
    int32_t next_id = 1;
    for (int64_t i = 0; i < P; ++i) labels[i] = 0;
    for (int64_t i = 0; i < P; ++i) {
        if (down[i] < 0) labels[i] = next_id++;
    }
    for (int64_t k = 0; k < P; ++k) {
        int64_t p = order_down_first[k];
        if (down[p] >= 0) labels[p] = labels[down[p]];
    }
}

// Topological order, outlets first (each pixel after its downstream).
// Counting sort by topological distance (stable in pixel index).
void topo_order_down_first(const int64_t* dist, int64_t P, int64_t* order) {
    int64_t maxd = 0;
    for (int64_t i = 0; i < P; ++i) if (dist[i] > maxd) maxd = dist[i];
    std::vector<int64_t> counts((size_t)maxd + 2, 0);
    for (int64_t i = 0; i < P; ++i) counts[dist[i]]++;
    std::vector<int64_t> offset((size_t)maxd + 2, 0);
    for (int64_t d = 1; d <= maxd; ++d) offset[d] = offset[d - 1] + counts[d - 1];
    for (int64_t i = 0; i < P; ++i) order[offset[dist[i]]++] = i;
}

// Dependency-safe chunk packing (graph/ldd.py build_schedule): pixels in
// decreasing dist order; a pixel joins the open chunk unless one of its
// upstream neighbours is already in it or the chunk is full.
// ups_start/ups_flat: CSR adjacency of upstream neighbours.
// Returns the number of chunks; chunk_of[p] receives each pixel's chunk.
int64_t pack_chunks(const int32_t* down, const int64_t* dist, int64_t P,
                    int64_t chunk_size, int64_t* chunk_of) {
    // order headwaters first: decreasing dist, stable in pixel index
    std::vector<int64_t> order(P);
    {
        int64_t maxd = 0;
        for (int64_t i = 0; i < P; ++i) if (dist[i] > maxd) maxd = dist[i];
        std::vector<int64_t> counts((size_t)maxd + 2, 0);
        for (int64_t i = 0; i < P; ++i) counts[maxd - dist[i]]++;
        std::vector<int64_t> offset((size_t)maxd + 2, 0);
        for (int64_t d = 1; d <= maxd + 1; ++d) offset[d] = offset[d - 1] + counts[d - 1];
        for (int64_t i = 0; i < P; ++i) order[offset[maxd - dist[i]]++] = i;
    }
    // CSR of upstream neighbours
    std::vector<int64_t> ucount(P + 1, 0);
    for (int64_t i = 0; i < P; ++i) if (down[i] >= 0) ucount[down[i] + 1]++;
    for (int64_t i = 0; i < P; ++i) ucount[i + 1] += ucount[i];
    std::vector<int64_t> ups(ucount[P]);
    std::vector<int64_t> cursor(ucount.begin(), ucount.end() - 1);
    for (int64_t i = 0; i < P; ++i)
        if (down[i] >= 0) ups[cursor[down[i]]++] = i;

    int64_t current = 0, fill = 0;
    for (int64_t i = 0; i < P; ++i) chunk_of[i] = -1;
    for (int64_t k = 0; k < P; ++k) {
        int64_t p = order[k];
        bool conflict = false;
        for (int64_t u = ucount[p]; u < ucount[p + 1]; ++u) {
            if (chunk_of[ups[u]] == current) { conflict = true; break; }
        }
        if (conflict || fill >= chunk_size) { ++current; fill = 0; }
        chunk_of[p] = current;
        ++fill;
    }
    return current + 1;
}

}  // extern "C"
