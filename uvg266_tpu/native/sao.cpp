// SAO native kernels: per-CTU statistics accumulation and offset apply.
//
// The host-side twins live in control/sao.py (_frame_sao_stats /
// sao_apply_frame); behavior mirrors the reference's SAO search and
// reconstruction (sao.c uvg_calc_sao_* / uvg_sao_reconstruct_frame).
// These are the per-pixel passes; the RD offset decisions stay in
// (vectorized) Python.

#include <cstdint>
#include <cstring>

namespace {

// edge offset class sample pairs: {a, b} offsets as (dx, dy)
static const int EO[4][2][2] = {
    {{-1, 0}, {1, 0}},    // class 0: horizontal neighbors
    {{0, -1}, {0, 1}},    // class 1: vertical
    {{-1, -1}, {1, 1}},   // class 2: 135 diagonal
    {{1, -1}, {-1, 1}},   // class 3: 45 diagonal
};
static const int EO_IDX_TO_CAT[5] = {1, 2, 0, 3, 4};

inline int sign3(int v) { return (v > 0) - (v < 0); }

}  // namespace

extern "C" {

// Accumulate per-CTU SAO statistics for one plane.
// edge_cnt/edge_sum layout: [4][n_ctu][5]; band_cnt/band_sum: [n_ctu][32].
void rc_sao_stats(const int32_t* src, const int32_t* rec, int W, int H,
                  int lcu, int wl, int n_ctu, int bitdepth,
                  int64_t* edge_cnt, int64_t* edge_sum,
                  int64_t* band_cnt, int64_t* band_sum) {
    const int bshift = bitdepth - 5;
    for (int y = 0; y < H; ++y) {
        const int cy = y / lcu;
        const int32_t* rrow = rec + (size_t)y * W;
        const int32_t* srow = src + (size_t)y * W;
        for (int x = 0; x < W; ++x) {
            const int ctu = cy * wl + x / lcu;
            const int d = srow[x] - rrow[x];
            const int c = rrow[x];
            const int band = c >> bshift;
            band_cnt[(size_t)ctu * 32 + band] += 1;
            band_sum[(size_t)ctu * 32 + band] += d;
            const bool x_in = x > 0 && x < W - 1;
            const bool y_in = y > 0 && y < H - 1;
            for (int ec = 0; ec < 4; ++ec) {
                int cat = 0;
                const bool ok = (ec == 0) ? x_in
                              : (ec == 1) ? y_in
                              : (x_in && y_in);
                if (ok) {
                    const int a = rec[(size_t)(y + EO[ec][0][1]) * W
                                      + x + EO[ec][0][0]];
                    const int b = rec[(size_t)(y + EO[ec][1][1]) * W
                                      + x + EO[ec][1][0]];
                    cat = EO_IDX_TO_CAT[2 + sign3(c - a) + sign3(c - b)];
                }
                const size_t base = (size_t)ec * n_ctu * 5
                                  + (size_t)ctu * 5 + cat;
                edge_cnt[base] += 1;
                edge_sum[base] += d;
            }
        }
    }
}

// Apply SAO offsets in place for one plane.
// types/eo_class: [n_ctu]; band_pos: [n_ctu]; offsets: [n_ctu][5]
// (category-indexed: offsets[1..4] edge cats or 4 band offsets at
// band_pos..+3 packed into [1..4]).
void rc_sao_apply(int32_t* plane, const int32_t* pre, int W, int H,
                  int lcu, int wl, int bitdepth,
                  const int32_t* types, const int32_t* eo_class,
                  const int32_t* band_pos, const int32_t* offsets,
                  const int32_t* tbx, int n_tbx,
                  const int32_t* tby, int n_tby) {
    const int maxv = (1 << bitdepth) - 1;
    const int bshift = bitdepth - 5;
    // with loop_filter_across_tiles disabled, a sample whose edge-offset
    // neighbor lies across a tile boundary is left unfiltered (same rule
    // as the picture border); tbx/tby list interior boundary coordinates
    // in THIS plane's units
    auto at_b = [](int v, const int32_t* lst, int n) {
        for (int i = 0; i < n; ++i)
            if (lst[i] == v) return true;
        return false;
    };
    for (int y = 0; y < H; ++y) {
        const int cy = y / lcu;
        const int32_t* prow = pre + (size_t)y * W;
        const bool yb = at_b(y, tby, n_tby) || at_b(y + 1, tby, n_tby);
        for (int x = 0; x < W; ++x) {
            const int ctu = cy * wl + x / lcu;
            const int t = types[ctu];
            if (t == 0) continue;
            const int c = prow[x];
            int v = c;
            if (t == 1) {                       // band
                const int band = c >> bshift;
                const int k = band - band_pos[ctu];
                if (k >= 0 && k < 4)
                    v = c + offsets[(size_t)ctu * 5 + 1 + k];
            } else {                            // edge
                const int ec = eo_class[ctu];
                const bool xb = n_tbx &&
                    (at_b(x, tbx, n_tbx) || at_b(x + 1, tbx, n_tbx));
                const bool ok = (ec == 0) ? (x > 0 && x < W - 1 && !xb)
                              : (ec == 1) ? (y > 0 && y < H - 1 && !yb)
                              : (x > 0 && x < W - 1 && y > 0 && y < H - 1
                                 && !xb && !yb);
                if (ok) {
                    const int a = pre[(size_t)(y + EO[ec][0][1]) * W
                                      + x + EO[ec][0][0]];
                    const int b = pre[(size_t)(y + EO[ec][1][1]) * W
                                      + x + EO[ec][1][0]];
                    const int cat =
                        EO_IDX_TO_CAT[2 + sign3(c - a) + sign3(c - b)];
                    if (cat)
                        v = c + offsets[(size_t)ctu * 5 + cat];
                }
            }
            if (v < 0) v = 0;
            if (v > maxv) v = maxv;
            plane[(size_t)y * W + x] = v;
        }
    }
}

}  // extern "C"
