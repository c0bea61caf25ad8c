// Row-pair element zipper for structured mesh generation.
//
// Implements the decision rules of the reference generator
// (atlas meshgenerator/detail/StructuredMeshGenerator.cc:464-640, angle=0
// default): a quad is emitted only when both current column positions of the
// two rows are aligned (alpha1 == alpha2 == 0); otherwise a triangle advances
// the row whose opposite cross-distance is smaller. Emission order and node
// winding (N1, S1, S2, N2) match the reference so meshes are element-for-
// element equivalent on one partition.
//
// Exposed as a C ABI for ctypes. kind: 0 = triangle advancing N (N1,S1,N2),
// 1 = triangle advancing S (N1,S1,S2), 2 = quad (N1,S1,S2,N2).

#include <cmath>
#include <cstdint>

extern "C" {

// xN: endN+1 ascending positions of the north row (last = periodic wrap)
// xS: endS+1 positions of the south row
// out_kind: caller-allocated, capacity endN + endS
// returns number of elements, or -1 on rule failure
int64_t zip_rows(const double* xN, int64_t endN, const double* xS, int64_t endS,
                 double max_angle_deg, int64_t* out_kind) {
    int64_t iN = 0, iS = 0, n = 0;
    const double rad = M_PI / 180.0;
    while (!(iN == endN && iS == endS)) {
        const int64_t iN2 = iN + 1 < endN ? iN + 1 : endN;
        const int64_t iS2 = iS + 1 < endS ? iS + 1 : endS;
        const double xN1 = xN[iN] * rad, xN2 = xN[iN2] * rad;
        const double xS1 = xS[iS] * rad, xS2 = xS[iS2] * rad;
        const bool canN = iN != iN2;
        const bool canS = iS != iS2;

        int kind = -1;
        const double dxN = std::fabs(xN2 - xN1);
        const double dxS = std::fabs(xS2 - xS1);
        const double dx = dxN < dxS ? dxN : dxS;
        const double alpha1 = dx == 0.0 ? 0.0 : std::atan2(xN1 - xS1, dx) / rad;
        const double alpha2 = dx == 0.0 ? 0.0 : std::atan2(xN2 - xS2, dx) / rad;
        if (std::fabs(alpha1) <= max_angle_deg && std::fabs(alpha2) <= max_angle_deg) {
            if (!canN) {
                kind = 1;
            } else if (!canS) {
                kind = 0;
            } else {
                kind = 2;
            }
        } else {
            const double dN1S2 = std::fabs(xN1 - xS2);
            const double dS1N2 = std::fabs(xS1 - xN2);
            if (dN1S2 <= dS1N2 && canS) {
                kind = 1;
            } else if (dN1S2 >= dS1N2 && canN) {
                kind = 0;
            } else if (!canN) {
                kind = 1;
            } else if (!canS) {
                kind = 0;
            } else {
                return -1;
            }
        }
        // final overrides (reference :622-633)
        if (!canN) kind = 1;
        if (!canS) kind = 0;

        out_kind[n++] = kind;
        if (kind != 1) iN = iN2;
        if (kind != 0) iS = iS2;
    }
    return n;
}

}  // extern "C"
