// Convex spherical polygon clipping: batched Sutherland-Hodgman on the unit
// sphere with areas and centroids of the intersections.
//
// Native equivalent of the reference's hot conservative-remap setup path
// (atlas util/ConvexSphericalPolygon.{h,cc} driven by interpolation/method/
// unstructured/ConservativeSphericalPolygonInterpolation.cc): each subject
// polygon is clipped by the great-circle half-spaces of its clipper polygon;
// the spherical excess (van Oosterom-Strackee fan) gives the overlap area and
// the excess-weighted triangle centers give the overlap centroid (needed by
// the second-order scheme).

#include <cmath>
#include <cstdint>

namespace {

constexpr int kCap = 40;         // max vertices of an intersection polygon
constexpr double kEps = 1e-14;   // half-space tolerance (matches numpy path)

struct V3 {
  double x, y, z;
};

inline V3 cross(const V3& a, const V3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline double dot(const V3& a, const V3& b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
inline V3 add(const V3& a, const V3& b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline V3 scale(const V3& a, double s) { return {a.x * s, a.y * s, a.z * s}; }
inline double norm(const V3& a) { return std::sqrt(dot(a, a)); }
inline V3 normalize(const V3& a) {
  double n = norm(a);
  return n > 0.0 ? scale(a, 1.0 / n) : a;
}

inline double triangle_excess(const V3& a, const V3& b, const V3& c) {
  double num = dot(a, cross(b, c));
  double den = 1.0 + dot(a, b) + dot(b, c) + dot(c, a);
  return 2.0 * std::atan2(num, den);
}

// One half-space clip step; returns new vertex count.
int clip_plane(const V3* in, int n, const V3& normal, V3* out) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const V3& vi = in[i];
    const V3& vn = in[(i + 1) % n];
    double di = dot(vi, normal);
    double dn = dot(vn, normal);
    bool in_i = di >= -kEps;
    bool in_n = dn >= -kEps;
    if (in_i && m < kCap) out[m++] = vi;
    if (in_i != in_n && m < kCap) {
      V3 edge_n = cross(vi, vn);
      V3 dr = cross(edge_n, normal);
      if (norm(dr) < 1e-300) continue;  // degenerate subject edge
      V3 d = normalize(dr);
      V3 mid = add(vi, vn);
      double s = dot(d, mid);
      if (s < 0.0) d = scale(d, -1.0);
      out[m++] = d;
    }
  }
  return m;
}

}  // namespace

extern "C" {

// subj: (M, nvs, 3) unit vectors, CCW; subj_count: (M,) valid counts.
// clip: (M, nvc, 3), clip_count: (M,).
// area_out: (M,), centroid_out: (M, 3) — unit centroid of each intersection
// (zero vector when the intersection is empty).
void csp_intersect(const double* subj, const int64_t* subj_count, int64_t nvs,
                   const double* clip, const int64_t* clip_count, int64_t nvc,
                   int64_t M, double* area_out, double* centroid_out) {
  V3 bufA[kCap], bufB[kCap];
  for (int64_t p = 0; p < M; ++p) {
    int n = static_cast<int>(subj_count[p]);
    if (n > kCap) n = kCap;
    const double* sv = subj + p * nvs * 3;
    for (int i = 0; i < n; ++i) bufA[i] = {sv[3 * i], sv[3 * i + 1], sv[3 * i + 2]};
    V3* cur = bufA;
    V3* nxt = bufB;
    int nc = static_cast<int>(clip_count[p]);
    const double* cv = clip + p * nvc * 3;
    for (int k = 0; k < nc && n >= 3; ++k) {
      V3 a = {cv[3 * k], cv[3 * k + 1], cv[3 * k + 2]};
      int k2 = (k + 1) % nc;
      V3 b = {cv[3 * k2], cv[3 * k2 + 1], cv[3 * k2 + 2]};
      V3 raw = cross(a, b);
      // degenerate clip edge (duplicate vertices, e.g. a pole repeated):
      // skip — under -O3/FMA cross(a, a) is not exactly zero, and
      // normalizing that noise would fabricate an arbitrary clip plane
      if (norm(raw) < 1e-12) continue;
      V3 normal = normalize(raw);
      n = clip_plane(cur, n, normal, nxt);
      V3* t = cur;
      cur = nxt;
      nxt = t;
    }
    double area = 0.0;
    V3 cent = {0.0, 0.0, 0.0};
    if (n >= 3) {
      for (int k = 1; k + 1 < n; ++k) {
        double e = triangle_excess(cur[0], cur[k], cur[k + 1]);
        area += e;
        V3 tc = normalize(add(add(cur[0], cur[k]), cur[k + 1]));
        cent = add(cent, scale(tc, e));
      }
    }
    area_out[p] = area;
    if (area > 0.0) {
      cent = normalize(cent);
    } else {
      cent = {0.0, 0.0, 0.0};
    }
    centroid_out[3 * p] = cent.x;
    centroid_out[3 * p + 1] = cent.y;
    centroid_out[3 * p + 2] = cent.z;
  }
}

}  // extern "C"
