// ref_engine: a from-scratch, dependency-free C implementation of the
// hector_slam reference numerics, used as the fast bit-faithful oracle for
// trajectory-level golden tests of the TPU engine (and as the native
// verification harness of this framework).
//
// This is NOT a copy of the reference sources: the reference is an
// Eigen/template/class library (hector_slam_lib headers); this file is a
// flat array-based C core that re-implements the *formulas* cited below
// with the same float32 operation order, so its outputs are bit-comparable
// to the original serial C++ on the same inputs.
//
// Formula citations (file:line into /root/reference/hector_mapping/
// include/hector_slam_lib/):
//   transforms .......... map/GridMapBase.h:265-280
//   bounds (dims-2) ..... map/MapDimensionProperties.h:65-73
//   interp + gradients .. map/OccGridMapUtil.h:287-347
//   JtJ/JtR accumulation  map/OccGridMapUtil.h:64-104
//   GN step ............. matcher/ScanMatcher.h:194-226
//   match loop (+1 iter)  matcher/ScanMatcher.h:54-190
//   log-odds update ..... map/GridMapLogOdds.h:135-167
//   Bresenham rays ...... map/OccGridMapBase.h:121-260
//   pyramid chain ....... slam_main/MapRepMultiMap.h:44-147
//   processor + gate .... slam_main/HectorSlamProcessor.h:52-139,
//                         util/UtilFunctions.h:37-92
//
// Build: g++ -O2 -ffp-contract=off -shared -fPIC (see build.sh). FMA
// contraction is disabled so multiply-add rounding matches plain x86-64
// SSE float arithmetic (what the reference builds to by default).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <cfloat>

namespace {

struct RefMap {
  float* lo;       // log-odds, row-major [h*w], index y*w + x
  int* ui;         // per-cell update index, init -1
  int w, h;
  float s;         // scaleToMap = 1.0f / cellLength
  float tx, ty;    // mapTworld translation = s * topLeftOffset
  float inv_s;     // worldTmap linear = s * (1/(s*s))  (Eigen 2x2 inverse)
  float itx, ity;  // worldTmap translation = -inv_s * t
  int curr_update_index;
  float lo_free, lo_occ;
};

inline float world_to_map_x(const RefMap& m, float wx) { return wx * m.s + m.tx; }
inline float world_to_map_y(const RefMap& m, float wy) { return wy * m.s + m.ty; }
inline float map_to_world_x(const RefMap& m, float mx) { return mx * m.inv_s + m.itx; }
inline float map_to_world_y(const RefMap& m, float my) { return my * m.inv_s + m.ity; }

void map_init(RefMap& m, int w, int h, float cell_length,
              float off_x, float off_y, float lo_free, float lo_occ) {
  m.w = w; m.h = h;
  m.lo = (float*)calloc((size_t)w * h, sizeof(float));
  m.ui = (int*)malloc((size_t)w * h * sizeof(int));
  for (long i = 0; i < (long)w * h; ++i) m.ui[i] = -1;
  m.s = 1.0f / cell_length;
  m.tx = m.s * off_x;
  m.ty = m.s * off_y;
  float inv_det = 1.0f / (m.s * m.s);
  m.inv_s = m.s * inv_det;
  m.itx = -(m.inv_s * m.tx);
  m.ity = -(m.inv_s * m.ty);
  m.curr_update_index = 0;
  m.lo_free = lo_free; m.lo_occ = lo_occ;
}

void map_free(RefMap& m) { free(m.lo); free(m.ui); }

inline float cell_prob(const RefMap& m, long idx) {
  // GridMapLogOdds.h:163-167 — unqualified C++ exp(float) promotes to
  // double; the ratio is computed in float
  float odds = (float)exp((double)m.lo[idx]);
  return odds / (odds + 1.0f);
}

// interpMapValueWithDerivatives (OccGridMapUtil.h:287-347)
inline void interp_derivs(const RefMap& m, float cx, float cy,
                          float out[3]) {
  // bounds: coords > size-2 rejected (MapDimensionProperties.h:65-73)
  if (cx < 0.0f || cx > (float)(m.w) - 2.0f ||
      cy < 0.0f || cy > (float)(m.h) - 2.0f) {
    out[0] = out[1] = out[2] = 0.0f;
    return;
  }
  int xi = (int)cx;   // truncation == floor for in-bounds coords
  int yi = (int)cy;
  float fx = cx - (float)xi;
  float fy = cy - (float)yi;
  long idx = (long)yi * m.w + xi;
  float p00 = cell_prob(m, idx);
  float p10 = cell_prob(m, idx + 1);
  float p01 = cell_prob(m, idx + m.w);
  float p11 = cell_prob(m, idx + m.w + 1);
  float dx1 = p00 - p10, dx2 = p01 - p11;
  float dy1 = p00 - p01, dy2 = p10 - p11;
  float xfi = 1.0f - fx, yfi = 1.0f - fy;
  out[0] = ((p00 * xfi + p10 * fx) * yfi) + ((p01 * xfi + p11 * fx) * fy);
  // quirk gradients (OccGridMapUtil.h:344-345)
  out[1] = -((dx1 * xfi) + (dx2 * fx));
  out[2] = -((dy1 * yfi) + (dy2 * fy));
}

// getCompleteHessianDerivs (OccGridMapUtil.h:64-104); pose in map coords
void hessian_derivs(const RefMap& m, const float pose[3],
                    const float* pts, int n, float H[9], float dTr[3]) {
  // the affine transform uses Rotation2D<float>'s sinf/cosf while the
  // rotDeriv terms use double sin/cos truncated to float — keep both
  float mc = cosf(pose[2]), ms = sinf(pose[2]);
  float cosRot = (float)cos((double)pose[2]);
  float sinRot = (float)sin((double)pose[2]);
  for (int k = 0; k < 9; ++k) H[k] = 0.0f;
  dTr[0] = dTr[1] = dTr[2] = 0.0f;
  for (int i = 0; i < n; ++i) {
    float px = pts[2 * i], py = pts[2 * i + 1];
    // Eigen applies an affine as linear*p + translation with the
    // translation folded into the second product's sum:
    // x' = m00*px + (m01*py + t) — verified bitwise vs the compiled
    // reference (refbuild/), NOT (m00*px + m01*py) + t
    float txp = mc * px + ((-ms) * py + pose[0]);
    float typ = ms * px + (mc * py + pose[1]);
    float ipd[3];
    interp_derivs(m, txp, typ, ipd);
    float fun_val = 1.0f - ipd[0];
    dTr[0] += ipd[1] * fun_val;
    dTr[1] += ipd[2] * fun_val;
    float rot_deriv = ((-sinRot * px - cosRot * py) * ipd[1] +
                       (cosRot * px - sinRot * py) * ipd[2]);
    dTr[2] += rot_deriv * fun_val;
    H[0] += ipd[1] * ipd[1];        // H(0,0)
    H[4] += ipd[2] * ipd[2];        // H(1,1)
    H[8] += rot_deriv * rot_deriv;  // H(2,2)
    H[1] += ipd[1] * ipd[2];        // H(0,1)
    H[2] += ipd[1] * rot_deriv;     // H(0,2)
    H[5] += ipd[2] * rot_deriv;     // H(1,2)
  }
  H[3] = H[1]; H[6] = H[2]; H[7] = H[5];
}

// 3x3 inverse*vector in f32, matching Eigen Matrix3f::inverse()'s exact
// rounding (Eigen/src/LU/InverseImpl.h compute_inverse<.,.,3>): each
// inverse ENTRY is rounded as cofactor*invdet BEFORE the matvec — not
// (cofactor-matvec)*invdet — verified bitwise vs the compiled reference
// (refbuild/). cofactor_3x3<i,j> = m(i1,j1)*m(i2,j2) - m(i1,j2)*m(i2,j1)
// with i1=(i+1)%3 etc.; inverse(r,c) = cofactor<c,r>*invdet;
// det = cof00*m00 + (cof10*m10 + cof20*m20) (right-assoc).
void solve3(const float H[9], const float b[3], float x[3]) {
#define COF(i, j)                                                       \
  (H[3 * (((i) + 1) % 3) + (((j) + 1) % 3)] *                           \
       H[3 * (((i) + 2) % 3) + (((j) + 2) % 3)] -                       \
   H[3 * (((i) + 1) % 3) + (((j) + 2) % 3)] *                           \
       H[3 * (((i) + 2) % 3) + (((j) + 1) % 3)])
  float c00 = COF(0, 0), c10 = COF(1, 0), c20 = COF(2, 0);
  // Eigen's 3-element redux is RIGHT-associated: p0 + (p1 + p2)
  float det = c00 * H[0] + (c10 * H[3] + c20 * H[6]);
  float invdet = 1.0f / det;
  float inv[9];
  inv[0] = c00 * invdet;
  inv[1] = c10 * invdet;
  inv[2] = c20 * invdet;
  inv[3] = COF(0, 1) * invdet;
  inv[4] = COF(1, 1) * invdet;
  inv[5] = COF(2, 1) * invdet;
  inv[6] = COF(0, 2) * invdet;
  inv[7] = COF(1, 2) * invdet;
  inv[8] = COF(2, 2) * invdet;
#undef COF
  // Eigen's Matrix3f*Vector3f contracts RIGHT-associated:
  // p0 + (p1 + p2) (verified bitwise vs the compiled reference)
  x[0] = inv[0] * b[0] + (inv[1] * b[1] + inv[2] * b[2]);
  x[1] = inv[3] * b[0] + (inv[4] * b[1] + inv[5] * b[2]);
  x[2] = inv[6] * b[0] + (inv[7] * b[1] + inv[8] * b[2]);
}

// estimateTransformationLogLh (ScanMatcher.h:194-226)
void gn_step(const RefMap& m, float est[3], const float* pts, int n,
             float H[9]) {
  float dTr[3];
  hessian_derivs(m, est, pts, n, H, dTr);
  if (H[0] != 0.0f && H[4] != 0.0f) {
    float dir[3];
    solve3(H, dTr, dir);
    if (dir[2] > 0.2f) dir[2] = 0.2f;
    else if (dir[2] < -0.2f) dir[2] = -0.2f;
    est[0] += dir[0]; est[1] += dir[1]; est[2] += dir[2];
  }
}

inline float normalize_angle(float a) {
  // util/UtilFunctions.h:37-49: 2.0f*M_PI is a DOUBLE expression, so the
  // whole fmod chain runs in double and rounds to float once at the
  // normalize_angle_pos return; the > M_PI compare and final subtraction
  // are double too (verified bitwise vs the compiled reference,
  // refbuild/)
  double two_pi = 2.0f * M_PI;
  float r = (float)fmod(fmod((double)a, two_pi) + two_pi, two_pi);
  if ((double)r > M_PI) r = (float)((double)r - two_pi);
  return r;
}

// ScanMatcher::matchData (ScanMatcher.h:54-190)
void match_data(const RefMap& m, const float begin_world[3],
                const float* pts, int n, int max_iterations,
                float out_world[3], float H[9]) {
  if (n == 0) {
    out_world[0] = begin_world[0];
    out_world[1] = begin_world[1];
    out_world[2] = begin_world[2];
    // covMatrix untouched in the reference when size==0
    return;
  }
  float est[3] = {world_to_map_x(m, begin_world[0]),
                  world_to_map_y(m, begin_world[1]), begin_world[2]};
  for (int it = 0; it < max_iterations + 1; ++it)  // +1: ScanMatcher.h:74,94
    gn_step(m, est, pts, n, H);
  est[2] = normalize_angle(est[2]);
  out_world[0] = map_to_world_x(m, est[0]);
  out_world[1] = map_to_world_y(m, est[1]);
  out_world[2] = est[2];
}

inline int sign_ref(int v) { return v > 0 ? 1 : -1; }  // sign(0) == -1

inline void cell_free(RefMap& m, long off, int mark_free) {
  if (m.ui[off] < mark_free) {
    m.lo[off] += m.lo_free;
    m.ui[off] = mark_free;
  }
}

inline void cell_occ(RefMap& m, long off, int mark_free, int mark_occ) {
  if (m.ui[off] < mark_occ) {
    if (m.ui[off] == mark_free) m.lo[off] -= m.lo_free;
    if (m.lo[off] < 50.0f) m.lo[off] += m.lo_occ;
    m.ui[off] = mark_occ;
  }
}

// updateByScan + updateLineBresenhami + bresenham2D
// (OccGridMapBase.h:121-260)
void update_by_scan(RefMap& m, const float* pts, int n,
                    const float origo[2], const float pose_world[3]) {
  int mark_free = m.curr_update_index + 1;
  int mark_occ = m.curr_update_index + 2;
  float pm[3] = {world_to_map_x(m, pose_world[0]),
                 world_to_map_y(m, pose_world[1]), pose_world[2]};
  float c = cosf(pm[2]), s = sinf(pm[2]);
  // Eigen affine order: m00*px + (m01*py + t), see hessian_derivs
  float ox = c * origo[0] + ((-s) * origo[1] + pm[0]);
  float oy = s * origo[0] + (c * origo[1] + pm[1]);
  int bx = (int)(ox + 0.5f);
  int by = (int)(oy + 0.5f);
  for (int i = 0; i < n; ++i) {
    float px = pts[2 * i], py = pts[2 * i + 1];
    float exf = c * px + ((-s) * py + pm[0]);
    float eyf = s * px + (c * py + pm[1]);
    int ex = (int)(exf + 0.5f);
    int ey = (int)(eyf + 0.5f);
    if (bx == ex && by == ey) continue;
    if (bx < 0 || bx >= m.w || by < 0 || by >= m.h) continue;
    if (ex < 0 || ex >= m.w || ey < 0 || ey >= m.h) continue;
    int dx = ex - bx, dy = ey - by;
    unsigned abs_dx = (unsigned)abs(dx), abs_dy = (unsigned)abs(dy);
    int off_dx = sign_ref(dx);
    int off_dy = sign_ref(dy) * m.w;
    long offset = (long)by * m.w + bx;
    unsigned abs_da, abs_db; int off_a, off_b;
    if (abs_dx >= abs_dy) { abs_da = abs_dx; abs_db = abs_dy; off_a = off_dx; off_b = off_dy; }
    else                  { abs_da = abs_dy; abs_db = abs_dx; off_a = off_dy; off_b = off_dx; }
    int err = (int)(abs_da / 2);
    cell_free(m, offset, mark_free);
    for (unsigned j = 0; j + 1 < abs_da; ++j) {
      offset += off_a;
      err += (int)abs_db;
      if ((unsigned)err >= abs_da) { offset += off_b; err -= (int)abs_da; }
      cell_free(m, offset, mark_free);
    }
    cell_occ(m, (long)ey * m.w + ex, mark_free, mark_occ);
  }
  m.curr_update_index += 3;
}

inline float fsqr(float v) { return v * v; }

// util/UtilFunctions.h:73-92
bool pose_diff_larger(const float p1[3], const float p2[3],
                      float dist_thresh, float angle_thresh) {
  float dx = p1[0] - p2[0], dy = p1[1] - p2[1];
  if (sqrtf(fsqr(dx) + fsqr(dy)) > dist_thresh) return true;
  float ad = p1[2] - p2[2];
  if (ad > (float)M_PI) ad -= (float)(M_PI * 2.0);
  else if (ad < (float)-M_PI) ad += (float)(M_PI * 2.0);
  return fabsf(ad) > angle_thresh;
}

float prob_to_log_odds(float p) {
  float odds = p / (1.0f - p);
  return (float)log((double)odds);
}

}  // namespace

extern "C" {

// One-shot kernels for unit cross-checks ------------------------------------

void hs_ref_interp(const float* log_odds, int w, int h,
                   const float* coords, int n, float* out /* [n,3] */) {
  RefMap m; map_init(m, w, h, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f);
  memcpy(m.lo, log_odds, (size_t)w * h * sizeof(float));
  for (int i = 0; i < n; ++i)
    interp_derivs(m, coords[2 * i], coords[2 * i + 1], out + 3 * i);
  map_free(m);
}

void hs_ref_hessian(const float* log_odds, int w, int h,
                    const float pose_map[3], const float* pts, int n,
                    float H[9], float dTr[3]) {
  RefMap m; map_init(m, w, h, 1.0f, 0.0f, 0.0f, 0.0f, 0.0f);
  memcpy(m.lo, log_odds, (size_t)w * h * sizeof(float));
  hessian_derivs(m, pose_map, pts, n, H, dTr);
  map_free(m);
}

// Full sequential SLAM over a scan log --------------------------------------
// points: [T, N, 2] in map-scale units of the finest level; mask: [T, N];
// pose_hints: optional [T,3] (NULL -> chain last pose); known_poses != 0
// bypasses matching (map_without_matching mode).
void hs_ref_run(const float* points, const unsigned char* mask,
                const float* origo, int T, int N,
                float resolution, int size_x, int size_y, int levels,
                float start_frac_x, float start_frac_y,
                float free_factor, float occ_factor,
                float dist_thresh, float angle_thresh,
                const float* pose_hints, int known_poses,
                float* out_poses /* [T,3] */, float* out_H /* [T,9] */,
                unsigned char* out_updated /* [T] */,
                float* out_log_odds_l0 /* [size_y*size_x] or NULL */) {
  float lo_free = prob_to_log_odds(free_factor);
  float lo_occ = prob_to_log_odds(occ_factor);
  // MapRepMultiMap ctor (MapRepMultiMap.h:49-72)
  float total_x = resolution * (float)size_x;
  float total_y = resolution * (float)size_y;
  float off_x = total_x * start_frac_x;
  float off_y = total_y * start_frac_y;
  RefMap* maps = new RefMap[levels];
  {
    float res = resolution; int sx = size_x, sy = size_y;
    for (int l = 0; l < levels; ++l) {
      map_init(maps[l], sx, sy, res, off_x, off_y, lo_free, lo_occ);
      sx /= 2; sy /= 2; res *= 2.0f;
    }
  }
  float* scaled = (float*)malloc((size_t)N * 2 * sizeof(float));
  float last_pose[3] = {0.0f, 0.0f, 0.0f};
  float last_update_pose[3] = {FLT_MAX, FLT_MAX, FLT_MAX};

  for (int t = 0; t < T; ++t) {
    // compact the masked scan (the reference containers hold only valid
    // beams)
    int n = 0;
    for (int i = 0; i < N; ++i) {
      if (mask[(long)t * N + i]) {
        scaled[2 * n] = points[((long)t * N + i) * 2];
        scaled[2 * n + 1] = points[((long)t * N + i) * 2 + 1];
        ++n;
      }
    }
    float hint[3];
    if (pose_hints) { hint[0] = pose_hints[3*t]; hint[1] = pose_hints[3*t+1]; hint[2] = pose_hints[3*t+2]; }
    else { hint[0] = last_pose[0]; hint[1] = last_pose[1]; hint[2] = last_pose[2]; }

    float pose[3] = {hint[0], hint[1], hint[2]};
    float H[9] = {0};
    if (!known_poses) {
      // coarse->fine chain (MapRepMultiMap.h:116-132). Keep one compacted
      // buffer per level scale like DataContainer::setFrom.
      for (int l = levels - 1; l >= 0; --l) {
        int iters = (l == 0) ? 5 : 3;
        if (l == 0) {
          match_data(maps[0], pose, scaled, n, iters, pose, H);
        } else {
          float factor = (float)(1.0 / pow(2.0, (double)l));
          float* lp = (float*)malloc((size_t)n * 2 * sizeof(float));
          for (int i = 0; i < 2 * n; ++i) lp[i] = scaled[i] * factor;
          match_data(maps[l], pose, lp, n, iters, pose, H);
          free(lp);
        }
      }
    }
    last_pose[0] = pose[0]; last_pose[1] = pose[1]; last_pose[2] = pose[2];

    bool do_update = pose_diff_larger(pose, last_update_pose, dist_thresh,
                                      angle_thresh) || known_poses;
    if (do_update) {
      for (int l = 0; l < levels; ++l) {
        if (l == 0) {
          update_by_scan(maps[0], scaled, n, origo, pose);
        } else {
          float factor = (float)(1.0 / pow(2.0, (double)l));
          float* lp = (float*)malloc((size_t)n * 2 * sizeof(float));
          for (int i = 0; i < 2 * n; ++i) lp[i] = scaled[i] * factor;
          float lorigo[2] = {origo[0] * factor, origo[1] * factor};
          update_by_scan(maps[l], lp, n, lorigo, pose);
          free(lp);
        }
      }
      last_update_pose[0] = pose[0]; last_update_pose[1] = pose[1];
      last_update_pose[2] = pose[2];
    }
    out_poses[3 * t] = pose[0]; out_poses[3 * t + 1] = pose[1];
    out_poses[3 * t + 2] = pose[2];
    memcpy(out_H + 9 * t, H, 9 * sizeof(float));
    out_updated[t] = do_update ? 1 : 0;
  }
  if (out_log_odds_l0)
    memcpy(out_log_odds_l0, maps[0].lo,
           (size_t)size_x * size_y * sizeof(float));
  free(scaled);
  for (int l = 0; l < levels; ++l) map_free(maps[l]);
  delete[] maps;
}

}  // extern "C"
