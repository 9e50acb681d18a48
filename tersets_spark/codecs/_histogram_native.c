/* Min-Merge histogram kernel (PWCH/PWLH fast path) — C transcription of
 * histogram.py + _geometry.py + _heap.py, which are themselves semantics-
 * parity reimplementations of the reference's
 * src/functional/histogram_compression.zig, src/utilities/convex_hull.zig
 * and src/utilities/hashed_priority_queue.zig.
 *
 * Bit-exactness contract with the Python path (enforced by
 * tests/test_native_histogram.py differential suite):
 *  - all double arithmetic is the same IEEE-754 ops in the same order;
 *    compiled with -ffp-contract=off and no fast-math so no fma fusion;
 *  - trig (atan2/cos/sin/tan) comes from the same libm CPython's math
 *    module calls;
 *  - the f80 max-error accumulation uses x86 long double, the same type
 *    as np.longdouble on this platform;
 *  - every reference quirk is preserved: floatMin(f64) max-init in the
 *    MABR fold, the heap's no-resift-on-equal-index update, sentinel
 *    renames (max_buckets+10, 1e16), and tangent merges that mutate the
 *    first hull.
 */

#include <math.h>
#include <float.h>
#include <stdlib.h>
#include <string.h>

#ifdef __AVX2__
#include <immintrin.h>
#endif

/* ------------------------------------------------------------------ */
/* geometry                                                           */
/* ------------------------------------------------------------------ */

typedef struct { long t; double v; } Point;

typedef struct {
    Point *pts;
    long n, cap;
} Chain;

typedef struct {
    Chain lower, upper;
} Hull;

#define TURN_RIGHT 0
#define TURN_LEFT 1
#define TURN_COLLINEAR 2

static int chain_reserve(Chain *c, long need) {
    if (need <= c->cap) return 0;
    long cap = c->cap ? c->cap * 2 : 8;
    while (cap < need) cap *= 2;
    Point *p = (Point *)realloc(c->pts, (size_t)cap * sizeof(Point));
    if (!p) return -1;
    c->pts = p; c->cap = cap;
    return 0;
}

static int chain_push(Chain *c, Point p) {
    if (chain_reserve(c, c->n + 1)) return -1;
    c->pts[c->n++] = p;
    return 0;
}

static int compute_turn(Point first, Point middle, Point last) {
    double cross = (middle.v - first.v) * (double)(last.t - middle.t)
                 - (last.v - middle.v) * (double)(middle.t - first.t);
    if (cross == 0.0) return TURN_COLLINEAR;
    return cross > 0.0 ? TURN_RIGHT : TURN_LEFT;
}

static int add_to_chain(Chain *c, int turn, Point p) {
    if (c->n < 2) return chain_push(c, p);
    long top = c->n - 1;
    while (top > 0 && compute_turn(c->pts[top - 1], c->pts[top], p) != turn) {
        c->n--; top--;
    }
    return chain_push(c, p);
}

static int hull_add(Hull *h, Point p) {
    if (add_to_chain(&h->upper, TURN_RIGHT, p)) return -1;
    if (add_to_chain(&h->lower, TURN_LEFT, p)) return -1;
    return 0;
}

static long hull_len(const Hull *h) {
    long total = h->lower.n + h->upper.n;
    if (total == 0) return 0;
    if (total == 2) return 1;
    return total - 2;
}

static Point hull_at0(const Hull *h) { return h->lower.pts[0]; }

/* time-ordered merge of the chains, endpoints once (all_points_sorted) */
static long hull_sorted(const Hull *h, Point *out) {
    long li = 0, ui = 1, k = 0;
    const Chain *lo = &h->lower, *up = &h->upper;
    while (li < lo->n && ui < up->n - 1) {
        if (lo->pts[li].t <= up->pts[ui].t) out[k++] = lo->pts[li++];
        else out[k++] = up->pts[ui++];
    }
    while (li < lo->n) out[k++] = lo->pts[li++];
    while (ui < up->n - 1) out[k++] = up->pts[ui++];
    return k;
}

/* combined at(0..n-1) order: lower chain, then upper interior */
static long hull_combined(const Hull *h, Point *out) {
    long k = 0;
    if (h->lower.n + h->upper.n <= 2) {
        if (h->lower.n > 0) out[k++] = h->lower.pts[0];
        return k;
    }
    for (long i = 0; i < h->lower.n; i++) out[k++] = h->lower.pts[i];
    for (long i = 1; i < h->upper.n - 1; i++) out[k++] = h->upper.pts[i];
    return k;
}

/* outer tangent; pops violators from hull_one (mutates!) */
static long find_tangent(Chain *one, const Chain *two, int upper) {
    int violation = upper ? TURN_LEFT : TURN_RIGHT;
    long one_idx = one->n - 1;
    long two_idx = 0;
    for (;;) {
        if (two_idx != two->n - 1) {
            int turn = compute_turn(one->pts[one_idx], two->pts[two_idx],
                                    two->pts[two_idx + 1]);
            if (turn == violation) { two_idx++; continue; }
        }
        if (one_idx != 0) {
            int turn = compute_turn(one->pts[one_idx - 1], one->pts[one_idx],
                                    two->pts[two_idx]);
            if (turn == violation) { one_idx--; one->n--; continue; }
        }
        break;
    }
    return two_idx;
}

/* merge `other` into `target` (the merged==None / in-place path, and the
 * merged-scratch path after the caller chain-copies self into target) */
static int hull_merge_into(Hull *target, const Hull *other, Point *scratch) {
    if (hull_len(other) == 1) return hull_add(target, hull_at0(other));
    if (hull_len(target) == 1) {
        long n = hull_sorted(other, scratch);
        for (long i = 0; i < n; i++)
            if (hull_add(target, scratch[i])) return -1;
        return 0;
    }
    long up2 = find_tangent(&target->upper, &other->upper, 1);
    long lo2 = find_tangent(&target->lower, &other->lower, 0);
    for (long i = up2; i < other->upper.n; i++)
        if (chain_push(&target->upper, other->upper.pts[i])) return -1;
    for (long i = lo2; i < other->lower.n; i++)
        if (chain_push(&target->lower, other->lower.pts[i])) return -1;
    return 0;
}

static int hull_copy(Hull *dst, const Hull *src) {
    if (chain_reserve(&dst->lower, src->lower.n)) return -1;
    if (chain_reserve(&dst->upper, src->upper.n)) return -1;
    memcpy(dst->lower.pts, src->lower.pts, (size_t)src->lower.n * sizeof(Point));
    memcpy(dst->upper.pts, src->upper.pts, (size_t)src->upper.n * sizeof(Point));
    dst->lower.n = src->lower.n;
    dst->upper.n = src->upper.n;
    return 0;
}

/* Exact per-edge MABR evaluation — the reference's inner block verbatim
 * (zig :107-192): same IEEE ops in the same order, including the
 * DBL_MIN (std.math.floatMin(f64)) max-init quirk. */
static double mabr_edge_exact(const Point *points, long n, long i,
                              double *out_angle, double *out_min_x,
                              double *out_max_x, double *out_min_y,
                              double *out_max_y) {
    Point first = points[i];
    Point second = points[(i + 1) % n];
    double angle = atan2(second.v - first.v, (double)(second.t - first.t));
    double cos_a = cos(-angle);
    double sin_a = sin(-angle);
    double min_x = DBL_MAX, max_x = DBL_MIN, min_y = DBL_MAX, max_y = DBL_MIN;
    for (long j = 0; j < n; j++) {
        double rx = (double)points[j].t * cos_a - points[j].v * sin_a;
        double ry = (double)points[j].t * sin_a + points[j].v * cos_a;
        if (rx < min_x) min_x = rx;
        if (rx > max_x) max_x = rx;
        if (ry < min_y) min_y = ry;
        if (ry > max_y) max_y = ry;
    }
    *out_angle = angle;
    *out_min_x = min_x; *out_max_x = max_x;
    *out_min_y = min_y; *out_max_y = max_y;
    return (max_x - min_x) * (max_y - min_y);
}

/* Exact edge evaluation over the SoA cycle arrays (same point SET as
 * the combined order, so every min/max VALUE matches mabr_edge_exact
 * bitwise — including the reference's DBL_MIN max-init quirk, which
 * seeds the lanes).  Per-element arithmetic is the same mul/sub/add
 * sequence; only the fold order differs. */
static double mabr_edge_exact_soa(const double *ct, const double *cv, long n,
                                  Point first, Point second,
                                  double *out_angle, double *out_min_x,
                                  double *out_max_x, double *out_min_y,
                                  double *out_max_y) {
    double angle = atan2(second.v - first.v, (double)(second.t - first.t));
    double cos_a = cos(-angle);
    double sin_a = sin(-angle);
    double min_x = DBL_MAX, max_x = DBL_MIN, min_y = DBL_MAX, max_y = DBL_MIN;
    long j = 0;
#ifdef __AVX2__
    if (n >= 8) {
        __m256d vca = _mm256_set1_pd(cos_a), vsa = _mm256_set1_pd(sin_a);
        __m256d vminx = _mm256_set1_pd(DBL_MAX), vmaxx = _mm256_set1_pd(DBL_MIN);
        __m256d vminy = vminx, vmaxy = vmaxx;
        for (; j + 4 <= n; j += 4) {
            __m256d t = _mm256_loadu_pd(ct + j);
            __m256d v = _mm256_loadu_pd(cv + j);
            __m256d rx = _mm256_sub_pd(_mm256_mul_pd(t, vca), _mm256_mul_pd(v, vsa));
            __m256d ry = _mm256_add_pd(_mm256_mul_pd(t, vsa), _mm256_mul_pd(v, vca));
            vminx = _mm256_min_pd(vminx, rx); vmaxx = _mm256_max_pd(vmaxx, rx);
            vminy = _mm256_min_pd(vminy, ry); vmaxy = _mm256_max_pd(vmaxy, ry);
        }
        double lane[4];
        _mm256_storeu_pd(lane, vminx);
        for (int k = 0; k < 4; k++) if (lane[k] < min_x) min_x = lane[k];
        _mm256_storeu_pd(lane, vmaxx);
        for (int k = 0; k < 4; k++) if (lane[k] > max_x) max_x = lane[k];
        _mm256_storeu_pd(lane, vminy);
        for (int k = 0; k < 4; k++) if (lane[k] < min_y) min_y = lane[k];
        _mm256_storeu_pd(lane, vmaxy);
        for (int k = 0; k < 4; k++) if (lane[k] > max_y) max_y = lane[k];
    }
#endif
    for (; j < n; j++) {
        double rx = ct[j] * cos_a - cv[j] * sin_a;
        double ry = ct[j] * sin_a + cv[j] * cos_a;
        if (rx < min_x) min_x = rx;
        if (rx > max_x) max_x = rx;
        if (ry < min_y) min_y = ry;
        if (ry > max_y) max_y = ry;
    }
    *out_angle = angle;
    *out_min_x = min_x; *out_max_x = max_x;
    *out_min_y = min_y; *out_max_y = max_y;
    return (max_x - min_x) * (max_y - min_y);
}

/* running-min improvement block — identical ops to the reference's branch */
static void mabr_improve(double area, double angle, double min_x, double max_x,
                         double min_y, double max_y, double *min_area,
                         double *min_slope, double *min_intercept) {
    if (area < *min_area) {
        *min_area = area;
        *min_slope = tan(angle);
        double center_x = (min_x + max_x) / 2.0;
        double center_y = (min_y + max_y) / 2.0;
        double cos_b = cos(angle);
        double sin_b = sin(angle);
        double back_x = center_x * cos_b - center_y * sin_b;
        double back_y = center_x * sin_b + center_y * cos_b;
        *min_intercept = back_y - *min_slope * back_x;
    }
}

/* ------------------------------------------------------------------ */
/* Fast MABR: candidate-pruned exact evaluation.                      */
/*                                                                    */
/* The reference scans every "edge" (consecutive pair in combined     */
/* order) and for each rotates ALL hull points — O(p^2) with 3 trig   */
/* calls per edge.  This path computes, per edge, a conservative      */
/* [lo, hi] interval around the exact computed area using trig-free   */
/* support-function extremes (rx*len = dot(p, e), ry*len = cross(e,p))*/
/* then exactly evaluates ONLY the edges whose interval can contain   */
/* the global minimum.  The winner's floats come from the exact scan, */
/* so the result is bit-identical to the full scan:                   */
/*   - every edge e has exact_area(e) in [lo_e, hi_e]: a relative     */
/*     3e-14 budget covers the dot/cross value rounding, and an       */
/*     ABSOLUTE 64*eps*R*(wx+wy) term covers the trig-vs-true-        */
/*     rotation discrepancy, which is unbounded RELATIVE to the area  */
/*     when the thin rectangle side collapses (ang_err comment below);*/
/*   - hence the first edge attaining the global min is always a      */
/*     candidate, and iterating candidates in combined order with     */
/*     the same strict-< rule picks exactly that edge.                */
/*                                                                    */
/* Support extremes come from one fused exact pass per unique edge    */
/* direction (proj_extremes): 4 running extremes over the vertex set, */
/* branch-predictable and ILP-friendly.  Tolerance-guarded cycle      */
/* walks were tried first but lattice token data produces long near-  */
/* flat plateaus (~21 visited vertices per walk, measured), making    */
/* the straight scan both faster and slack-free.                      */
/* ------------------------------------------------------------------ */

static int g_mabr_force_exact = 0;

/* Differential-test hook: force the O(p^2) full scan. */
void tersets_histogram_set_mabr_exact(int flag) { g_mabr_force_exact = flag; }

static _Thread_local double *g_ct = NULL; /* cycle-ordered t (SoA: walk */
static _Thread_local double *g_cv = NULL; /* steps avoid cyc[] indirection) */
static _Thread_local long g_cs_cap = 0;
static _Thread_local double *g_lo = NULL;
static _Thread_local long g_lo_cap = 0;
static _Thread_local unsigned long long *g_dirh = NULL; /* open-address set */
static _Thread_local unsigned long long *g_dirgen = NULL; /* slot gen stamp */
static _Thread_local unsigned long long g_dirgen_cur = 0;
static _Thread_local long g_dirh_cap = 0;

static int mabr_scratch_reserve(long n) {
    if (n > g_lo_cap) {
        long cap = g_lo_cap ? g_lo_cap : 64;
        while (cap < n) cap *= 2;
        double *p = (double *)realloc(g_lo, (size_t)cap * sizeof(double));
        if (!p) return -1;
        g_lo = p; g_lo_cap = cap;
    }
    if (n > g_cs_cap) {
        long cap = g_cs_cap ? g_cs_cap : 64;
        while (cap < n) cap *= 2;
        double *pt = (double *)realloc(g_ct, (size_t)cap * sizeof(double));
        if (!pt) return -1;
        g_ct = pt;
        double *pv = (double *)realloc(g_cv, (size_t)cap * sizeof(double));
        if (!pv) return -1;
        g_cv = pv;
        g_cs_cap = cap;
    }
    long want = 64;
    while (want < 4 * n) want *= 2; /* load factor <= 0.5 */
    if (want > g_dirh_cap) {
        unsigned long long *p = (unsigned long long *)realloc(
            g_dirh, (size_t)want * 2 * sizeof(unsigned long long));
        if (!p) return -1;
        unsigned long long *g = (unsigned long long *)realloc(
            g_dirgen, (size_t)want * sizeof(unsigned long long));
        if (!g) { g_dirh = p; return -1; }
        /* growth resets every stamp; the per-call gen bump below keeps
         * stale cells invisible without touching them */
        memset(g, 0, (size_t)want * sizeof(unsigned long long));
        g_dirh = p; g_dirgen = g; g_dirh_cap = want;
        g_dirgen_cur = 0;
    }
    return 0;
}

/* Exact-direction dedup: edges with bitwise-identical (ex, ey) produce
 * bitwise-identical angle -> cos/sin -> extremes -> area, so under the
 * strict-< running min only the FIRST occurrence can ever win.  Returns
 * 1 if (ex, ey) was already seen in this call, else records it and
 * returns 0.  A slot belongs to the current call iff its generation
 * stamp matches g_dirgen_cur — bumping the stamp empties the whole
 * table in O(1), so no per-call memset (dedup decisions are exact
 * bitwise matches either way; table size only affects collisions). */

static int dir_seen(double ex, double ey, long mask) {
    unsigned long long bx, by;
    memcpy(&bx, &ex, 8);
    memcpy(&by, &ey, 8);
    unsigned long long key = (bx * 0x9E3779B97F4A7C15ULL) ^
                             (by + 0x165667B19E3779F9ULL);
    key ^= key >> 29; key *= 0xBF58476D1CE4E5B9ULL; key ^= key >> 32;
    unsigned long long probe = key & (unsigned long long)mask;
    for (;;) {
        unsigned long long *cell = &g_dirh[probe * 2];
        if (g_dirgen[probe] != g_dirgen_cur) {
            g_dirgen[probe] = g_dirgen_cur;
            cell[0] = bx; cell[1] = by;
            return 0;
        }
        if (cell[0] == bx && cell[1] == by) return 1;
        probe = (probe + 1) & (unsigned long long)mask;
    }
}

/* Exact support extremes of the projections d = ex*t + ey*v and
 * c = -ey*t + ex*v over the vertex set, one fused pass.  Replaces the
 * old tolerance-guarded cycle walks: on lattice token data the walks
 * traversed ~21 near-flat plateau vertices per call (measured), so a
 * straight-line scan with 4 independent running extremes is both
 * cheaper (ILP, no data-dependent branches) and tighter (no walk
 * slack).  Reordering a max/min fold only affects which of several
 * bitwise-tied extremes is kept — the returned VALUE is order-
 * independent, and these extremes only feed the conservative candidate
 * interval, never the winner's floats, so bit-identity of the final
 * MABR line is untouched. */
static void proj_extremes(const double *ct, const double *cv, long n,
                          double ex, double ey, double *dmax, double *dmin,
                          double *cmax, double *cmin) {
    double dM = -DBL_MAX, dm = DBL_MAX, cM = -DBL_MAX, cm = DBL_MAX;
    long j = 0;
#ifdef __AVX2__
    /* Exact SIMD: explicit mul/add (no FMA contraction) and maxpd/minpd
     * over finite lanes round identically to the scalar loop; only the
     * fold ORDER differs, which cannot change a max/min VALUE. */
    if (n >= 8) {
        __m256d vex = _mm256_set1_pd(ex), vey = _mm256_set1_pd(ey);
        __m256d vdM = _mm256_set1_pd(-DBL_MAX), vdm = _mm256_set1_pd(DBL_MAX);
        __m256d vcM = vdM, vcm = vdm;
        for (; j + 4 <= n; j += 4) {
            __m256d t = _mm256_loadu_pd(ct + j);
            __m256d v = _mm256_loadu_pd(cv + j);
            __m256d d = _mm256_add_pd(_mm256_mul_pd(vex, t), _mm256_mul_pd(vey, v));
            __m256d c = _mm256_sub_pd(_mm256_mul_pd(vex, v), _mm256_mul_pd(vey, t));
            vdM = _mm256_max_pd(vdM, d); vdm = _mm256_min_pd(vdm, d);
            vcM = _mm256_max_pd(vcM, c); vcm = _mm256_min_pd(vcm, c);
        }
        double lane[4];
        _mm256_storeu_pd(lane, vdM);
        for (int k = 0; k < 4; k++) if (lane[k] > dM) dM = lane[k];
        _mm256_storeu_pd(lane, vdm);
        for (int k = 0; k < 4; k++) if (lane[k] < dm) dm = lane[k];
        _mm256_storeu_pd(lane, vcM);
        for (int k = 0; k < 4; k++) if (lane[k] > cM) cM = lane[k];
        _mm256_storeu_pd(lane, vcm);
        for (int k = 0; k < 4; k++) if (lane[k] < cm) cm = lane[k];
    }
#endif
    for (; j < n; j++) {
        double t = ct[j], v = cv[j];
        double d = ex * t + ey * v;
        double c = ex * v - ey * t;
        if (d > dM) dM = d;
        if (d < dm) dm = d;
        if (c > cM) cM = c;
        if (c < cm) cm = c;
    }
    *dmax = dM; *dmin = dm; *cmax = cM; *cmin = cm;
}

/* MABR bisector line over `points[0..n-1]` in combined order, with
 * `n_lower` = length of the lower-chain prefix (<= 0 when unknown:
 * falls back to the full scan). Output is bit-identical to the full
 * scan in all modes. */
static int mabr_line(const Point *points, long n, long n_lower,
                     double *out_slope, double *out_intercept) {
    if (n == 1) { *out_slope = 0.0; *out_intercept = points[0].v; return 0; }
    if (n == 2) {
        double delta_time = (double)(points[1].t - points[0].t);
        double slope = (points[1].v - points[0].v) / delta_time;
        *out_slope = slope;
        *out_intercept = points[0].v - slope * (double)points[0].t;
        return 0;
    }
    double min_area = DBL_MAX, min_slope = 0.0, min_intercept = 0.0;
    double angle, min_x, max_x, min_y, max_y;

    if (g_mabr_force_exact || n <= 4 || n_lower < 2 || n_lower > n) {
        for (long i = 0; i < n; i++) {
            double area = mabr_edge_exact(points, n, i, &angle, &min_x, &max_x,
                                          &min_y, &max_y);
            mabr_improve(area, angle, min_x, max_x, min_y, max_y, &min_area,
                         &min_slope, &min_intercept);
        }
        *out_slope = min_slope;
        *out_intercept = min_intercept;
        return 0;
    }

    if (mabr_scratch_reserve(n)) return -1;
    /* convex cycle: lower chain L->R, then upper interior R->L; the
     * magnitude fold is order-independent (max of |.| over the same
     * set), so it fuses with the SoA build bit-identically */
    double t_mag = 0.0, v_mag = 0.0;
    for (long i = 0; i < n; i++) {
        const Point p = points[i < n_lower ? i : n - 1 - (i - n_lower)];
        double t = (double)p.t;
        g_ct[i] = t;
        g_cv[i] = p.v;
        double at = fabs(t), av = fabs(p.v);
        if (at > t_mag) t_mag = at;
        if (av > v_mag) v_mag = av;
    }

    long hmask = g_dirh_cap - 1;
    g_dirgen_cur++;

    double min_hi = DBL_MAX;
    unsigned long long prev_bx = 0, prev_by = 0;
    int have_prev = 0;
    for (long i = 0; i < n; i++) {
        Point first = points[i];
        Point second = points[(i + 1) % n];
        double ex = (double)(second.t - first.t);
        double ey = second.v - first.v;
        /* collinear plateau runs repeat the SAME direction on consecutive
         * edges — catch those with a register compare before hashing */
        unsigned long long bx, by;
        memcpy(&bx, &ex, 8);
        memcpy(&by, &ey, 8);
        if (have_prev && bx == prev_bx && by == prev_by) {
            g_lo[i] = DBL_MAX;
            continue;
        }
        prev_bx = bx; prev_by = by; have_prev = 1;
        if (dir_seen(ex, ey, hmask)) {
            /* bitwise-identical direction as an earlier edge: identical
             * exact area, can never strictly improve -> not a candidate */
            g_lo[i] = DBL_MAX;
            continue;
        }
        double len = sqrt(ex * ex + ey * ey);
        double mag_d = fabs(ex) * t_mag + fabs(ey) * v_mag;
        double mag_c = fabs(ey) * t_mag + fabs(ex) * v_mag;
        double dmax, dmin, cmax, cmin;
        proj_extremes(g_ct, g_cv, n, ex, ey, &dmax, &dmin, &cmax, &cmin);
        double err_d = 3e-14 * mag_d + 1e-300;
        double err_c = 3e-14 * mag_c + 1e-300;
        double quirk = DBL_MIN * len; /* len * max-init quirk, dot domain */
        double sx_hi = fmax(dmax + err_d, quirk) - (dmin - err_d);
        double sx_lo = fmax(dmax - err_d, quirk) - (dmin + err_d);
        double sy_hi = fmax(cmax + err_c, quirk) - (cmin - err_c);
        double sy_lo = fmax(cmax - err_c, quirk) - (cmin + err_c);
        if (sx_lo < 0.0) sx_lo = 0.0;
        if (sy_lo < 0.0) sy_lo = 0.0;
        /* The interval must contain the TRIG-computed area (that's what
         * mabr_edge_exact compares), not just the true dot/cross area.
         * The trig path rotates by atan2->cos/sin: the effective rotation
         * direction is off by up to a few ulps of the ANGLE, perturbing
         * each rotated coordinate by up to ~|p| * eps and each rectangle
         * WIDTH by twice that, so the trig area deviates from the true
         * area by up to ~C * eps * R * (wx + wy) ABSOLUTE — which is
         * unbounded RELATIVE to the area as the thin side collapses
         * (found by hypothesis: [0,0,1,0,999999990,1,0], where the trig
         * area sits 8 above the true area and a 3e-14-relative interval
         * pruned the true winner). C = 64 covers atan2 (<=1 ulp of a
         * value <= pi), correctly-rounded cos/sin, and the two
         * mul/sub roundings per coordinate, with >4x margin. */
        double wx_hi = sx_hi / len, wy_hi = sy_hi / len;
        double ang_err = 64.0 * DBL_EPSILON * (t_mag + v_mag) * (wx_hi + wy_hi)
                         + 1e-300;
        double hi = wx_hi * wy_hi * (1.0 + 1e-12) + ang_err;
        double lo = (sx_lo / len) * (sy_lo / len) * (1.0 - 1e-12) - ang_err;
        if (lo < 0.0) lo = 0.0;
        g_lo[i] = lo;
        if (hi < min_hi) min_hi = hi;
    }

    for (long i = 0; i < n; i++) {
        if (g_lo[i] > min_hi) continue;
        double area = mabr_edge_exact_soa(g_ct, g_cv, n, points[i],
                                          points[(i + 1) % n], &angle, &min_x,
                                          &max_x, &min_y, &max_y);
        mabr_improve(area, angle, min_x, max_x, min_y, max_y, &min_area,
                     &min_slope, &min_intercept);
    }
    *out_slope = min_slope;
    *out_intercept = min_intercept;
    return 0;
}

/* f80 L-inf error of the line over the points (zig :254-280) */
static double max_error_f80(const Point *points, long n, double slope,
                            double intercept) {
    long double slope_ld = (long double)slope;
    long double intercept_ld = (long double)intercept;
    long double max_error = 0.0L;
    for (long i = 0; i < n; i++) {
        long double predicted = slope_ld * (long double)points[i].t + intercept_ld;
        long double current = fabsl(predicted - (long double)points[i].v);
        if (current > max_error) max_error = current;
    }
    return (double)max_error;
}

/* ------------------------------------------------------------------ */
/* hashed heap (mirror of _heap.py / hashed_priority_queue.zig)       */
/* ------------------------------------------------------------------ */

typedef struct { long index; double merge_error; } MergeError;

typedef struct {
    MergeError *items;
    long n, cap;
    long *pos_of_key;   /* direct-address map: key -> position, -1 absent */
    long key_cap;
} Heap;

static int me_compare(MergeError a, MergeError b) {
    if (a.index == b.index) return 0;
    if (a.merge_error > b.merge_error) return 1;
    if (a.merge_error < b.merge_error) return -1;
    return 0;
}

static void heap_sift_up(Heap *h, long start) {
    MergeError child = h->items[start];
    long child_index = start;
    while (child_index > 0) {
        long parent_index = (child_index - 1) >> 1;
        MergeError parent = h->items[parent_index];
        if (me_compare(child, parent) >= 0) break;
        h->items[child_index] = parent;
        h->pos_of_key[parent.index] = child_index;
        child_index = parent_index;
    }
    h->items[child_index] = child;
    h->pos_of_key[child.index] = child_index;
}

static void heap_sift_down(Heap *h, long start) {
    long n = h->n;
    MergeError target = h->items[start];
    long index = start;
    for (;;) {
        long lesser = (index * 2) | 1;
        if (lesser >= n) break;
        long nxt = lesser + 1;
        if (nxt < n && me_compare(h->items[nxt], h->items[lesser]) < 0) lesser = nxt;
        if (me_compare(target, h->items[lesser]) < 0) break;
        h->items[index] = h->items[lesser];
        h->pos_of_key[h->items[index].index] = index;
        index = lesser;
    }
    h->items[index] = target;
    h->pos_of_key[target.index] = index;
}

static int heap_add(Heap *h, MergeError e) {
    if (h->n + 1 > h->cap) {
        long cap = h->cap ? h->cap * 2 : 16;
        MergeError *it = (MergeError *)realloc(h->items, (size_t)cap * sizeof(MergeError));
        if (!it) return -1;
        h->items = it; h->cap = cap;
    }
    h->items[h->n] = e;
    h->pos_of_key[e.index] = h->n;
    h->n++;
    heap_sift_up(h, h->n - 1);
    return 0;
}

/* remove_index(0) — pop */
static MergeError heap_pop(Heap *h) {
    MergeError item = h->items[0];
    MergeError last = h->items[--h->n];
    if (0 < h->n) {
        h->items[0] = last;
        heap_sift_down(h, 0);
    }
    /* index_map.pop(key(item)) AFTER the sift, unconditionally — mirroring
     * _heap.py (dict.pop even clobbers a same-key sentinel the sift just
     * re-placed, exactly like the reference's HashMap) */
    h->pos_of_key[item.index] = -1;
    return item;
}

/* update(old identified by key old.index) -> new */
static int heap_update(Heap *h, MergeError old_key, MergeError new_elem) {
    long pos = h->pos_of_key[old_key.index];
    if (pos < 0) return -1;
    MergeError old_elem = h->items[pos];
    h->pos_of_key[old_key.index] = -1;
    h->pos_of_key[new_elem.index] = pos;
    h->items[pos] = new_elem;
    int order = me_compare(new_elem, old_elem);
    if (order < 0) heap_sift_up(h, pos);
    else if (order > 0) heap_sift_down(h, pos);
    return 0;
}

/* ------------------------------------------------------------------ */
/* histogram                                                          */
/* ------------------------------------------------------------------ */

typedef struct {
    long begin, end;
    double min_val, max_val;
    Hull hull;
} Bucket;

typedef struct {
    int approximation;     /* 0 constant, 1 linear */
    long max_buckets;
    Bucket *buckets;
    long n_buckets;
    Heap queue;
    Hull scratch;          /* merged-hull scratch for merge errors */
    Point *pbuf;           /* combined/sorted point scratch */
    long pbuf_cap;
} Histogram;

static int pbuf_reserve(Histogram *hg, long need) {
    if (need <= hg->pbuf_cap) return 0;
    long cap = hg->pbuf_cap ? hg->pbuf_cap * 2 : 64;
    while (cap < need) cap *= 2;
    Point *p = (Point *)realloc(hg->pbuf, (size_t)cap * sizeof(Point));
    if (!p) return -1;
    hg->pbuf = p; hg->pbuf_cap = cap;
    return 0;
}

static double merge_error(Histogram *hg, long index, int *err) {
    Bucket *one = &hg->buckets[index];
    Bucket *two = &hg->buckets[index + 1];
    if (hg->approximation == 0) {
        double mx = one->max_val > two->max_val ? one->max_val : two->max_val;
        double mn = one->min_val < two->min_val ? one->min_val : two->min_val;
        return (mx - mn) / 2.0;
    }
    /* merged = copy(one.hull); merged.merge(two.hull) */
    hg->scratch.lower.n = 0;
    hg->scratch.upper.n = 0;
    if (hull_copy(&hg->scratch, &one->hull)) { *err = 1; return 0.0; }
    if (pbuf_reserve(hg, two->hull.lower.n + two->hull.upper.n + 4)) { *err = 1; return 0.0; }
    if (hull_merge_into(&hg->scratch, &two->hull, hg->pbuf)) { *err = 1; return 0.0; }
    long total = hg->scratch.lower.n + hg->scratch.upper.n;
    if (pbuf_reserve(hg, total + 4)) { *err = 1; return 0.0; }
    long n = hull_combined(&hg->scratch, hg->pbuf);
    double slope, intercept;
    if (mabr_line(hg->pbuf, n, hg->scratch.lower.n, &slope, &intercept)) {
        *err = 1; return 0.0;
    }
    return max_error_f80(hg->pbuf, n, slope, intercept);
}

static int update_all_index(Histogram *hg, long from) {
    for (long i = from; i < hg->n_buckets; i++) {
        long pos = hg->queue.pos_of_key[i];
        if (pos < 0) return -1;
        MergeError old = hg->queue.items[pos];
        MergeError nw;
        if (i == from) {
            nw.index = hg->max_buckets + 10;  /* logical removal sentinel */
            nw.merge_error = 1e16;
        } else {
            nw.index = old.index - 1;
            nw.merge_error = old.merge_error;
        }
        if (heap_update(&hg->queue, old, nw)) return -1;
    }
    return 0;
}

static int min_merge(Histogram *hg) {
    int err = 0;
    MergeError mm = heap_pop(&hg->queue);
    long index = mm.index;
    Bucket *one = &hg->buckets[index];
    Bucket *two = &hg->buckets[index + 1];
    one->end = two->end;
    if (two->min_val < one->min_val) one->min_val = two->min_val;
    if (two->max_val > one->max_val) one->max_val = two->max_val;
    if (hg->approximation == 1) {
        if (pbuf_reserve(hg, two->hull.lower.n + two->hull.upper.n + 4)) return -1;
        if (hull_merge_into(&one->hull, &two->hull, hg->pbuf)) return -1;
    }
    /* del buckets[index+1] */
    free(two->hull.lower.pts);
    free(two->hull.upper.pts);
    memmove(&hg->buckets[index + 1], &hg->buckets[index + 2],
            (size_t)(hg->n_buckets - index - 2) * sizeof(Bucket));
    hg->n_buckets--;

    if (index < hg->n_buckets - 1) {
        MergeError e = { index, merge_error(hg, index, &err) };
        if (err) return -1;
        if (heap_add(&hg->queue, e)) return -1;
        if (index > 0) {
            MergeError oldk = { index - 1, -1.0 };
            MergeError nw = { index - 1, merge_error(hg, index - 1, &err) };
            if (err) return -1;
            if (heap_update(&hg->queue, oldk, nw)) return -1;
        }
        if (update_all_index(hg, index + 1)) return -1;
    }
    return 0;
}

static int hist_insert(Histogram *hg, long index, double value) {
    int err = 0;
    Bucket *b = &hg->buckets[hg->n_buckets];
    memset(b, 0, sizeof(Bucket));
    b->begin = b->end = index;
    b->min_val = b->max_val = value;
    Point p = { index, value };
    if (hull_add(&b->hull, p)) return -1;
    hg->n_buckets++;
    if (hg->n_buckets > 1) {
        long last = hg->n_buckets - 1;
        MergeError e = { last - 1, merge_error(hg, last - 1, &err) };
        if (err) return -1;
        if (heap_add(&hg->queue, e)) return -1;
    }
    if (hg->n_buckets > hg->max_buckets) {
        if (min_merge(hg)) return -1;
    }
    return 0;
}

/* Public entry: returns bucket count >= 0 on success,
 * -1 = allocation/internal failure, -2 = non-finite input.
 * out arrays must hold max_buckets entries each; slope/intercept are
 * filled for the LINEAR variant (MABR of each final bucket hull). */
long tersets_histogram(const double *values, long n, long max_buckets,
                       int approximation, long *out_begin, long *out_end,
                       double *out_min, double *out_max, double *out_slope,
                       double *out_intercept) {
    Histogram hg;
    memset(&hg, 0, sizeof(hg));
    hg.approximation = approximation;
    hg.max_buckets = max_buckets;
    hg.buckets = (Bucket *)calloc((size_t)(max_buckets + 2), sizeof(Bucket));
    hg.queue.pos_of_key = (long *)malloc((size_t)(max_buckets + 16) * sizeof(long));
    long rc = -1;
    if (!hg.buckets || !hg.queue.pos_of_key) goto done;
    for (long i = 0; i < max_buckets + 16; i++) hg.queue.pos_of_key[i] = -1;

    for (long i = 0; i < n; i++) {
        if (!isfinite(values[i])) { rc = -2; goto done; }
        if (hist_insert(&hg, i, values[i])) goto done;
    }

    for (long i = 0; i < hg.n_buckets; i++) {
        Bucket *b = &hg.buckets[i];
        out_begin[i] = b->begin;
        out_end[i] = b->end;
        out_min[i] = b->min_val;
        out_max[i] = b->max_val;
        if (approximation == 1) {
            long total = b->hull.lower.n + b->hull.upper.n;
            if (pbuf_reserve(&hg, total + 4)) goto done;
            long np = hull_combined(&b->hull, hg.pbuf);
            if (mabr_line(hg.pbuf, np, b->hull.lower.n, &out_slope[i],
                          &out_intercept[i])) goto done;
        } else {
            out_slope[i] = 0.0;
            out_intercept[i] = 0.0;
        }
    }
    rc = hg.n_buckets;

done:
    for (long i = 0; i < hg.n_buckets; i++) {
        free(hg.buckets[i].hull.lower.pts);
        free(hg.buckets[i].hull.upper.pts);
    }
    free(hg.buckets);
    free(hg.queue.items);
    free(hg.queue.pos_of_key);
    free(hg.scratch.lower.pts);
    free(hg.scratch.upper.pts);
    free(hg.pbuf);
    return rc;
}
