/* Swing/SwingDisconnected/Slide filter kernels — C transcription of
 * swing_slide.py (itself a semantics-parity reimplementation of the
 * reference's src/functional/swing_slide_filter.zig).
 *
 * Bit-exactness contract with the Python path (differential suite in
 * tests/test_native_histogram.py): identical IEEE-754 double ops in the
 * same order, -ffp-contract=off (no fma fusion), no fast-math. The f32
 * error-bound adjustment stays on the Python side; this kernel receives
 * the already-adjusted double bound.
 *
 * Returns bytes written into `out`, or -2 for non-finite input.
 * `variant`: 0 = Swing (zig :60-239), 1 = SwingDisconnected (zig
 * :501-651), 2 = Slide (zig :245-459, Lemma 4.3 hull scan :390-424).
 */

#include <math.h>
#include <stdlib.h>
#include <string.h>

/* ---- minimal incremental hull (duplicated from _histogram_native.c;
 * the two kernels are independent shared objects) ---- */

typedef struct { long t; double v; } Point;
typedef struct { Point *pts; long n, cap; } Chain;

#define TURN_RIGHT 0
#define TURN_LEFT 1
#define TURN_COLLINEAR 2

static int chain_push(Chain *c, Point p) {
    if (c->n + 1 > c->cap) {
        long cap = c->cap ? c->cap * 2 : 16;
        Point *q = (Point *)realloc(c->pts, (size_t)cap * sizeof(Point));
        if (!q) return -1;
        c->pts = q; c->cap = cap;
    }
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

/* ---- line helpers (swing_slide.py:60-83) ---- */

typedef struct { double slope, intercept; } Line;

static Line swing_line(long start_t, double start_v, long end_t, double end_v,
                       double bound) {
    Line l;
    if (end_t != start_t) {
        l.slope = (end_v + bound - start_v) / (double)(end_t - start_t);
        l.intercept = start_v - l.slope * (double)start_t;
    } else {
        l.slope = 0.0;
        l.intercept = start_v;
    }
    return l;
}

static Line slide_line(long start_t, double start_v, long end_t, double end_v,
                       double bound) {
    Line l;
    if (end_t != start_t) {
        l.slope = (end_v + 2 * bound - start_v) / (double)(end_t - start_t);
        l.intercept = start_v - bound - l.slope * (double)start_t;
    } else {
        l.slope = 0.0;
        l.intercept = start_v;
    }
    return l;
}

static double eval_line(Line l, long t) { return l.slope * (double)t + l.intercept; }

static double optimal_swing_slope(double slope_derivate, long segment_size,
                                  double upper_slope, double lower_slope) {
    long ss = segment_size * (segment_size + 1) * (2 * segment_size + 1) / 6;
    double sum_square = (double)ss;
    double s = slope_derivate / sum_square;
    if (s > upper_slope) s = upper_slope;
    if (s < lower_slope) s = lower_slope;
    return s;
}

/* ---- output helpers ---- */

static long put_d(unsigned char *out, long pos, double d) {
    memcpy(out + pos, &d, 8);
    return pos + 8;
}

static long put_q(unsigned char *out, long pos, unsigned long long q) {
    memcpy(out + pos, &q, 8);
    return pos + 8;
}

/* ---- Swing (variant 0) ---- */

static long compress_swing_c(const double *v, long n, double adj,
                             unsigned char *out) {
    if (!isfinite(v[0]) || !isfinite(v[1])) return -2;
    long pos = 0;
    pos = put_d(out, pos, v[0]);
    long start_t = 0, end_t = 1;
    double start_v = v[0], end_v = v[1];
    double slope_derivate = (end_v - start_v) * (double)(end_t - start_t);
    Line ub = swing_line(start_t, start_v, end_t, end_v, adj);
    Line lb = swing_line(start_t, start_v, end_t, end_v, -adj);

    for (long ct = 2; ct < n; ct++) {
        double upper_limit = eval_line(ub, ct);
        double lower_limit = eval_line(lb, ct);
        double value = v[ct];
        if (!isfinite(value)) return -2;
        if (!isfinite(upper_limit + lower_limit)
            || upper_limit < value - adj || lower_limit > value + adj) {
            long segment_size = ct - start_t - 1;
            double rec_value;
            if (segment_size > 1) {
                double slope = optimal_swing_slope(slope_derivate, segment_size,
                                                   ub.slope, lb.slope);
                double intercept = start_v - slope * (double)start_t;
                Line rec = { slope, intercept };
                rec_value = eval_line(rec, ct - 1);
            } else {
                rec_value = end_v;
            }
            pos = put_d(out, pos, rec_value);
            pos = put_q(out, pos, (unsigned long long)ct);
            start_t = ct - 1; start_v = rec_value;
            end_t = ct; end_v = value;
            ub = swing_line(start_t, start_v, end_t, end_v, adj);
            lb = swing_line(start_t, start_v, end_t, end_v, -adj);
            slope_derivate = (end_v - start_v) * (double)(end_t - start_t);
        } else {
            end_t = ct; end_v = value;
            Line new_ub = swing_line(start_t, start_v, end_t, end_v, adj);
            Line new_lb = swing_line(start_t, start_v, end_t, end_v, -adj);
            if (upper_limit > eval_line(new_ub, ct)) ub = new_ub;
            if (lower_limit < eval_line(new_lb, ct)) lb = new_lb;
            slope_derivate += (end_v - start_v) * (double)(end_t - start_t);
        }
    }

    long ct = n;
    long segment_size = ct - start_t - 1;
    if (segment_size > 1) {
        double slope = optimal_swing_slope(slope_derivate, segment_size,
                                           ub.slope, lb.slope);
        double intercept = start_v - slope * (double)start_t;
        Line rec = { slope, intercept };
        pos = put_d(out, pos, eval_line(rec, ct - 1));
    } else {
        pos = put_d(out, pos, end_v);
    }
    pos = put_q(out, pos, (unsigned long long)ct);
    return pos;
}

/* ---- SwingDisconnected (variant 1) ---- */

static long compress_swing_disc_c(const double *v, long n, double adj,
                                  unsigned char *out) {
    if (!isfinite(v[0]) || !isfinite(v[1])) return -2;
    long pos = 0;
    long start_t = 0, end_t = 1;
    double start_v = v[0], end_v = v[1];
    double slope_derivate = (end_v - start_v) * (double)(end_t - start_t);
    Line ub = swing_line(start_t, start_v, end_t, end_v, adj);
    Line lb = swing_line(start_t, start_v, end_t, end_v, -adj);

    long ct = 2;
    while (ct < n) {
        double upper_limit = eval_line(ub, ct);
        double lower_limit = eval_line(lb, ct);
        double value = v[ct];
        if (!isfinite(value)) return -2;
        if (!isfinite(upper_limit + lower_limit)
            || upper_limit < value - adj || lower_limit > value + adj) {
            pos = put_d(out, pos, start_v);
            long segment_size = ct - start_t - 1;
            if (segment_size > 1) {
                double slope = optimal_swing_slope(slope_derivate, segment_size,
                                                   ub.slope, lb.slope);
                double intercept = start_v - slope * (double)start_t;
                Line rec = { slope, intercept };
                pos = put_d(out, pos, eval_line(rec, ct - 1));
            } else {
                pos = put_d(out, pos, end_v);
            }
            pos = put_q(out, pos, (unsigned long long)ct);
            start_t = ct; start_v = value;
            if (ct + 1 < n) {
                double nxt = v[ct + 1];
                if (!isfinite(nxt)) return -2;
                end_t = ct + 1; end_v = nxt;
                ub = swing_line(start_t, start_v, end_t, end_v, adj);
                lb = swing_line(start_t, start_v, end_t, end_v, -adj);
                ct += 1;
                slope_derivate = (end_v - start_v) * (double)(end_t - start_t);
            } else {
                end_t = ct; end_v = value;
            }
        } else {
            end_t = ct; end_v = value;
            Line new_ub = swing_line(start_t, start_v, end_t, end_v, adj);
            Line new_lb = swing_line(start_t, start_v, end_t, end_v, -adj);
            if (upper_limit > eval_line(new_ub, ct)) ub = new_ub;
            if (lower_limit < eval_line(new_lb, ct)) lb = new_lb;
            slope_derivate += (end_v - start_v) * (double)(end_t - start_t);
        }
        ct += 1;
    }

    long segment_size = ct - start_t - 1;
    pos = put_d(out, pos, start_v);
    if (segment_size > 1) {
        double slope = optimal_swing_slope(slope_derivate, segment_size,
                                           ub.slope, lb.slope);
        double intercept = start_v - slope * (double)start_t;
        Line rec = { slope, intercept };
        pos = put_d(out, pos, eval_line(rec, ct - 1));
    } else {
        pos = put_d(out, pos, end_v);
    }
    pos = put_q(out, pos, (unsigned long long)ct);
    return pos;
}

/* ---- Slide (variant 2) ---- */

static void interception_point(Line lb, Line ub, double *it, double *iv) {
    if (lb.slope != ub.slope) {
        double t = (ub.intercept - lb.intercept) / (lb.slope - ub.slope);
        *it = t;
        *iv = lb.slope * t + lb.intercept;
    } else {
        *it = 0.0;
        *iv = lb.intercept;
    }
}

static long compress_slide_c(const double *v, long n, double adj,
                             unsigned char *out, Chain *upper, Chain *lower) {
    if (!isfinite(v[0]) || !isfinite(v[1])) return -2;
    long pos = 0;
    long start_t = 0, end_t = 1;
    double start_v = v[0], end_v = v[1];
    upper->n = 0; lower->n = 0;
    Point p0 = { 0, start_v }, p1 = { 1, end_v };
    if (add_to_chain(upper, TURN_RIGHT, p0) || add_to_chain(lower, TURN_LEFT, p0)) return -1;
    if (add_to_chain(upper, TURN_RIGHT, p1) || add_to_chain(lower, TURN_LEFT, p1)) return -1;
    Line ub = slide_line(start_t, start_v, end_t, end_v, adj);
    Line lb = slide_line(start_t, start_v, end_t, end_v, -adj);

    long ct = 2;
    while (ct < n) {
        double upper_limit = eval_line(ub, ct);
        double lower_limit = eval_line(lb, ct);
        double value = v[ct];
        if (!isfinite(value)) return -2;
        if (!isfinite(upper_limit + lower_limit)
            || upper_limit < value - adj || lower_limit > value + adj) {
            double it, iv;
            interception_point(lb, ub, &it, &iv);
            double slope = (lb.slope + ub.slope) / 2;
            double intercept = iv - slope * it;
            Line rec = { slope, intercept };
            long segment_size = end_t - start_t;
            if (segment_size > 1) {
                pos = put_d(out, pos, eval_line(rec, start_t));
                pos = put_d(out, pos, eval_line(rec, end_t));
            } else {
                pos = put_d(out, pos, start_v);
                pos = put_d(out, pos, end_v);
            }
            pos = put_q(out, pos, (unsigned long long)ct);
            start_t = ct; start_v = value;
            if (ct + 1 < n) {
                double nxt = v[ct + 1];
                if (!isfinite(nxt)) return -2;
                end_t = ct + 1; end_v = nxt;
                ub = slide_line(start_t, start_v, end_t, end_v, adj);
                lb = slide_line(start_t, start_v, end_t, end_v, -adj);
                upper->n = 0; lower->n = 0;
                Point q0 = { start_t, start_v }, q1 = { end_t, end_v };
                if (add_to_chain(upper, TURN_RIGHT, q0) || add_to_chain(lower, TURN_LEFT, q0)) return -1;
                if (add_to_chain(upper, TURN_RIGHT, q1) || add_to_chain(lower, TURN_LEFT, q1)) return -1;
                ct += 1;
            } else {
                end_t = ct; end_v = value;
            }
        } else {
            /* Lemma 4.3 hull scan (zig :390-424): iterate chain[:-1] */
            end_t = ct; end_v = value;
            Point pc = { end_t, end_v };
            if (add_to_chain(upper, TURN_RIGHT, pc) || add_to_chain(lower, TURN_LEFT, pc)) return -1;
            long un = upper->n > 1 ? upper->n - 1 : 0;
            for (long i = 0; i < un; i++) {
                Line new_ub = slide_line(upper->pts[i].t, upper->pts[i].v,
                                         end_t, end_v, adj);
                if (new_ub.slope < ub.slope) ub = new_ub;
            }
            long ln = lower->n > 1 ? lower->n - 1 : 0;
            for (long i = 0; i < ln; i++) {
                Line new_lb = slide_line(lower->pts[i].t, lower->pts[i].v,
                                         end_t, end_v, -adj);
                if (new_lb.slope > lb.slope) lb = new_lb;
            }
        }
        ct += 1;
    }

    long segment_size = ct - start_t - 1;
    if (segment_size > 1) {
        double it, iv;
        interception_point(lb, ub, &it, &iv);
        double slope = (lb.slope + ub.slope) / 2;
        double intercept = iv - slope * it;
        Line rec = { slope, intercept };
        pos = put_d(out, pos, eval_line(rec, start_t));
        pos = put_d(out, pos, eval_line(rec, ct - 1));
    } else {
        pos = put_d(out, pos, start_v);
        pos = put_d(out, pos, end_v);
    }
    pos = put_q(out, pos, (unsigned long long)ct);
    return pos;
}

/* Public entry. out must hold >= 24*n + 16 bytes. */
long tersets_swing(const double *values, long n, double adjusted_bound,
                   int variant, unsigned char *out) {
    if (variant == 0) return compress_swing_c(values, n, adjusted_bound, out);
    if (variant == 1) return compress_swing_disc_c(values, n, adjusted_bound, out);
    Chain upper = {0}, lower = {0};
    long rc = compress_slide_c(values, n, adjusted_bound, out, &upper, &lower);
    free(upper.pts);
    free(lower.pts);
    return rc;
}
