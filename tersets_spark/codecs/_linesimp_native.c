/* Visvalingam-Whyatt / SlidingWindow / BottomUp / ABC kernels — C
 * transcription of line_simplification.py and abc_linear.py (themselves
 * semantics-parity reimplementations of the reference's
 * src/line_simplification/ and src/functional/abc_linear_compression.zig).
 *
 * Bit-exactness contract with the Python paths (differential suite in
 * tests/test_native_linesimp.py): identical IEEE-754 double ops in the
 * same order, -ffp-contract=off, libm sqrt, f80 (x86 long double) hull
 * max-error for ABC, and the hashed-heap mechanics of _heap.py preserved
 * verbatim (no-resift on comparator-equal updates, sift tie behavior,
 * pop's late map erase). The f32 error-bound conversions stay in Python.
 */

#include <math.h>
#include <stdlib.h>
#include <string.h>

static long put_d(unsigned char *out, long pos, double d) {
    memcpy(out + pos, &d, 8);
    return pos + 8;
}

static long put_q(unsigned char *out, long pos, unsigned long long q) {
    memcpy(out + pos, &q, 8);
    return pos + 8;
}

/* ---- sequential-sum RMSE (sliding_window.zig :142-160) ---- */

static double rmse(const double *v, long seg_start, long seg_end) {
    double seg_len = (double)(seg_end - seg_start + 1);
    if (seg_len <= 1) return 0.0;
    double v_start = v[seg_start];
    double slope = (v[seg_end] - v_start) / (seg_len - 1);
    double intercept = v_start - slope * (double)seg_start;
    double sse = 0.0;
    for (long i = seg_start; i <= seg_end; i++) {
        double diff = v[i] - (slope * (double)i + intercept);
        sse += diff * diff;
    }
    return sqrt(sse / seg_len);
}

/* ================= SlidingWindow ================= */

static long sliding_window_c(const double *v, long n, double eb,
                             unsigned char *out) {
    long pos = 0;
    long seg_start = 0;
    while (seg_start < n - 1) {
        long seg_end = seg_start + 2;
        while (seg_end < n && rmse(v, seg_start, seg_end) < eb) seg_end++;
        pos = put_d(out, pos, v[seg_start]);
        pos = put_q(out, pos, (unsigned long long)(seg_end - 1));
        pos = put_d(out, pos, v[seg_end - 1]);
        seg_start = seg_end;
    }
    if (seg_start == n - 1) {
        pos = put_d(out, pos, v[seg_start]);
        pos = put_q(out, pos, (unsigned long long)seg_start);
        pos = put_d(out, pos, v[seg_start]);
    }
    return pos;
}

/* ================= Visvalingam-Whyatt ================= */

typedef struct { long index; double area; long left_point, right_point; } PA;

typedef struct {
    PA *items;
    long n;
    long *pos_of_key; /* point index -> heap position, -1 absent */
} VWHeap;

static int pa_cmp(PA a, PA b) {
    if (a.area == b.area) return 0;
    return a.area > b.area ? 1 : -1;
}

static void vw_sift_up(VWHeap *h, long start) {
    PA child = h->items[start];
    long ci = start;
    while (ci > 0) {
        long pi = (ci - 1) >> 1;
        PA parent = h->items[pi];
        if (pa_cmp(child, parent) >= 0) break;
        h->items[ci] = parent;
        h->pos_of_key[parent.index] = ci;
        ci = pi;
    }
    h->items[ci] = child;
    h->pos_of_key[child.index] = ci;
}

static void vw_sift_down(VWHeap *h, long start) {
    long n = h->n;
    PA target = h->items[start];
    long index = start;
    for (;;) {
        long lesser = (index * 2) | 1;
        if (lesser >= n) break;
        long nxt = lesser + 1;
        if (nxt < n && pa_cmp(h->items[nxt], h->items[lesser]) < 0) lesser = nxt;
        if (pa_cmp(target, h->items[lesser]) < 0) break;
        h->items[index] = h->items[lesser];
        h->pos_of_key[h->items[index].index] = index;
        index = lesser;
    }
    h->items[index] = target;
    h->pos_of_key[target.index] = index;
}

static void vw_add(VWHeap *h, PA e) {
    h->items[h->n] = e;
    h->pos_of_key[e.index] = h->n;
    h->n++;
    vw_sift_up(h, h->n - 1);
}

static PA vw_pop(VWHeap *h) {
    PA item = h->items[0];
    PA last = h->items[--h->n];
    if (0 < h->n) {
        h->items[0] = last;
        vw_sift_down(h, 0);
    }
    h->pos_of_key[item.index] = -1;
    return item;
}

static void vw_update(VWHeap *h, PA nw) {
    long pos = h->pos_of_key[nw.index];
    PA old = h->items[pos];
    h->pos_of_key[nw.index] = pos; /* same key: erase+put is a no-op */
    h->items[pos] = nw;
    int order = pa_cmp(nw, old);
    if (order < 0) vw_sift_up(h, pos);
    else if (order > 0) vw_sift_down(h, pos);
}

static double triangle_area(double x1, double y1, double x2, double y2,
                            double x3, double y3) {
    return fabs((x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2)) / 2.0);
}

static int pa_index_cmp(const void *a, const void *b) {
    long ia = ((const PA *)a)->index, ib = ((const PA *)b)->index;
    return (ia > ib) - (ia < ib);
}

static long vw_c(const double *v, long n, double eb, unsigned char *out) {
    /* n >= 3 here; n <= 2 handled in Python */
    VWHeap h;
    h.items = (PA *)malloc((size_t)n * sizeof(PA));
    h.pos_of_key = (long *)malloc((size_t)n * sizeof(long));
    if (!h.items || !h.pos_of_key) { free(h.items); free(h.pos_of_key); return -1; }
    h.n = 0;
    for (long i = 0; i < n; i++) h.pos_of_key[i] = -1;

    PA e0 = { 0, INFINITY, 0, 1 };
    vw_add(&h, e0);
    for (long i = 1; i < n - 1; i++) {
        PA e = { i,
                 triangle_area((double)(i - 1), v[i - 1], (double)i, v[i],
                               (double)(i + 1), v[i + 1]),
                 i - 1, i + 1 };
        vw_add(&h, e);
    }
    PA eN = { n - 1, INFINITY, n - 2, n };
    vw_add(&h, eN);

    for (;;) {
        PA min_point = h.items[0];
        if (min_point.area >= eb) break;
        vw_pop(&h);

        PA left = h.items[h.pos_of_key[min_point.left_point]];
        left.right_point = min_point.right_point;
        PA right = h.items[h.pos_of_key[min_point.right_point]];
        right.left_point = min_point.left_point;

        PA neighbors[2] = { left, right };
        for (int k = 0; k < 2; k++) {
            PA nb = neighbors[k];
            double new_area = nb.area;
            if (nb.left_point > 0 && nb.right_point < n) { /* zig :294 quirk */
                new_area = triangle_area(
                    (double)nb.left_point, v[nb.left_point],
                    (double)nb.index, v[nb.index],
                    (double)nb.right_point, v[nb.right_point]);
            }
            nb.area = new_area;
            vw_update(&h, nb);
        }
    }

    qsort(h.items, (size_t)h.n, sizeof(PA), pa_index_cmp);
    long pos = 0;
    pos = put_d(out, pos, v[0]);
    for (long i = 1; i < h.n; i++) {
        pos = put_q(out, pos, (unsigned long long)h.items[i].index);
        pos = put_d(out, pos, v[h.items[i].index]);
    }
    free(h.items);
    free(h.pos_of_key);
    return pos;
}

/* ================= BottomUp ================= */

typedef struct {
    long index; double cost;
    long left_seg, right_seg, seg_start, seg_end;
} SC;

typedef struct {
    SC *items;
    long n;
    long *pos_of_key;
} BUHeap;

static int sc_cmp(SC a, SC b) {
    if (a.cost == b.cost) return 0;
    return a.cost > b.cost ? 1 : -1;
}

static void bu_sift_up(BUHeap *h, long start) {
    SC child = h->items[start];
    long ci = start;
    while (ci > 0) {
        long pi = (ci - 1) >> 1;
        SC parent = h->items[pi];
        if (sc_cmp(child, parent) >= 0) break;
        h->items[ci] = parent;
        h->pos_of_key[parent.index] = ci;
        ci = pi;
    }
    h->items[ci] = child;
    h->pos_of_key[child.index] = ci;
}

static void bu_sift_down(BUHeap *h, long start) {
    long n = h->n;
    SC target = h->items[start];
    long index = start;
    for (;;) {
        long lesser = (index * 2) | 1;
        if (lesser >= n) break;
        long nxt = lesser + 1;
        if (nxt < n && sc_cmp(h->items[nxt], h->items[lesser]) < 0) lesser = nxt;
        if (sc_cmp(target, h->items[lesser]) < 0) break;
        h->items[index] = h->items[lesser];
        h->pos_of_key[h->items[index].index] = index;
        index = lesser;
    }
    h->items[index] = target;
    h->pos_of_key[target.index] = index;
}

static void bu_add(BUHeap *h, SC e) {
    h->items[h->n] = e;
    h->pos_of_key[e.index] = h->n;
    h->n++;
    bu_sift_up(h, h->n - 1);
}

static SC bu_pop(BUHeap *h) {
    SC item = h->items[0];
    SC last = h->items[--h->n];
    if (0 < h->n) {
        h->items[0] = last;
        bu_sift_down(h, 0);
    }
    h->pos_of_key[item.index] = -1;
    return item;
}

static void bu_update(BUHeap *h, SC nw) {
    long pos = h->pos_of_key[nw.index];
    SC old = h->items[pos];
    h->items[pos] = nw;
    int order = sc_cmp(nw, old);
    if (order < 0) bu_sift_up(h, pos);
    else if (order > 0) bu_sift_down(h, pos);
}

static double bu_merge_cost(const double *v, SC one, SC two) {
    long lo = one.seg_start < two.seg_start ? one.seg_start : two.seg_start;
    long hi = one.seg_end > two.seg_end ? one.seg_end : two.seg_end;
    return rmse(v, lo, hi);
}

static int sc_index_cmp(const void *a, const void *b) {
    long ia = ((const SC *)a)->index, ib = ((const SC *)b)->index;
    return (ia > ib) - (ia < ib);
}

static long bottom_up_c(const double *v, long n, double eb,
                        unsigned char *out) {
    /* n >= 3 here; n <= 2 handled in Python */
    long max_segs = n / 2 + 2;
    BUHeap h;
    h.items = (SC *)malloc((size_t)max_segs * sizeof(SC));
    h.pos_of_key = (long *)malloc((size_t)max_segs * sizeof(long));
    if (!h.items || !h.pos_of_key) { free(h.items); free(h.pos_of_key); return -1; }
    h.n = 0;
    for (long i = 0; i < max_segs; i++) h.pos_of_key[i] = -1;

    long seg_id = 1;
    long seg_start = 2;
    SC previous = { 0, INFINITY, 0, 1, 0, 1 };
    while (seg_start < n) {
        long seg_end = seg_start + 1 < n ? seg_start + 1 : seg_start;
        SC current = { seg_id, INFINITY, seg_id - 1, seg_id + 1, seg_start, seg_end };
        previous.cost = bu_merge_cost(v, previous, current);
        bu_add(&h, previous);
        seg_id++;
        previous = current;
        seg_start += 2;
    }
    bu_add(&h, previous);

    while (h.n > 2) {
        SC min_segment = h.items[0];
        if (min_segment.cost > eb) break;
        bu_pop(&h);

        SC right = h.items[h.pos_of_key[min_segment.right_seg]];
        right.seg_start = min_segment.seg_start;

        if (min_segment.seg_start != 0) {
            SC left = h.items[h.pos_of_key[min_segment.left_seg]];
            right.left_seg = left.index;
            left.right_seg = right.index;
            left.cost = bu_merge_cost(v, left, right);
            bu_update(&h, left);
        }

        if (right.seg_end != n - 1) {
            SC rr = h.items[h.pos_of_key[right.right_seg]];
            right.cost = bu_merge_cost(v, right, rr);
        }
        bu_update(&h, right);
    }

    qsort(h.items, (size_t)h.n, sizeof(SC), sc_index_cmp);
    long pos = 0;
    for (long i = 0; i < h.n; i++) {
        pos = put_d(out, pos, v[h.items[i].seg_start]);
        pos = put_q(out, pos, (unsigned long long)h.items[i].seg_end);
        pos = put_d(out, pos, v[h.items[i].seg_end]);
    }
    free(h.items);
    free(h.pos_of_key);
    return pos;
}

/* ================= ABC Linear Approximation ================= */

typedef struct { long t; double v; } Pt;
typedef struct { Pt *pts; long n, cap; } Ch;

#define TURN_RIGHT 0
#define TURN_LEFT 1
#define TURN_COLLINEAR 2

static int ch_push(Ch *c, Pt p) {
    if (c->n + 1 > c->cap) {
        long cap = c->cap ? c->cap * 2 : 16;
        Pt *q = (Pt *)realloc(c->pts, (size_t)cap * sizeof(Pt));
        if (!q) return -1;
        c->pts = q; c->cap = cap;
    }
    c->pts[c->n++] = p;
    return 0;
}

static int turn3(Pt first, Pt middle, Pt last) {
    double cross = (middle.v - first.v) * (double)(last.t - middle.t)
                 - (last.v - middle.v) * (double)(middle.t - first.t);
    if (cross == 0.0) return TURN_COLLINEAR;
    return cross > 0.0 ? TURN_RIGHT : TURN_LEFT;
}

static int ch_add(Ch *c, int turn, Pt p) {
    if (c->n < 2) return ch_push(c, p);
    long top = c->n - 1;
    while (top > 0 && turn3(c->pts[top - 1], c->pts[top], p) != turn) {
        c->n--; top--;
    }
    return ch_push(c, p);
}

typedef struct { Ch lower, upper; } HullC;

static int hullc_add(HullC *h, Pt p) {
    if (ch_add(&h->upper, TURN_RIGHT, p)) return -1;
    if (ch_add(&h->lower, TURN_LEFT, p)) return -1;
    return 0;
}

static long hullc_len(const HullC *h) {
    long total = h->lower.n + h->upper.n;
    if (total == 0) return 0;
    if (total == 2) return 1;
    return total - 2;
}

/* combined indexing with wraparound (convex_hull.zig :283-315) */
static Pt hullc_at(const HullC *h, long index) {
    long n = hullc_len(h);
    index %= n;
    if (index < h->lower.n) return h->lower.pts[index];
    return h->upper.pts[index - h->lower.n + 1];
}

static double hullc_max_error(const HullC *h, double slope, double intercept) {
    long n = hullc_len(h);
    long double slope_ld = (long double)slope;
    long double intercept_ld = (long double)intercept;
    long double max_error = 0.0L;
    for (long i = 0; i < n; i++) {
        Pt p = hullc_at(h, i);
        long double predicted = slope_ld * (long double)p.t + intercept_ld;
        long double current = fabsl(predicted - (long double)p.v);
        if (current > max_error) max_error = current;
    }
    return (double)max_error;
}

static double abc_deviation(Pt a, Pt b, Pt c) {
    double slope = (b.v - a.v) / (double)(b.t - a.t);
    double pred = slope * ((double)c.t - (double)a.t) + a.v;
    return fabs(pred - c.v);
}

static long abc_find_pivot(const HullC *h, long a_index) {
    Pt a = hullc_at(h, a_index);
    Pt b = hullc_at(h, a_index + 1);
    long n = hullc_len(h);
    double max_dev = -1.0;
    long pivot = -1;
    for (long c_index = 0; c_index < n; c_index++) {
        if (c_index != a_index && c_index != a_index + 1) {
            double dev = abc_deviation(a, b, hullc_at(h, c_index));
            if (dev > max_dev) { max_dev = dev; pivot = c_index; }
        }
    }
    return pivot;
}

/* returns 1 and fills slope/intercept */
static int abc_optimal_segment(const HullC *h, char *visited, long visited_cap,
                               double *out_slope, double *out_intercept) {
    long n = hullc_len(h);
    long a_index = 0, c_index = 0;
    int finished = 0;
    memset(visited, 0, (size_t)visited_cap);

    while (!finished) {
        if (a_index + 1 >= n) break;
        Pt a = hullc_at(h, a_index);
        Pt b = hullc_at(h, a_index + 1);
        long pivot = abc_find_pivot(h, a_index);
        if (pivot < 0) {
            double slope = (b.v - a.v) / (double)(b.t - a.t);
            *out_slope = slope;
            *out_intercept = a.v - slope * (double)a.t;
            return 1;
        }
        c_index = pivot;
        if (visited[a_index]) break;
        visited[a_index] = 1;
        Pt c = hullc_at(h, c_index);
        if (c.t > b.t) a_index += 1;
        else if (c.t < a.t) {
            if (a_index == 0) finished = 1;
            else a_index -= 1;
        } else finished = 1;
    }

    Pt start = hullc_at(h, a_index);
    Pt end = hullc_at(h, a_index + 1);
    Pt c = hullc_at(h, c_index);
    double slope = (end.v - start.v) / (double)(end.t - start.t);
    double pred = slope * (double)(c.t - start.t) + start.v; /* signed diff */
    double deviation = fabs(pred - c.v);
    *out_slope = slope;
    *out_intercept = start.v - slope * (double)start.t + deviation / 2;
    return 1;
}

static long abc_c(const double *v, long n, double eb, unsigned char *out) {
    HullC hull; memset(&hull, 0, sizeof(hull));
    char *visited = (char *)malloc((size_t)(2 * n + 4));
    if (!visited) return -1;
    long pos = 0;
    long seg_start = 0;
    long rc = -1;
    while (seg_start < n - 1) {
        int have_line = 0;
        double line_s = 0.0, line_i = 0.0;
        if (hullc_add(&hull, (Pt){ seg_start, v[seg_start] })) goto done;
        long last_valid_end = seg_start + 1;
        long index = seg_start + 1;
        while (index < n) {
            if (hullc_add(&hull, (Pt){ index, v[index] })) goto done;
            double s, ic;
            abc_optimal_segment(&hull, visited, 2 * n + 4, &s, &ic);
            if (hullc_max_error(&hull, s, ic) <= eb) {
                last_valid_end = index;
                line_s = s; line_i = ic; have_line = 1;
            } else break;
            index++;
        }
        pos = put_q(out, pos, (unsigned long long)last_valid_end);
        if (have_line && seg_start + 1 != last_valid_end) {
            pos = put_d(out, pos, line_s);
            pos = put_d(out, pos, line_i);
        } else {
            pos = put_d(out, pos, v[seg_start]);
            pos = put_d(out, pos, v[last_valid_end]);
        }
        seg_start = last_valid_end + 1;
        hull.lower.n = 0;
        hull.upper.n = 0;
    }
    if (seg_start == n - 1) {
        pos = put_q(out, pos, (unsigned long long)seg_start);
        pos = put_d(out, pos, 0.0);
        pos = put_d(out, pos, v[seg_start]);
    }
    rc = pos;
done:
    free(visited);
    free(hull.lower.pts);
    free(hull.upper.pts);
    return rc;
}

/* ---- public entries ---- */

long tersets_sliding_window(const double *v, long n, double eb,
                            unsigned char *out) {
    return sliding_window_c(v, n, eb, out);
}

long tersets_vw(const double *v, long n, double eb, unsigned char *out) {
    return vw_c(v, n, eb, out);
}

long tersets_bottom_up(const double *v, long n, double eb,
                       unsigned char *out) {
    return bottom_up_c(v, n, eb, out);
}

long tersets_abc(const double *v, long n, double eb, unsigned char *out) {
    return abc_c(v, n, eb, out);
}
