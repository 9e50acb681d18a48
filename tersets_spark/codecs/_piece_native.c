/* Sim-Piece / Mix-Piece kernels — C transcription of sim_piece.py and
 * mix_piece.py (semantics-parity reimplementations of the reference's
 * src/functional/sim_piece.zig and mix_piece.zig).
 *
 * Bit-exactness contract with the Python paths (differential suite in
 * tests/test_native_piece.py):
 *  - identical IEEE-754 double ops in order, -ffp-contract=off, libm
 *    floor/ceil;
 *  - Python-dict semantics for float-keyed grouping: insertion-ordered
 *    iteration, key equality by VALUE (+0.0 == -0.0), the FIRST-seen key's
 *    bit pattern serialized;
 *  - Python list.sort stability reproduced via (key, sequence) tie-break.
 *
 * The f32 error-bound arithmetic stays in Python; this kernel receives
 * eb (f64 of the f32 bound) and adjusted (eb32 - 1e-7f, f32 math) plus
 * the f64-promoted margin. Returns bytes written, or -2 for non-finite /
 * out-of-range input, -1 for allocation failure.
 */

#include <math.h>
#include <stdlib.h>
#include <string.h>

static const double F64MAX = 1.7976931348623157e308;

static long put_d(unsigned char *out, long pos, double d) {
    memcpy(out + pos, &d, 8);
    return pos + 8;
}

static long put_q(unsigned char *out, long pos, unsigned long long q) {
    memcpy(out + pos, &q, 8);
    return pos + 8;
}

/* ---- insertion-ordered open-addressing map over f64 keys ---- */

static unsigned long long dkey_bits(double k) {
    if (k == 0.0) k = 0.0; /* canonicalize -0.0 (value equality, like dict) */
    unsigned long long b;
    memcpy(&b, &k, 8);
    return b;
}

static unsigned long long mix64(unsigned long long x) {
    x += 0x9E3779B97F4A7C15ULL;
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
    x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
    return x ^ (x >> 31);
}

typedef struct {
    unsigned long long *keys;
    long *vals;       /* value: order id (0..n-1) */
    char *used;
    double *raw;      /* first-seen raw key per order id */
    long cap, n;
} OMap;

static int omap_init(OMap *m, long expected) {
    long cap = 16;
    while (cap < 2 * expected + 4) cap <<= 1;
    m->keys = (unsigned long long *)malloc((size_t)cap * 8);
    m->vals = (long *)malloc((size_t)cap * sizeof(long));
    m->used = (char *)calloc((size_t)cap, 1);
    m->raw = (double *)malloc((size_t)(expected + 1) * 8);
    m->cap = cap;
    m->n = 0;
    return (m->keys && m->vals && m->used && m->raw) ? 0 : -1;
}

static void omap_free(OMap *m) {
    free(m->keys); free(m->vals); free(m->used); free(m->raw);
}

/* get-or-insert: returns order id */
static long omap_gid(OMap *m, double key) {
    unsigned long long b = dkey_bits(key);
    unsigned long long h = mix64(b) & (unsigned long long)(m->cap - 1);
    for (;;) {
        if (!m->used[h]) {
            m->used[h] = 1;
            m->keys[h] = b;
            m->vals[h] = m->n;
            m->raw[m->n] = key; /* first-seen bit pattern kept */
            return m->n++;
        }
        if (m->keys[h] == b) return m->vals[h];
        h = (h + 1) & (unsigned long long)(m->cap - 1);
    }
}

/* ---- dynamic long vector ---- */

typedef struct { long *a; long n, cap; } LVec;

static int lv_push(LVec *v, long x) {
    if (v->n + 1 > v->cap) {
        long cap = v->cap ? v->cap * 2 : 8;
        long *q = (long *)realloc(v->a, (size_t)cap * sizeof(long));
        if (!q) return -1;
        v->a = q; v->cap = cap;
    }
    v->a[v->n++] = x;
    return 0;
}

/* ---- segment record + stable sorts ---- */

typedef struct { long start_t; double intercept, lower, upper; long seq; } SegR;

static int seg_by_lower(const void *pa, const void *pb) {
    const SegR *a = (const SegR *)pa, *b = (const SegR *)pb;
    if (a->lower < b->lower) return -1;
    if (a->lower > b->lower) return 1;
    return (a->seq > b->seq) - (a->seq < b->seq); /* stability */
}

static int seg_by_start(const void *pa, const void *pb) {
    const SegR *a = (const SegR *)pa, *b = (const SegR *)pb;
    if (a->start_t < b->start_t) return -1;
    if (a->start_t > b->start_t) return 1;
    return (a->seq > b->seq) - (a->seq < b->seq);
}

/* ---- Sim-Piece phase 1 (sim_piece.zig :165-253) ---- */

static double quantize_floor(double value, double eb) {
    return eb != 0 ? floor(value / eb) * eb : value;
}

static double quantize_ceil(double value, double eb) {
    return eb != 0 ? ceil(value / eb) * eb : value;
}

static long sim_phase1(const double *v, long n, double eb, double adjusted,
                       double margin, SegR *segs) {
    double v0 = v[0];
    if (!isfinite(v0) || fabs(v0) > 1e15) return -2;
    double upper = F64MAX, lower = -F64MAX;
    long start_t = 0;
    double intercept = quantize_floor(v0, eb) + margin;
    long k = 0;
    for (long ct = 1; ct < n; ct++) {
        double value = v[ct];
        if (!isfinite(value) || fabs(value) > 1e15) return -2;
        double segment_size = (double)(ct - start_t);
        double upper_limit = upper * segment_size + intercept;
        double lower_limit = lower * segment_size + intercept;
        if (upper_limit < value - adjusted || lower_limit > value + adjusted) {
            segs[k] = (SegR){ start_t, intercept, lower, upper, 0 };
            k++;
            start_t = ct;
            intercept = quantize_floor(value, eb) + margin;
            upper = F64MAX;
            lower = -F64MAX;
        } else {
            double new_upper = (value + adjusted - intercept) / segment_size;
            double new_lower = (value - adjusted - intercept) / segment_size;
            if (value + adjusted < upper_limit)
                upper = new_upper > lower ? new_upper : lower;
            if (value - adjusted > lower_limit)
                lower = new_lower < upper ? new_lower : upper;
        }
    }
    if (n - start_t == 1) { upper = 0.0; lower = 0.0; }
    segs[k] = (SegR){ start_t, intercept, lower, upper, 0 };
    return k + 1;
}

/* ---- Mix-Piece phase 1 (mix_piece.zig :359-569) ---- */

static double round_half_away(double x) {
    return x >= 0 ? floor(x + 0.5) : ceil(x - 0.5);
}

static long mix_phase1(const double *v, long n, double eb, double adjusted,
                       double margin, SegR *segs) {
    double v0 = v[0];
    if (!isfinite(v0) || fabs(v0) > 1e15) return -2;
    long k = 0;
    long start_t = 0;
    double start_v = v0;
    double up_f = F64MAX, lo_f = -F64MAX, up_c = F64MAX, lo_c = -F64MAX;
    double int_f = quantize_floor(v0, eb) + margin;
    double int_c = quantize_ceil(v0, eb) + margin;
    /* Documented divergence from mix_piece.zig:385-389 (see mix_piece.py):
     * start the ceil track invalid when its margin-shifted intercept
     * already misses the first value by more than the bound. */
    int floor_valid = 1, ceil_valid = (int_c - v0) <= eb;
    long last_valid_floor = 0, last_valid_ceil = 0;

    for (long ct = 1; ct < n; ct++) {
        double value = v[ct];
        if (!isfinite(value) || fabs(value) > 1e15) return -2;
        double segment_size = (double)(ct - start_t);

        if (floor_valid) {
            double upper_limit = up_f * segment_size + int_f;
            double lower_limit = lo_f * segment_size + int_f;
            if (upper_limit < value - adjusted || lower_limit > value + adjusted) {
                floor_valid = 0;
                last_valid_floor = ct - 1;
            } else {
                double new_up = (value + adjusted - int_f) / segment_size;
                double new_lo = (value - adjusted - int_f) / segment_size;
                if (value + adjusted < upper_limit)
                    up_f = new_up > lo_f ? new_up : lo_f;
                if (value - adjusted > lower_limit)
                    lo_f = new_lo < up_f ? new_lo : up_f;
            }
        }
        if (ceil_valid) {
            double upper_limit = up_c * segment_size + int_c;
            double lower_limit = lo_c * segment_size + int_c;
            if (upper_limit < value - adjusted || lower_limit > value + adjusted) {
                ceil_valid = 0;
                last_valid_ceil = ct - 1;
            } else {
                double new_up = (value + adjusted - int_c) / segment_size;
                double new_lo = (value - adjusted - int_c) / segment_size;
                if (value + adjusted < upper_limit)
                    up_c = new_up > lo_c ? new_up : lo_c;
                if (value - adjusted > lower_limit)
                    lo_c = new_lo < up_c ? new_lo : up_c;
            }
        }
        if (!floor_valid && !ceil_valid) {
            if (last_valid_floor >= last_valid_ceil)
                segs[k] = (SegR){ start_t, int_f, lo_f, up_f, 0 };
            else
                segs[k] = (SegR){ start_t, int_c, lo_c, up_c, 0 };
            k++;
            start_t = ct; start_v = value;
            int_f = quantize_floor(value, eb) + margin;
            int_c = quantize_ceil(value, eb) + margin;
            up_f = F64MAX; lo_f = -F64MAX; up_c = F64MAX; lo_c = -F64MAX;
            floor_valid = 1; ceil_valid = (int_c - value) <= eb;
            last_valid_floor = ct; last_valid_ceil = ct;
        }
    }

    long segment_size = n - start_t;
    if (segment_size > 0) {
        if (floor_valid && !ceil_valid) {
            if (segment_size == 1) { up_f = 0.0; lo_f = 0.0; }
            segs[k++] = (SegR){ start_t, int_f, lo_f, up_f, k };
        } else if (ceil_valid && !floor_valid) {
            if (segment_size == 1) { up_c = 0.0; lo_c = 0.0; }
            segs[k++] = (SegR){ start_t, int_c, lo_c, up_c, k };
        } else {
            double original = start_v;
            if (round_half_away(original / eb) == ceil(original / eb)) {
                if (segment_size == 1) { up_c = 0.0; lo_c = 0.0; }
                segs[k++] = (SegR){ start_t, int_c, lo_c, up_c, k };
            } else {
                if (segment_size == 1) { up_f = 0.0; lo_f = 0.0; }
                segs[k++] = (SegR){ start_t, int_f, lo_f, up_f, k };
            }
        }
    }
    return k;
}

/* ---- per-intercept grouping + interval merging (shared core).
 * route_singles: 0 = Sim-Piece (everything to `merged`);
 *                1 = Mix-Piece (singleton-timestamp groups to `singles`).
 * Outputs are appended with seq stamped by arrival order.  ---- */

typedef struct { SegR *a; long n; } SegArr;

static int merge_by_intercept(SegR *segs, long nseg, int route_singles,
                              SegArr *merged, SegArr *singles) {
    OMap imap;
    if (omap_init(&imap, nseg)) return -1;
    LVec *groups = (LVec *)calloc((size_t)nseg + 1, sizeof(LVec));
    if (!groups) { omap_free(&imap); return -1; }
    for (long i = 0; i < nseg; i++) {
        long gid = omap_gid(&imap, segs[i].intercept);
        if (lv_push(&groups[gid], i)) goto fail;
    }
    long scratch_cap = 0;
    SegR *scratch = NULL;
    for (long g = 0; g < imap.n; g++) {
        LVec *grp = &groups[g];
        if (grp->n > scratch_cap) {
            SegR *q = (SegR *)realloc(scratch, (size_t)grp->n * sizeof(SegR));
            if (!q) goto fail2;
            scratch = q; scratch_cap = grp->n;
        }
        for (long j = 0; j < grp->n; j++) {
            scratch[j] = segs[grp->a[j]];
            scratch[j].seq = j; /* stability = order within the group list */
        }
        qsort(scratch, (size_t)grp->n, sizeof(SegR), seg_by_lower);
        double intercept = imap.raw[g];
        double lower = scratch[0].lower, upper = scratch[0].upper;
        long ts_start = 0; /* timestamps = scratch[ts_start..j-1].start_t */
        for (long j = 1; j <= grp->n; j++) {
            int flush = 0;
            if (j == grp->n) flush = 1;
            else if (!(scratch[j].lower <= upper && scratch[j].upper >= lower)) flush = 1;
            else {
                if (scratch[j].lower > lower) lower = scratch[j].lower;
                if (scratch[j].upper < upper) upper = scratch[j].upper;
            }
            if (flush) {
                long cnt = j - ts_start;
                if (route_singles && cnt == 1) {
                    SegR r = { scratch[ts_start].start_t, intercept, lower, upper, singles->n };
                    singles->a[singles->n++] = r;
                } else {
                    for (long m = ts_start; m < j; m++) {
                        SegR r = { scratch[m].start_t, intercept, lower, upper, merged->n };
                        merged->a[merged->n++] = r;
                    }
                }
                if (j < grp->n) {
                    lower = scratch[j].lower;
                    upper = scratch[j].upper;
                    ts_start = j;
                }
            }
        }
    }
    free(scratch);
    for (long g = 0; g < imap.n; g++) free(groups[g].a);
    free(groups);
    omap_free(&imap);
    return 0;
fail2:
    free(scratch);
fail:
    for (long g = 0; g < imap.n; g++) free(groups[g].a);
    free(groups);
    omap_free(&imap);
    return -1;
}

/* ---- phase 3/4: intercept -> slope -> [timestamps], serialized.
 * One combined open-addressing map keyed by (intercept-gid, slope-bits)
 * gives python-dict insertion-order semantics for the nested dicts. ---- */

typedef struct { double raw_slope; LVec times; } SlopeG;
typedef struct { double raw_intercept; LVec slope_ids; } InterG;

static long serialize_groups_c(const SegR *merged, long n, unsigned char *out,
                               long pos, long *out_n_intercepts) {
    OMap imap;
    if (omap_init(&imap, n)) return -1;
    InterG *inter = (InterG *)calloc((size_t)n + 1, sizeof(InterG));
    SlopeG *slopes = (SlopeG *)calloc((size_t)n + 1, sizeof(SlopeG));
    long cap = 16;
    while (cap < 2 * n + 4) cap <<= 1;
    long *m_gid = (long *)malloc((size_t)cap * sizeof(long));
    unsigned long long *m_sb = (unsigned long long *)malloc((size_t)cap * 8);
    long *m_val = (long *)malloc((size_t)cap * sizeof(long));
    char *m_used = (char *)calloc((size_t)cap, 1);
    long n_slopes = 0;
    long rc = -1;
    if (!inter || !slopes || !m_gid || !m_sb || !m_val || !m_used) goto done;

    for (long i = 0; i < n; i++) {
        double slope = (merged[i].lower + merged[i].upper) / 2;
        long before = imap.n;
        long gid = omap_gid(&imap, merged[i].intercept);
        if (imap.n > before) inter[gid].raw_intercept = imap.raw[gid];
        unsigned long long sb = dkey_bits(slope);
        unsigned long long h =
            (mix64(sb) ^ mix64((unsigned long long)gid * 0x9E3779B97F4A7C15ULL))
            & (unsigned long long)(cap - 1);
        long sid;
        for (;;) {
            if (!m_used[h]) {
                m_used[h] = 1;
                m_gid[h] = gid;
                m_sb[h] = sb;
                sid = n_slopes++;
                m_val[h] = sid;
                slopes[sid].raw_slope = slope;
                if (lv_push(&inter[gid].slope_ids, sid)) goto done;
                break;
            }
            if (m_gid[h] == gid && m_sb[h] == sb) { sid = m_val[h]; break; }
            h = (h + 1) & (unsigned long long)(cap - 1);
        }
        if (lv_push(&slopes[sid].times, merged[i].start_t)) goto done;
    }

    for (long g = 0; g < imap.n; g++) {
        pos = put_d(out, pos, inter[g].raw_intercept);
        pos = put_q(out, pos, (unsigned long long)inter[g].slope_ids.n);
        for (long si = 0; si < inter[g].slope_ids.n; si++) {
            SlopeG *sg = &slopes[inter[g].slope_ids.a[si]];
            pos = put_d(out, pos, sg->raw_slope);
            pos = put_q(out, pos, (unsigned long long)sg->times.n);
            long prev = 0;
            for (long ti = 0; ti < sg->times.n; ti++) {
                pos = put_q(out, pos, (unsigned long long)(sg->times.a[ti] - prev));
                prev = sg->times.a[ti];
            }
        }
    }
    if (out_n_intercepts) *out_n_intercepts = imap.n;
    rc = pos;
done:
    if (inter)
        for (long g = 0; g < imap.n; g++) free(inter[g].slope_ids.a);
    if (slopes)
        for (long s = 0; s < n_slopes; s++) free(slopes[s].times.a);
    free(inter); free(slopes);
    free(m_gid); free(m_sb); free(m_val); free(m_used);
    omap_free(&imap);
    return rc;
}

/* ---- public: Sim-Piece ---- */

long tersets_sim_piece(const double *v, long n, double eb, double adjusted,
                       double margin, unsigned char *out) {
    SegR *segs = (SegR *)malloc((size_t)(n + 1) * sizeof(SegR));
    if (!segs) return -1;
    long nseg = sim_phase1(v, n, eb, adjusted, margin, segs);
    if (nseg < 0) { free(segs); return nseg; }

    SegArr merged = { (SegR *)malloc((size_t)(nseg + 1) * sizeof(SegR)), 0 };
    if (!merged.a) { free(segs); return -1; }
    long rc = merge_by_intercept(segs, nseg, 0, &merged, NULL);
    free(segs);
    if (rc) { free(merged.a); return -1; }
    qsort(merged.a, (size_t)merged.n, sizeof(SegR), seg_by_start);

    long pos = serialize_groups_c(merged.a, merged.n, out, 0, NULL);
    free(merged.a);
    if (pos < 0) return -1;
    pos = put_q(out, pos, (unsigned long long)n);
    return pos;
}

/* ---- public: Mix-Piece ---- */

long tersets_mix_piece(const double *v, long n, double eb, double adjusted,
                       double margin, unsigned char *out) {
    SegR *segs = (SegR *)malloc((size_t)(n + 1) * sizeof(SegR));
    if (!segs) return -1;
    long nseg = mix_phase1(v, n, eb, adjusted, margin, segs);
    if (nseg < 0) { free(segs); return nseg; }

    SegArr same = { (SegR *)malloc((size_t)(nseg + 1) * sizeof(SegR)), 0 };
    SegArr singles = { (SegR *)malloc((size_t)(nseg + 1) * sizeof(SegR)), 0 };
    if (!same.a || !singles.a) { free(segs); free(same.a); free(singles.a); return -1; }
    long rc = merge_by_intercept(segs, nseg, 1, &same, &singles);
    free(segs);
    if (rc) { free(same.a); free(singles.a); return -1; }

    /* part 2: regroup singles across intercepts by slope interval */
    qsort(singles.a, (size_t)singles.n, sizeof(SegR), seg_by_lower);
    SegArr cross = { (SegR *)malloc((size_t)(singles.n + 1) * sizeof(SegR)), 0 };
    SegArr ungrouped = { (SegR *)malloc((size_t)(singles.n + 1) * sizeof(SegR)), 0 };
    if (!cross.a || !ungrouped.a) {
        free(same.a); free(singles.a); free(cross.a); free(ungrouped.a);
        return -1;
    }
    if (singles.n > 0) {
        double lower = singles.a[0].lower, upper = singles.a[0].upper;
        long mem_start = 0;
        for (long j = 1; j <= singles.n; j++) {
            int flush = 0;
            if (j == singles.n) flush = 1;
            else if (!(singles.a[j].lower <= upper && singles.a[j].upper >= lower))
                flush = 1;
            else {
                if (singles.a[j].lower > lower) lower = singles.a[j].lower;
                if (singles.a[j].upper < upper) upper = singles.a[j].upper;
            }
            if (flush) {
                long cnt = j - mem_start;
                SegArr *target = cnt > 1 ? &cross : &ungrouped;
                for (long m = mem_start; m < j; m++) {
                    SegR r = { singles.a[m].start_t, singles.a[m].intercept,
                               lower, upper, target->n };
                    target->a[target->n++] = r;
                }
                if (j < singles.n) {
                    lower = singles.a[j].lower;
                    upper = singles.a[j].upper;
                    mem_start = j;
                }
            }
        }
    }
    free(singles.a);
    qsort(same.a, (size_t)same.n, sizeof(SegR), seg_by_start);
    qsort(cross.a, (size_t)cross.n, sizeof(SegR), seg_by_start);
    qsort(ungrouped.a, (size_t)ungrouped.n, sizeof(SegR), seg_by_start);

    /* phase 3.2: slope -> [(intercept, timestamp)] over cross, in order */
    OMap smap;
    long pos = -1;
    LVec *pair_i = NULL, *pair_t = NULL;
    if (omap_init(&smap, cross.n)) goto done0;
    pair_i = (LVec *)calloc((size_t)cross.n + 1, sizeof(LVec));
    pair_t = (LVec *)calloc((size_t)cross.n + 1, sizeof(LVec));
    if (!pair_i || !pair_t) goto done;
    for (long i = 0; i < cross.n; i++) {
        double slope = (cross.a[i].lower + cross.a[i].upper) / 2;
        long gid = omap_gid(&smap, slope);
        double icept = cross.a[i].intercept;
        long bits;
        memcpy(&bits, &icept, 8);
        if (lv_push(&pair_i[gid], bits)) goto done;
        if (lv_push(&pair_t[gid], cross.a[i].start_t)) goto done;
    }

    /* header + part 1 */
    long n_outer = 0;
    /* count distinct intercepts of `same` without serializing: do it via a
     * dry pass in serialize_groups_c (it reports the count) */
    pos = 24; /* reserve header */
    pos = serialize_groups_c(same.a, same.n, out, pos, &n_outer);
    if (pos < 0) goto done;
    {
        long p0 = 0;
        p0 = put_q(out, p0, (unsigned long long)n_outer);
        p0 = put_q(out, p0, (unsigned long long)smap.n);
        p0 = put_q(out, p0, (unsigned long long)ungrouped.n);
    }
    /* part 2 */
    for (long g = 0; g < smap.n; g++) {
        pos = put_d(out, pos, smap.raw[g]);
        pos = put_q(out, pos, (unsigned long long)pair_t[g].n);
        long prev = 0;
        for (long j = 0; j < pair_t[g].n; j++) {
            double icept;
            memcpy(&icept, &pair_i[g].a[j], 8);
            pos = put_d(out, pos, icept);
            pos = put_q(out, pos, (unsigned long long)(pair_t[g].a[j] - prev));
            prev = pair_t[g].a[j];
        }
    }
    /* part 3 */
    {
        long prev = 0;
        for (long i = 0; i < ungrouped.n; i++) {
            double slope = (ungrouped.a[i].lower + ungrouped.a[i].upper) / 2.0;
            pos = put_d(out, pos, slope);
            pos = put_d(out, pos, ungrouped.a[i].intercept);
            pos = put_q(out, pos, (unsigned long long)(ungrouped.a[i].start_t - prev));
            prev = ungrouped.a[i].start_t;
        }
    }
    pos = put_q(out, pos, (unsigned long long)n);

done:
    if (pair_i) for (long g = 0; g < smap.n; g++) free(pair_i[g].a);
    if (pair_t) for (long g = 0; g < smap.n; g++) free(pair_t[g].a);
    free(pair_i); free(pair_t);
    omap_free(&smap);
done0:
    free(same.a); free(cross.a); free(ungrouped.a);
    return pos;
}
