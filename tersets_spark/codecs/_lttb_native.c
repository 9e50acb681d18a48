/* Batched LTTB (Largest-Triangle-Three-Buckets, Steinarsson 2013) kernel —
 * C transcription of downsample.py:lttb, processing a whole Arrow batch of
 * series per call (flat values buffer + offsets, the same zero-ish-copy
 * shape kernels.py uses for the cascade).
 *
 * Bit-exactness contract with the Python path (differential suite in
 * tests/test_native_lttb.py), for INTEGER-VALUED inputs — the engine's
 * domain is token arrays (int32 widened to double), where every bucket-mean
 * numerator is a sum of integer-valued doubles below 2^53 and therefore
 * exact under ANY summation order (left-to-right here vs NumPy's pairwise
 * in the reference path).  The time axis is an arange, so its mean is the
 * exact integer midpoint formula.  Triangle areas reuse the identical
 * multiply/subtract order with -ffp-contract=off; argmax keeps the FIRST
 * maximum exactly like np.argmax.  For non-integer floats the kernel is
 * still a correct LTTB but bucket means may differ from NumPy by final-ulp
 * summation order, so the Python wrapper only routes token-style data here.
 */

#include <math.h>

/* Downsample one series of length n to exactly `threshold` points.
 * Caller guarantees threshold >= 3 and threshold < n. */
static void lttb_one(const double *v, long n, long threshold, double *out) {
    double every = (double)(n - 2) / (double)(threshold - 2);
    long prev = 0;
    out[0] = v[0];
    for (long i = 0; i < threshold - 2; i++) {
        /* bounds[j] = floor(j*every) + 1 for j < threshold-1, else n-1 */
        long lo = (long)floor((double)i * every) + 1;
        long hi = (long)floor((double)(i + 1) * every) + 1;
        if (i + 1 == threshold - 1) hi = n - 1; /* unreachable; guard */
        long nlo = hi;
        long nhi;
        if (i + 2 < threshold - 1)
            nhi = (long)floor((double)(i + 2) * every) + 1;
        else
            nhi = n - 1; /* bounds[threshold-1] */
        if (i == threshold - 3) nhi = n; /* last bucket's "next" = tail */
        double avg_t, avg_v;
        if (nhi > nlo) {
            long cnt = nhi - nlo;
            /* exact: sum of consecutive integers */
            avg_t = (double)((nlo + nhi - 1) * cnt / 2.0) / (double)cnt;
            double s = 0.0;
            for (long j = nlo; j < nhi; j++) s += v[j];
            avg_v = s / (double)cnt;
        } else {
            avg_t = (double)(n - 1);
            avg_v = v[n - 1];
        }
        double tp = (double)prev, vp = v[prev];
        double best = -1.0;
        long best_j = lo;
        for (long j = lo; j < hi; j++) {
            double a = fabs((tp - avg_t) * (v[j] - vp) -
                            (tp - (double)j) * (avg_v - vp));
            if (a > best) { best = a; best_j = j; }
        }
        prev = best_j;
        out[i + 1] = v[prev];
    }
    out[threshold - 1] = v[n - 1];
}

/* Batch entry: `flat` holds ndocs series back-to-back, series d spanning
 * flat[offsets[d] : offsets[d+1]].  Output layout is the caller-computed
 * out_offsets (out_len = n when threshold >= n or threshold < 3, else
 * threshold).  Returns total doubles written, or -1 on a layout mismatch. */
long tersets_lttb(const double *flat, const long *offsets, long ndocs,
                  long threshold, double *out, const long *out_offsets) {
    for (long d = 0; d < ndocs; d++) {
        const double *v = flat + offsets[d];
        long n = offsets[d + 1] - offsets[d];
        double *o = out + out_offsets[d];
        long olen = out_offsets[d + 1] - out_offsets[d];
        if (threshold >= n || threshold < 3) {
            if (olen != n) return -1;
            for (long i = 0; i < n; i++) o[i] = v[i];
        } else {
            if (olen != threshold) return -1;
            lttb_one(v, n, threshold, o);
        }
    }
    return out_offsets[ndocs];
}
