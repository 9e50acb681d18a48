#include <stdlib.h>
#include <math.h>
#include <stdio.h>
#include <string.h>

long tersets_histogram(const double*, long, long, int, long*, long*, double*, double*, double*, double*);
long tersets_swing(const double*, long, double, int, unsigned char*);
long tersets_vw(const double*, long, double, unsigned char*);
long tersets_sliding_window(const double*, long, double, unsigned char*);
long tersets_bottom_up(const double*, long, double, unsigned char*);
long tersets_abc(const double*, long, double, unsigned char*);
long tersets_sim_piece(const double*, long, double, double, double, unsigned char*);
long tersets_mix_piece(const double*, long, double, double, double, unsigned char*);
long tersets_lttb(const double*, const long*, long, long, double*, const long*);

int main(void) {
    srand(7);
    for (int trial = 0; trial < 150; trial++) {
        long n = 1 + rand() % 2000;
        double *v = malloc(n * 8);
        for (long i = 0; i < n; i++) {
            switch (trial % 4) {
            case 0: v[i] = (double)(rand() % 4000); break;
            case 1: v[i] = ((double)rand() / RAND_MAX - 0.5) * 2e6; break;
            case 2: v[i] = floor((0.4 * i + 500) / 50.0) * 50.0; break;
            default: v[i] = 5.0;
            }
        }
        unsigned char *buf = malloc(48 * n + 96);
        long mb = 2 + rand() % 38;
        long *b_ = malloc((mb + 2) * 8), *e_ = malloc((mb + 2) * 8);
        double *mn = malloc((mb+2)*8), *mx = malloc((mb+2)*8), *sl = malloc((mb+2)*8), *ic = malloc((mb+2)*8);
        tersets_histogram(v, n, mb, 0, b_, e_, mn, mx, sl, ic);
        tersets_histogram(v, n, mb, 1, b_, e_, mn, mx, sl, ic);
        double eb = (trial % 3 == 0) ? 0.0 : (trial % 3 == 1 ? 0.5 : 25.0);
        if (n >= 2) {
            tersets_swing(v, n, eb, 0, buf);
            tersets_swing(v, n, eb, 1, buf);
            tersets_swing(v, n, eb, 2, buf);
            tersets_abc(v, n, eb, buf);
        }
        if (n >= 3) {
            tersets_vw(v, n, eb, buf);
            tersets_bottom_up(v, n, eb, buf);
        }
        tersets_sliding_window(v, n, eb, buf);
        double ebp = eb > 0 ? eb : 0.5;
        tersets_sim_piece(v, n, ebp, ebp - 1e-7, 1.00000001e-07, buf);
        tersets_mix_piece(v, n, ebp, ebp - 1e-7, 1.00000001e-07, buf);
        {
            long thr = 2 + rand() % 130;
            long offs[2] = { 0, n };
            long out_n = (thr >= n || thr < 3) ? n : thr;
            long oo[2] = { 0, out_n };
            double *lout = malloc((out_n > 0 ? out_n : 1) * 8);
            tersets_lttb(v, offs, 1, thr, lout, oo);
            free(lout);
        }
        free(v); free(buf); free(b_); free(e_); free(mn); free(mx); free(sl); free(ic);
    }
    printf("asan sweep ok\n");
    return 0;
}
/* Build + run:
 *   gcc -O1 -g -ffp-contract=off -fsanitize=address,undefined \
 *       tools/asan_sweep.c tersets_spark/codecs/_histogram_native.c \
 *       tersets_spark/codecs/_swing_native.c \
 *       tersets_spark/codecs/_linesimp_native.c \
 *       tersets_spark/codecs/_piece_native.c \
 *       tersets_spark/codecs/_lttb_native.c -o /tmp/asan_all -lm
 *   ASAN_OPTIONS=detect_leaks=1 /tmp/asan_all
 * Last run (round 3): clean — no leaks, no UB, 150 trials x 9 entry points
 *   (also with -O3 -march=native to compile the guarded SIMD paths).
 */
