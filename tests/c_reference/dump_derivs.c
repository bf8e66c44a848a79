/* Derivative-dump oracle: the MMex role (iLQG_MMex.tem modes 0-16).
 *
 * Fills the reference solver's nominal trajectory with given (x, u) pairs,
 * runs the generated calc_derivs() + forward_pass() unmodified, and dumps
 * every derivative object so the framework's autodiff bundles can be
 * compared against the reference's analytic formulas point-by-point
 * (SURVEY.md section 4 leg 2: the derivative-verification harness).
 *
 * Input (little-endian float64):
 *   [0] T, then xs[(T+1)*4] step-major, us[T*2] step-major,
 *   then 20 params (same order as main.c)
 *
 * Output per step k (float64, in this order, reference storage layouts):
 *   fx[16] fu[8] fxx[40] fuu[12] fxu[32]
 *   cx[4] cxx[10 packed] cu[2] cuu[3 packed] cxu[8]
 *   lower[2] upper[2] lower_sign[2] upper_sign[2] c[1]
 * then final: cx[4] cxx[10 packed] c[1]
 * then rollout check: x_roll[(T+1)*4] (forward_pass from xs[0] with the
 * given u as nominal, alpha=0), cost[1]
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "iLQG.h"

static double *read_doubles(FILE *fp, size_t n) {
    double *buf = malloc(sizeof(double) * n);
    if (!buf || fread(buf, sizeof(double), n, fp) != n) {
        fprintf(stderr, "short read\n");
        exit(2);
    }
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s input.bin output.bin\n", argv[0]);
        return 2;
    }
    FILE *fin = fopen(argv[1], "rb");
    if (!fin) { perror("input"); return 2; }
    double *head = read_doubles(fin, 1);
    int T = (int)head[0];
    double *xs = read_doubles(fin, (size_t)(T + 1) * N_X);
    double *us = read_doubles(fin, (size_t)T * N_U);
    double *pblk = read_doubles(fin, 20);
    fclose(fin);

    tOptSet o;
    memset(&o, 0, sizeof(o));
    o.n_hor = T;
    standard_parameters(&o);
    o.p = malloc(n_params * sizeof(double *));
    {
        int i, off = 0;
        for (i = 0; i < n_params; i++) {
            o.p[i] = pblk + off;
            off += paramdesc[i]->size;
        }
    }
    {
        int i;
        for (i = 0; i < NUMBER_OF_THREADS + 1; i++)
            o.trajectories[i].t = malloc(sizeof(trajEl_t) * T);
        o.multipliers.t = malloc(sizeof(multipliersEl_t) * (T + 1) + 1);
    }
    if (!init_opt(&o)) { fprintf(stderr, "init_opt failed\n"); return 3; }

    int k, i;
    for (k = 0; k < T; k++) {
        for (i = 0; i < N_X; i++) o.nominal->t[k].x[i] = xs[k * N_X + i];
        for (i = 0; i < N_U; i++) o.nominal->t[k].u[i] = us[k * N_U + i];
    }
    for (i = 0; i < N_X; i++) o.nominal->f.x[i] = xs[T * N_X + i];

    if (!calc_derivs(&o)) { fprintf(stderr, "calc_derivs failed\n"); return 4; }

    /* per-step running cost via forward_pass(cost_only=1) fills t->c */
    double csum_dummy;
    if (!forward_pass(o.nominal, &o, 0.0, &csum_dummy, 1)) {
        fprintf(stderr, "cost eval failed\n");
        return 4;
    }

    FILE *fout = fopen(argv[2], "wb");
    if (!fout) { perror("output"); return 2; }
    for (k = 0; k < T; k++) {
        trajEl_t *t = &o.nominal->t[k];
        fwrite(t->fx, sizeof(double), N_X * N_X, fout);
        fwrite(t->fu, sizeof(double), N_X * N_U, fout);
#if FULL_DDP
        fwrite(t->fxx, sizeof(double), N_X * sizeofQxx, fout);
        fwrite(t->fuu, sizeof(double), N_X * sizeofQuu, fout);
        fwrite(t->fxu, sizeof(double), N_X * sizeofQxu, fout);
#endif
        fwrite(t->cx, sizeof(double), N_X, fout);
        fwrite(t->cxx, sizeof(double), sizeofQxx, fout);
        fwrite(t->cu, sizeof(double), N_U, fout);
        fwrite(t->cuu, sizeof(double), sizeofQuu, fout);
        fwrite(t->cxu, sizeof(double), sizeofQxu, fout);
        fwrite(t->lower, sizeof(double), N_U, fout);
        fwrite(t->upper, sizeof(double), N_U, fout);
        fwrite(t->lower_sign, sizeof(double), N_U, fout);
        fwrite(t->upper_sign, sizeof(double), N_U, fout);
        fwrite(&t->c, sizeof(double), 1, fout);
    }
    fwrite(o.nominal->f.cx, sizeof(double), N_X, fout);
    fwrite(o.nominal->f.cxx, sizeof(double), sizeofQxx, fout);
    fwrite(&o.nominal->f.c, sizeof(double), 1, fout);

    /* open-loop rollout from xs[0] (alpha=0): dynamics parity */
    o.x0 = xs;
    double cost;
    if (!forward_pass(o.candidates[0], &o, 0.0, &cost, 0)) {
        fprintf(stderr, "rollout failed\n");
        return 4;
    }
    for (k = 0; k < T; k++)
        fwrite(o.candidates[0]->t[k].x, sizeof(double), N_X, fout);
    fwrite(o.candidates[0]->f.x, sizeof(double), N_X, fout);
    fwrite(&cost, sizeof(double), 1, fout);
    fclose(fout);
    return 0;
}
