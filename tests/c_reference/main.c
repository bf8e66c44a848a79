/* Standalone driver for the reference iLQG solver core (CarParking).
 *
 * Replaces the MEX wrapper (/root/reference/iLQG_mex.c:19-144) with a plain
 * main(): reads a binary workload file, runs the reference algorithm
 * unmodified, writes a binary result file.  Used by
 * tests/test_c_reference_parity.py as the numeric parity oracle.
 *
 * Input file (all little-endian float64):
 *   [0]       T (horizon, as double)
 *   [1..4]    x0 (4 states)
 *   [5..5+2T) u0, step-major: u0[k*2 + i] = input i at step k
 *   then 20 parameter doubles in paramdesc order (alphabetical, matching
 *   gen_problem_c.py): cf[4], cu[2], cx[2], d, h, limA[2], limW[2],
 *   pf[4], px[2]
 *   then 2 option doubles: max_iter, tolFun
 *
 * Output file (float64):
 *   [0] success, [1] final cost, [2] iterations, [3] g_norm, [4] lambda,
 *   then x[(T+1)*4] step-major, then u[T*2] step-major.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "iLQG.h"

static double *read_doubles(FILE *fp, size_t n) {
    double *buf = malloc(sizeof(double) * n);
    if (!buf || fread(buf, sizeof(double), n, fp) != n) {
        fprintf(stderr, "short read (%zu doubles expected)\n", n);
        exit(2);
    }
    return buf;
}

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s input.bin output.bin [debug_level]\n", argv[0]);
        return 2;
    }
    FILE *fin = fopen(argv[1], "rb");
    if (!fin) { perror("input"); return 2; }

    double *head = read_doubles(fin, 5);
    int T = (int)head[0];
    double *x0 = head + 1;
    double *u0 = read_doubles(fin, (size_t)T * N_U);
    double *pblk = read_doubles(fin, 20);
    double *optblk = read_doubles(fin, 2);
    fclose(fin);

    tOptSet o;
    memset(&o, 0, sizeof(o));
    o.x0 = x0;
    o.n_hor = T;
    standard_parameters(&o);
    o.max_iter = (int)optblk[0];
    o.tolFun = optblk[1];
    o.debug_level = (argc > 3) ? atoi(argv[3]) : 0;

    /* paramdesc order: cf cu cx d h limA limW pf px (sizes 4 2 2 1 1 2 2 4 2) */
    o.p = malloc(n_params * sizeof(double *));
    {
        int i, off = 0;
        for (i = 0; i < n_params; i++) {
            o.p[i] = pblk + off;
            off += paramdesc[i]->size;
        }
        if (off != 20) { fprintf(stderr, "param block size mismatch\n"); return 2; }
    }

    {
        int i, k;
        for (i = 0; i < NUMBER_OF_THREADS + 1; i++)
            o.trajectories[i].t = malloc(sizeof(trajEl_t) * T);
        o.multipliers.t = malloc(sizeof(multipliersEl_t) * (T + 1) + 1);

        if (!init_opt(&o)) { fprintf(stderr, "init_opt failed\n"); return 3; }

        /* initial nominal controls + init rollout (iLQG_mex.c:113-120) */
        for (k = 0; k < T; k++)
            for (i = 0; i < N_U; i++)
                o.nominal->t[k].u[i] = u0[k * N_U + i];
        double success = 0.0;
        if (!forward_pass(o.candidates[0], &o, 0.0, &o.cost, 0)) {
            fprintf(stderr, "initial rollout failed\n");
        } else {
            makeCandidateNominal(&o, 0);
            success = (double)iLQG(&o);
        }

        FILE *fout = fopen(argv[2], "wb");
        if (!fout) { perror("output"); return 2; }
        double hdr[5];
        hdr[0] = success;
        hdr[1] = o.cost;
        hdr[2] = (double)o.iterations;
        hdr[3] = o.g_norm;
        hdr[4] = o.lambda;
        fwrite(hdr, sizeof(double), 5, fout);
        for (k = 0; k < T; k++)
            fwrite(o.nominal->t[k].x, sizeof(double), N_X, fout);
        fwrite(o.nominal->f.x, sizeof(double), N_X, fout);
        for (k = 0; k < T; k++)
            fwrite(o.nominal->t[k].u, sizeof(double), N_U, fout);
        fclose(fout);
    }
    return 0;
}
