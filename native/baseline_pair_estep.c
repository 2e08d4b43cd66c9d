/* Single-core C baseline for the VBHEM pair E-step.
 *
 * Measures what a scalar single-threaded C implementation (the class of
 * the reference's MEX kernels, `vbhem_hmm_bwd_fwd_mex.c`) achieves on
 * THIS machine at the bench.py problem shape (Kb x Kr pairs, Sb=Sr=3,
 * D=2, tau=10).  This anchors bench.py's BASELINE_PAIRS_PER_SEC with a
 * measurement instead of an estimate (VERDICT round 1, "What's weak" #1).
 *
 * The math is a direct C transcription of the repo's own JAX kernel
 * (vbhem_tpu/ops/pair_estep.py): per (i,j) pair
 *   1. E3logN[b][r]  expected Gaussian log-lik under the NIW posterior
 *   2. backward recursion over tau steps -> theta tensors + LL_elbo
 *   3. forward accumulation -> nu_1, sum_xi, sum_t_nu
 * It is NOT derived from the reference C sources.
 *
 * Build & run:
 *   gcc -O2 -o baseline_pair_estep baseline_pair_estep.c -lm
 *   ./baseline_pair_estep [kb] [kr]
 * Prints one JSON line: {"pairs_per_sec": N, ...}
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#define SB 3
#define SR 3
#define D 2
#define TAU 10

static double now_sec(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

static double logsumexp_row(const double *x, int n) {
    double m = x[0];
    for (int i = 1; i < n; i++) if (x[i] > m) m = x[i];
    if (!isfinite(m)) return m;
    double s = 0.0;
    for (int i = 0; i < n; i++) s += exp(x[i] - m);
    return m + log(s);
}

/* per-base-HMM parameters */
typedef struct {
    double prior[SB];
    double trans[SB][SB];
    double mean[SB][D];
    double cov[SB][D][D];
} BaseHMM;

/* per-reduced-cluster variational parameters */
typedef struct {
    double log_pi[SR];
    double log_a[SR][SR];
    double m[SR][D];
    double w[SR][D][D];
    double v[SR];
    double lam[SR];
    double log_lam_tilde[SR];
} RedHMM;

/* outputs of one pair update */
typedef struct {
    double ll_elbo;
    double nu_1[SR];
    double sum_xi[SR][SR];
    double sum_t_nu[SR][SB];
} PairOut;

static void pair_update(const BaseHMM *bh, const RedHMM *rh, PairOut *out) {
    /* 1. expected emission log-lik matrix  ell[b][r] */
    double ell[SB][SR];
    const double dlog2pi = D * log(2.0 * M_PI);
    for (int b = 0; b < SB; b++) {
        for (int r = 0; r < SR; r++) {
            double tr = 0.0, quad = 0.0, diff[D];
            for (int d0 = 0; d0 < D; d0++)
                for (int d1 = 0; d1 < D; d1++)
                    tr += rh->w[r][d0][d1] * bh->cov[b][d1][d0];
            for (int d0 = 0; d0 < D; d0++)
                diff[d0] = bh->mean[b][d0] - rh->m[r][d0];
            for (int d0 = 0; d0 < D; d0++)
                for (int d1 = 0; d1 < D; d1++)
                    quad += diff[d0] * rh->w[r][d0][d1] * diff[d1];
            ell[b][r] = -0.5 * (dlog2pi - rh->log_lam_tilde[r]
                                + (double)D / rh->lam[r]
                                + rh->v[r] * (tr + quad));
        }
    }

    /* 2. backward: theta[t][rho_prev][b][rho], ll carried as [b][rho] */
    static double theta[TAU - 1][SR][SB][SR];
    double ll_old[SB][SR], ll_new[SB][SR];
    memset(ll_old, 0, sizeof ll_old);
    for (int t = 0; t < TAU - 1; t++) {
        double lse[SR][SB];
        for (int rp = 0; rp < SR; rp++) {
            for (int b = 0; b < SB; b++) {
                double row[SR];
                for (int r = 0; r < SR; r++)
                    row[r] = rh->log_a[rp][r] + ell[b][r] + ll_old[b][r];
                double z = logsumexp_row(row, SR);
                lse[rp][b] = z;
                for (int r = 0; r < SR; r++)
                    theta[t][rp][b][r] = exp(row[r] - z);
            }
        }
        for (int bp = 0; bp < SB; bp++)
            for (int rp = 0; rp < SR; rp++) {
                double s = 0.0;
                for (int c = 0; c < SB; c++)
                    s += bh->trans[bp][c] * lse[rp][c];
                ll_new[bp][rp] = s;
            }
        memcpy(ll_old, ll_new, sizeof ll_old);
    }
    /* terminate (t = 1) */
    double theta1[SB][SR], lse1[SB];
    for (int b = 0; b < SB; b++) {
        double row[SR];
        for (int r = 0; r < SR; r++)
            row[r] = rh->log_pi[r] + ell[b][r] + ll_old[b][r];
        lse1[b] = logsumexp_row(row, SR);
        for (int r = 0; r < SR; r++)
            theta1[b][r] = exp(row[r] - lse1[b]);
    }
    out->ll_elbo = 0.0;
    for (int b = 0; b < SB; b++) out->ll_elbo += bh->prior[b] * lse1[b];

    /* 3. forward: nu[rho][b]; iterate theta in REVERSE (t = 2..tau) */
    double nu[SR][SB];
    for (int r = 0; r < SR; r++)
        for (int b = 0; b < SB; b++)
            nu[r][b] = bh->prior[b] * theta1[b][r];
    for (int r = 0; r < SR; r++) {
        out->nu_1[r] = 0.0;
        for (int b = 0; b < SB; b++) out->nu_1[r] += nu[r][b];
    }
    memset(out->sum_xi, 0, sizeof out->sum_xi);
    for (int r = 0; r < SR; r++)
        for (int b = 0; b < SB; b++)
            out->sum_t_nu[r][b] = nu[r][b];
    for (int t = TAU - 2; t >= 0; t--) {
        double foo[SR][SB]; /* [rho_prev][b_cur] */
        for (int rp = 0; rp < SR; rp++)
            for (int c = 0; c < SB; c++) {
                double s = 0.0;
                for (int b = 0; b < SB; b++)
                    s += nu[rp][b] * bh->trans[b][c];
                foo[rp][c] = s;
            }
        double nu_new[SR][SB];
        memset(nu_new, 0, sizeof nu_new);
        for (int rp = 0; rp < SR; rp++)
            for (int c = 0; c < SB; c++) {
                double f = foo[rp][c];
                for (int r = 0; r < SR; r++) {
                    double xi = f * theta[t][rp][c][r];
                    out->sum_xi[rp][r] += xi;
                    nu_new[r][c] += xi;
                }
            }
        memcpy(nu, nu_new, sizeof nu);
        for (int r = 0; r < SR; r++)
            for (int b = 0; b < SB; b++)
                out->sum_t_nu[r][b] += nu_new[r][b];
    }
}

static double frand(unsigned *seed) {
    *seed = *seed * 1664525u + 1013904223u;
    return (double)(*seed >> 8) / (double)(1u << 24);
}

int main(int argc, char **argv) {
    int kb = argc > 1 ? atoi(argv[1]) : 8192;
    int kr = argc > 2 ? atoi(argv[2]) : 8;
    unsigned seed = 12345;

    BaseHMM *bases = malloc(sizeof(BaseHMM) * kb);
    RedHMM *reds = malloc(sizeof(RedHMM) * kr);
    for (int i = 0; i < kb; i++) {
        double ps = 0.0;
        for (int b = 0; b < SB; b++) { bases[i].prior[b] = frand(&seed) + .1; ps += bases[i].prior[b]; }
        for (int b = 0; b < SB; b++) bases[i].prior[b] /= ps;
        for (int b = 0; b < SB; b++) {
            double ts = 0.0;
            for (int c = 0; c < SB; c++) { bases[i].trans[b][c] = frand(&seed) + .1; ts += bases[i].trans[b][c]; }
            for (int c = 0; c < SB; c++) bases[i].trans[b][c] /= ts;
            for (int d = 0; d < D; d++) bases[i].mean[b][d] = 3.0 * (frand(&seed) - .5);
            for (int d0 = 0; d0 < D; d0++)
                for (int d1 = 0; d1 < D; d1++)
                    bases[i].cov[b][d0][d1] = (d0 == d1) ? 1.0 + frand(&seed) : 0.1 * frand(&seed);
            bases[i].cov[b][1][0] = bases[i].cov[b][0][1];
        }
    }
    for (int j = 0; j < kr; j++) {
        for (int r = 0; r < SR; r++) {
            reds[j].log_pi[r] = log(1.0 / SR);
            for (int s = 0; s < SR; s++) reds[j].log_a[r][s] = log(1.0 / SR);
            for (int d = 0; d < D; d++) reds[j].m[r][d] = 3.0 * (frand(&seed) - .5);
            for (int d0 = 0; d0 < D; d0++)
                for (int d1 = 0; d1 < D; d1++)
                    reds[j].w[r][d0][d1] = (d0 == d1) ? 1.0 + frand(&seed) : 0.05 * frand(&seed);
            reds[j].w[r][1][0] = reds[j].w[r][0][1];
            reds[j].v[r] = D + 2.0 + frand(&seed);
            reds[j].lam[r] = 1.0 + frand(&seed);
            reds[j].log_lam_tilde[r] = 0.5 * frand(&seed);
        }
    }

    PairOut out;
    double acc = 0.0;
    /* warmup */
    for (int i = 0; i < kb && i < 256; i++)
        for (int j = 0; j < kr; j++) { pair_update(&bases[i], &reds[j], &out); acc += out.ll_elbo; }

    int reps = 3;
    double t0 = now_sec();
    for (int rep = 0; rep < reps; rep++)
        for (int i = 0; i < kb; i++)
            for (int j = 0; j < kr; j++) {
                pair_update(&bases[i], &reds[j], &out);
                acc += out.ll_elbo;
            }
    double dt = (now_sec() - t0) / reps;
    double pps = (double)kb * kr / dt;
    printf("{\"pairs_per_sec\": %.1f, \"kb\": %d, \"kr\": %d, \"tau\": %d, "
           "\"sb\": %d, \"sr\": %d, \"dt_sec\": %.4f, \"checksum\": %.6g}\n",
           pps, kb, kr, TAU, SB, SR, dt, acc);
    return 0;
}
