/* Reference-style histogram-GBDT TRAINING baseline (timing denominator).
 *
 * Re-creates the per-iteration tree-fitting cost of QuickRank's MART loop
 * on one node, with the reference's parallel structure and data layout —
 * NOT a copy of the reference (original code; same semantics):
 *   - feature-major (vertical) u8 bin matrix, like VerticalDataset + stmap;
 *   - per-node sampleid lists; a split partitions the parent's list
 *     (rt.cc:325-347 semantics);
 *   - LEFT child histogram accumulated over its sampleids with OpenMP over
 *     features, cumulative per feature, double sums; RIGHT child by
 *     parent-minus-left subtraction (rtnode_histogram.cc:40-87 semantics);
 *   - best-first growth: pop the max-deviance leaf, deviance =
 *     sum g^2 - (sum g)^2 / n; gain = ls^2/lc + rs^2/rc with both children
 *     >= minls (rt.cc:49-90, :209-313); OpenMP over features in the scan;
 *   - MART pseudoresponses label - score, mean-gradient leaves, shrinkage
 *     update (mart.cc:307-383 loop shape).
 *
 * Deliberately CONSERVATIVE (favors the baseline): no per-iteration metric
 * evaluation, no LambdaMART pairwise lambda computation (both are extra
 * reference cost our measured s/tree includes), uint32 sampleids instead
 * of the reference's size_t.
 *
 * Usage: c_train_baseline N F B nleaves ntrees warmup minls seed
 * Prints one line per timed tree: "tree <i> <seconds>", then a summary.
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#ifdef _OPENMP
#include <omp.h>
#endif

typedef struct {
  uint32_t start, count; /* window into the docs[] partition */
  double *hist;          /* [F*B*2] cumulative (count, sum) per feature */
  double sum, sqsum;     /* node gradient totals */
  double deviance;
  double gain;           /* best split gain (-inf if none) */
  int feat, bin;         /* best split */
  int live;
} Leaf;

static double now_s(void) {
  struct timespec t;
  clock_gettime(CLOCK_MONOTONIC, &t);
  return t.tv_sec + 1e-9 * t.tv_nsec;
}

/* xorshift PRNG: portable deterministic data */
static uint64_t rng_state = 88172645463325252ull;
static inline uint64_t xr(void) {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return rng_state;
}

/* cumulative (count, sum) histogram of one node from its sampleids —
 * OpenMP over features, doubles, cumulative scan per feature (the
 * rtnode_histogram.cc:51-63 structure) */
static void build_hist(const uint8_t *bins, const double *grad,
                       const uint32_t *ids, uint32_t n, double *hist,
                       long N, int F, int B) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int f = 0; f < F; ++f) {
    double *h = hist + (size_t)f * B * 2;
    memset(h, 0, sizeof(double) * B * 2);
    const uint8_t *col = bins + (size_t)f * N;
    for (uint32_t i = 0; i < n; ++i) {
      const uint32_t s = ids[i];
      const int t = col[s];
      h[2 * t] += 1.0;
      h[2 * t + 1] += grad[s];
    }
    for (int t = 1; t < B; ++t) { /* cumulative, like the reference */
      h[2 * t] += h[2 * (t - 1)];
      h[2 * t + 1] += h[2 * (t - 1) + 1];
    }
  }
}

static void subtract_hist(const double *parent, const double *left,
                          double *right, int F, int B) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int f = 0; f < F; ++f) {
    const double *p = parent + (size_t)f * B * 2;
    const double *l = left + (size_t)f * B * 2;
    double *r = right + (size_t)f * B * 2;
    for (int t = 0; t < 2 * B; ++t) r[t] = p[t] - l[t];
  }
}

/* max-gain (feature, bin) over the cumulative histogram — OpenMP over
 * features with a serial reduction (rt.cc:257-313's scan structure) */
static void best_split(Leaf *L, int F, int B, int minls) {
  double best = -INFINITY;
  int bf = -1, bb = -1;
  const double tot_c = L->hist[2 * (B - 1)];
  const double tot_s = L->hist[2 * (B - 1) + 1];
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    double my_best = -INFINITY;
    int my_f = -1, my_b = -1;
#ifdef _OPENMP
#pragma omp for schedule(static) nowait
#endif
    for (int f = 0; f < F; ++f) {
      const double *h = L->hist + (size_t)f * B * 2;
      for (int t = 0; t < B - 1; ++t) {
        const double lc = h[2 * t];
        const double rc = tot_c - lc;
        if (lc < minls || rc < minls) continue;
        const double ls = h[2 * t + 1];
        const double rs = tot_s - ls;
        const double g = ls * ls / lc + rs * rs / rc;
        if (g > my_best) { my_best = g; my_f = f; my_b = t; }
      }
    }
#ifdef _OPENMP
#pragma omp critical
#endif
    if (my_best > best) { best = my_best; bf = my_f; bb = my_b; }
  }
  L->gain = best;
  L->feat = bf;
  L->bin = bb;
}

int main(int argc, char **argv) {
  long N = argc > 1 ? atol(argv[1]) : 2560000;
  int F = argc > 2 ? atoi(argv[2]) : 136;
  int B = argc > 3 ? atoi(argv[3]) : 256;
  int nleaves = argc > 4 ? atoi(argv[4]) : 16;
  int ntrees = argc > 5 ? atoi(argv[5]) : 10;
  int warmup = argc > 6 ? atoi(argv[6]) : 2;
  int minls = argc > 7 ? atoi(argv[7]) : 1;
  rng_state += argc > 8 ? (uint64_t)atol(argv[8]) : 0;
  const double shrinkage = 0.1;

  uint8_t *bins = malloc((size_t)F * N);
  float *labels = malloc(sizeof(float) * N);
  float *scores = calloc(N, sizeof(float));
  double *grad = malloc(sizeof(double) * N);
  uint32_t *docs = malloc(sizeof(uint32_t) * N);
  uint32_t *tmp = malloc(sizeof(uint32_t) * N);
  if (!bins || !labels || !scores || !grad || !docs || !tmp) {
    fprintf(stderr, "alloc failed\n");
    return 1;
  }
  for (size_t i = 0; i < (size_t)F * N; ++i) bins[i] = (uint8_t)(xr() % B);
  for (long i = 0; i < N; ++i) labels[i] = (float)(xr() % 5);

  const int max_leaves = 2 * nleaves; /* split nodes stay in the array */
  Leaf *leaves = calloc(max_leaves, sizeof(Leaf));
  /* histogram buffer pool: at most nleaves live + 2 children in flight */
  const int npool = nleaves + 3;
  double **pool = malloc(sizeof(double *) * npool);
  int pool_top = 0;
  for (int i = 0; i < npool; ++i)
    pool[i] = malloc(sizeof(double) * (size_t)F * B * 2);

  double total_timed = 0.0;
  int timed = 0;
  for (int m = 0; m < ntrees; ++m) {
    const double t0 = now_s();

    /* MART pseudoresponses (mart.cc:418-431) */
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (long i = 0; i < N; ++i) grad[i] = (double)labels[i] - scores[i];
    for (long i = 0; i < N; ++i) docs[i] = (uint32_t)i;

    /* root */
    pool_top = npool; /* reset pool: all buffers free */
    memset(leaves, 0, sizeof(Leaf) * max_leaves);
    int nl = 1;
    Leaf *root = &leaves[0];
    root->start = 0;
    root->count = (uint32_t)N;
    root->hist = pool[--pool_top];
    build_hist(bins, grad, docs, root->count, root->hist, N, F, B);
    root->sum = root->hist[2 * (B - 1) + 1];
    double sq = 0.0;
#ifdef _OPENMP
#pragma omp parallel for reduction(+ : sq) schedule(static)
#endif
    for (long i = 0; i < N; ++i) sq += grad[i] * grad[i];
    root->sqsum = sq;
    root->deviance = root->sqsum - root->sum * root->sum / root->count;
    best_split(root, F, B, minls);
    root->live = 1;

    /* best-first: nleaves - 1 splits, max-deviance priority (rt.cc:64-90) */
    for (int split = 0; split < nleaves - 1; ++split) {
      int pick = -1;
      double bestdev = -INFINITY;
      for (int i = 0; i < nl; ++i)
        if (leaves[i].live && leaves[i].feat >= 0 &&
            leaves[i].deviance > bestdev && leaves[i].deviance > 0) {
          bestdev = leaves[i].deviance;
          pick = i;
        }
      if (pick < 0) break;
      Leaf *P = &leaves[pick];

      /* stable partition of the parent's sampleid window (rt.cc:325-347) */
      const uint8_t *col = bins + (size_t)P->feat * N;
      uint32_t nleft = 0, nright = 0;
      uint32_t *w = docs + P->start;
      for (uint32_t i = 0; i < P->count; ++i) {
        const uint32_t s = w[i];
        if (col[s] <= P->bin) w[nleft++] = s;
        else tmp[nright++] = s;
      }
      memcpy(w + nleft, tmp, sizeof(uint32_t) * nright);

      Leaf *Lc = &leaves[nl];
      Leaf *Rc = &leaves[nl + 1];
      nl += 2;
      Lc->start = P->start;
      Lc->count = nleft;
      Rc->start = P->start + nleft;
      Rc->count = nright;
      Lc->hist = pool[--pool_top];
      Rc->hist = pool[--pool_top];
      build_hist(bins, grad, docs + Lc->start, nleft, Lc->hist, N, F, B);
      subtract_hist(P->hist, Lc->hist, Rc->hist, F, B);
      double lsq = 0.0;
      for (uint32_t i = 0; i < nleft; ++i) {
        const double g = grad[w[i]];
        lsq += g * g;
      }
      Lc->sum = Lc->hist[2 * (B - 1) + 1];
      Rc->sum = P->sum - Lc->sum;
      Lc->sqsum = lsq;
      Rc->sqsum = P->sqsum - lsq;
      Lc->deviance =
          nleft ? Lc->sqsum - Lc->sum * Lc->sum / nleft : 0.0;
      Rc->deviance =
          nright ? Rc->sqsum - Rc->sum * Rc->sum / nright : 0.0;
      best_split(Lc, F, B, minls);
      best_split(Rc, F, B, minls);
      Lc->live = Rc->live = 1;
      P->live = 0;
      pool[pool_top++] = P->hist; /* parent histogram freed */
      P->hist = NULL;
    }

    /* leaf outputs: mean gradient, shrinkage-scaled score update */
    double acc = 0.0;
    for (int i = 0; i < nl; ++i) {
      Leaf *L = &leaves[i];
      if (!L->live) continue;
      const double v = L->count ? L->sum / L->count : 0.0;
      acc += v;
      const uint32_t *w = docs + L->start;
      for (uint32_t j = 0; j < L->count; ++j)
        scores[w[j]] += (float)(shrinkage * v);
      if (L->hist) { pool[pool_top++] = L->hist; L->hist = NULL; }
      L->live = 0;
    }

    const double dt = now_s() - t0;
    if (m >= warmup) { total_timed += dt; ++timed; }
    printf("tree %d %.6f\n", m, dt);
    fprintf(stderr, "# tree %d: %.3fs (leafsum %.4g)\n", m, dt, acc);
  }
#ifdef _OPENMP
  const int threads = omp_get_max_threads();
#else
  const int threads = 1;
#endif
  printf("summary docs=%ld feats=%d bins=%d nleaves=%d threads=%d "
         "mean_s_per_tree=%.6f\n",
         N, F, B, nleaves, threads, timed ? total_timed / timed : 0.0);
  return 0;
}
