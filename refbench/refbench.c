/* refbench — standalone timing + golden-fixture driver for the
 * REFERENCE engine's C hot path (jasperlinthorst/reveal).
 *
 * Links against the reference's own libdivsufsort compiled IN PLACE
 * from /root/reference/divsufsort (no sources copied into this repo;
 * see build.sh).  Around that SA build this driver re-implements, with
 * reference-identical semantics, the C hot loop of the reveal aligner:
 *
 *   - Kasai LCP               (reveallib/interface.c:97-111)
 *   - pairwise MUM scan       (reveallib/reveal.c:55-131  getmums)
 *   - longest-MUM pick        (reveallib/reveal.c:180-225 getlongestmum)
 *   - D-mark + lowercase      (reveallib/reveal.c:1612-1617 splitindex)
 *   - split leading/trailing  (reveallib/reveal.c:582-664  split)
 *   - bubble_sort LCP repair  (reveallib/reveal.c:666-727  bubble_sort)
 *
 * and drives them through the same LIFO recursion the reference's
 * aligner() thread runs (reveallib/reveal.c:729-1260), minus the
 * Python graph surgery and the schemes.py picker (longest-MUM stands
 * in — both are O(n) scans; omitting the Python side only makes the
 * reference LOOK FASTER, so the resulting baseline is conservative).
 *
 * Outputs one JSON line with phase timings and, with --fixture PREFIX,
 * golden fixtures for differential tests:
 *   PREFIX.json      n, sa/lcp FNV-1a64 hashes, head/tail samples
 *   PREFIX.mums.txt  one "l aStart bStart" per line (getmums order)
 *
 * Build/run: refbench/build.sh (gated on /root/reference existing).
 */
#include <ctype.h>
#include <inttypes.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "divsufsort.h"

typedef int32_t saidx32_t;

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

/* ---------- fasta ---------- */

/* Append every sequence of `path` (uppercased, one '$' after each) to
 * *T; mirrors utils.py fasta parsing (reveal/utils.py:95-110). */
static void load_fasta(const char *path, char **T, int64_t *n, int64_t *cap) {
    FILE *f = fopen(path, "r");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    char line[1 << 16];
    int insample = 0;
    while (fgets(line, sizeof line, f)) {
        if (line[0] == '>') {
            if (insample) { /* close previous sequence */
                if (*n + 1 > *cap) { *cap = 2 * *cap + 4096; *T = realloc(*T, *cap); }
                (*T)[(*n)++] = '$';
            }
            insample = 1;
            continue;
        }
        size_t len = strlen(line);
        while (len && (line[len - 1] == '\n' || line[len - 1] == '\r')) len--;
        if (*n + (int64_t)len > *cap) {
            while (*n + (int64_t)len > *cap) *cap = 2 * *cap + 4096;
            *T = realloc(*T, *cap);
        }
        for (size_t i = 0; i < len; i++) (*T)[(*n)++] = (char)toupper((unsigned char)line[i]);
    }
    if (insample) {
        if (*n + 1 > *cap) { *cap = 2 * *cap + 4096; *T = realloc(*T, *cap); }
        (*T)[(*n)++] = '$';
    }
    fclose(f);
}

/* ---------- LCP (Kasai; interface.c:97-111 semantics) ---------- */

static void kasai_lcp(const char *T, const saidx32_t *SA, const saidx32_t *SAi,
                      saidx32_t *LCP, int64_t n, int cap_sentinel) {
    /* cap_sentinel=0: reference semantics (a '$' matches a '$', so LCP
     * can run through sample boundaries — interface.c:97-111).
     * cap_sentinel=1: the reveal_tpu convention (matches stop at '$';
     * a cross-sentinel "common prefix" is meaningless for anchoring).
     * Both hashes go into the fixture so the deviation stays pinned. */
    int64_t h = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t k = SAi[i];
        if (k == 0) { LCP[k] = 0; h = 0; continue; }
        int64_t j = SA[k - 1];
        while (i + h < n && j + h < n && T[i + h] == T[j + h] &&
               !(cap_sentinel && T[i + h] == '$')) h++;
        LCP[k] = (saidx32_t)h;
        if (h > 0) h--;
    }
}

/* ---------- sub-index of the recursion ---------- */

typedef struct {
    saidx32_t *SA;
    saidx32_t *LCP;
    int64_t n;
    /* one live interval per sample side (pairwise, single-contig) */
    int64_t abegin, aend, bbegin, bend;
} SubIdx;

/* global text state shared by all sub-indexes (like RevealIndex.main) */
static char *g_T;
static saidx32_t *g_SAi;
static int64_t g_nsep0;

/* MUM scan, getmums semantics (reveal.c:55-131): returns count; if
 * `out` is non-NULL, writes "l aStart bStart" lines in scan order. */
static int64_t mum_scan(const SubIdx *ix, int minl, FILE *out) {
    int64_t cnt = 0;
    for (int64_t i = 1; i < ix->n; i++) {
        saidx32_t l = ix->LCP[i];
        if (l < minl) continue;
        if ((ix->SA[i] > g_nsep0) == (ix->SA[i - 1] > g_nsep0)) continue; /* repeat */
        saidx32_t aStart, bStart;
        if (ix->SA[i] < ix->SA[i - 1]) { aStart = ix->SA[i]; bStart = ix->SA[i - 1]; }
        else { aStart = ix->SA[i - 1]; bStart = ix->SA[i]; }
        if (aStart > 0 && bStart > 0) {
            char c = g_T[aStart - 1];
            if (!((c != g_T[bStart - 1]) || c == 'N' || c == '$' || islower((unsigned char)c)))
                continue; /* not left-maximal */
        }
        saidx32_t lb = ix->LCP[i - 1];
        saidx32_t la = (i == ix->n - 1) ? 0 : ix->LCP[i + 1];
        if (lb >= l || la >= l) continue; /* not unique */
        cnt++;
        if (out) fprintf(out, "%d %d %d\n", (int)l, (int)aStart, (int)bStart);
    }
    return cnt;
}

/* longest-MUM pick, getlongestmum semantics (reveal.c:180-225) */
static int pick_longest(const SubIdx *ix, int minl, saidx32_t *pa, saidx32_t *pb, saidx32_t *pl) {
    saidx32_t best = 0;
    for (int64_t i = 1; i < ix->n; i++) {
        if (ix->LCP[i] <= best) continue;
        if ((ix->SA[i] > g_nsep0) == (ix->SA[i - 1] > g_nsep0)) continue;
        saidx32_t aStart, bStart;
        if (ix->SA[i] < ix->SA[i - 1]) { aStart = ix->SA[i]; bStart = ix->SA[i - 1]; }
        else { aStart = ix->SA[i - 1]; bStart = ix->SA[i]; }
        if (aStart > 0 && bStart > 0) {
            char c = g_T[aStart - 1];
            if (!((c != g_T[bStart - 1]) || c == 'N' || c == '$' || islower((unsigned char)c)))
                continue;
        }
        saidx32_t lb = ix->LCP[i - 1];
        saidx32_t la = (i == ix->n - 1) ? 0 : ix->LCP[i + 1];
        if (lb >= ix->LCP[i] || la >= ix->LCP[i]) continue;
        best = ix->LCP[i]; *pa = aStart; *pb = bStart;
    }
    *pl = best;
    return best >= minl && best > 0;
}

/* bubble_sort LCP repair, reference-identical (reveal.c:666-727) */
static void bubble_repair(SubIdx *ix, const int64_t (*ivals)[2], int niv) {
    for (int v = 0; v < niv; v++) {
        int64_t begin = ivals[v][0];
        for (int64_t i = 0; i < ix->n; i++) {
            if (ix->SA[i] < begin && ix->SA[i] + ix->LCP[i] > begin) {
                int64_t x = i;
                saidx32_t tmpSA = ix->SA[i];
                saidx32_t tmpLCP = ix->LCP[i];
                while (x > 0 && ix->LCP[x] >= begin - tmpSA) {
                    g_SAi[ix->SA[x - 1]] = (saidx32_t)x;
                    ix->SA[x] = ix->SA[x - 1];
                    ix->LCP[x] = ix->LCP[x - 1];
                    x--;
                }
                g_SAi[tmpSA] = (saidx32_t)x;
                ix->SA[x] = tmpSA;
                ix->LCP[x + 1] = (saidx32_t)(begin - tmpSA);
                if (i < ix->n - 1 && tmpLCP < ix->LCP[i + 1]) ix->LCP[i + 1] = tmpLCP;
            } else if (i < ix->n - 1) {
                if (ix->SA[i] < begin && ix->SA[i] + ix->LCP[i + 1] > begin &&
                    ix->LCP[i + 1] > ix->LCP[i])
                    ix->LCP[i + 1] = (saidx32_t)(begin - ix->SA[i]);
            }
        }
    }
}

/* One recursion step: mark D from the MUM, lowercase the matched text,
 * split into leading/trailing with running-min LCP (reveal.c:582-664),
 * bubble-repair the leading index (reveal.c:1742).  Dropped suffixes
 * (sentinels, matched) simply don't propagate, as in the reference. */
static void split_step(SubIdx *ix, saidx32_t ma, saidx32_t mb, saidx32_t l,
                       SubIdx *lead, SubIdx *trail) {
    uint8_t *D = calloc((size_t)ix->n, 1);
    int64_t leadingn = 0, trailingn = 0;
    int64_t j;
    /* leading: [abegin, ma) + [bbegin, mb); trailing: [ma+l, aend) +
     * [mb+l, bend); matching: the two MUM intervals (lowercased) */
    for (j = ix->abegin; j < ma; j++) { D[g_SAi[j]] = 1; leadingn++; }
    for (j = ix->bbegin; j < mb; j++) { D[g_SAi[j]] = 1; leadingn++; }
    for (j = ma + l; j < ix->aend; j++) { D[g_SAi[j]] = 2; trailingn++; }
    for (j = mb + l; j < ix->bend; j++) { D[g_SAi[j]] = 2; trailingn++; }
    for (j = ma; j < ma + l; j++) { D[g_SAi[j]] = 3; g_T[j] = (char)tolower((unsigned char)g_T[j]); }
    for (j = mb; j < mb + l; j++) { D[g_SAi[j]] = 3; g_T[j] = (char)tolower((unsigned char)g_T[j]); }

    lead->n = leadingn; trail->n = trailingn;
    lead->SA = malloc((size_t)leadingn * sizeof(saidx32_t));
    lead->LCP = malloc((size_t)leadingn * sizeof(saidx32_t));
    trail->SA = malloc((size_t)trailingn * sizeof(saidx32_t));
    trail->LCP = malloc((size_t)trailingn * sizeof(saidx32_t));
    lead->abegin = ix->abegin; lead->aend = ma;
    lead->bbegin = ix->bbegin; lead->bend = mb;
    trail->abegin = ma + l; trail->aend = ix->aend;
    trail->bbegin = mb + l; trail->bend = ix->bend;

    /* split() proper: single pass, running min LCP per destination */
    int64_t il = 0, it = 0, lastl = 0, lastt = 0;
    saidx32_t minlcpl = 0, minlcpt = 0;
    for (int64_t i = 0; i < ix->n; i++) {
        if (D[i] == 1) {
            lead->SA[il] = ix->SA[i];
            lead->LCP[il] = (il == 0) ? 0 : minlcpl;
            g_SAi[ix->SA[i]] = (saidx32_t)il;
            il++; lastl = i;
        } else if (D[i] == 2) {
            trail->SA[it] = ix->SA[i];
            trail->LCP[it] = (it == 0) ? 0 : minlcpt;
            g_SAi[ix->SA[i]] = (saidx32_t)it;
            it++; lastt = i;
        } /* D==3 matched and D==0 sentinels: dropped */
        if (i == ix->n - 1) break;
        if (i == lastt) minlcpt = ix->LCP[i + 1];
        else if (ix->LCP[i + 1] < minlcpt) minlcpt = ix->LCP[i + 1];
        if (i == lastl) minlcpl = ix->LCP[i + 1];
        else if (ix->LCP[i + 1] < minlcpl) minlcpl = ix->LCP[i + 1];
    }
    free(D);

    if (leadingn > 0) {
        int64_t ivals[2][2] = {{ma, ma + l}, {mb, mb + l}};
        bubble_repair(lead, (const int64_t(*)[2])ivals, 2);
    }
}

static uint64_t fnv1a64(const void *data, size_t nbytes) {
    const uint8_t *p = data;
    uint64_t h = 0xcbf29ce484222325ULL;
    for (size_t i = 0; i < nbytes; i++) { h ^= p[i]; h *= 0x100000001b3ULL; }
    return h;
}

/* ---------- multiMUM fixture mode ---------- */

/* ismultimum (reveal.c:227-259): interval [lb, ub] must hit every
 * sample exactly once (nsep test for 2 samples, SO flags otherwise)
 * and be left-maximal somewhere. */
static int ref_ismultimum(const char *T, const saidx32_t *SA,
                          const int *SO, int64_t nsep0, int nsamples,
                          saidx32_t l, int64_t lb, int64_t ub,
                          int *flag_so) {
    if (l <= 0) return 0;
    int64_t j;
    memset(flag_so, 0, (size_t)nsamples * sizeof(int));
    if (nsamples == 2) {
        if ((SA[ub] > nsep0) == (SA[lb] > nsep0)) return 0;
    } else {
        for (j = lb; j < ub + 1; j++) {
            if (flag_so[SO[SA[j]]] == 0) flag_so[SO[SA[j]]] = 1;
            else return 0;
        }
    }
    for (j = lb; j < ub; j++) {
        if (SA[j] == 0) return 1;
        if (SA[j + 1] == 0) return 1;
        if (T[SA[j] - 1] != T[SA[j + 1] - 1] || T[SA[j] - 1] == 'N' ||
            T[SA[j] - 1] == '$' || islower((unsigned char)T[SA[j] - 1]))
            return 1;
    }
    return 0;
}

/* getmultimums (reveal.c:436-580): LCP-interval stack walk; emits one
 * "l n so:pos so:pos ..." line per multiMUM in the walk's emission
 * order (SA order within the interval, like the reference's crdmap). */
static int64_t ref_multimum_walk(const char *T, const saidx32_t *SA,
                                 const saidx32_t *LCP, const int *SO,
                                 int64_t n, int64_t nsep0, int nsamples,
                                 int minl, int minn, FILE *out) {
    int maxdepth = 1000;
    saidx32_t *st_lcp = malloc((size_t)maxdepth * sizeof(saidx32_t));
    int64_t *st_lb = malloc((size_t)maxdepth * sizeof(int64_t));
    int64_t *st_ub = malloc((size_t)maxdepth * sizeof(int64_t));
    int *flag_so = calloc((size_t)nsamples, sizeof(int));
    int depth = 0;
    int64_t count = 0;
    st_lcp[0] = 0; st_lb[0] = 0; st_ub[0] = 0;
    int64_t i, lb;

#define EMIT(i_lcp, i_lb, i_ub)                                          \
    do {                                                                 \
        int64_t cn = (i_ub) - (i_lb) + 1;                                \
        if ((i_lcp) >= minl && cn <= nsamples && cn >= minn &&           \
            ref_ismultimum(T, SA, SO, nsep0, nsamples, (saidx32_t)(i_lcp), \
                           (i_lb), (i_ub), flag_so)) {                   \
            count++;                                                     \
            if (out) {                                                   \
                fprintf(out, "%d %d", (int)(i_lcp), (int)cn);            \
                for (int64_t x = (i_lb); x <= (i_ub); x++)               \
                    fprintf(out, " %d:%d", SO[SA[x]], (int)SA[x]);       \
                fputc('\n', out);                                        \
            }                                                            \
        }                                                                \
    } while (0)

    for (i = 1; i < n; i++) {
        lb = i - 1;
        while (LCP[i] < st_lcp[depth]) {
            st_ub[depth] = i - 1;
            saidx32_t i_lcp = st_lcp[depth];
            int64_t i_lb = st_lb[depth];
            int64_t i_ub = st_ub[depth];
            depth--;
            EMIT(i_lcp, i_lb, i_ub);
            lb = i_lb;
        }
        if (LCP[i] > st_lcp[depth]) {
            depth++;
            if (depth >= maxdepth) {
                maxdepth += 1000;
                st_lcp = realloc(st_lcp, (size_t)maxdepth * sizeof(saidx32_t));
                st_lb = realloc(st_lb, (size_t)maxdepth * sizeof(int64_t));
                st_ub = realloc(st_ub, (size_t)maxdepth * sizeof(int64_t));
            }
            st_lcp[depth] = LCP[i];
            st_lb[depth] = lb;
            st_ub[depth] = 0;
        }
    }
    while (depth >= 0) {
        st_ub[depth] = n - 1;
        saidx32_t i_lcp = st_lcp[depth];
        int64_t i_lb = st_lb[depth];
        int64_t i_ub = st_ub[depth];
        depth--;
        EMIT(i_lcp, i_lb, i_ub);
    }
#undef EMIT
    free(st_lcp); free(st_lb); free(st_ub); free(flag_so);
    return count;
}

/* --multimums f1.fa f2.fa ... [minl N] [--fixture PREFIX]: the
 * reference's own multiMUM enumeration over any number of samples;
 * emits PREFIX.mmums.txt and one timing JSON line. */
static int multimum_main(int argc, char **argv) {
    const char *files[64];
    int nfiles = 0, minl = 20;
    const char *fixture = NULL;
    for (int i = 2; i < argc; i++) {
        if (!strcmp(argv[i], "--fixture") && i + 1 < argc) fixture = argv[++i];
        else if (!strcmp(argv[i], "--minl") && i + 1 < argc) minl = atoi(argv[++i]);
        else if (nfiles < 64) files[nfiles++] = argv[i];
    }
    if (nfiles < 2) { fprintf(stderr, "need >=2 fasta files\n"); return 2; }

    char *T = NULL; int64_t n = 0, cap = 0;
    int64_t bounds[65];
    for (int f = 0; f < nfiles; f++) {
        load_fasta(files[f], &T, &n, &cap);
        bounds[f] = n; /* one past sample f's final '$' */
    }
    int *SO = malloc((size_t)n * sizeof(int));
    {
        int f = 0;
        for (int64_t i = 0; i < n; i++) {
            while (i >= bounds[f]) f++;
            SO[i] = f;
        }
    }
    int64_t nsep0 = bounds[0] - 1;

    saidx32_t *SA = malloc((size_t)n * sizeof(saidx32_t));
    saidx32_t *SAi = malloc((size_t)n * sizeof(saidx32_t));
    saidx32_t *LCP = malloc((size_t)n * sizeof(saidx32_t));
    double t0 = now_s();
    if (divsufsort((const sauchar_t *)T, SA, (saidx_t)n) != 0) {
        fprintf(stderr, "divsufsort failed\n"); return 1;
    }
    double t_sa = now_s() - t0;
    t0 = now_s();
    for (int64_t i = 0; i < n; i++) SAi[SA[i]] = (saidx32_t)i;
    kasai_lcp(T, SA, SAi, LCP, n, 0);
    double t_lcp = now_s() - t0;

    /* uncapped walk = the reference's literal behavior (its Kasai lets
     * comparisons run through '$'); count kept in the JSON.  The
     * .mmums.txt fixture uses the sentinel-capped LCP — the repo's
     * documented deviation (a cross-sentinel "common prefix" is
     * meaningless for anchoring) — so the differential test compares
     * like with like while the raw count stays pinned. */
    t0 = now_s();
    int64_t cnt_ref = ref_multimum_walk(T, SA, LCP, SO, n, nsep0, nfiles,
                                        minl, 2, NULL);
    double t_mm = now_s() - t0;

    saidx32_t *LCPc = malloc((size_t)n * sizeof(saidx32_t));
    kasai_lcp(T, SA, SAi, LCPc, n, 1);
    FILE *out = NULL;
    char path[4096];
    if (fixture) {
        snprintf(path, sizeof path, "%s.mmums.txt", fixture);
        out = fopen(path, "w");
    }
    int64_t cnt = ref_multimum_walk(T, SA, LCPc, SO, n, nsep0, nfiles,
                                    minl, 2, out);
    if (out) fclose(out);
    printf("{\"ref_c_sa_seconds\": %.4f, \"ref_c_lcp_seconds\": %.4f, "
           "\"ref_c_multimum_seconds\": %.4f, \"n\": %lld, "
           "\"nsamples\": %d, \"multimums\": %lld, "
           "\"multimums_sentinel_capped\": %lld}\n",
           t_sa, t_lcp, t_mm, (long long)n, nfiles, (long long)cnt_ref,
           (long long)cnt);
    return 0;
}

/* ---------- multi-genome recursion mode (--remmulti) ----------
 *
 * Timed multi-genome rem baseline: the reference's own multiMUM
 * machinery (getmultimums LCP-interval walk + ismultimum,
 * reveal.c:436-580,227-259) driven through the LIFO recursion
 * (aligner(), reveal.c:731-1338) with a longest-multiMUM pick standing
 * in for the Python chain picker — omitting the Python side only makes
 * the reference LOOK FASTER, so the baseline is conservative (same
 * philosophy as the pairwise rem proxy above).  Split semantics follow
 * split() (reveal.c:582-664): leading/trailing for samples hit by the
 * picked mum, parallel (D=4) for whole intervals of samples it does
 * not span (reveal.c:1005-1117), bubble-repair on the leading child
 * per matched begin (reveal.c:666-727,1230-1251).
 */

#define MAXSAMP 64

typedef struct {
    saidx32_t *SA, *LCP;
    int64_t n;
    int64_t ivbeg[MAXSAMP], ivend[MAXSAMP]; /* -1,-1 = sample absent */
} MSub;

static int *g_SO;        /* sample-origin per text position */
static int g_nsamples;

/* longest multiMUM in the segment: LCP-interval stack walk
 * (reveal.c:436-580) with the candidate filter inline.  Prefers mums
 * spanning every present sample (the graphmumpicker subset rule,
 * schemes.py:227-231); falls back to the longest of any width >= 2
 * (cheaper than the reference's segment()+chain, conservative).
 * Returns width and positions (SA values) of the winner. */
static int pick_longest_multi(const MSub *ix, int minl, int npresent,
                              saidx32_t *out_pos, int *out_n,
                              saidx32_t *out_l) {
    enum { MAXD = 4096 };
    static saidx32_t st_lcp[MAXD];
    static int64_t st_lb[MAXD];
    int depth = 0;
    st_lcp[0] = 0; st_lb[0] = 0;
    saidx32_t best_full = 0, best_any = 0;
    int64_t bf_lb = -1, bf_ub = -1, ba_lb = -1, ba_ub = -1;
    saidx32_t bf_l = 0, ba_l = 0;
    int flag_so[MAXSAMP];

    const saidx32_t *SA = ix->SA;
    const saidx32_t *LCP = ix->LCP;
    const int64_t n = ix->n;

#define MCHECK(i_lcp, i_lb, i_ub)                                        \
    do {                                                                 \
        int64_t cn = (i_ub) - (i_lb) + 1;                                \
        if ((i_lcp) >= minl && cn >= 2 && cn <= g_nsamples &&            \
            ((i_lcp) > best_any || ((i_lcp) > best_full && cn == npresent))) { \
            int okm = 1;                                                 \
            memset(flag_so, 0, sizeof(int) * (size_t)g_nsamples);        \
            for (int64_t x = (i_lb); x <= (i_ub); x++) {                 \
                int so = g_SO[SA[x]];                                    \
                if (flag_so[so]) { okm = 0; break; }                     \
                flag_so[so] = 1;                                         \
            }                                                            \
            if (okm) {                                                   \
                int lm = 0;                                              \
                for (int64_t x = (i_lb); x < (i_ub); x++) {              \
                    if (SA[x] == 0 || SA[x + 1] == 0) { lm = 1; break; } \
                    char c = g_T[SA[x] - 1];                             \
                    if (c != g_T[SA[x + 1] - 1] || c == 'N' ||           \
                        c == '$' || islower((unsigned char)c)) {         \
                        lm = 1; break;                                   \
                    }                                                    \
                }                                                        \
                if (lm) {                                                \
                    if (cn == npresent && (i_lcp) > best_full) {         \
                        best_full = (i_lcp); bf_l = (i_lcp);             \
                        bf_lb = (i_lb); bf_ub = (i_ub);                  \
                    }                                                    \
                    if ((i_lcp) > best_any) {                            \
                        best_any = (i_lcp); ba_l = (i_lcp);              \
                        ba_lb = (i_lb); ba_ub = (i_ub);                  \
                    }                                                    \
                }                                                        \
            }                                                            \
        }                                                                \
    } while (0)

    for (int64_t i = 1; i < n; i++) {
        int64_t lb = i - 1;
        while (LCP[i] < st_lcp[depth]) {
            saidx32_t i_lcp = st_lcp[depth];
            int64_t i_lb = st_lb[depth];
            int64_t i_ub = i - 1;
            depth--;
            MCHECK(i_lcp, i_lb, i_ub);
            lb = i_lb;
        }
        if (LCP[i] > st_lcp[depth]) {
            if (depth + 1 >= MAXD) return 0; /* pathological depth */
            depth++;
            st_lcp[depth] = LCP[i];
            st_lb[depth] = lb;
        }
    }
    while (depth >= 0) {
        saidx32_t i_lcp = st_lcp[depth];
        int64_t i_lb = st_lb[depth];
        int64_t i_ub = n - 1;
        depth--;
        MCHECK(i_lcp, i_lb, i_ub);
    }
#undef MCHECK

    int64_t lb, ub;
    saidx32_t l;
    if (bf_lb >= 0) { lb = bf_lb; ub = bf_ub; l = bf_l; }
    else if (ba_lb >= 0) { lb = ba_lb; ub = ba_ub; l = ba_l; }
    else return 0;
    int cnt = 0;
    for (int64_t x = lb; x <= ub; x++) out_pos[cnt++] = SA[x];
    *out_n = cnt;
    *out_l = l;
    return 1;
}

/* one multi recursion step: D-mark, lowercase, 3-way split with
 * running-min LCP, bubble repair on leading (reveal.c:582-664,
 * 1005-1117, 1230-1251) */
static void split_step_multi(MSub *ix, const saidx32_t *pos, int nmum,
                             saidx32_t l, MSub *lead, MSub *trail,
                             MSub *par) {
    uint8_t *D = calloc((size_t)ix->n, 1);
    int64_t nl = 0, nt = 0, np = 0;
    int inmum[MAXSAMP];
    memset(inmum, 0, sizeof inmum);
    for (int c = 0; c < nmum; c++) inmum[g_SO[pos[c]]] = 1;
    for (int s = 0; s < g_nsamples; s++) {
        lead->ivbeg[s] = lead->ivend[s] = -1;
        trail->ivbeg[s] = trail->ivend[s] = -1;
        par->ivbeg[s] = par->ivend[s] = -1;
        if (ix->ivbeg[s] < 0) continue;
        if (!inmum[s]) { /* parallel: whole interval */
            for (int64_t j = ix->ivbeg[s]; j < ix->ivend[s]; j++) {
                D[g_SAi[j]] = 4; np++;
            }
            par->ivbeg[s] = ix->ivbeg[s];
            par->ivend[s] = ix->ivend[s];
        }
    }
    for (int c = 0; c < nmum; c++) {
        int s = g_SO[pos[c]];
        int64_t mb = pos[c];
        for (int64_t j = ix->ivbeg[s]; j < mb; j++) { D[g_SAi[j]] = 1; nl++; }
        for (int64_t j = mb + l; j < ix->ivend[s]; j++) { D[g_SAi[j]] = 2; nt++; }
        for (int64_t j = mb; j < mb + l; j++) {
            D[g_SAi[j]] = 3;
            g_T[j] = (char)tolower((unsigned char)g_T[j]);
        }
        if (mb > ix->ivbeg[s]) {
            lead->ivbeg[s] = ix->ivbeg[s]; lead->ivend[s] = mb;
        }
        if (mb + l < ix->ivend[s]) {
            trail->ivbeg[s] = mb + l; trail->ivend[s] = ix->ivend[s];
        }
    }
    lead->n = nl; trail->n = nt; par->n = np;
    lead->SA = malloc((size_t)(nl ? nl : 1) * sizeof(saidx32_t));
    lead->LCP = malloc((size_t)(nl ? nl : 1) * sizeof(saidx32_t));
    trail->SA = malloc((size_t)(nt ? nt : 1) * sizeof(saidx32_t));
    trail->LCP = malloc((size_t)(nt ? nt : 1) * sizeof(saidx32_t));
    par->SA = malloc((size_t)(np ? np : 1) * sizeof(saidx32_t));
    par->LCP = malloc((size_t)(np ? np : 1) * sizeof(saidx32_t));
    int64_t il = 0, it = 0, ip = 0, lastl = 0, lastt = 0, lastp = 0;
    saidx32_t minl_ = 0, mint_ = 0, minp_ = 0;
    for (int64_t i = 0; i < ix->n; i++) {
        if (D[i] == 1) {
            lead->SA[il] = ix->SA[i];
            lead->LCP[il] = (il == 0) ? 0 : minl_;
            g_SAi[ix->SA[i]] = (saidx32_t)il;
            il++; lastl = i;
        } else if (D[i] == 2) {
            trail->SA[it] = ix->SA[i];
            trail->LCP[it] = (it == 0) ? 0 : mint_;
            g_SAi[ix->SA[i]] = (saidx32_t)it;
            it++; lastt = i;
        } else if (D[i] == 4) {
            par->SA[ip] = ix->SA[i];
            par->LCP[ip] = (ip == 0) ? 0 : minp_;
            g_SAi[ix->SA[i]] = (saidx32_t)ip;
            ip++; lastp = i;
        }
        if (i == ix->n - 1) break;
        if (i == lastt) mint_ = ix->LCP[i + 1];
        else if (ix->LCP[i + 1] < mint_) mint_ = ix->LCP[i + 1];
        if (i == lastl) minl_ = ix->LCP[i + 1];
        else if (ix->LCP[i + 1] < minl_) minl_ = ix->LCP[i + 1];
        if (i == lastp) minp_ = ix->LCP[i + 1];
        else if (ix->LCP[i + 1] < minp_) minp_ = ix->LCP[i + 1];
    }
    free(D);
    if (nl > 0) {
        int64_t ivals[MAXSAMP][2];
        for (int c = 0; c < nmum; c++) {
            ivals[c][0] = pos[c]; ivals[c][1] = pos[c] + l;
        }
        SubIdx tmp = {lead->SA, lead->LCP, lead->n, 0, 0, 0, 0};
        bubble_repair(&tmp, (const int64_t(*)[2])ivals, nmum);
    }
}

static int remmulti_main(int argc, char **argv) {
    const char *files[MAXSAMP];
    int nfiles = 0, minl = 20;
    for (int i = 2; i < argc; i++) {
        if (!strcmp(argv[i], "--minl") && i + 1 < argc) minl = atoi(argv[++i]);
        else if (nfiles < MAXSAMP) files[nfiles++] = argv[i];
    }
    if (nfiles < 2) { fprintf(stderr, "need >=2 fasta files\n"); return 2; }

    char *T = NULL; int64_t n = 0, cap = 0;
    int64_t bounds[MAXSAMP + 1];
    for (int f = 0; f < nfiles; f++) {
        load_fasta(files[f], &T, &n, &cap);
        bounds[f] = n;
    }
    g_T = T;
    g_nsamples = nfiles;
    g_nsep0 = bounds[0] - 1;
    g_SO = malloc((size_t)n * sizeof(int));
    {
        int f = 0;
        for (int64_t i = 0; i < n; i++) {
            while (i >= bounds[f]) f++;
            g_SO[i] = f;
        }
    }

    saidx32_t *SA = malloc((size_t)n * sizeof(saidx32_t));
    saidx32_t *SAi = malloc((size_t)n * sizeof(saidx32_t));
    saidx32_t *LCP = malloc((size_t)n * sizeof(saidx32_t));
    double t0 = now_s();
    if (divsufsort((const sauchar_t *)T, SA, (saidx_t)n) != 0) {
        fprintf(stderr, "divsufsort failed\n"); return 1;
    }
    double t_sa = now_s() - t0;
    t0 = now_s();
    for (int64_t i = 0; i < n; i++) SAi[SA[i]] = (saidx32_t)i;
    kasai_lcp(T, SA, SAi, LCP, n, 1);
    double t_lcp = now_s() - t0;
    g_SAi = SAi;

    t0 = now_s();
    int64_t steps = 0, matched = 0;
    MSub root;
    root.SA = SA; root.LCP = LCP; root.n = n;
    for (int s = 0; s < g_nsamples; s++) {
        root.ivbeg[s] = (s == 0) ? 0 : bounds[s - 1] + 1;
        root.ivend[s] = bounds[s] - 1;
    }
    MSub *stack = malloc(1024 * sizeof(MSub));
    int64_t sp = 0, stackcap = 1024;
    stack[sp++] = root;
    saidx32_t pos[MAXSAMP];
    while (sp > 0) {
        MSub ix = stack[--sp];
        int npresent = 0;
        for (int s = 0; s < g_nsamples; s++)
            if (ix.ivbeg[s] >= 0) npresent++;
        saidx32_t l; int nmum;
        if (ix.n > 1 && npresent >= 2 &&
            pick_longest_multi(&ix, minl, npresent, pos, &nmum, &l)) {
            MSub lead, trail, par;
            split_step_multi(&ix, pos, nmum, l, &lead, &trail, &par);
            steps++; matched += (int64_t)nmum * (int64_t)l;
            if (sp + 3 > stackcap) {
                stackcap *= 2;
                stack = realloc(stack, (size_t)stackcap * sizeof(MSub));
            }
            /* push parallel, leading, trailing (reveal.c:1295-1324) */
            if (par.n > 0) stack[sp++] = par;
            else { free(par.SA); free(par.LCP); }
            if (lead.n > 0) stack[sp++] = lead;
            else { free(lead.SA); free(lead.LCP); }
            if (trail.n > 0) stack[sp++] = trail;
            else { free(trail.SA); free(trail.LCP); }
        }
        if (ix.SA != SA) { free(ix.SA); free(ix.LCP); }
    }
    free(stack);
    double t_rem = now_s() - t0;

    printf("{\"n\": %lld, \"nsamples\": %d, \"ref_c_sa_seconds\": %.4f, "
           "\"ref_c_lcp_seconds\": %.4f, \"ref_c_remmulti_seconds\": %.4f, "
           "\"rem_steps\": %lld, \"matched_bases\": %lld}\n",
           (long long)n, nfiles, t_sa, t_lcp, t_rem,
           (long long)steps, (long long)matched);
    return 0;
}

/* ---------- recursion-trace mode (--remtrace) ----------
 *
 * Per-step picked-anchor trace of the reference recursion under
 * threads=0 LIFO semantics, with the ACTUAL reference picker: a literal
 * C transliteration of schemes.graphmumpicker + chain + trim_overlap
 * (reveal/schemes.py:20-104,161-191,197-361), including the py2
 * behaviors that shape the output — stable list.sort, the i==0
 * containment-filter wraparound quirk (schemes.py:171), and dict
 * aliasing when two (trimmed) MUMs share a start offset (sp2mum /
 * score / link are keyed by the ref-axis offset, later writers win).
 * Written independently from the Python source; the repo's own engine
 * (reveal_tpu/native/esa.cpp pick_pairwise_dp) is a separate
 * implementation, so anchor-for-anchor agreement is a differential
 * check of both.
 *
 * Pairwise single-contig inputs only (the offset map pos->path offset
 * is then the arithmetic shift the reference's node-offset lookup
 * reduces to: offA = pos, offB = pos - (nsep0+1)).  seedsize=0
 * semantics (live picking at every step; the reference default of
 * 10000 switches children to precomputed-chain midpoint picks —
 * documented deviation, fixtures pin the live-picking trace).
 * Emits one "ma mb l aBeg aEnd bBeg bEnd" line per anchor in pop
 * order (trailing subtree first, reveal.c:21-27,1295-1324). */

typedef struct {
    int64_t l;      /* current (possibly trimmed) length */
    int64_t a, b;   /* text coords */
} TMum;

/* stable insertion sorts (py2 list.sort is stable; k is small) */
static void tm_sort_start_negl(TMum *m, int64_t k, int coord) {
    for (int64_t i = 1; i < k; i++) {
        TMum x = m[i];
        int64_t xs = coord == 0 ? x.a : x.b;
        int64_t j = i - 1;
        while (j >= 0) {
            int64_t js = coord == 0 ? m[j].a : m[j].b;
            if (js > xs || (js == xs && -m[j].l > -x.l)) {
                m[j + 1] = m[j];
                j--;
            } else break;
        }
        m[j + 1] = x;
    }
}

static void tm_sort_l_desc(TMum *m, int64_t k) {
    for (int64_t i = 1; i < k; i++) {
        TMum x = m[i];
        int64_t j = i - 1;
        while (j >= 0 && m[j].l < x.l) { m[j + 1] = m[j]; j--; }
        m[j + 1] = x;
    }
}

static void tm_sort_l_asc(TMum *m, int64_t k) {
    for (int64_t i = 1; i < k; i++) {
        TMum x = m[i];
        int64_t j = i - 1;
        while (j >= 0 && m[j].l > x.l) { m[j + 1] = m[j]; j--; }
        m[j + 1] = x;
    }
}

/* trim_overlap (schemes.py:161-191), both coords, literal */
static int64_t trim_overlap_c(TMum *m, int64_t k) {
    for (int coord = 0; coord < 2; coord++) {
        if (k <= 1) break;
        tm_sort_start_negl(m, k, coord);
        /* containment filter incl. the i==0 wraparound quirk */
        TMum *keep = malloc((size_t)k * sizeof(TMum));
        int64_t nk = 0;
        for (int64_t i = 0; i < k; i++) {
            int64_t me = (coord == 0 ? m[i].a : m[i].b) + m[i].l;
            int ok;
            if (i == 0) {
                int64_t ne = (coord == 0 ? m[1].a : m[1].b) + m[1].l;
                ok = ne > me;
            } else {
                int64_t pe = (coord == 0 ? m[i - 1].a : m[i - 1].b) + m[i - 1].l;
                ok = pe < me;
            }
            if (ok) keep[nk++] = m[i];
        }
        memcpy(m, keep, (size_t)nk * sizeof(TMum));
        free(keep);
        k = nk;
        if (k <= 1) break;
        /* overlap trimming (schemes.py:175-189) */
        TMum *tr = malloc((size_t)k * sizeof(TMum));
        int64_t nt = 0;
        tr[nt++] = m[0];
        for (int64_t i = 1; i < k; i++) {
            TMum cur = m[i];
            if (nt == 0) { tr[nt++] = cur; continue; }
            TMum *p = &tr[nt - 1];
            int64_t ov = ((coord == 0 ? p->a : p->b) + p->l) -
                         (coord == 0 ? cur.a : cur.b);
            if (ov > 0) {
                if (p->l - ov > 0) p->l -= ov;
                else nt--; /* del trimmed[-1] */
                if (cur.l - ov > 0) {
                    cur.l -= ov;
                    cur.a += ov;  /* all coords shift (schemes.py:185) */
                    cur.b += ov;
                    tr[nt++] = cur;
                }
            } else {
                tr[nt++] = cur;
            }
        }
        memcpy(m, tr, (size_t)nt * sizeof(TMum));
        free(tr);
        k = nt;
    }
    return k;
}

/* py2-dict emulation keyed by the ref-axis (a) offset: one slot per
 * key, later writers overwrite (the aliasing path) */
typedef struct { int64_t *keys, *vals; int64_t n, cap; } I64Map;
static void map_init(I64Map *d, int64_t cap) {
    d->keys = malloc((size_t)cap * sizeof(int64_t));
    d->vals = malloc((size_t)cap * sizeof(int64_t));
    d->n = 0; d->cap = cap;
}
static void map_free(I64Map *d) { free(d->keys); free(d->vals); }
static void map_set(I64Map *d, int64_t k, int64_t v) {
    for (int64_t i = 0; i < d->n; i++)
        if (d->keys[i] == k) { d->vals[i] = v; return; }
    d->keys[d->n] = k; d->vals[d->n] = v; d->n++;
}
static int64_t map_get(const I64Map *d, int64_t k) {
    for (int64_t i = 0; i < d->n; i++)
        if (d->keys[i] == k) return d->vals[i];
    fprintf(stderr, "remtrace: key %lld missing\n", (long long)k);
    exit(4);
}

/* schemes.graphmumpicker for the pairwise live path; returns 1 and the
 * picked (ma, mb, l) in text coords, 0 for stop. */
static int pick_schemes(const SubIdx *ix, int minl, int maxmums,
                        int64_t wscore, int64_t wpen,
                        saidx32_t *pa, saidx32_t *pb, saidx32_t *pl) {
    /* collect MUMs (getmums_rem scan order) */
    int64_t cap = 256, k = 0;
    TMum *m = malloc((size_t)cap * sizeof(TMum));
    for (int64_t i = 1; i < ix->n; i++) {
        saidx32_t l = ix->LCP[i];
        if (l < minl) continue;
        if ((ix->SA[i] > g_nsep0) == (ix->SA[i - 1] > g_nsep0)) continue;
        saidx32_t aS, bS;
        if (ix->SA[i] < ix->SA[i - 1]) { aS = ix->SA[i]; bS = ix->SA[i - 1]; }
        else { aS = ix->SA[i - 1]; bS = ix->SA[i]; }
        if (aS > 0 && bS > 0) {
            char c = g_T[aS - 1];
            if (!((c != g_T[bS - 1]) || c == 'N' || c == '$' ||
                  islower((unsigned char)c)))
                continue;
        }
        saidx32_t lb = ix->LCP[i - 1];
        saidx32_t la = (i == ix->n - 1) ? 0 : ix->LCP[i + 1];
        if (lb >= l || la >= l) continue;
        if (k == cap) { cap *= 2; m = realloc(m, (size_t)cap * sizeof(TMum)); }
        m[k].l = l; m[k].a = aS; m[k].b = bS; k++;
    }
    if (k == 0) { free(m); return 0; }

    k = trim_overlap_c(m, k);           /* args.trim default True */
    if (k == 0) { free(m); return 0; }
    tm_sort_l_desc(m, k);               /* mmums.sort(key=l, reverse) */
    /* mapping dict snapshot: built during maptooffsets in THIS desc
     * order, keyed by the offsets tuple (later writers win) — the
     * final splitmum lookup goes through it (schemes.py:152-158,330) */
    TMum *mdesc = malloc((size_t)k * sizeof(TMum));
    memcpy(mdesc, m, (size_t)k * sizeof(TMum));
    const int64_t kfull = k;
    /* maptooffsets: offA = a, offB = b - (nsep0+1); relmums sort by
     * (n, l) ascending (n==2 throughout -> by l, stable) */
    tm_sort_l_asc(m, k);
    if (maxmums > 0 && k > maxmums) {   /* keep the largest (last) */
        memmove(m, m + (k - maxmums), (size_t)maxmums * sizeof(TMum));
        k = maxmums;
    }
    const int64_t boff = g_nsep0 + 1;
    /* left/right pseudo in offset coords (leftnode end-1 / rightnode
     * start reduce to the segment bounds, schemes.py:255-275) */
    const int64_t leftA = ix->abegin - 1, leftB = ix->bbegin - 1 - boff;
    const int64_t rightA = ix->aend, rightB = ix->bend - boff;

    TMum best;
    int have = 0;
    if (k == 1) {
        /* splitmum = relmums[0], then the mapping lookup (same key) */
        for (int64_t i = kfull - 1; i >= 0; i--)
            if (mdesc[i].a == m[0].a && mdesc[i].b == m[0].b) {
                best = mdesc[i]; have = 1; break;
            }
    } else {
        /* chain (schemes.py:20-104).  Entries 0..k-1 candidates
         * (offset coords), entry k = right pseudo; left is virtual
         * index -1.  All dicts keyed by a-offset with overwrite. */
        int64_t K1 = k + 1;
        TMum *c = malloc((size_t)K1 * sizeof(TMum));
        for (int64_t i = 0; i < k; i++) {
            c[i].l = m[i].l; c[i].a = m[i].a; c[i].b = m[i].b - boff;
        }
        c[k].l = 0; c[k].a = rightA; c[k].b = rightB;
        /* stable sort by a-offset (mums.sort(key=mum[2][ref])) */
        for (int64_t i = 1; i < K1; i++) {
            TMum x = c[i];
            int64_t j = i - 1;
            while (j >= 0 && c[j].a > x.a) { c[j + 1] = c[j]; j--; }
            c[j + 1] = x;
        }
        I64Map sp2mum, score, link;   /* sp2mum: a-offset -> entry idx */
        map_init(&sp2mum, K1 + 1);
        map_init(&score, K1 + 1);
        map_init(&link, K1 + 1);
        for (int64_t i = 0; i < K1; i++) map_set(&sp2mum, c[i].a, i);
        map_set(&score, leftA, 0);
        /* active/processed hold entry indices; -1 = left pseudo */
        int64_t *active = malloc((size_t)(K1 + 1) * sizeof(int64_t));
        int64_t *proc = malloc((size_t)K1 * sizeof(int64_t));
        int64_t na = 0, np = 0;
        active[na++] = -1;
        int64_t bestidx = -1; /* py2 'best' persists across iterations */
        for (int64_t mi = 0; mi < K1; mi++) {
            int64_t msA = c[mi].a, msB = c[mi].b;
            /* move processed -> active when end <= start in all coords */
            int64_t w = 0;
            for (int64_t pi = 0; pi < np; pi++) {
                int64_t p = proc[pi];
                if (c[p].a + c[p].l > msA || c[p].b + c[p].l > msB) {
                    proc[w++] = p;
                } else {
                    active[na++] = p;
                }
            }
            np = w;
            /* stable sort active by score desc */
            for (int64_t i = 1; i < na; i++) {
                int64_t x = active[i];
                int64_t xs = map_get(&score, x < 0 ? leftA : c[x].a);
                int64_t j = i - 1;
                while (j >= 0) {
                    int64_t js = map_get(&score,
                                         active[j] < 0 ? leftA : c[active[j]].a);
                    if (js < xs) { active[j + 1] = active[j]; j--; }
                    else break;
                }
                active[j + 1] = x;
            }
            /* n==2: wscore * (l * (2*1)/2) = wscore*l */
            int64_t wbest = 0; int havew = 0;
            for (int64_t ai = 0; ai < na; ai++) {
                int64_t am = active[ai];
                int64_t aA = am < 0 ? leftA : c[am].a;
                int64_t aB = am < 0 ? leftB : c[am].b;
                int64_t al = am < 0 ? 0 : c[am].l;
                if (aA + al > msA || aB + al > msB) continue;
                int64_t s = map_get(&score, aA) + wscore * c[mi].l;
                if (havew && wbest > s) break;
                int64_t dA = msA - (aA + al); if (dA < 0) dA = -dA;
                int64_t dB = msB - (aB + al); if (dB < 0) dB = -dB;
                int64_t pen = dA - dB; if (pen < 0) pen = -pen;
                int64_t tmpw = s - wpen * pen;
                if (!havew || tmpw > wbest) {
                    havew = 1; wbest = tmpw; bestidx = am;
                }
            }
            map_set(&link, msA, bestidx < 0 ? leftA : c[bestidx].a);
            map_set(&score, msA, wbest);
            proc[np++] = mi;
        }
        /* backtrack from right; path[1:] drops the right pseudo */
        int64_t chaincap = K1, nch = 0;
        int64_t *chains = malloc((size_t)chaincap * sizeof(int64_t));
        int64_t end = rightA;
        int firstrow = 1;
        while (end != leftA) {
            if (nch >= chaincap) {  /* aliasing cycle guard (python
                                     * would loop forever here) */
                fprintf(stderr, "remtrace: link cycle\n"); exit(4);
            }
            int64_t ei = map_get(&sp2mum, end);
            if (!firstrow) chains[nch++] = ei;
            firstrow = 0;
            end = map_get(&link, end);
        }
        free(active); free(proc);
        if (nch == 0) {
            map_free(&sp2mum); map_free(&score); map_free(&link);
            free(c); free(chains); free(m); free(mdesc);
            return 0;
        }
        /* chainedmums = path[1:] reversed (left-to-right); splitmum =
         * last max-l (sorted stable by l, [-1]) */
        int64_t bi = nch - 1;          /* leftmost in backtrack order */
        int64_t bestl = c[chains[bi]].l;
        for (int64_t i = nch - 1; i >= 0; i--) {  /* left-to-right */
            if (c[chains[i]].l >= bestl) { bestl = c[chains[i]].l; bi = i; }
        }
        TMum picked = c[chains[bi]];
        /* splitmum = mapping[(offA, offB)]: last writer in the l-desc
         * build order wins (py2 dict overwrite) */
        for (int64_t i = kfull - 1; i >= 0; i--) {
            if (mdesc[i].a == picked.a && mdesc[i].b == picked.b + boff) {
                best = mdesc[i]; have = 1; break;
            }
        }
        map_free(&sp2mum); map_free(&score); map_free(&link);
        free(c); free(chains);
    }
    free(m); free(mdesc);
    if (!have) { fprintf(stderr, "remtrace: mapping miss\n"); exit(4); }
    *pa = (saidx32_t)best.a; *pb = (saidx32_t)best.b;
    *pl = (saidx32_t)best.l;
    return 1;
}

static int remtrace_main(int argc, char **argv) {
    const char *files[2] = {NULL, NULL};
    int nfiles = 0, minl = 20, maxmums = 1000;
    const char *fixture = NULL;
    for (int i = 2; i < argc; i++) {
        if (!strcmp(argv[i], "--fixture") && i + 1 < argc) fixture = argv[++i];
        else if (!strcmp(argv[i], "--minl") && i + 1 < argc) minl = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--maxmums") && i + 1 < argc) maxmums = atoi(argv[++i]);
        else if (nfiles < 2) files[nfiles++] = argv[i];
    }
    if (nfiles != 2) { fprintf(stderr, "need 2 fasta files\n"); return 2; }

    char *T = NULL; int64_t n = 0, cap = 0;
    load_fasta(files[0], &T, &n, &cap);
    g_nsep0 = n - 1;
    load_fasta(files[1], &T, &n, &cap);
    g_T = T;
    for (int64_t i = 0; i < n; i++)  /* single-contig check */
        if (T[i] == '$' && i != g_nsep0 && i != n - 1) {
            fprintf(stderr, "remtrace: single-contig inputs only\n");
            return 2;
        }

    saidx32_t *SA = malloc((size_t)n * sizeof(saidx32_t));
    saidx32_t *SAi = malloc((size_t)n * sizeof(saidx32_t));
    saidx32_t *LCP = malloc((size_t)n * sizeof(saidx32_t));
    double t0 = now_s();
    if (divsufsort((const sauchar_t *)T, SA, (saidx_t)n) != 0) {
        fprintf(stderr, "divsufsort failed\n"); return 1;
    }
    for (int64_t i = 0; i < n; i++) SAi[SA[i]] = (saidx32_t)i;
    /* sentinel-capped LCP: the repo's documented deviation, so both
     * engines enumerate the same MUM set (see --multimums rationale) */
    kasai_lcp(T, SA, SAi, LCP, n, 1);
    g_SAi = SAi;
    double t_build = now_s() - t0;

    FILE *out = NULL;
    char path[4096];
    if (fixture) {
        snprintf(path, sizeof path, "%s.remtrace.txt", fixture);
        out = fopen(path, "w");
    }
    t0 = now_s();
    int64_t steps = 0, matched = 0;
    SubIdx root = {SA, LCP, n, 0, g_nsep0, g_nsep0 + 1, n - 1};
    SubIdx *stack = malloc(1024 * sizeof(SubIdx));
    int64_t sp = 0, stackcap = 1024;
    stack[sp++] = root;
    while (sp > 0) {
        SubIdx ix = stack[--sp];
        saidx32_t ma, mb, l;
        if (ix.n > 1 &&
            pick_schemes(&ix, minl, maxmums, 1, 1, &ma, &mb, &l)) {
            if (out)
                fprintf(out, "%d %d %d %lld %lld %lld %lld\n",
                        (int)ma, (int)mb, (int)l,
                        (long long)ix.abegin, (long long)ix.aend,
                        (long long)ix.bbegin, (long long)ix.bend);
            SubIdx lead, trail;
            split_step(&ix, ma, mb, l, &lead, &trail);
            steps++; matched += 2 * (int64_t)l;
            if (sp + 2 > stackcap) {
                stackcap *= 2;
                stack = realloc(stack, (size_t)stackcap * sizeof(SubIdx));
            }
            /* push leading then trailing: LIFO pops trailing first
             * (reveal.c:1306-1324 push order + pop_index :25) */
            if (lead.n > 0) stack[sp++] = lead;
            else { free(lead.SA); free(lead.LCP); }
            if (trail.n > 0) stack[sp++] = trail;
            else { free(trail.SA); free(trail.LCP); }
        }
        if (ix.SA != SA) { free(ix.SA); free(ix.LCP); }
    }
    free(stack);
    double t_rem = now_s() - t0;
    if (out) fclose(out);

    printf("{\"n\": %lld, \"ref_c_build_seconds\": %.4f, "
           "\"ref_c_remtrace_seconds\": %.4f, \"anchors\": %lld, "
           "\"matched_bases\": %lld}\n",
           (long long)n, t_build, t_rem, (long long)steps,
           (long long)matched);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 2 && !strcmp(argv[1], "--multimums"))
        return multimum_main(argc, argv);
    if (argc >= 2 && !strcmp(argv[1], "--remtrace"))
        return remtrace_main(argc, argv);
    if (argc >= 2 && !strcmp(argv[1], "--remmulti"))
        return remmulti_main(argc, argv);
    if (argc < 3) {
        fprintf(stderr, "usage: %s a.fa b.fa [minl] [--fixture PREFIX] [--no-rem]\n"
                        "       %s --multimums f1.fa f2.fa ... [--minl N] [--fixture PREFIX]\n",
                argv[0], argv[0]);
        return 2;
    }
    int minl = 20;
    const char *fixture = NULL;
    int do_rem = 1;
    for (int i = 3; i < argc; i++) {
        if (!strcmp(argv[i], "--fixture") && i + 1 < argc) fixture = argv[++i];
        else if (!strcmp(argv[i], "--no-rem")) do_rem = 0;
        else minl = atoi(argv[i]);
    }

    char *T = NULL; int64_t n = 0, cap = 0;
    load_fasta(argv[1], &T, &n, &cap);
    g_nsep0 = n - 1; /* final '$' of sample A (interface.c:36-44) */
    load_fasta(argv[2], &T, &n, &cap);
    g_T = T;

    saidx32_t *SA = malloc((size_t)n * sizeof(saidx32_t));
    saidx32_t *SAi = malloc((size_t)n * sizeof(saidx32_t));
    saidx32_t *LCP = malloc((size_t)n * sizeof(saidx32_t));

    double t0 = now_s();
    if (divsufsort((const sauchar_t *)T, SA, (saidx_t)n) != 0) {
        fprintf(stderr, "divsufsort failed\n"); return 1;
    }
    double t_sa = now_s() - t0;

    t0 = now_s();
    for (int64_t i = 0; i < n; i++) SAi[SA[i]] = (saidx32_t)i;
    kasai_lcp(T, SA, SAi, LCP, n, 0);
    double t_lcp = now_s() - t0;
    g_SAi = SAi;

    uint64_t t_hash = fnv1a64(T, (size_t)n);
    uint64_t sa_hash = fnv1a64(SA, (size_t)n * sizeof(saidx32_t));
    uint64_t lcp_hash = fnv1a64(LCP, (size_t)n * sizeof(saidx32_t));
    /* sentinel-capped variant for the reveal_tpu differential tests */
    uint64_t lcpcap_hash;
    {
        saidx32_t *LCPc = malloc((size_t)n * sizeof(saidx32_t));
        kasai_lcp(T, SA, SAi, LCPc, n, 1);
        lcpcap_hash = fnv1a64(LCPc, (size_t)n * sizeof(saidx32_t));
        free(LCPc);
    }
    fprintf(stderr, "t_fnv1a64=%016" PRIx64 "\n", t_hash);

    FILE *mf = NULL;
    char path[4096];
    const char *dump = getenv("REFBENCH_DUMP_T");
    if (dump) { FILE *tf = fopen(dump, "wb"); fwrite(T, 1, (size_t)n, tf); fclose(tf); }
    if (fixture) {
        snprintf(path, sizeof path, "%s.mums.txt", fixture);
        mf = fopen(path, "w");
    }
    t0 = now_s();
    SubIdx root = {SA, LCP, n, 0, g_nsep0, g_nsep0 + 1, n - 1};
    int64_t nmums = mum_scan(&root, minl, mf);
    double t_mum = now_s() - t0;
    if (mf) fclose(mf);

    /* recursive rem proxy: LIFO stack, longest-MUM picker */
    double t_rem = 0; int64_t steps = 0, matched = 0;
    if (do_rem) {
        t0 = now_s();
        SubIdx *stack = malloc(1024 * sizeof(SubIdx));
        int64_t sp = 0, stackcap = 1024;
        stack[sp++] = root;
        int rootdone = 0;
        while (sp > 0) {
            SubIdx ix = stack[--sp];
            saidx32_t ma, mb, l;
            if (ix.n > 1 && pick_longest(&ix, minl, &ma, &mb, &l)) {
                /* clamp to the node intervals (a match crossing the
                 * sample boundary through equal '$' bytes; graphalign
                 * trims to node bounds on the reference side) */
                if (ma + (int64_t)l > ix.aend) l = (saidx32_t)(ix.aend - ma);
                if (mb + (int64_t)l > ix.bend) l = (saidx32_t)(ix.bend - mb);
                if (l < minl) { if (ix.SA != SA) { free(ix.SA); free(ix.LCP); } continue; }
                SubIdx lead, trail;
                split_step(&ix, ma, mb, l, &lead, &trail);
                steps++; matched += 2 * (int64_t)l;
                if (sp + 2 > stackcap) { stackcap *= 2; stack = realloc(stack, (size_t)stackcap * sizeof(SubIdx)); }
                /* LIFO like push_index/pop_index (reveal.c:23-38) */
                if (trail.n > 0) stack[sp++] = trail; else { free(trail.SA); free(trail.LCP); }
                if (lead.n > 0) stack[sp++] = lead; else { free(lead.SA); free(lead.LCP); }
            }
            if (ix.SA != SA) { free(ix.SA); free(ix.LCP); } else rootdone = 1;
            (void)rootdone;
        }
        free(stack);
        t_rem = now_s() - t0;
    }

    if (fixture) {
        snprintf(path, sizeof path, "%s.json", fixture);
        FILE *jf = fopen(path, "w");
        fprintf(jf, "{\"n\": %" PRId64 ", \"nsep0\": %" PRId64 ", \"minl\": %d,\n", n, g_nsep0, minl);
        fprintf(jf, " \"sa_fnv1a64\": \"%016" PRIx64 "\", \"lcp_fnv1a64\": \"%016" PRIx64 "\",\n", sa_hash, lcp_hash);
        fprintf(jf, " \"t_fnv1a64\": \"%016" PRIx64 "\", \"lcp_sentinel_capped_fnv1a64\": \"%016" PRIx64 "\",\n", t_hash, lcpcap_hash);
        fprintf(jf, " \"sa_head\": [");
        for (int i = 0; i < 8 && i < n; i++) fprintf(jf, "%s%d", i ? ", " : "", (int)SA[i]);
        fprintf(jf, "], \"sa_tail\": [");
        for (int64_t i = (n > 8 ? n - 8 : 0); i < n; i++) fprintf(jf, "%s%d", i > (n > 8 ? n - 8 : 0) ? ", " : "", (int)SA[i]);
        saidx32_t lcp_max = 0;
        for (int64_t i = 0; i < n; i++) if (LCP[i] > lcp_max) lcp_max = LCP[i];
        fprintf(jf, "],\n \"n_mums\": %" PRId64 ", \"lcp_max\": %d,\n", nmums, (int)lcp_max);
        fprintf(jf, " \"inputs\": [\"%s\", \"%s\"]}\n", argv[1], argv[2]);
        fclose(jf);
    }

    printf("{\"n\": %" PRId64 ", \"ref_c_sa_seconds\": %.4f, \"ref_c_lcp_seconds\": %.4f, "
           "\"ref_c_mumscan_seconds\": %.4f, \"n_mums\": %" PRId64 ", "
           "\"ref_c_rem_seconds\": %.4f, \"rem_steps\": %" PRId64 ", \"matched_bases\": %" PRId64 ", "
           "\"sa_fnv1a64\": \"%016" PRIx64 "\"}\n",
           n, t_sa, t_lcp, t_mum, nmums, t_rem, steps, matched, sa_hash);
    return 0;
}
