/* refprobcons — standalone timing + golden-fixture driver for the
 * REFERENCE ProbCons MSA engine (jasperlinthorst/reveal probconslib).
 *
 * The engine itself is the reference's OWN code compiled in place:
 * build.sh slices /root/reference/probcons/Probcons.cc at its
 * "//PYTHON LIB!" marker (line 1606) — everything above is pure C++
 * (DoAlign :312, DoRelaxation :1056, ComputeFinalAlignment :1216,
 * DoIterativeRefinement :1465, ComputeAnnotation :1545) — and compiles
 * it with a 10-line Python.h shim and -Dmain=probcons_ref_cli_main.
 * No reference sources are copied into this repo.
 *
 * This driver reproduces exactly what reveal's refine stage asks of
 * probconslib.bpalign (Probcons.cc:1608-1667, called from
 * reveal/refine.py:640-642 with consistency=2, refinement=100,
 * pretraining=0): per bubble, build a MultiSequence of the allele
 * sequences ('@'-prefixed data vectors, input order = sortLabel order),
 * enableAnnotation, ReadParameters() (hardcoded pecan DNA defaults,
 * Defaults.h), then time DoAlign end to end.
 *
 * Modes:
 *   --msa FILE         bubble stream: lines "#bubble" then ">name" /
 *                      one-line sequence records.  Times DoAlign per
 *                      bubble; reports total seconds + posterior cells
 *                      (sum over pairs of L1*L2 — the same cell count
 *                      reveal_tpu's bench uses).
 *   --posteriors FILE  pairs of lines (seq1, seq2).  Times ONLY the
 *                      fwd+bwd+posterior DP per pair
 *                      (ProbabilisticModel.h:102,194,302) — the
 *                      apples-to-apples number against the Pallas
 *                      pair-HMM kernel's cells/s.
 *   --fixture PREFIX   (msa mode) dump PREFIX.msa.txt golden fixtures:
 *                      per bubble the aligned rows + column confidence,
 *                      exactly the (alignment, conf) tuple bpalign
 *                      returns (Probcons.cc:1676-1707).
 *                      (posteriors mode) dump PREFIX.post.txt: the full
 *                      posterior matrix per pair, row-major, %.6f.
 *
 * Output: ONE JSON line on stdout with timings and cell counts.
 */
#include <cassert>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include "SafeVector.h"
#include "MultiSequence.h"
#include "ScoreType.h"
#include "ProbabilisticModel.h"

/* globals + entry points owned by the reference core TU
 * (probcons_core.cc, sliced from Probcons.cc by build.sh) */
extern bool enableTraining, enableAllPairs, enableAnnotation, enableViterbi;
extern int numConsistencyReps, consgap, numPreTrainingReps,
    numIterativeRefinementReps;
extern VF initDistrib, gapOpen, gapExtend;
extern VVF emitPairs;
extern VF emitSingle;
extern float gapSwitchDefault[];
void ReadParameters();
MultiSequence *DoAlign(MultiSequence *, const ProbabilisticModel &, VF &,
                       VF &, VF &, VVF &, VF &);

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

/* Build a Sequence the way bpalign does (Probcons.cc:1645-1657):
 * '@'-prefixed data vector, label = input order. */
static Sequence *make_seq(const std::string &name, const std::string &seq,
                          int label) {
    SafeVector<char> *data = new SafeVector<char>;
    data->push_back('@');
    for (size_t i = 0; i < seq.size(); i++) data->push_back(seq[i]);
    return new Sequence(data, name, (int)seq.size(), label, label);
}

struct Bubble {
    std::vector<std::string> names, seqs;
};

static std::vector<Bubble> read_bubbles(const char *path) {
    std::ifstream in(path);
    if (!in) { fprintf(stderr, "cannot open %s\n", path); exit(2); }
    std::vector<Bubble> out;
    std::string line, pendname;
    while (std::getline(in, line)) {
        while (!line.empty() && (line.back() == '\n' || line.back() == '\r'))
            line.pop_back();
        if (line.empty()) continue;
        if (line[0] == '#') { out.push_back(Bubble()); continue; }
        if (line[0] == '>') { pendname = line.substr(1); continue; }
        if (out.empty()) out.push_back(Bubble());
        out.back().names.push_back(pendname);
        out.back().seqs.push_back(line);
    }
    return out;
}

int main(int argc, char **argv) {
    const char *msafile = NULL, *pairfile = NULL, *fixture = NULL;
    int consistency = 2, refinement = 100, want_consgap = 1, iters = 1;
    for (int i = 1; i < argc; i++) {
        if (!strcmp(argv[i], "--msa") && i + 1 < argc) msafile = argv[++i];
        else if (!strcmp(argv[i], "--posteriors") && i + 1 < argc)
            pairfile = argv[++i];
        else if (!strcmp(argv[i], "--fixture") && i + 1 < argc)
            fixture = argv[++i];
        else if (!strcmp(argv[i], "--consistency") && i + 1 < argc)
            consistency = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--refinement") && i + 1 < argc)
            refinement = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--consgap") && i + 1 < argc)
            want_consgap = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--iters") && i + 1 < argc)
            iters = atoi(argv[++i]);
        else { fprintf(stderr, "unknown arg %s\n", argv[i]); return 2; }
    }
    if (!msafile && !pairfile) {
        fprintf(stderr,
                "usage: %s --msa FILE [--consistency N] [--refinement N] "
                "[--consgap N] [--fixture PREFIX]\n"
                "       %s --posteriors FILE [--iters K] [--fixture PREFIX]\n",
                argv[0], argv[0]);
        return 2;
    }

    /* bpalign's exact setup (Probcons.cc:1614-1636) */
    numConsistencyReps = consistency;
    numIterativeRefinementReps = refinement;
    numPreTrainingReps = 0;
    consgap = want_consgap;
    enableAnnotation = true;
    ReadParameters(); /* hardcoded pecan DNA defaults (Defaults.h) */
    ProbabilisticModel model(initDistrib, gapOpen, gapExtend, emitPairs,
                             emitSingle, gapSwitchDefault);

    if (pairfile) {
        /* ---- posterior-DP-only mode ---- */
        std::ifstream in(pairfile);
        if (!in) { fprintf(stderr, "cannot open %s\n", pairfile); return 2; }
        std::vector<std::pair<std::string, std::string> > pairs;
        std::string l1, l2;
        while (std::getline(in, l1) && std::getline(in, l2)) {
            while (!l1.empty() && (l1.back() == '\n' || l1.back() == '\r')) l1.pop_back();
            while (!l2.empty() && (l2.back() == '\n' || l2.back() == '\r')) l2.pop_back();
            if (!l1.empty() && !l2.empty()) pairs.push_back(std::make_pair(l1, l2));
        }
        std::vector<Sequence *> s1, s2;
        double cells1 = 0;
        for (size_t p = 0; p < pairs.size(); p++) {
            s1.push_back(make_seq("a", pairs[p].first, 0));
            s2.push_back(make_seq("b", pairs[p].second, 1));
            cells1 += (double)pairs[p].first.size() * (double)pairs[p].second.size();
        }
        FILE *pf = NULL;
        char path[4096];
        if (fixture) {
            snprintf(path, sizeof path, "%s.post.txt", fixture);
            pf = fopen(path, "w");
        }
        double t0 = now_s();
        for (int it = 0; it < iters; it++) {
            for (size_t p = 0; p < pairs.size(); p++) {
                VF *fwd = model.ComputeForwardMatrix(s1[p], s2[p]);
                VF *bwd = model.ComputeBackwardMatrix(s1[p], s2[p]);
                VF *post = model.ComputePosteriorMatrix(s1[p], s2[p], *fwd, *bwd);
                if (pf && it == 0) {
                    int L1 = s1[p]->GetLength(), L2 = s2[p]->GetLength();
                    fprintf(pf, "#pair %d %d %d\n", (int)p, L1, L2);
                    for (int i = 1; i <= L1; i++) {
                        for (int j = 1; j <= L2; j++)
                            fprintf(pf, "%s%.6f", j > 1 ? " " : "",
                                    (*post)[i * (L2 + 1) + j]);
                        fprintf(pf, "\n");
                    }
                }
                delete fwd; delete bwd; delete post;
            }
        }
        double dt = now_s() - t0;
        if (pf) fclose(pf);
        double cells = cells1 * iters;
        printf("{\"mode\": \"posteriors\", \"n_pairs\": %d, \"iters\": %d, "
               "\"posterior_cells\": %.0f, \"ref_probcons_seconds\": %.4f, "
               "\"ref_probcons_cells_per_sec\": %.1f}\n",
               (int)pairs.size(), iters, cells, dt, cells / dt);
        return 0;
    }

    /* ---- full-DoAlign (refine workload) mode ---- */
    std::vector<Bubble> bubbles = read_bubbles(msafile);
    FILE *mf = NULL;
    char path[4096];
    if (fixture) {
        snprintf(path, sizeof path, "%s.msa.txt", fixture);
        mf = fopen(path, "w");
    }
    double total = 0, cells = 0;
    long npairs = 0;
    int done = 0;
    for (size_t bi = 0; bi < bubbles.size(); bi++) {
        Bubble &b = bubbles[bi];
        if (b.seqs.size() < 2) continue;
        MultiSequence *sequences = new MultiSequence();
        for (size_t i = 0; i < b.seqs.size(); i++)
            sequences->AddSequence(make_seq(b.names[i], b.seqs[i], (int)i));
        for (size_t i = 0; i < b.seqs.size(); i++)
            for (size_t j = i + 1; j < b.seqs.size(); j++) {
                cells += (double)b.seqs[i].size() * (double)b.seqs[j].size();
                npairs++;
            }
        double t0 = now_s();
        MultiSequence *alignment =
            DoAlign(sequences, model, initDistrib, gapOpen, gapExtend,
                    emitPairs, emitSingle);
        total += now_s() - t0;
        done++;
        if (mf && alignment) {
            fprintf(mf, "#bubble %d\n", (int)bi);
            int cols = 0;
            for (int i = 0; i < alignment->GetNumSequences(); i++) {
                Sequence *aln = alignment->GetSequence(i);
                SafeVector<char>::iterator data = aln->GetDataPtr();
                cols = aln->GetLength();
                fprintf(mf, ">%s\n", aln->GetHeader().c_str());
                for (int j = 1; j <= cols; j++) fputc(data[j], mf);
                fputc('\n', mf);
            }
            fprintf(mf, "#confidence");
            for (int j = 0; j < cols; j++)
                fprintf(mf, " %d", alignment->conf[j]);
            fprintf(mf, "\n");
        }
        delete alignment;
        delete sequences;
    }
    if (mf) fclose(mf);
    printf("{\"mode\": \"msa\", \"n_bubbles\": %d, \"n_pairs\": %ld, "
           "\"posterior_cells\": %.0f, \"consistency\": %d, "
           "\"refinement\": %d, \"consgap\": %d, "
           "\"ref_probcons_seconds\": %.4f, "
           "\"ref_probcons_cells_per_sec\": %.1f}\n",
           done, npairs, cells, consistency, refinement, want_consgap,
           total, total > 0 ? cells / total : 0.0);
    return 0;
}
