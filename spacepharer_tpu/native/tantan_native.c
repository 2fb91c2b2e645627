/* tantan repeat masking — native hot path.
 *
 * Scalar port of spacepharer_tpu.ops.tantan.repeat_probabilities with
 * identical float64 operation order, so results are bit-identical to
 * the Python/NumPy reference (which in turn matches the reference
 * implementation's masks exactly; see tests/test_orf_translate.py and
 * the golden-mask test). Compiled WITHOUT -ffast-math on purpose.
 *
 * Build: spacepharer_tpu/native/build.py (cc -O2 -shared -fPIC).
 */
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <unistd.h>

#define SCALE_STEP 16

void tantan_probs(const uint8_t *seq, int64_t n,
                  const double *ratios, int64_t alphabet,
                  int max_offset, double repeat_prob, double repeat_end_prob,
                  double decay, double min_mask_prob, uint8_t *out_mask) {
    if (n <= 0) return;

    double b2b = 1.0 - repeat_prob;
    double f2b = repeat_end_prob;
    double f2f0 = 1.0 - repeat_end_prob;

    double decay_pow = 1.0;
    for (int i = 0; i < max_offset; i++) decay_pow *= decay;
    double b2f_first = repeat_prob * (1 - decay) / (1 - decay_pow);

    double *b2f = (double *)malloc(sizeof(double) * max_offset);
    double *fg = (double *)calloc(max_offset, sizeof(double));
    float *letter_probs = (float *)malloc(sizeof(float) * n);
    int64_t n_scale = n / SCALE_STEP;
    double *scale_factors =
        (double *)malloc(sizeof(double) * (n_scale > 0 ? n_scale : 1));

    double p = b2f_first;
    for (int i = 0; i < max_offset; i++) { b2f[i] = p; p *= decay; }

    double bg = 1.0;
    for (int64_t t = 0; t < n; t++) {
        int m = t < max_offset ? (int)t : max_offset;
        double from_fg = 0.0;
        if (m > 0) {
            const double *row = ratios + seq[t] * alphabet;
            /* match NumPy evaluation order: sum first, then update */
            for (int i = 0; i < m; i++) from_fg += fg[i];
            for (int i = 0; i < m; i++) {
                double em = row[seq[t - 1 - i]];
                fg[i] = (bg * b2f[i] + fg[i] * f2f0) * em;
            }
        }
        bg = bg * b2b + from_fg * f2b;
        if (t % SCALE_STEP == SCALE_STEP - 1) {
            double scale = 1.0 / bg;
            scale_factors[t / SCALE_STEP] = scale;
            bg *= scale;
            for (int i = 0; i < max_offset; i++) fg[i] *= scale;
        }
        letter_probs[t] = (float)bg;
    }

    double z = 0.0;
    {
        double from_fg = 0.0;
        for (int i = 0; i < max_offset; i++) from_fg += fg[i];
        z = bg * b2b + from_fg * f2b;
    }

    bg = b2b;
    for (int i = 0; i < max_offset; i++) fg[i] = f2b;
    for (int64_t t = n - 1; t >= 0; t--) {
        double non_repeat = (double)letter_probs[t] * bg / z;
        letter_probs[t] = 1.0f - (float)non_repeat;
        if (t % SCALE_STEP == SCALE_STEP - 1) {
            double scale = scale_factors[t / SCALE_STEP];
            bg *= scale;
            for (int i = 0; i < max_offset; i++) fg[i] *= scale;
        }
        int m = t < max_offset ? (int)t : max_offset;
        double to_bg = f2b * bg;
        double to_fg = 0.0;
        if (m > 0) {
            const double *row = ratios + seq[t] * alphabet;
            for (int i = 0; i < m; i++) {
                double femit = fg[i] * row[seq[t - 1 - i]];
                to_fg += b2f[i] * femit;
                fg[i] = to_bg + f2f0 * femit;
            }
        }
        bg = b2b * bg + to_fg;
    }

    for (int64_t t = 0; t < n; t++)
        out_mask[t] = letter_probs[t] >= (float)min_mask_prob ? 1 : 0;

    free(scale_factors);
    free(letter_probs);
    free(fg);
    free(b2f);
}

/* Batch driver: seqs concatenated with offsets. Sequences are
 * independent recurrences, so the thread split is bit-exact. Worker
 * threads are joined before returning (no lingering pool), keeping the
 * process safely forkable afterwards. */
typedef struct {
    const uint8_t *flat;
    const int64_t *offsets;
    int64_t n_seqs;
    const double *ratios;
    int64_t alphabet;
    int max_offset;
    double repeat_prob, repeat_end_prob, decay, min_mask_prob;
    uint8_t *out_mask;
    int64_t next; /* atomic chunk cursor */
} tantan_job_t;

#define TANTAN_CHUNK 64

static void *tantan_worker(void *arg) {
    tantan_job_t *job = (tantan_job_t *)arg;
    for (;;) {
        int64_t s0 = __atomic_fetch_add(&job->next, TANTAN_CHUNK,
                                        __ATOMIC_RELAXED);
        if (s0 >= job->n_seqs) break;
        int64_t s1 = s0 + TANTAN_CHUNK;
        if (s1 > job->n_seqs) s1 = job->n_seqs;
        for (int64_t s = s0; s < s1; s++) {
            int64_t start = job->offsets[s];
            int64_t len = job->offsets[s + 1] - start;
            tantan_probs(job->flat + start, len, job->ratios, job->alphabet,
                         job->max_offset, job->repeat_prob,
                         job->repeat_end_prob, job->decay,
                         job->min_mask_prob, job->out_mask + start);
        }
    }
    return NULL;
}

void tantan_mask_batch(const uint8_t *flat, const int64_t *offsets,
                       int64_t n_seqs, const double *ratios, int64_t alphabet,
                       int max_offset, double repeat_prob,
                       double repeat_end_prob, double decay,
                       double min_mask_prob, uint8_t *out_mask) {
    tantan_job_t job = {flat, offsets, n_seqs, ratios, alphabet, max_offset,
                        repeat_prob, repeat_end_prob, decay, min_mask_prob,
                        out_mask, 0};
    long ncpu = sysconf(_SC_NPROCESSORS_ONLN);
    int nthreads = ncpu > 1 ? (int)ncpu : 1;
    if (nthreads > 8) nthreads = 8;
    if (n_seqs < 2 * TANTAN_CHUNK || nthreads == 1) {
        tantan_worker(&job);
        return;
    }
    pthread_t tids[8];
    int spawned = 0;
    for (int t = 0; t < nthreads - 1; t++)
        if (pthread_create(&tids[t], NULL, tantan_worker, &job) == 0)
            spawned++;
    tantan_worker(&job);
    for (int t = 0; t < spawned; t++)
        pthread_join(tids[t], NULL);
}
