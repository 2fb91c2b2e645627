/* Batched banded nucleotide aligner (blastn-mode hot path).
 *
 * C port of ops/banded_nucl.py — itself the probe-parity behavioral
 * re-implementation of the reference's ksw2-extz engine
 * (lib/mmseqs/lib/ksw2/ksw2_extz2_sse.cpp semantics: anti-diagonal
 * difference DP, 16-aligned band edges with stale persistent state,
 * SSE 4-lane row-max tie-breaking, zdrop, direction-byte backtrack)
 * plus the BandedNucleotideAligner wrapper (ungapped re-anchor,
 * all-M shortcut, reverse/forward extension, reverse-cigar fallback;
 * lib/mmseqs/src/alignment/BandedNucleotideAligner.cpp:73-255).
 *
 * One call aligns a whole candidate batch over a pthread pool; outputs
 * are (score, coords, identity count, backtrace length) per pair —
 * everything the m8 writer needs, with no per-pair Python dispatch.
 * Bit-identical to the Python engine (tests/test_banded_batch.py).
 */
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define KSW_NEG_INF (-0x40000000)

typedef struct {
    int32_t max, max_q, max_t;
    int32_t mqe, mqe_t;
    int32_t mte, mte_q;
    int32_t score;
    int zdropped;
} bz_ez_t;

/* growable per-worker scratch */
typedef struct {
    void *p;
    int64_t cap;
} bz_buf_t;

static void *bz_ensure(bz_buf_t *b, int64_t n, size_t elem) {
    if (n > b->cap) {
        int64_t nc = b->cap ? b->cap : 4096;
        while (nc < n) nc *= 2;
        void *np = realloc(b->p, (size_t)nc * elem);
        if (!np)
            return NULL;
        b->p = np;
        b->cap = nc;
    }
    return b->p;
}

typedef struct {
    bz_buf_t u, v, x, y, s, H;      /* persistent rows */
    bz_buf_t drows;                  /* direction bytes, rows concat */
    bz_buf_t doff;                   /* int64 [n_rows+1] offsets */
    bz_buf_t rst;                    /* int32 [n_rows] aligned st */
    bz_buf_t ren;                    /* int32 [n_rows] aligned en */
    bz_buf_t cig;                    /* int32 ops (M=0 I=1 D=2) x len */
    bz_buf_t rev1, rev2;             /* shifted reverse buffers */
    int oom;
} bz_ws_t;

/* ksw_extz2: returns 0 ok, -1 alloc failure. cigar (when wanted) is
 * written into ws->cig as (op, len) int32 pairs; *n_cig gets count. */
static int bz_extz2(bz_ws_t *ws, const uint8_t *query, int64_t qlen,
                    const uint8_t *target, int64_t tlen,
                    const int32_t *mat, int32_t m,
                    int32_t q, int32_t e, int32_t w, int32_t zdrop,
                    int score_only, bz_ez_t *ez, int64_t *n_cig) {
    ez->max = 0; ez->max_q = -1; ez->max_t = -1;
    ez->mqe = KSW_NEG_INF; ez->mqe_t = -1;
    ez->mte = KSW_NEG_INF; ez->mte_q = -1;
    ez->score = KSW_NEG_INF; ez->zdropped = 0;
    if (n_cig) *n_cig = 0;
    if (qlen <= 0 || tlen <= 0)
        return 0;
    int32_t qe = q + e, qe2 = 2 * (q + e);
    int32_t sc_mch = mat[0], sc_mis = mat[1];
    int32_t max_sc = sc_mch + qe2;
    int32_t min_sc = mat[0];
    for (int32_t i = 0; i < m * m; i++)
        if (mat[i] < min_sc) min_sc = mat[i];
    if (-min_sc > 2 * qe)
        return 0;
    if (w < 0)
        w = (int32_t)(tlen > qlen ? tlen : qlen);
    int32_t wl = w, wr = w;

    int64_t tpad = (tlen + 15) / 16 * 16;
    int32_t *u = (int32_t *)bz_ensure(&ws->u, tpad, 4);
    int32_t *v = (int32_t *)bz_ensure(&ws->v, tpad, 4);
    int32_t *x = (int32_t *)bz_ensure(&ws->x, tpad, 4);
    int32_t *y = (int32_t *)bz_ensure(&ws->y, tpad, 4);
    int32_t *s = (int32_t *)bz_ensure(&ws->s, tpad, 4);
    int64_t *H = (int64_t *)bz_ensure(&ws->H, tpad, 8);
    int64_t n_rows = qlen + tlen - 1;
    int32_t *rst = NULL, *ren = NULL;
    int64_t *doff = NULL;
    uint8_t *dall = NULL;
    if (!score_only) {
        rst = (int32_t *)bz_ensure(&ws->rst, n_rows, 4);
        ren = (int32_t *)bz_ensure(&ws->ren, n_rows, 4);
        doff = (int64_t *)bz_ensure(&ws->doff, n_rows + 1, 8);
        if (!rst || !ren || !doff)
            return -1;
        doff[0] = 0;
    }
    if (!u || !v || !x || !y || !s || !H)
        return -1;
    memset(u, 0, 4 * (size_t)tpad);
    memset(v, 0, 4 * (size_t)tpad);
    memset(x, 0, 4 * (size_t)tpad);
    memset(y, 0, 4 * (size_t)tpad);
    memset(s, 0, 4 * (size_t)tpad);
    for (int64_t i = 0; i < tpad; i++)
        H[i] = KSW_NEG_INF;

    int32_t last_st = -1, last_en = -1;
    int64_t r;
    for (r = 0; r < n_rows; r++) {
        int64_t st = 0, en = tlen - 1;
        if (st < r - qlen + 1) st = r - qlen + 1;
        if (en > r) en = r;
        if (st < (r - wr + 1) >> 1) st = (r - wr + 1) >> 1;
        if (en > (r + wl) >> 1) en = (r + wl) >> 1;
        if (st > en) {
            ez->zdropped = 1;
            break;
        }
        int64_t st0 = st, en0 = en;
        st = st / 16 * 16;
        en = (en + 16) / 16 * 16 - 1;
        int32_t x1, v1;
        if (st > 0) {
            if (last_st <= st - 1 && st - 1 <= last_en) {
                x1 = x[st - 1];
                v1 = v[st - 1];
            } else {
                x1 = v1 = 0;
            }
        } else {
            x1 = 0;
            v1 = r ? q : 0;
        }
        if (en >= r) {
            y[r] = 0;
            u[r] = r ? q : 0;
        }
        for (int64_t t = st0; t <= en0; t++) {
            uint8_t a = target[t], b = query[r - t];
            int32_t sc = (a == b) ? sc_mch : sc_mis;
            if (a == (uint8_t)(m - 1) || b == (uint8_t)(m - 1))
                sc = 0;
            s[t] = sc;
        }
        int64_t en_c = en < tpad - 1 ? en : tpad - 1;
        uint8_t *drow = NULL;
        if (!score_only) {
            int64_t need = doff[r] + (en_c - st + 1);
            dall = (uint8_t *)bz_ensure(&ws->drows, need, 1);
            if (!dall)
                return -1;
            drow = dall + doff[r];
            doff[r + 1] = need;
            rst[r] = (int32_t)st;
            ren[r] = (int32_t)en;
        }
        /* the diagonal shift reads x/v at t-1, so walk downward using
         * saved previous values (x1/v1 seed position st) */
        int32_t xp = x1, vp = v1;
        for (int64_t t = st; t <= en_c; t++) {
            int32_t a = xp + vp;
            int32_t b = y[t] + u[t];
            int32_t z = s[t] + qe2;
            uint8_t d = 0;
            if (!score_only)
                d = (a > z) ? 1 : 0;
            if (a > z) z = a;
            if (!score_only && b > z)
                d = 2;
            if (b > z) z = b;
            if (z > max_sc) z = max_sc;
            int32_t u_new = z - vp;
            int32_t v_new = z - u[t];
            int32_t zq = z - q;
            int32_t a2 = a - zq;
            int32_t b2 = b - zq;
            int32_t xn = a2 > 0 ? a2 : 0;
            int32_t yn = b2 > 0 ? b2 : 0;
            if (!score_only) {
                if (a2 > 0) d |= 8;
                if (b2 > 0) d |= 16;
                drow[t - st] = d;
            }
            xp = x[t];       /* previous-row x[t] feeds column t+1 */
            vp = v[t];
            x[t] = xn;
            y[t] = yn;
            u[t] = u_new;
            v[t] = v_new;
        }
        /* exact H + row max (SSE reduction order) */
        int64_t max_H;
        int64_t max_t;
        if (r > 0) {
            if (en0 > 0)
                H[en0] = H[en0 - 1] + u[en0] - qe;
            else
                H[en0] = H[en0] + v[en0] - qe;
            for (int64_t t = st0; t < en0; t++)
                H[t] += v[t] - qe;
            /* seed with H[en0]; 4 strided lanes keep their FIRST
             * strictly-greater maximum; lanes combined in lane order;
             * scalar tail (ksw2_extz2_sse.cpp:214-247) */
            max_H = H[en0];
            max_t = en0;
            int64_t en1 = st0 + (en0 - st0) / 4 * 4;
            for (int lane = 0; lane < 4; lane++) {
                int64_t bt = -1;
                int64_t bv = 0;
                for (int64_t p = st0 + lane; p < en1; p += 4) {
                    if (bt < 0 || H[p] > bv) {
                        bv = H[p];
                        bt = p;
                    }
                }
                if (bt >= 0 && max_H < bv) {
                    max_H = bv;
                    max_t = bt;
                }
            }
            for (int64_t t = en1; t < en0; t++) {
                if (H[t] > max_H) {
                    max_H = H[t];
                    max_t = t;
                }
            }
        } else {
            H[0] = v[0] - qe - qe;
            max_H = H[0];
            max_t = 0;
        }
        if (en0 == tlen - 1 && H[en0] > ez->mte) {
            ez->mte = (int32_t)H[en0];
            ez->mte_q = (int32_t)(r - en);
        }
        if (r - st0 == qlen - 1 && H[st0] > ez->mqe) {
            ez->mqe = (int32_t)H[st0];
            ez->mqe_t = (int32_t)st0;
        }
        /* ksw_apply_zdrop (ksw2.h:188-206, is_rot) */
        if (max_H > ez->max) {
            ez->max = (int32_t)max_H;
            ez->max_t = (int32_t)max_t;
            ez->max_q = (int32_t)(r - max_t);
        } else if (max_t >= ez->max_t && r - max_t >= ez->max_q) {
            int64_t tl = max_t - ez->max_t;
            int64_t ql = (r - max_t) - ez->max_q;
            int64_t l = tl > ql ? tl - ql : ql - tl;
            if (zdrop >= 0 && ez->max - max_H > zdrop + l * e) {
                ez->zdropped = 1;
                break;
            }
        }
        if (r == n_rows - 1 && en0 == tlen - 1)
            ez->score = (int32_t)H[tlen - 1];
        last_st = (int32_t)st;
        last_en = (int32_t)en;
    }

    if (score_only || ez->max_t < 0 || ez->max_q < 0)
        return 0;
    /* ksw_backtrack (ksw2.h:141-180, is_rot=1, left-aligned) */
    int64_t cap_ops = ez->max_t + ez->max_q + 2;
    int32_t *cig = (int32_t *)bz_ensure(&ws->cig, cap_ops * 2, 4);
    if (!cig)
        return -1;
    int64_t nc = 0;
    int64_t i = ez->max_t, j = ez->max_q;
    int state = 0;
    while (i >= 0 && j >= 0) {
        int64_t rr = i + j;
        int32_t stA = rst[rr];
        int force_state = -1;
        if (i < stA) force_state = 2;
        if (i > ren[rr]) force_state = 1;
        int tmp = force_state < 0 ? dall[doff[rr] + (i - stA)] : 0;
        if (state == 0)
            state = tmp & 7;
        else if (!((tmp >> (state + 2)) & 1))
            state = 0;
        if (state == 0)
            state = tmp & 7;
        if (force_state >= 0)
            state = force_state;
        int op;
        if (state == 0) {
            op = 0;  /* M */
            i--;
            j--;
        } else if (state == 1 || state == 3) {
            op = 2;  /* D */
            i--;
        } else {
            op = 1;  /* I */
            j--;
        }
        if (nc && cig[(nc - 1) * 2] == op)
            cig[(nc - 1) * 2 + 1] += 1;
        else {
            cig[nc * 2] = op;
            cig[nc * 2 + 1] = 1;
            nc++;
        }
    }
    if (i >= 0) {
        if (nc && cig[(nc - 1) * 2] == 2)
            cig[(nc - 1) * 2 + 1] += (int32_t)(i + 1);
        else {
            cig[nc * 2] = 2;
            cig[nc * 2 + 1] = (int32_t)(i + 1);
            nc++;
        }
    }
    if (j >= 0) {
        if (nc && cig[(nc - 1) * 2] == 1)
            cig[(nc - 1) * 2 + 1] += (int32_t)(j + 1);
        else {
            cig[nc * 2] = 1;
            cig[nc * 2 + 1] = (int32_t)(j + 1);
            nc++;
        }
    }
    /* reverse op order (built back-to-front) */
    for (int64_t k = 0; k < nc / 2; k++) {
        int32_t o = cig[k * 2], l = cig[k * 2 + 1];
        cig[k * 2] = cig[(nc - 1 - k) * 2];
        cig[k * 2 + 1] = cig[(nc - 1 - k) * 2 + 1];
        cig[(nc - 1 - k) * 2] = o;
        cig[(nc - 1 - k) * 2 + 1] = l;
    }
    *n_cig = nc;
    return 0;
}

/* ungapped_startend: exact Kadane with the reference's tie rules
 * (DistanceCalculator.h:179-201). */
static void bz_startend(const uint8_t *s1, const uint8_t *s2, int64_t n,
                        const int32_t *mat, int32_t m,
                        int64_t *o_st, int64_t *o_en, int64_t *o_sc) {
    if (n == 0) {
        *o_st = *o_en = *o_sc = 0;
        return;
    }
    int64_t raw = 0, best = 0, b_end = -1, last_reset = -1, b_start = 0;
    int64_t cummax = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t sc = mat[(int32_t)s1[i] * m + s2[i]];
        raw = (raw > 0 ? raw : 0) + sc;
        int64_t eff = raw > 0 ? raw : 0;
        if (raw <= 0)
            last_reset = i;
        if (eff > cummax) {
            cummax = eff;
            if (eff > best) {
                best = eff;
                b_end = i;
                b_start = (raw <= 0) ? i + 1 : 0;  /* refined below */
            }
        }
    }
    if (best <= 0) {
        *o_st = *o_en = *o_sc = 0;
        return;
    }
    /* b_start = (last reset index <= b_end) + 1, else 0 — recompute
     * with a second pass to match the vectorized semantics exactly */
    last_reset = -1;
    raw = 0;
    for (int64_t i = 0; i <= b_end; i++) {
        int64_t sc = mat[(int32_t)s1[i] * m + s2[i]];
        raw = (raw > 0 ? raw : 0) + sc;
        if (raw <= 0)
            last_reset = i;
    }
    b_start = last_reset >= 0 ? last_reset + 1 : 0;
    *o_st = b_start;
    *o_en = b_end;
    *o_sc = best;
}

/* computeUngappedAlignment: +-65536 wraps of the u16 diagonal
 * (DistanceCalculator.h:94-113). */
static void bz_ungapped(const uint8_t *query, int64_t qlen,
                        const uint8_t *target, int64_t tlen,
                        int32_t diagonal, const int32_t *mat, int32_t m,
                        int64_t *o_st, int64_t *o_en, int64_t *o_sc,
                        int64_t *o_diag, int64_t *o_dist) {
    int64_t b_st = -1, b_en = -1, b_sc = 0, b_d = 0, b_dist = 0;
    int64_t n_neg = 1 + tlen / 32768;
    for (int64_t div = 1; div <= n_neg; div++) {
        int64_t d = -div * 65536 + diagonal;
        int64_t dist = d < 0 ? -d : d;
        int64_t st, en, sc;
        if (d >= 0 && dist < qlen) {
            int64_t n = tlen < qlen - dist ? tlen : qlen - dist;
            bz_startend(query + dist, target, n, mat, m, &st, &en, &sc);
        } else if (d < 0 && dist < tlen) {
            int64_t n = (tlen - dist) < qlen ? tlen - dist : qlen;
            bz_startend(query, target + dist, n, mat, m, &st, &en, &sc);
        } else {
            continue;
        }
        if (sc > b_sc) {
            b_st = st; b_en = en; b_sc = sc; b_d = d; b_dist = dist;
        }
    }
    int64_t n_pos = qlen / 65536;
    for (int64_t div = 0; div <= n_pos; div++) {
        int64_t d = div * 65536 + diagonal;
        int64_t dist = d < 0 ? -d : d;
        int64_t st, en, sc;
        if (d >= 0 && dist < qlen) {
            int64_t n = tlen < qlen - dist ? tlen : qlen - dist;
            bz_startend(query + dist, target, n, mat, m, &st, &en, &sc);
        } else if (d < 0 && dist < tlen) {
            int64_t n = (tlen - dist) < qlen ? tlen - dist : qlen;
            bz_startend(query, target + dist, n, mat, m, &st, &en, &sc);
        } else {
            continue;
        }
        if (sc > b_sc) {
            b_st = st; b_en = en; b_sc = sc; b_d = d; b_dist = dist;
        }
    }
    *o_st = b_st; *o_en = b_en; *o_sc = b_sc;
    *o_diag = b_d; *o_dist = b_dist;
}

/* ---- batch driver ---- */

typedef struct {
    const uint8_t *qflat;
    const int64_t *qoff;
    const uint8_t *tflat;
    const int64_t *toff;
    const int32_t *pair_q, *pair_t, *pair_diag;
    int64_t n_pairs;
    const int32_t *mat;
    int32_t m, gapo, gape, zdrop;
    int32_t *o_score, *o_qs, *o_qe, *o_ts, *o_te, *o_ids, *o_btlen;
    volatile int64_t *next;
    volatile int *error;
} bz_shared_t;

#define BZ_CHUNK 16

static int bz_align_one(bz_ws_t *ws, bz_shared_t *sh, int64_t pi) {
    const uint8_t *query = sh->qflat + sh->qoff[sh->pair_q[pi]];
    int64_t qlen = sh->qoff[sh->pair_q[pi] + 1] - sh->qoff[sh->pair_q[pi]];
    const uint8_t *target = sh->tflat + sh->toff[sh->pair_t[pi]];
    int64_t tlen = sh->toff[sh->pair_t[pi] + 1] - sh->toff[sh->pair_t[pi]];
    const int32_t *mat = sh->mat;
    int32_t m = sh->m;

    int64_t st, en, score, diag, dist;
    bz_ungapped(query, qlen, target, tlen, sh->pair_diag[pi], mat, m,
                &st, &en, &score, &diag, &dist);
    int64_t q_u_start, q_u_end, t_u_start, t_u_end;
    if (diag >= 0) {
        q_u_start = st + dist; q_u_end = en + dist;
        t_u_start = st; t_u_end = en;
    } else {
        q_u_start = st; q_u_end = en;
        t_u_start = st + dist; t_u_end = en + dist;
    }
    if (q_u_end - q_u_start == qlen - 1 && t_u_start == 0
            && t_u_end == tlen - 1) {
        int64_t ids = 0;
        for (int64_t k = 0; k < qlen; k++)
            ids += query[q_u_start + k] == target[t_u_start + k];
        sh->o_score[pi] = (int32_t)score;
        sh->o_qs[pi] = (int32_t)q_u_start;
        sh->o_qe[pi] = (int32_t)q_u_end;
        sh->o_ts[pi] = (int32_t)t_u_start;
        sh->o_te[pi] = (int32_t)t_u_end;
        sh->o_ids[pi] = (int32_t)ids;
        sh->o_btlen[pi] = (int32_t)qlen;
        return 0;
    }
    /* shifted reverse buffers (BandedNucleotideAligner.cpp:61-93
     * seq_reverse off-by-one; out-of-range byte = wildcard).
     * np.concatenate(([first], seq[1:end+1][::-1])) always includes
     * the `first` element, so the length is max(end+1, 1) — end can
     * be -1 on no-anchor candidates (unreachable from the real
     * prefilter; kept bug-compatible with the Python engine). */
    uint8_t wild = (uint8_t)(m - 1);
    int64_t bq_len = q_u_end + 1 > 1 ? q_u_end + 1 : 1;
    int64_t bt_len2 = t_u_end + 1 > 1 ? t_u_end + 1 : 1;
    uint8_t *back_q = (uint8_t *)bz_ensure(&ws->rev1, bq_len, 1);
    uint8_t *back_t = (uint8_t *)bz_ensure(&ws->rev2, bt_len2, 1);
    if (!back_q || !back_t)
        return -1;
    back_q[0] = q_u_end + 1 < qlen ? query[q_u_end + 1] : wild;
    for (int64_t k = 1; k <= q_u_end; k++)
        back_q[k] = query[q_u_end + 1 - k];
    back_t[0] = t_u_end + 1 < tlen ? target[t_u_end + 1] : wild;
    for (int64_t k = 1; k <= t_u_end; k++)
        back_t[k] = target[t_u_end + 1 - k];

    bz_ez_t ez, ez_a;
    int64_t nc = 0;
    if (bz_extz2(ws, back_q, bq_len, back_t, bt_len2, mat, m,
                 sh->gapo, sh->gape, 64, sh->zdrop, 1, &ez, NULL) < 0)
        return -1;
    int64_t q_start = qlen - ((qlen - q_u_end - 1) + ez.max_q) - 1;
    int64_t t_start = tlen - ((tlen - t_u_end - 1) + ez.max_t) - 1;
    /* python suffix slicing: seq[q_start:] with a negative start is
     * the last -q_start elements */
    int64_t qs2 = q_start < 0
        ? (qlen + q_start < 0 ? 0 : qlen + q_start)
        : (q_start > qlen ? qlen : q_start);
    int64_t ts2 = t_start < 0
        ? (tlen + t_start < 0 ? 0 : tlen + t_start)
        : (t_start > tlen ? tlen : t_start);
    if (bz_extz2(ws, query + qs2, qlen - qs2,
                 target + ts2, tlen - ts2, mat, m,
                 sh->gapo, sh->gape, 64, sh->zdrop, 0, &ez_a, &nc) < 0)
        return -1;
    int reversed = 0;
    if (ez.max_q > ez_a.max_q && ez.max_t > ez_a.max_t) {
        if (bz_extz2(ws, back_q, bq_len, back_t, bt_len2, mat,
                     m, sh->gapo, sh->gape, 64, sh->zdrop, 0, &ez_a,
                     &nc) < 0)
            return -1;
        reversed = 1;
    }
    const int32_t *cig = (const int32_t *)ws->cig.p;
    int64_t ids = 0, btlen = 0;
    int64_t qp = q_start, tp = t_start;
    for (int64_t ci = 0; ci < nc; ci++) {
        int64_t k = reversed ? nc - 1 - ci : ci;
        int32_t op = cig[k * 2], ln = cig[k * 2 + 1];
        if (op == 0) {
            /* python slice semantics for seq[p:p+ln] (p may be
             * negative on no-anchor candidates) */
            int64_t qa = qp < 0 ? (qlen + qp < 0 ? 0 : qlen + qp)
                                : (qp > qlen ? qlen : qp);
            int64_t qb = qp + ln < 0
                ? (qlen + qp + ln < 0 ? 0 : qlen + qp + ln)
                : (qp + ln > qlen ? qlen : qp + ln);
            int64_t ta = tp < 0 ? (tlen + tp < 0 ? 0 : tlen + tp)
                                : (tp > tlen ? tlen : tp);
            int64_t tb = tp + ln < 0
                ? (tlen + tp + ln < 0 ? 0 : tlen + tp + ln)
                : (tp + ln > tlen ? tlen : tp + ln);
            int64_t n1 = qb - qa > 0 ? qb - qa : 0;
            int64_t n2 = tb - ta > 0 ? tb - ta : 0;
            int64_t nn = n1 < n2 ? n1 : n2;
            for (int64_t kk = 0; kk < nn; kk++)
                ids += query[qa + kk] == target[ta + kk];
            qp += ln;
            tp += ln;
        } else if (op == 1) {
            qp += ln;
        } else {
            tp += ln;
        }
        btlen += ln;
    }
    sh->o_score[pi] = ez_a.max;
    sh->o_qs[pi] = (int32_t)q_start;
    sh->o_qe[pi] = (int32_t)(q_start + ez_a.max_q);
    sh->o_ts[pi] = (int32_t)t_start;
    sh->o_te[pi] = (int32_t)(t_start + ez_a.max_t);
    sh->o_ids[pi] = (int32_t)ids;
    sh->o_btlen[pi] = (int32_t)btlen;
    return 0;
}

static void *bz_worker(void *arg) {
    bz_shared_t *sh = (bz_shared_t *)arg;
    bz_ws_t ws;
    memset(&ws, 0, sizeof(ws));
    for (;;) {
        int64_t p0 = __atomic_fetch_add(sh->next, BZ_CHUNK,
                                        __ATOMIC_RELAXED);
        if (p0 >= sh->n_pairs || *sh->error)
            break;
        int64_t p1 = p0 + BZ_CHUNK < sh->n_pairs ? p0 + BZ_CHUNK
                                                 : sh->n_pairs;
        for (int64_t pi = p0; pi < p1; pi++) {
            if (bz_align_one(&ws, sh, pi) < 0) {
                *sh->error = 1;
                break;
            }
        }
    }
    free(ws.u.p); free(ws.v.p); free(ws.x.p); free(ws.y.p);
    free(ws.s.p); free(ws.H.p); free(ws.drows.p); free(ws.doff.p);
    free(ws.rst.p); free(ws.ren.p); free(ws.cig.p);
    free(ws.rev1.p); free(ws.rev2.p);
    return NULL;
}

/* Returns 0 ok, -1 on allocation failure (caller falls back). */
int64_t banded_align_batch(
        const uint8_t *qflat, const int64_t *qoff,
        const uint8_t *tflat, const int64_t *toff,
        const int32_t *pair_q, const int32_t *pair_t,
        const int32_t *pair_diag, int64_t n_pairs,
        const int32_t *mat, int32_t m,
        int32_t gapo, int32_t gape, int32_t zdrop, int32_t n_threads,
        int32_t *o_score, int32_t *o_qs, int32_t *o_qe,
        int32_t *o_ts, int32_t *o_te, int32_t *o_ids,
        int32_t *o_btlen) {
    volatile int64_t next = 0;
    volatile int error = 0;
    bz_shared_t sh = {
        qflat, qoff, tflat, toff, pair_q, pair_t, pair_diag, n_pairs,
        mat, m, gapo, gape, zdrop,
        o_score, o_qs, o_qe, o_ts, o_te, o_ids, o_btlen,
        &next, &error,
    };
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;
    if (n_threads == 1 || n_pairs < 2 * BZ_CHUNK) {
        bz_worker(&sh);
    } else {
        pthread_t tids[64];
        int nt = 0;
        for (int i = 0; i < n_threads; i++)
            if (pthread_create(&tids[nt], NULL, bz_worker, &sh) == 0)
                nt++;
        if (nt == 0)
            bz_worker(&sh);
        for (int i = 0; i < nt; i++)
            pthread_join(tids[i], NULL);
    }
    return error ? -1 : 0;
}
