/* Native epoch loop for the averaged-perceptron CRF trainer.
 *
 * Semantics-identical C implementation of the epoch loop inside
 * webstruct_spark/kernel/crf.py CRFTagger.fit_compact (which is
 * itself the bit-identical compact twin of CRFTagger.fit — see its
 * docstring).  The pure-Python loop remains the differential oracle:
 * tests/test_trained_crf.py::test_fit_epoch_native_bit_identical
 * fuzzes this module against it.
 *
 * Float determinism: every operation is an elementwise IEEE-754
 * double add/sub/compare in the exact order of the numpy path
 * (emissions accumulate per token in feature order; the Viterbi DP
 * computes cand = score[p] + trans[p][c] then score' = cand_best +
 * em[t][c]; argmax scans ascending and keeps the FIRST maximum, like
 * np.argmax).  x86-64 SSE2 doubles carry no excess precision and -O2
 * (without -ffast-math) performs no reassociation, so results are
 * bit-identical to numpy's elementwise ops.
 *
 * Why it exists: each mixing round of train_crf_distributed is
 * wall-bounded by its SLOWEST shard's epoch (driver barrier); the
 * Python loop costs ~0.2-0.8 s per shard at sf0.1 and the straggler
 * sets the round.  The C loop removes that bound without changing a
 * single emitted float.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

typedef struct {
    Py_buffer buf;
    int held;
} Buf;

static int
get_buf(PyObject *obj, Buf *b, int writable, const char *name)
{
    int flags = PyBUF_C_CONTIGUOUS | (writable ? PyBUF_WRITABLE : 0);
    if (PyObject_GetBuffer(obj, &b->buf, flags) < 0) {
        PyErr_Format(PyExc_TypeError,
                     "fit_epoch: %s must be a C-contiguous%s buffer",
                     name, writable ? " writable" : "");
        return -1;
    }
    b->held = 1;
    return 0;
}

static PyObject *
py_fit_epoch(PyObject *self, PyObject *args)
{
    PyObject *oW, *oU, *oTouched, *oTrans, *oUt, *oInit, *oUi;
    PyObject *oRtc, *oGold, *oTfc, *oFid;
    double c;
    int epochs;
    (void)self;
    if (!PyArg_ParseTuple(args, "OOOOOOOOOOOdi:fit_epoch",
                          &oW, &oU, &oTouched, &oTrans, &oUt, &oInit,
                          &oUi, &oRtc, &oGold, &oTfc, &oFid, &c,
                          &epochs))
        return NULL;

    Buf bW = {0}, bU = {0}, bTouched = {0}, bTrans = {0}, bUt = {0};
    Buf bInit = {0}, bUi = {0}, bRtc = {0}, bGold = {0}, bTfc = {0};
    Buf bFid = {0};
    PyObject *ret = NULL;
    double *em = NULL;
    double *score = NULL, *score_new = NULL;
    Py_ssize_t *back = NULL;
    Py_ssize_t *pred = NULL;

    if (get_buf(oW, &bW, 1, "W") < 0) goto done;
    if (get_buf(oU, &bU, 1, "U") < 0) goto done;
    if (get_buf(oTouched, &bTouched, 1, "touched") < 0) goto done;
    if (get_buf(oTrans, &bTrans, 1, "trans") < 0) goto done;
    if (get_buf(oUt, &bUt, 1, "ut") < 0) goto done;
    if (get_buf(oInit, &bInit, 1, "init") < 0) goto done;
    if (get_buf(oUi, &bUi, 1, "ui") < 0) goto done;
    if (get_buf(oRtc, &bRtc, 0, "row_tok_counts") < 0) goto done;
    if (get_buf(oGold, &bGold, 0, "gold") < 0) goto done;
    if (get_buf(oTfc, &bTfc, 0, "tok_feat_counts") < 0) goto done;
    if (get_buf(oFid, &bFid, 0, "feat_ids") < 0) goto done;

    {
        double *W = (double *)bW.buf.buf;
        double *U = (double *)bU.buf.buf;
        unsigned char *touched = (unsigned char *)bTouched.buf.buf;
        double *trans = (double *)bTrans.buf.buf;
        double *ut = (double *)bUt.buf.buf;
        double *init = (double *)bInit.buf.buf;
        double *ui = (double *)bUi.buf.buf;
        const int *rtc = (const int *)bRtc.buf.buf;
        const long long *gold = (const long long *)bGold.buf.buf;
        const int *tfc = (const int *)bTfc.buf.buf;
        const int *fid = (const int *)bFid.buf.buf;

        Py_ssize_t T = (Py_ssize_t)(bInit.buf.len / (Py_ssize_t)sizeof(double));
        Py_ssize_t V = (Py_ssize_t)bTouched.buf.len;
        Py_ssize_t R = (Py_ssize_t)(bRtc.buf.len / (Py_ssize_t)sizeof(int));
        Py_ssize_t NT = (Py_ssize_t)(bTfc.buf.len / (Py_ssize_t)sizeof(int));
        Py_ssize_t NF = (Py_ssize_t)(bFid.buf.len / (Py_ssize_t)sizeof(int));

        if ((Py_ssize_t)(bW.buf.len / sizeof(double)) != V * T ||
            (Py_ssize_t)(bU.buf.len / sizeof(double)) != V * T ||
            (Py_ssize_t)(bTrans.buf.len / sizeof(double)) != T * T ||
            (Py_ssize_t)(bUt.buf.len / sizeof(double)) != T * T ||
            (Py_ssize_t)(bUi.buf.len / sizeof(double)) != T ||
            (Py_ssize_t)(bGold.buf.len / sizeof(long long)) != NT) {
            PyErr_SetString(PyExc_ValueError,
                            "fit_epoch: inconsistent buffer shapes");
            goto done;
        }

        Py_ssize_t max_n = 0, tot = 0;
        for (Py_ssize_t r = 0; r < R; r++) {
            if (rtc[r] > max_n) max_n = rtc[r];
            tot += rtc[r];
        }
        if (tot != NT) {
            PyErr_SetString(PyExc_ValueError,
                            "fit_epoch: row_tok_counts do not sum to "
                            "the token count");
            goto done;
        }
        {
            Py_ssize_t ftot = 0;
            for (Py_ssize_t i = 0; i < NT; i++) ftot += tfc[i];
            if (ftot != NF) {
                PyErr_SetString(PyExc_ValueError,
                                "fit_epoch: tok_feat_counts do not sum "
                                "to the feature count");
                goto done;
            }
        }
        for (Py_ssize_t i = 0; i < NF; i++) {
            if (fid[i] < 0 || (Py_ssize_t)fid[i] >= V) {
                PyErr_SetString(PyExc_ValueError,
                                "fit_epoch: feature id out of range");
                goto done;
            }
        }
        for (Py_ssize_t i = 0; i < NT; i++) {
            if (gold[i] < 0 || (Py_ssize_t)gold[i] >= T) {
                PyErr_SetString(PyExc_ValueError,
                                "fit_epoch: gold tag id out of range");
                goto done;
            }
        }

        if (max_n > 0) {
            em = (double *)PyMem_Malloc((size_t)(max_n * T) * sizeof(double));
            back = (Py_ssize_t *)PyMem_Malloc(
                (size_t)(max_n * T) * sizeof(Py_ssize_t));
            pred = (Py_ssize_t *)PyMem_Malloc((size_t)max_n * sizeof(Py_ssize_t));
            score = (double *)PyMem_Malloc((size_t)T * sizeof(double));
            score_new = (double *)PyMem_Malloc((size_t)T * sizeof(double));
            if (!em || !back || !pred || !score || !score_new) {
                PyErr_NoMemory();
                goto done;
            }
        }

        for (int ep = 0; ep < epochs; ep++) {
            Py_ssize_t tok0 = 0; /* first token index of row */
            Py_ssize_t f0 = 0;   /* first feature index of row */
            for (Py_ssize_t r = 0; r < R; r++) {
                Py_ssize_t n = rtc[r];
                if (n == 0)
                    continue; /* no c increment, like the Python path */
                /* emissions: per token, add W rows in feature order */
                Py_ssize_t fo = f0;
                for (Py_ssize_t i = 0; i < n; i++) {
                    double *row = em + i * T;
                    for (Py_ssize_t t = 0; t < T; t++) row[t] = 0.0;
                    Py_ssize_t nf = tfc[tok0 + i];
                    for (Py_ssize_t k = 0; k < nf; k++) {
                        const double *w = W + (Py_ssize_t)fid[fo + k] * T;
                        for (Py_ssize_t t = 0; t < T; t++) row[t] += w[t];
                    }
                    fo += nf;
                }
                /* viterbi: score = init + em[0]; DP with first-max
                 * argmax (strict > keeps the first, like np.argmax) */
                for (Py_ssize_t t = 0; t < T; t++)
                    score[t] = init[t] + em[t];
                for (Py_ssize_t t = 1; t < n; t++) {
                    const double *emt = em + t * T;
                    Py_ssize_t *bk = back + t * T;
                    for (Py_ssize_t cc = 0; cc < T; cc++) {
                        double best = score[0] + trans[cc]; /* p=0 */
                        Py_ssize_t bp = 0;
                        for (Py_ssize_t p = 1; p < T; p++) {
                            double v = score[p] + trans[p * T + cc];
                            if (v > best) { best = v; bp = p; }
                        }
                        bk[cc] = bp;
                        score_new[cc] = best + emt[cc];
                    }
                    { double *tmp = score; score = score_new; score_new = tmp; }
                }
                {
                    double best = score[0];
                    Py_ssize_t bi = 0;
                    for (Py_ssize_t t = 1; t < T; t++)
                        if (score[t] > best) { best = score[t]; bi = t; }
                    pred[n - 1] = bi;
                }
                for (Py_ssize_t t = n - 1; t > 0; t--)
                    pred[t - 1] = back[t * T + pred[t]];
                /* updates iff the whole path differs somewhere */
                {
                    int differs = 0;
                    for (Py_ssize_t i = 0; i < n; i++)
                        if (pred[i] != (Py_ssize_t)gold[tok0 + i]) {
                            differs = 1;
                            break;
                        }
                    if (differs) {
                        Py_ssize_t fo2 = f0;
                        for (Py_ssize_t i = 0; i < n; i++) {
                            Py_ssize_t g = (Py_ssize_t)gold[tok0 + i];
                            Py_ssize_t p = pred[i];
                            Py_ssize_t nf = tfc[tok0 + i];
                            if (g != p) {
                                for (Py_ssize_t k = 0; k < nf; k++) {
                                    Py_ssize_t j = (Py_ssize_t)fid[fo2 + k];
                                    W[j * T + g] += 1.0;
                                    W[j * T + p] -= 1.0;
                                    U[j * T + g] += c;
                                    U[j * T + p] -= c;
                                    touched[j] = 1;
                                }
                            }
                            if (i == 0) {
                                if (g != p) {
                                    init[g] += 1.0;
                                    init[p] -= 1.0;
                                    ui[g] += c;
                                    ui[p] -= c;
                                }
                            } else {
                                Py_ssize_t pg = (Py_ssize_t)gold[tok0 + i - 1];
                                Py_ssize_t pp = pred[i - 1];
                                if (pg != pp || g != p) {
                                    trans[pg * T + g] += 1.0;
                                    trans[pp * T + p] -= 1.0;
                                    ut[pg * T + g] += c;
                                    ut[pp * T + p] -= c;
                                }
                            }
                            fo2 += nf;
                        }
                    }
                }
                c += 1.0;
                tok0 += n;
                f0 = fo;
            }
        }
        ret = PyFloat_FromDouble(c);
    }

done:
    PyMem_Free(em);
    PyMem_Free(back);
    PyMem_Free(pred);
    PyMem_Free(score);
    PyMem_Free(score_new);
    if (bW.held) PyBuffer_Release(&bW.buf);
    if (bU.held) PyBuffer_Release(&bU.buf);
    if (bTouched.held) PyBuffer_Release(&bTouched.buf);
    if (bTrans.held) PyBuffer_Release(&bTrans.buf);
    if (bUt.held) PyBuffer_Release(&bUt.buf);
    if (bInit.held) PyBuffer_Release(&bInit.buf);
    if (bUi.held) PyBuffer_Release(&bUi.buf);
    if (bRtc.held) PyBuffer_Release(&bRtc.buf);
    if (bGold.held) PyBuffer_Release(&bGold.buf);
    if (bTfc.held) PyBuffer_Release(&bTfc.buf);
    if (bFid.held) PyBuffer_Release(&bFid.buf);
    return ret;
}

static PyMethodDef crf_methods[] = {
    {"fit_epoch", py_fit_epoch, METH_VARARGS,
     "fit_epoch(W, U, touched, trans, ut, init, ui, row_tok_counts, "
     "gold, tok_feat_counts, feat_ids, c0, epochs) -> c_end.\n"
     "Bit-identical native twin of CRFTagger.fit_compact's epoch "
     "loop; mutates the weight/accumulator buffers in place."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef crf_module = {
    PyModuleDef_HEAD_INIT, "_crf_native",
    "Native averaged-perceptron epoch loop (see kernel/crf.py).",
    -1, crf_methods, NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC
PyInit__crf_native(void)
{
    return PyModule_Create(&crf_module);
}
