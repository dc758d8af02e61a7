/* Native tokenizer + fused mention-extraction kernel.
 *
 * Semantics-identical C implementation of
 * webstruct_spark/kernel/tokenize.py (segment_words /
 * default_segment_words) and the fused marker scan of
 * webstruct_spark/operators/extract.py (extract_turn_entities),
 * which together reproduce the reference tokenizer
 * (/root/reference/webstruct/text_tokenizers.py:9-217), the IOB2
 * marker consumption (/root/reference/webstruct/sequence_encoding.py:58-85)
 * and smart_join (/root/reference/webstruct/utils.py:59-75).
 *
 * The pure-Python implementations remain the differential oracle:
 * tests/test_ctok_differential.py fuzzes this module against them and
 * tests/test_tokenizer_differential.py fuzzes the active path against
 * the reference itself.
 *
 * Rule set (order is precedence, identical to tokenize.py _RULES):
 *   1  \s+                    -> separator, emits nothing
 *   2  U+201C                 -> "``"   (length 1)
 *   3  ["  U+201D]            -> "''"   (length 1)
 *   4  ``                     -> verbatim
 *   5  U+2026 | "..."         -> "..."  (length 1 / 3)
 *   6  --                     -> verbatim
 *   7  ,(?=\D|$)              -> verbatim
 *   8  \.$                    -> verbatim ($ = end or before final \n)
 *   9  [;#$%&|!?\[\](){}<>] and U+00A3 -> verbatim
 *  10  '(?=\s) | ''           -> verbatim
 * plus the open-quote pre-pass ((^|[\s(\[{<])") which splits the text
 * into independently-scanned segments ($ anchors are segment-local).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

/* ---- token descriptors -------------------------------------------- */

enum { TK_VERBATIM = 0, TK_BACKTICKS = 1, TK_QUOTES = 2, TK_ELLIPSIS = 3 };

typedef struct {
    Py_ssize_t start; /* char offset into the original text */
    Py_ssize_t len;   /* reported token length (chars consumed) */
    int        kind;  /* TK_* above */
} Tok;

typedef struct {
    Tok       *a;
    Py_ssize_t n, cap;
} TokVec;

static int
tv_push(TokVec *v, Py_ssize_t start, Py_ssize_t len, int kind)
{
    if (v->n == v->cap) {
        Py_ssize_t ncap = v->cap ? v->cap * 2 : 64;
        Tok *na = (Tok *)PyMem_Realloc(v->a, (size_t)ncap * sizeof(Tok));
        if (na == NULL) {
            PyErr_NoMemory();
            return -1;
        }
        v->a = na;
        v->cap = ncap;
    }
    v->a[v->n].start = start;
    v->a[v->n].len = len;
    v->a[v->n].kind = kind;
    v->n++;
    return 0;
}

/* sre parity: \w == Py_UNICODE_ISALNUM || '_', \s == Py_UNICODE_ISSPACE,
 * \d == Py_UNICODE_ISDIGIT (CPython Modules/_sre/sre.h). */
static inline int
is_word(Py_UCS4 c)
{
    return c == '_' || Py_UNICODE_ISALNUM(c);
}

static inline int
is_rule9(Py_UCS4 c)
{
    switch (c) {
    case ';': case '#': case '$': case '%': case '&': case '|':
    case '!': case '?': case '[': case ']': case '(': case ')':
    case '{': case '}': case '<': case '>':
        return 1;
    default:
        return c == 0xA3; /* pound sign */
    }
}

/* ---- the rule scanner over one quote-free segment [lo, hi) -------- */

static int
scan_segment(int ukind, const void *data, Py_ssize_t lo, Py_ssize_t hi,
             TokVec *v)
{
    Py_ssize_t i = lo, last = lo;
    while (i < hi) {
        Py_UCS4 c = PyUnicode_READ(ukind, data, i);
        Py_ssize_t mlen;
        int ekind = TK_VERBATIM;
        int emits = 1;

        if (Py_UNICODE_ISSPACE(c)) { /* rule 1: greedy \s+ */
            mlen = 1;
            while (i + mlen < hi &&
                   Py_UNICODE_ISSPACE(PyUnicode_READ(ukind, data, i + mlen)))
                mlen++;
            emits = 0;
        }
        else if (c == 0x201C) { mlen = 1; ekind = TK_BACKTICKS; }
        else if (c == '"' || c == 0x201D) { mlen = 1; ekind = TK_QUOTES; }
        else if (c == '`' && i + 1 < hi &&
                 PyUnicode_READ(ukind, data, i + 1) == '`') {
            mlen = 2;
        }
        else if (c == 0x2026) { mlen = 1; ekind = TK_ELLIPSIS; }
        else if (c == '.' && i + 2 < hi &&
                 PyUnicode_READ(ukind, data, i + 1) == '.' &&
                 PyUnicode_READ(ukind, data, i + 2) == '.') {
            mlen = 3;
        }
        else if (c == '-' && i + 1 < hi &&
                 PyUnicode_READ(ukind, data, i + 1) == '-') {
            mlen = 2;
        }
        else if (c == ',' &&
                 (i + 1 == hi ||
                  !Py_UNICODE_ISDIGIT(PyUnicode_READ(ukind, data, i + 1)))) {
            mlen = 1;
        }
        else if (c == '.' &&
                 (i + 1 == hi ||
                  (i + 2 == hi &&
                   PyUnicode_READ(ukind, data, i + 1) == '\n'))) {
            mlen = 1; /* rule 8: \.$  ($ also matches before a final \n) */
        }
        else if (is_rule9(c)) { mlen = 1; }
        else if (c == '\'') {
            if (i + 1 < hi &&
                Py_UNICODE_ISSPACE(PyUnicode_READ(ukind, data, i + 1))) {
                mlen = 1;
            }
            else if (i + 1 < hi &&
                     PyUnicode_READ(ukind, data, i + 1) == '\'') {
                mlen = 2;
            }
            else { i++; continue; }
        }
        else { i++; continue; }

        if (i > last && tv_push(v, last, i - last, TK_VERBATIM) < 0)
            return -1;
        if (emits && tv_push(v, i, mlen, ekind) < 0)
            return -1;
        i += mlen;
        last = i;
    }
    if (hi > last && tv_push(v, last, hi - last, TK_VERBATIM) < 0)
        return -1;
    return 0;
}

/* ---- full text: open-quote pre-pass + per-segment scan ------------ */

static inline int
is_open_quote_prefix(Py_UCS4 c)
{
    return Py_UNICODE_ISSPACE(c) || c == '(' || c == '[' || c == '{' ||
           c == '<';
}

static int
segment_all(PyObject *text, TokVec *v)
{
    Py_ssize_t n = PyUnicode_GET_LENGTH(text);
    int ukind = PyUnicode_KIND(text);
    const void *data = PyUnicode_DATA(text);
    Py_ssize_t seg = 0, i;

    for (i = 0; i < n; i++) {
        if (PyUnicode_READ(ukind, data, i) != '"')
            continue;
        if (i != 0 &&
            !is_open_quote_prefix(PyUnicode_READ(ukind, data, i - 1)))
            continue;
        /* open quote: flush the preceding segment, emit "``" (len 1) */
        if (scan_segment(ukind, data, seg, i, v) < 0)
            return -1;
        if (tv_push(v, i, 1, TK_BACKTICKS) < 0)
            return -1;
        seg = i + 1;
    }
    return scan_segment(ukind, data, seg, n, v);
}

static inline int
is_dropped_standalone(int ukind, const void *data, const Tok *t)
{
    Py_UCS4 c;
    if (t->kind != TK_VERBATIM || t->len != 1)
        return 0;
    c = PyUnicode_READ(ukind, data, t->start);
    return c == ',' || c == ';';
}

/* ---- materialization ---------------------------------------------- */

static PyObject *str_backticks; /* "``"  */
static PyObject *str_quotes;    /* "''"  */
static PyObject *str_ellipsis;  /* "..." */

static PyObject *
tok_text(PyObject *text, const Tok *t)
{
    switch (t->kind) {
    case TK_BACKTICKS: Py_INCREF(str_backticks); return str_backticks;
    case TK_QUOTES:    Py_INCREF(str_quotes);    return str_quotes;
    case TK_ELLIPSIS:  Py_INCREF(str_ellipsis);  return str_ellipsis;
    default:
        return PyUnicode_Substring(text, t->start, t->start + t->len);
    }
}

static PyObject *
tokens_to_list(PyObject *text, TokVec *v, int drop_punct)
{
    int ukind = PyUnicode_KIND(text);
    const void *data = PyUnicode_DATA(text);
    PyObject *out = PyList_New(0);
    Py_ssize_t i;
    if (out == NULL)
        return NULL;
    for (i = 0; i < v->n; i++) {
        Tok *t = &v->a[i];
        PyObject *tup, *s;
        if (drop_punct && is_dropped_standalone(ukind, data, t))
            continue;
        s = tok_text(text, t);
        if (s == NULL)
            goto fail;
        tup = Py_BuildValue("(Nnn)", s, t->start, t->len);
        if (tup == NULL)
            goto fail;
        if (PyList_Append(out, tup) < 0) {
            Py_DECREF(tup);
            goto fail;
        }
        Py_DECREF(tup);
    }
    return out;
fail:
    Py_DECREF(out);
    return NULL;
}

static PyObject *
segment_impl(PyObject *arg, int drop_punct)
{
    TokVec v = {NULL, 0, 0};
    PyObject *out = NULL;
    if (!PyUnicode_Check(arg)) {
        PyErr_SetString(PyExc_TypeError, "expected str");
        return NULL;
    }
    if (segment_all(arg, &v) == 0)
        out = tokens_to_list(arg, &v, drop_punct);
    PyMem_Free(v.a);
    return out;
}

static PyObject *
py_segment_words(PyObject *self, PyObject *arg)
{
    return segment_impl(arg, 0);
}

static PyObject *
py_default_segment_words(PyObject *self, PyObject *arg)
{
    return segment_impl(arg, 1);
}

/* ---- marker parse: __(START|END)_(\w+?)__  (re.match semantics) --- */

typedef struct {
    int        is_start;  /* 1 START, 0 END */
    Py_ssize_t val_start; /* char offset of the type value */
    Py_ssize_t val_len;
} Marker;

static int
parse_marker(int ukind, const void *data, Py_ssize_t start, Py_ssize_t len,
             Marker *m)
{
    static const char S[] = "START", E[] = "END";
    Py_ssize_t end = start + len, p, k, j;
    const char *word;
    Py_ssize_t wlen;

    if (len < 2 || PyUnicode_READ(ukind, data, start) != '_' ||
        PyUnicode_READ(ukind, data, start + 1) != '_')
        return 0;
    /* alternation order: START first, then END */
    word = S; wlen = 5; m->is_start = 1;
    for (j = 0; j < wlen && start + 2 + j < end; j++)
        if (PyUnicode_READ(ukind, data, start + 2 + j) != (Py_UCS4)word[j])
            break;
    if (j != wlen || start + 2 + wlen >= end ||
        PyUnicode_READ(ukind, data, start + 2 + wlen) != '_') {
        word = E; wlen = 3; m->is_start = 0;
        for (j = 0; j < wlen && start + 2 + j < end; j++)
            if (PyUnicode_READ(ukind, data, start + 2 + j) != (Py_UCS4)word[j])
                break;
        if (j != wlen || start + 2 + wlen >= end ||
            PyUnicode_READ(ukind, data, start + 2 + wlen) != '_')
            return 0;
    }
    p = start + 2 + wlen + 1; /* first char of \w+? */
    /* non-greedy: smallest k >= 1 with word chars then "__" */
    for (k = 1; p + k + 1 < end + 1; k++) {
        if (!is_word(PyUnicode_READ(ukind, data, p + k - 1)))
            return 0;
        if (p + k + 1 < end &&
            PyUnicode_READ(ukind, data, p + k) == '_' &&
            PyUnicode_READ(ukind, data, p + k + 1) == '_') {
            m->val_start = p;
            m->val_len = k;
            return 1;
        }
    }
    return 0;
}

/* ---- smart_join over entity piece tokens --------------------------
 * " ".join(pieces), then drop ' ' before [,:;.!?")] and after '('
 * (two sequential passes, matching the reference's two re.sub calls). */

static inline int
in_space_before_set(Py_UCS4 c)
{
    switch (c) {
    case ',': case ':': case ';': case '.': case '!': case '?':
    case '"': case ')':
        return 1;
    default:
        return 0;
    }
}

static PyObject *
smart_join_toks(PyObject *text, const Tok *pieces, Py_ssize_t np)
{
    int ukind = PyUnicode_KIND(text);
    const void *data = PyUnicode_DATA(text);
    Py_ssize_t total = 0, i, w = 0, r;
    Py_UCS4 *buf;
    PyObject *out;

    for (i = 0; i < np; i++) {
        switch (pieces[i].kind) {
        case TK_BACKTICKS: case TK_QUOTES: total += 2; break;
        case TK_ELLIPSIS:  total += 3; break;
        default:           total += pieces[i].len; break;
        }
    }
    total += (np > 0) ? np - 1 : 0;
    buf = (Py_UCS4 *)PyMem_Malloc((size_t)(total ? total : 1) *
                                  sizeof(Py_UCS4));
    if (buf == NULL)
        return PyErr_NoMemory();
    for (i = 0; i < np; i++) {
        Py_ssize_t j;
        if (i > 0)
            buf[w++] = ' ';
        switch (pieces[i].kind) {
        case TK_BACKTICKS:
            buf[w++] = '`'; buf[w++] = '`'; break;
        case TK_QUOTES:
            buf[w++] = '\''; buf[w++] = '\''; break;
        case TK_ELLIPSIS:
            buf[w++] = '.'; buf[w++] = '.'; buf[w++] = '.'; break;
        default:
            for (j = 0; j < pieces[i].len; j++)
                buf[w++] = PyUnicode_READ(ukind, data, pieces[i].start + j);
        }
    }
    /* pass 1: ' ' followed by one of ,:;.!?") vanishes */
    for (r = 0, w = 0; r < total; r++) {
        if (buf[r] == ' ' && r + 1 < total &&
            in_space_before_set(buf[r + 1]))
            continue;
        buf[w++] = buf[r];
    }
    total = w;
    /* pass 2: ' ' preceded by '(' vanishes */
    for (r = 0, w = 0; r < total; r++) {
        if (buf[r] == ' ' && w > 0 && buf[w - 1] == '(')
            continue;
        buf[w++] = buf[r];
    }
    out = PyUnicode_FromKindAndData(PyUnicode_4BYTE_KIND, buf, w);
    PyMem_Free(buf);
    return out;
}

/* ---- plain_tokens(text): the marker-free clean token stream -------
 * Same contract as operators/tagger.py:plain_tokens — every token
 * from default_segment_words except marker tokens (prefix-match
 * semantics, like classify_token's _MARKER_RE.match).  The q9/q11
 * inference hot path. */

static PyObject *
py_plain_tokens(PyObject *self, PyObject *arg)
{
    TokVec v = {NULL, 0, 0};
    PyObject *out = NULL;
    int ukind;
    const void *data;
    Py_ssize_t i;

    if (!PyUnicode_Check(arg)) {
        PyErr_SetString(PyExc_TypeError, "expected str");
        return NULL;
    }
    ukind = PyUnicode_KIND(arg);
    data = PyUnicode_DATA(arg);
    if (segment_all(arg, &v) < 0)
        goto done;
    out = PyList_New(0);
    if (out == NULL)
        goto done;
    for (i = 0; i < v.n; i++) {
        Tok *t = &v.a[i];
        PyObject *s;
        if (is_dropped_standalone(ukind, data, t))
            continue;
        if (t->kind == TK_VERBATIM) {
            Marker m;
            if (parse_marker(ukind, data, t->start, t->len, &m))
                continue;
        }
        s = tok_text(arg, t);
        if (s == NULL) {
            Py_CLEAR(out);
            goto done;
        }
        if (PyList_Append(out, s) < 0) {
            Py_DECREF(s);
            Py_CLEAR(out);
            goto done;
        }
        Py_DECREF(s);
    }
done:
    PyMem_Free(v.a);
    return out;
}

/* ---- fused extraction: extract_turn(text) -------------------------
 * Returns (n_clean_tokens, [(text, type, tok_start, tok_end,
 * first_char, last_char), ...]); raises ValueError on a close marker
 * that does not match the open type (reference encoder semantics). */

static int
close_entity(PyObject *text, const Tok *pieces, Py_ssize_t np,
             Py_ssize_t otype_start, Py_ssize_t otype_len,
             Py_ssize_t tok_start, Py_ssize_t tok_end,
             Py_ssize_t first_char, Py_ssize_t last_char, PyObject *ents)
{
    PyObject *joined, *etype, *tup;
    if (np == 0)
        return 0;
    joined = smart_join_toks(text, pieces, np);
    if (joined == NULL)
        return -1;
    if (PyUnicode_GET_LENGTH(joined) == 0) { /* _drop_empty parity */
        Py_DECREF(joined);
        return 0;
    }
    etype = PyUnicode_Substring(text, otype_start, otype_start + otype_len);
    if (etype == NULL) {
        Py_DECREF(joined);
        return -1;
    }
    tup = Py_BuildValue("(NNnnnn)", joined, etype, tok_start, tok_end,
                        first_char, last_char);
    if (tup == NULL)
        return -1;
    if (PyList_Append(ents, tup) < 0) {
        Py_DECREF(tup);
        return -1;
    }
    Py_DECREF(tup);
    return 0;
}

static PyObject *
py_extract_turn(PyObject *self, PyObject *args)
{
    TokVec v = {NULL, 0, 0};
    TokVec pieces = {NULL, 0, 0};
    PyObject *ents = NULL, *result = NULL;
    PyObject *arg, *tagset = Py_None;
    int ukind, have_tagset;
    const void *data;
    Py_ssize_t i, n_clean = 0;
    int open_entity = 0, open_is_b = 0;
    Py_ssize_t otype_start = 0, otype_len = 0;
    Py_ssize_t tok_start = 0, first_char = 0, last_char = 0;

    if (!PyArg_ParseTuple(args, "O|O:extract_turn", &arg, &tagset))
        return NULL;
    have_tagset = (tagset != Py_None);
    if (!PyUnicode_Check(arg)) {
        PyErr_SetString(PyExc_TypeError, "expected str");
        return NULL;
    }
    ukind = PyUnicode_KIND(arg);
    data = PyUnicode_DATA(arg);
    if (segment_all(arg, &v) < 0)
        goto done;
    ents = PyList_New(0);
    if (ents == NULL)
        goto done;

    for (i = 0; i < v.n; i++) {
        Tok *t = &v.a[i];
        if (is_dropped_standalone(ukind, data, t))
            continue; /* DefaultTokenizer drops standalone , ; */
        if (t->kind == TK_VERBATIM) {
            Marker m;
            if (parse_marker(ukind, data, t->start, t->len, &m)) {
                if (have_tagset) {
                    /* P3 projection (reference _limit_tags): a marker
                     * whose entity type is outside the tagset is
                     * dropped entirely BEFORE any START/END handling —
                     * mirrors extract_turn_entities_py exactly. */
                    PyObject *val = PyUnicode_Substring(
                        arg, m.val_start, m.val_start + m.val_len);
                    int in_set;
                    if (val == NULL)
                        goto done;
                    in_set = PySequence_Contains(tagset, val);
                    Py_DECREF(val);
                    if (in_set < 0)
                        goto done;
                    if (!in_set)
                        continue;
                }
                if (m.is_start) {
                    if (open_entity) { /* adjacent START: B- starts anew */
                        if (close_entity(arg, pieces.a, pieces.n,
                                         otype_start, otype_len, tok_start,
                                         n_clean - 1, first_char, last_char,
                                         ents) < 0)
                            goto done;
                        pieces.n = 0;
                    }
                    open_entity = 1;
                    open_is_b = 1;
                    otype_start = m.val_start;
                    otype_len = m.val_len;
                }
                else { /* END */
                    PyObject *val = PyUnicode_Substring(
                        arg, m.val_start, m.val_start + m.val_len);
                    PyObject *cur = NULL;
                    int matches = 0;
                    if (val == NULL)
                        goto done;
                    if (open_entity && otype_len == m.val_len) {
                        Py_ssize_t j;
                        matches = 1;
                        for (j = 0; j < otype_len; j++) {
                            if (PyUnicode_READ(ukind, data, otype_start + j)
                                != PyUnicode_READ(ukind, data,
                                                  m.val_start + j)) {
                                matches = 0;
                                break;
                            }
                        }
                    }
                    if (!matches) {
                        if (open_entity) {
                            PyObject *ot = PyUnicode_Substring(
                                arg, otype_start, otype_start + otype_len);
                            if (ot != NULL) {
                                cur = PyUnicode_FromFormat(
                                    "%s%U", open_is_b ? "B-" : "I-", ot);
                                Py_DECREF(ot);
                            }
                        }
                        else {
                            cur = PyUnicode_FromString("O");
                        }
                        if (cur != NULL)
                            PyErr_Format(
                                PyExc_ValueError,
                                "Invalid tag sequence: close tag %R "
                                "doesn't match open tag %R.", val, cur);
                        Py_XDECREF(cur);
                        Py_DECREF(val);
                        goto done;
                    }
                    Py_DECREF(val);
                    if (close_entity(arg, pieces.a, pieces.n, otype_start,
                                     otype_len, tok_start, n_clean - 1,
                                     first_char, last_char, ents) < 0)
                        goto done;
                    pieces.n = 0;
                    open_entity = 0;
                }
                continue;
            }
        }
        /* clean token */
        if (open_entity) {
            if (pieces.n == 0) {
                tok_start = n_clean;
                first_char = t->start;
            }
            if (tv_push(&pieces, t->start, t->len, t->kind) < 0)
                goto done;
            last_char = t->start + t->len - 1;
            open_is_b = 0; /* B- becomes I- after the first token */
        }
        n_clean++;
    }
    if (open_entity &&
        close_entity(arg, pieces.a, pieces.n, otype_start, otype_len,
                     tok_start, n_clean - 1, first_char, last_char,
                     ents) < 0)
        goto done;

    result = Py_BuildValue("(nO)", n_clean, ents);
done:
    Py_XDECREF(ents);
    PyMem_Free(v.a);
    PyMem_Free(pieces.a);
    return result;
}

/* ---- module -------------------------------------------------------- */

static PyMethodDef ctok_methods[] = {
    {"segment_words", py_segment_words, METH_O,
     "WordTokenizer-parity segmentation: [(chars, position, length)]."},
    {"default_segment_words", py_default_segment_words, METH_O,
     "DefaultTokenizer parity: segment_words minus standalone , ; ."},
    {"plain_tokens", py_plain_tokens, METH_O,
     "Marker-free clean token strings (tagger plain_tokens parity)."},
    {"extract_turn", py_extract_turn, METH_VARARGS,
     "Fused tokenize+marker-scan: extract_turn(text, tagset=None) -> "
     "(n_clean_tokens, [(text, type, tok_start, tok_end, first_char, "
     "last_char)]); tagset (any membership container) applies the P3 "
     "projection: out-of-tagset markers are dropped, their text kept."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef ctok_module = {
    PyModuleDef_HEAD_INIT, "_ctok",
    "Native tokenizer/extraction kernel (semantics pinned by the "
    "pure-Python oracle and the reference differential fuzz).",
    -1, ctok_methods,
};

PyMODINIT_FUNC
PyInit__ctok(void)
{
    PyObject *mod;
    str_backticks = PyUnicode_InternFromString("``");
    str_quotes = PyUnicode_InternFromString("''");
    str_ellipsis = PyUnicode_InternFromString("...");
    if (str_backticks == NULL || str_quotes == NULL || str_ellipsis == NULL)
        return NULL;
    mod = PyModule_Create(&ctok_module);
    return mod;
}
