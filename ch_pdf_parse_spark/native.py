"""Native (C, via ctypes) twin of ``kernel._xy_cut`` — the extraction
kernel's hottest loop.

Profiling at 400k bench docs (round 7): ``kernel.extract_document`` costs
~1.1 ms/doc single-thread, and 57% of it is ``_xy_cut`` — pure integer
geometry (stable sorts + 1-D gap grouping + a band suffix scan) over ~60
spans/page, dominated by CPython interpreter overhead (14M function calls
per 3k docs), not by algorithmic work. That shape is exactly what a tiny C
routine removes: no strings, no objects, fixed int64 arithmetic.

Contract and safety:

* ``xy_cut(x1s, y1s, x2s, y2s)`` returns the same ``[(idx, region_x0)...]``
  as ``kernel._xy_cut`` BIT-FOR-BIT — same stable-sort tie-breaks (stable
  merge sort in C mirrors ``sorted(key=...)``), same composite leaf key
  (y1*KY + x1*KX + i), same band suffix-scan semantics. Differentially
  fuzzed against the Python twin in tests/test_kernel.py.
* The C source is embedded here (ships inside the package zip to
  executors), compiled ON FIRST USE with the system cc into a /tmp cache
  keyed by the source sha256 (atomic rename — concurrent workers race
  benignly). Any failure — no compiler, no ctypes, sandboxed /tmp —
  degrades silently to the Python implementation; ``CHPDF_NATIVE=0``
  disables it explicitly. The engine never *requires* a compiler: the
  native path is an optimization, the Python path is the semantics.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SOURCE = r"""
#define _GNU_SOURCE  /* memmem */
#include <stdlib.h>
#include <string.h>

/* Mirrors ch_pdf_parse_spark.kernel._xy_cut exactly (see that docstring).
   All index arrays hold page-local span indices; sorts are STABLE. */

typedef struct {
    const long long *x1, *y1, *x2, *y2;
    long long gx, gy;          /* XY_MIN_GAP_X / _Y */
    int *band_of;
    int *out_idx;
    long long *out_x0;
    int out_n;
    int n;
    int *scratch;              /* merge buffer, size n */
    long long *keybuf;         /* composite keys, size n */
} Ctx;

/* stable merge sort of idx[] by key[idx] ascending (ties keep order) */
static void msort(int *a, int *tmp, int lo, int hi, const long long *key) {
    if (hi - lo < 2) return;
    int mid = (lo + hi) / 2;
    msort(a, tmp, lo, mid, key);
    msort(a, tmp, mid, hi, key);
    if (key[a[mid - 1]] <= key[a[mid]]) return;
    int i = lo, j = mid, k = lo;
    while (i < mid && j < hi)
        tmp[k++] = (key[a[j]] < key[a[i]]) ? a[j++] : a[i++];
    while (i < mid) tmp[k++] = a[i++];
    while (j < hi) tmp[k++] = a[j++];
    memcpy(a + lo, tmp + lo, (size_t)(hi - lo) * sizeof(int));
}

/* stable sort by an arbitrary value array (x1 or y1) */
static void sort_by(Ctx *c, int *idxs, int n, const long long *vals) {
    msort(idxs, c->scratch, 0, n, vals);
}

/* groups over a sorted run: starts[g]..starts[g+1] slices of sorted_idx.
   identical to kernel._groups_1d */
static int groups_1d(const int *sorted_idx, int n, const long long *lo,
                     const long long *hi, long long min_gap, int *starts) {
    int ng = 0;
    starts[0] = 0;
    long long cur_hi = hi[sorted_idx[0]];
    for (int k = 1; k < n; k++) {
        int i = sorted_idx[k];
        if (lo[i] - cur_hi >= min_gap) {
            starts[++ng] = k;
            cur_hi = hi[i];
        } else {
            long long h = hi[i];
            if (h > cur_hi) cur_hi = h;
        }
    }
    starts[++ng] = n;
    return ng;
}

static void emit(Ctx *c, int idx, long long x0) {
    c->out_idx[c->out_n] = idx;
    c->out_x0[c->out_n] = x0;
    c->out_n++;
}

/* leaf: sort by composite (y1*KY + x1*KX + i) and emit */
#define KI (1LL << 24)
#define KX KI
#define KY (KI * 10000LL)

static void leaf(Ctx *c, int *idxs, int n, long long x0) {
    for (int k = 0; k < n; k++) {
        int i = idxs[k];
        c->keybuf[i] = c->y1[i] * KY + c->x1[i] * KX + i;
    }
    msort(idxs, c->scratch, 0, n, c->keybuf);
    for (int k = 0; k < n; k++) emit(c, idxs[k], x0);
}

static long long min_x1(Ctx *c, const int *idxs, int n) {
    long long m = c->x1[idxs[0]];
    for (int k = 1; k < n; k++)
        if (c->x1[idxs[k]] < m) m = c->x1[idxs[k]];
    return m;
}

static void recurse(Ctx *c, int *idxs, int n, long long region_x0);

/* xgroups: sorted-by-x copy + gap grouping; returns n_groups (sorted copy
   and starts written into caller-provided buffers) */
static int xgroups(Ctx *c, const int *idxs, int n, int *xo, int *starts) {
    memcpy(xo, idxs, (size_t)n * sizeof(int));
    sort_by(c, xo, n, c->x1);
    return groups_1d(xo, n, c->x1, c->x2, c->gx, starts);
}

static void band_standalone(Ctx *c, int *band, int n, long long x0) {
    if (n == 1) { emit(c, band[0], x0); return; }
    int *xo = malloc((size_t)n * sizeof(int));
    int *starts = malloc((size_t)(n + 1) * sizeof(int));
    int ng = xgroups(c, band, n, xo, starts);
    if (ng > 1) {
        for (int g = 0; g < ng; g++) {
            int gn = starts[g + 1] - starts[g];
            recurse(c, xo + starts[g], gn,
                    min_x1(c, xo + starts[g], gn));
        }
    } else {
        leaf(c, band, n, x0);
    }
    free(xo); free(starts);
}

static void recurse(Ctx *c, int *idxs, int n, long long region_x0) {
    if (n == 1) { emit(c, idxs[0], region_x0); return; }
    int *xo = malloc((size_t)n * sizeof(int));
    int *starts = malloc((size_t)(n + 1) * sizeof(int));
    int ng = xgroups(c, idxs, n, xo, starts);
    if (ng > 1) {
        for (int g = 0; g < ng; g++) {
            int gn = starts[g + 1] - starts[g];
            recurse(c, xo + starts[g], gn,
                    min_x1(c, xo + starts[g], gn));
        }
        free(xo); free(starts);
        return;
    }
    /* y bands over y-sorted order */
    int *yo = malloc((size_t)n * sizeof(int));
    int *bstarts = malloc((size_t)(n + 1) * sizeof(int));
    memcpy(yo, idxs, (size_t)n * sizeof(int));
    sort_by(c, yo, n, c->y1);
    int nb = groups_1d(yo, n, c->y1, c->y2, c->gy, bstarts);
    if (nb == 1) {
        leaf(c, idxs, n, region_x0);
        free(xo); free(starts); free(yo); free(bstarts);
        return;
    }
    /* xo currently holds the x-sorted order (from xgroups above) */
    for (int b = 0; b < nb; b++)
        for (int k = bstarts[b]; k < bstarts[b + 1]; k++)
            c->band_of[yo[k]] = b;
    /* decide split point BEFORE nested recursion (kernel comment applies:
       band_standalone recursion reassigns band_of) */
    int n_standalone = nb;
    int *split_rest = NULL;
    int split_n = 0;
    for (int b = 0; b < nb - 1; b++) {
        int lo = b + 1;
        long long cur_hi = 0;
        int have = 0, has_gap = 0;
        for (int k = 0; k < n; k++) {
            int i = xo[k];
            if (c->band_of[i] < lo) continue;
            if (have && c->x1[i] - cur_hi >= c->gx) { has_gap = 1; break; }
            long long v = c->x2[i];
            if (!have || v > cur_hi) { cur_hi = v; have = 1; }
        }
        if (has_gap) {
            split_rest = malloc((size_t)n * sizeof(int));
            for (int k = 0; k < n; k++)
                if (c->band_of[xo[k]] >= lo)
                    split_rest[split_n++] = xo[k];
            n_standalone = lo;
            break;
        }
    }
    for (int b = 0; b < n_standalone; b++)
        band_standalone(c, yo + bstarts[b], bstarts[b + 1] - bstarts[b],
                        region_x0);
    if (split_rest) {
        recurse(c, split_rest, split_n, region_x0);
        free(split_rest);
    }
    free(xo); free(starts); free(yo); free(bstarts);
}

/* in: one C-contiguous (4, n) int64 buffer — rows x1, y1, x2, y2;
   out: one (2, n) int64 buffer — row 0 emitted idx, row 1 region_x0
   (single-buffer marshaling keeps the ctypes call overhead at one
   pointer cast per side instead of six) */
int xy_cut(const long long *in4, int n, long long gx, long long gy,
           long long *out2) {
    if (n <= 0) return 0;
    const long long *x1 = in4, *y1 = in4 + n, *x2 = in4 + 2 * n,
                    *y2 = in4 + 3 * n;
    long long *out_iidx = out2, *out_xx0 = out2 + n;
    /* keep the narrow int emit buffer internal */
    int *out_idx = malloc((size_t)n * sizeof(int));
    long long *out_x0 = out_xx0;
    if (!out_idx) return -1;
    Ctx c;
    c.x1 = x1; c.y1 = y1; c.x2 = x2; c.y2 = y2;
    c.gx = gx; c.gy = gy;
    c.out_idx = out_idx; c.out_x0 = out_x0; c.out_n = 0;
    c.n = n;
    c.band_of = calloc((size_t)n, sizeof(int));
    c.scratch = malloc((size_t)n * sizeof(int));
    c.keybuf = malloc((size_t)n * sizeof(long long));
    int *root = malloc((size_t)n * sizeof(int));
    if (!c.band_of || !c.scratch || !c.keybuf || !root) {
        free(c.band_of); free(c.scratch); free(c.keybuf); free(root);
        free(out_idx);
        return -1;
    }
    for (int i = 0; i < n; i++) root[i] = i;
    recurse(&c, root, n, min_x1(&c, root, n));
    for (int k = 0; k < c.out_n; k++) out_iidx[k] = out_idx[k];
    free(c.band_of); free(c.scratch); free(c.keybuf); free(root);
    free(out_idx);
    return c.out_n;
}

/* ------------------------------------------------------------------ */
/* Wire-format shard parser — C twin of                               */
/* sources.wireformat._parse_shard_columnar (same framing, CRC,       */
/* structure, strict-UTF-8 and resync semantics; differential-fuzzed  */
/* in tests/test_wire_native.py).                                     */

#include <stdint.h>

static uint32_t crc_tab[8][256];
static int crc_init_done = 0;

static void crc_init(void) {
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc_tab[0][i] = c;
    }
    for (uint32_t i = 0; i < 256; i++)
        for (int t = 1; t < 8; t++)
            crc_tab[t][i] = crc_tab[0][crc_tab[t - 1][i] & 0xFF]
                            ^ (crc_tab[t - 1][i] >> 8);
    crc_init_done = 1;
}

static uint32_t crc32_z(const unsigned char *p, long long n) {
    uint32_t c = 0xFFFFFFFFu;
    while (n >= 8) {
        uint32_t lo, hi;
        memcpy(&lo, p, 4); memcpy(&hi, p + 4, 4);
        lo ^= c;
        c = crc_tab[7][lo & 0xFF] ^ crc_tab[6][(lo >> 8) & 0xFF]
          ^ crc_tab[5][(lo >> 16) & 0xFF] ^ crc_tab[4][lo >> 24]
          ^ crc_tab[3][hi & 0xFF] ^ crc_tab[2][(hi >> 8) & 0xFF]
          ^ crc_tab[1][(hi >> 16) & 0xFF] ^ crc_tab[0][hi >> 24];
        p += 8; n -= 8;
    }
    while (n-- > 0)
        c = crc_tab[0][(c ^ *p++) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

/* strict UTF-8 (CPython semantics: overlongs, surrogates, >U+10FFFF all
   invalid) */
static int valid_utf8(const unsigned char *s, long long n) {
    long long i = 0;
    while (i < n) {
        unsigned char c = s[i];
        if (c < 0x80) { i++; continue; }
        if (c < 0xC2) return 0;
        if (c < 0xE0) {
            if (i + 2 > n || (s[i+1] & 0xC0) != 0x80) return 0;
            i += 2; continue;
        }
        if (c < 0xF0) {
            if (i + 3 > n) return 0;
            unsigned char c1 = s[i+1], c2 = s[i+2];
            if ((c1 & 0xC0) != 0x80 || (c2 & 0xC0) != 0x80) return 0;
            if (c == 0xE0 && c1 < 0xA0) return 0;
            if (c == 0xED && c1 >= 0xA0) return 0;
            i += 3; continue;
        }
        if (c < 0xF5) {
            if (i + 4 > n) return 0;
            unsigned char c1 = s[i+1], c2 = s[i+2], c3 = s[i+3];
            if ((c1 & 0xC0) != 0x80 || (c2 & 0xC0) != 0x80
                || (c3 & 0xC0) != 0x80) return 0;
            if (c == 0xF0 && c1 < 0x90) return 0;
            if (c == 0xF4 && c1 >= 0x90) return 0;
            i += 4; continue;
        }
        return 0;
    }
    return 1;
}

typedef struct {
    unsigned char *vals; long long vlen, vcap;
    int *offs;           /* count+1 entries once finalized */
    unsigned char *valid;
    long long count, cap;
} StrCol;

static int col_reserve(StrCol *c, long long add_rows, long long add_bytes) {
    if (c->count + add_rows + 1 > c->cap) {
        long long nc = c->cap ? c->cap * 2 : 1024;
        while (nc < c->count + add_rows + 1) nc *= 2;
        int *no = realloc(c->offs, (size_t)(nc + 1) * sizeof(int));
        unsigned char *nv = realloc(c->valid, (size_t)nc);
        if (!no || !nv) { free(no ? no : c->offs); c->offs = no ? no : NULL;
                          if (nv) c->valid = nv; return 0; }
        c->offs = no; c->valid = nv; c->cap = nc;
    }
    if (c->vlen + add_bytes > c->vcap) {
        long long nc = c->vcap ? c->vcap * 2 : 4096;
        while (nc < c->vlen + add_bytes) nc *= 2;
        unsigned char *nv = realloc(c->vals, (size_t)nc);
        if (!nv) return 0;
        c->vals = nv; c->vcap = nc;
    }
    return 1;
}

static int col_push(StrCol *c, const unsigned char *s, long long n,
                    int is_null) {
    if (!col_reserve(c, 1, is_null ? 0 : n)) return 0;
    if (c->count == 0) c->offs[0] = 0;
    if (is_null) {
        c->offs[c->count + 1] = (int)c->vlen;
        c->valid[c->count] = 0;
    } else {
        memcpy(c->vals + c->vlen, s, (size_t)n);
        c->vlen += n;
        c->offs[c->count + 1] = (int)c->vlen;
        c->valid[c->count] = 1;
    }
    c->count++;
    return 1;
}

typedef struct {
    StrCol docid;
    int *counts; long long counts_cap;       /* -1 == NULL spans */
    StrCol kind, text, media;
    int *offv; unsigned char *offvalid; long long off_cap;
    long long n_spans;
    int corrupt;
    int oom;
} Parse;

static int push_offset(Parse *p, int v, int is_null) {
    if (p->n_spans + 1 > p->off_cap) {
        long long nc = p->off_cap ? p->off_cap * 2 : 1024;
        int *nv = realloc(p->offv, (size_t)nc * sizeof(int));
        unsigned char *nb = realloc(p->offvalid, (size_t)nc);
        if (!nv || !nb) { if (nv) p->offv = nv; if (nb) p->offvalid = nb;
                          return 0; }
        p->offv = nv; p->offvalid = nb; p->off_cap = nc;
    }
    p->offv[p->n_spans] = v;
    p->offvalid[p->n_spans] = is_null ? 0 : 1;
    p->n_spans++;
    return 1;
}

static int push_count(Parse *p, int v) {
    if (p->docid.count + 1 > p->counts_cap) {   /* counts parallel docid */
        long long nc = p->counts_cap ? p->counts_cap * 2 : 1024;
        int *nv = realloc(p->counts, (size_t)nc * sizeof(int));
        if (!nv) return 0;
        p->counts = nv; p->counts_cap = nc;
    }
    p->counts[p->docid.count] = v;
    return 1;
}

static uint32_t rd_u32(const unsigned char *d) {
    uint32_t v; memcpy(&v, d, 4); return v;   /* x86: little-endian */
}

#define NULL32 0xFFFFFFFFu

void free_parse(Parse *p) {
    if (!p) return;
    free(p->docid.vals); free(p->docid.offs); free(p->docid.valid);
    free(p->kind.vals); free(p->kind.offs); free(p->kind.valid);
    free(p->text.vals); free(p->text.offs); free(p->text.valid);
    free(p->media.vals); free(p->media.offs); free(p->media.valid);
    free(p->counts); free(p->offv); free(p->offvalid);
    free(p);
}

Parse *parse_shard_c(const unsigned char *data, long long end) {
    if (!crc_init_done) crc_init();
    Parse *p = calloc(1, sizeof(Parse));
    if (!p) return NULL;
    static const unsigned char MAGIC[4] = {'C', 'P', 'W', '1'};
    static const unsigned char FOOT[4] = {'C', 'P', 'W', 'E'};
    static const unsigned char SYNC[4] = {0xc5, 0xd2, 0x0c, 0x77};
    if (end < 4 || memcmp(data, MAGIC, 4) != 0) {
        p->corrupt = 1;
        return p;
    }
    long long i = 4;
    while (i < end) {
        int head_full = (i + 4 <= end);
        if (head_full && memcmp(data + i, FOOT, 4) == 0) {
            if (p->corrupt == 0 && (end - i < 8
                    || rd_u32(data + i + 4) != (uint32_t)p->docid.count))
                p->corrupt += 1;
            return p;
        }
        long long mark_spans = p->n_spans;
        long long mk = p->kind.count, mkv = p->kind.vlen;
        long long mt = p->text.count, mtv = p->text.vlen;
        long long mm = p->media.count, mmv = p->media.vlen;
        int head_sync = head_full && memcmp(data + i, SYNC, 4) == 0;
        if (head_sync && end - i >= 8) {
            uint32_t plen = rd_u32(data + i + 4);
            long long p0 = i + 8;
            long long pend = p0 + (long long)plen;
            long long pos = p0;
            uint32_t n;
            int fail = 0;
            const unsigned char *ds;
            if (pend + 4 > end) { fail = 1; goto decide; }
            if (rd_u32(data + pend) != crc32_z(data + p0, pend - p0)) {
                fail = 1; goto decide;
            }
            /* doc_id */
            if (pos + 4 > pend) { fail = 1; goto decide; }
            n = rd_u32(data + pos); pos += 4;
            {
                long long did_start = -1, did_len = 0;
                int did_null = (n == NULL32);
                if (!did_null) {
                    if (pos + (long long)n > pend) { fail = 1; goto decide; }
                    if (!valid_utf8(data + pos, n)) { fail = 1; goto decide; }
                    did_start = pos; did_len = n; pos += n;
                }
                /* spans */
                if (pos + 4 > pend) { fail = 1; goto decide; }
                uint32_t n_spans = rd_u32(data + pos); pos += 4;
                int cnt;
                if (n_spans == NULL32) {
                    cnt = -1;
                } else {
                    if (n_spans > plen) { fail = 1; goto decide; }
                    for (uint32_t s = 0; s < n_spans; s++) {
                        /* kind, text, media_ref */
                        StrCol *cols[3] = {&p->kind, &p->text, &p->media};
                        for (int f = 0; f < 3; f++) {
                            if (pos + 4 > pend) { fail = 1; goto decide; }
                            n = rd_u32(data + pos); pos += 4;
                            if (n == NULL32) {
                                if (!col_push(cols[f], NULL, 0, 1)) {
                                    p->oom = 1; return p;
                                }
                            } else {
                                if (pos + (long long)n > pend) {
                                    fail = 1; goto decide;
                                }
                                ds = data + pos;
                                if (!valid_utf8(ds, n)) {
                                    fail = 1; goto decide;
                                }
                                if (!col_push(cols[f], ds, n, 0)) {
                                    p->oom = 1; return p;
                                }
                                pos += n;
                            }
                        }
                        /* offset: presence byte + i32 */
                        if (pos + 5 > pend) { fail = 1; goto decide; }
                        {
                            int32_t ov; memcpy(&ov, data + pos + 1, 4);
                            if (!push_offset(p, data[pos] ? ov : 0,
                                             data[pos] ? 0 : 1)) {
                                p->oom = 1; return p;
                            }
                        }
                        pos += 5;
                    }
                    cnt = (int)n_spans;
                }
                if (pos != pend) { fail = 1; goto decide; }
                /* accept */
                if (!push_count(p, cnt)
                    || !col_push(&p->docid,
                                 did_null ? NULL : data + did_start,
                                 did_len, did_null)) {
                    p->oom = 1; return p;
                }
                i = pend + 4;
                continue;
            }
decide:
            if (fail) {
                p->kind.count = mk; p->kind.vlen = mkv;
                p->text.count = mt; p->text.vlen = mtv;
                p->media.count = mm; p->media.vlen = mmv;
                p->n_spans = mark_spans;
            }
        }
        /* bad sync / corrupt record: count once, resync forward */
        p->corrupt += 1;
        {
            long long from = i + (head_sync ? 4 : 1);
            const unsigned char *hit = NULL;
            if (from < end)
                hit = memmem(data + from, (size_t)(end - from), SYNC, 4);
            if (!hit) return p;
            i = hit - data;
        }
    }
    p->corrupt += 1;   /* ran off the end without a footer */
    return p;
}

"""

_LIB = None
_TRIED = False


def _build_lib():
    """Compile (or reuse the cached) shared object; return a ctypes lib or
    None. Never raises."""
    try:
        if os.environ.get("CHPDF_NATIVE", "1") == "0":
            return None
        tag = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
        cache_dir = os.path.join(tempfile.gettempdir(),
                                 f"chpdf_native_{tag}")
        so_path = os.path.join(cache_dir, "xycut.so")
        if not os.path.exists(so_path):
            os.makedirs(cache_dir, exist_ok=True)
            src = os.path.join(cache_dir, "xycut.c")
            tmp_so = os.path.join(
                cache_dir, f"xycut.{os.getpid()}.tmp.so")
            with open(src, "w") as f:
                f.write(_C_SOURCE)
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp_so, so_path)  # atomic; concurrent racers agree
        lib = ctypes.CDLL(so_path)
        LL = ctypes.POINTER(ctypes.c_longlong)
        lib.xy_cut.argtypes = [LL, ctypes.c_int, ctypes.c_longlong,
                               ctypes.c_longlong, LL]
        lib.xy_cut.restype = ctypes.c_int
        _wire_protos(lib)
        return lib
    except Exception:  # noqa: BLE001 — any failure means "use Python"
        return None


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _build_lib()
        _TRIED = True
    return _LIB


def available() -> bool:
    return _lib() is not None


def xy_cut(x1s: list, y1s: list, x2s: list, y2s: list,
           gap_x: int, gap_y: int):
    """C twin of kernel._xy_cut: [(local_idx, region_x0), ...] or None when
    the native library is unavailable (caller falls back to Python)."""
    lib = _lib()
    if lib is None:
        return None
    n = len(x1s)
    if n == 0:
        return []
    import numpy as np

    LL = ctypes.POINTER(ctypes.c_longlong)
    buf = np.array([x1s, y1s, x2s, y2s], dtype=np.int64)  # (4, n) C-order
    out = np.empty((2, n), dtype=np.int64)
    got = lib.xy_cut(buf.ctypes.data_as(LL), n, gap_x, gap_y,
                     out.ctypes.data_as(LL))
    if got != n:  # allocation failure inside C — degrade to Python
        return None
    o = out.tolist()
    return list(zip(o[0], o[1]))


class _StrCol(ctypes.Structure):
    _fields_ = [("vals", ctypes.POINTER(ctypes.c_ubyte)),
                ("vlen", ctypes.c_longlong), ("vcap", ctypes.c_longlong),
                ("offs", ctypes.POINTER(ctypes.c_int)),
                ("valid", ctypes.POINTER(ctypes.c_ubyte)),
                ("count", ctypes.c_longlong), ("cap", ctypes.c_longlong)]


class _Parse(ctypes.Structure):
    _fields_ = [("docid", _StrCol),
                ("counts", ctypes.POINTER(ctypes.c_int)),
                ("counts_cap", ctypes.c_longlong),
                ("kind", _StrCol), ("text", _StrCol), ("media", _StrCol),
                ("offv", ctypes.POINTER(ctypes.c_int)),
                ("offvalid", ctypes.POINTER(ctypes.c_ubyte)),
                ("off_cap", ctypes.c_longlong),
                ("n_spans", ctypes.c_longlong),
                ("corrupt", ctypes.c_int), ("oom", ctypes.c_int)]


def _wire_protos(lib) -> None:
    lib.parse_shard_c.argtypes = [ctypes.c_char_p, ctypes.c_longlong]
    lib.parse_shard_c.restype = ctypes.POINTER(_Parse)
    lib.free_parse.argtypes = [ctypes.POINTER(_Parse)]
    lib.free_parse.restype = None


def _str_array(col, pa, np):
    cnt = int(col.count)
    if cnt == 0:
        return pa.array([], pa.string())
    offs = np.ctypeslib.as_array(col.offs, shape=(cnt + 1,)).copy()
    vlen = int(offs[-1])
    vals = (np.ctypeslib.as_array(col.vals, shape=(vlen,)).copy()
            if vlen else np.empty(0, np.uint8))
    valid = np.ctypeslib.as_array(col.valid, shape=(cnt,)).copy()
    nulls = int(cnt - valid.sum())
    mask = (pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
            if nulls else None)
    return pa.Array.from_buffers(
        pa.utf8(), cnt, [mask, pa.py_buffer(offs), pa.py_buffer(vals)],
        null_count=nulls)


def parse_shard_batch(data: bytes):
    """(RecordBatch in the documents schema, n_corrupt) via the C parser,
    or None when the native library is unavailable / out of memory —
    callers fall back to the Python parser. Semantics are the C twin of
    ``wireformat._parse_shard_columnar`` + ``_doc_batch`` (differential-
    fuzzed in tests/test_wire_native.py)."""
    lib = _lib()
    if lib is None:
        return None
    import numpy as np
    import pyarrow as pa

    pp = lib.parse_shard_c(data, len(data))
    if not pp:
        return None
    try:
        P = pp.contents
        if P.oom:
            return None
        n_docs = int(P.docid.count)
        corrupt = int(P.corrupt)
        doc_ids = _str_array(P.docid, pa, np)
        counts = (np.ctypeslib.as_array(P.counts, shape=(n_docs,)).copy()
                  if n_docs else np.empty(0, np.int32))
        ns = int(P.n_spans)
        kinds = _str_array(P.kind, pa, np)
        texts = _str_array(P.text, pa, np)
        medias = _str_array(P.media, pa, np)
        if ns:
            offv = np.ctypeslib.as_array(P.offv, shape=(ns,)).copy()
            offvalid = np.ctypeslib.as_array(
                P.offvalid, shape=(ns,)).copy()
        else:
            offv = np.empty(0, np.int32)
            offvalid = np.empty(0, np.uint8)
    finally:
        lib.free_parse(pp)

    off_nulls = int(ns - offvalid.sum()) if ns else 0
    off_mask = (pa.py_buffer(np.packbits(offvalid, bitorder="little")
                             .tobytes()) if off_nulls else None)
    off_arr = pa.Array.from_buffers(
        pa.int32(), ns, [off_mask, pa.py_buffer(offv)],
        null_count=off_nulls)
    span_struct = pa.struct([("kind", pa.string()), ("text", pa.string()),
                             ("media_ref", pa.string()),
                             ("offset", pa.int32())])
    values = pa.StructArray.from_arrays(
        [kinds, texts, medias, off_arr], fields=list(span_struct))
    null_counts = counts < 0
    list_offs = np.zeros(n_docs + 1, dtype=np.int32)
    if n_docs:
        list_offs[1:] = (np.where(null_counts, 0, counts)
                         .cumsum().astype(np.int32))
    spans = pa.ListArray.from_arrays(
        pa.array(list_offs, pa.int32()), values,
        mask=pa.array(null_counts, pa.bool_()))
    counts_mask = (pa.py_buffer(np.packbits(~null_counts,
                                            bitorder="little").tobytes())
                   if null_counts.any() else None)
    counts_arr = pa.Array.from_buffers(
        pa.int32(), n_docs, [counts_mask, pa.py_buffer(counts)],
        null_count=int(null_counts.sum()))
    batch = pa.RecordBatch.from_arrays(
        [doc_ids, spans, counts_arr], ["doc_id", "spans", "n_spans"])
    return batch, corrupt
