/* FSST-style symbol-table compression kernels (encode/decode hot loops).
 *
 * Implemented from the published FSST design (Boncz, Neumann, Leis:
 * "FSST: Fast Random Access String Compression", VLDB 2020): a table of at
 * most 255 symbols of 1..8 bytes; output bytes are either a symbol code or
 * the escape byte 255 followed by a literal. Greedy longest-match encoding.
 *
 * Table construction/training happens in Python (numpy); these kernels only
 * run the per-byte loops that Python cannot do fast.
 */
#include <stdint.h>
#include <string.h>

#define ESCAPE 255
#define HCAP 1024
#define HMASK (HCAP - 1)

typedef struct {
    uint16_t byte_code[256];
    /* len-2 symbols: direct-mapped on the two bytes (no hashing) */
    uint16_t two_code[65536];
    uint64_t keys[7][HCAP];
    uint16_t codes[7][HCAP];
    uint8_t used[7][HCAP];
    uint8_t has_len;
    /* bit (len-2) set iff some symbol of that len starts with this byte:
     * prunes the per-position probe loop to lengths that can match at all */
    uint8_t first_len_mask[256];
    int max_len;
} SymTable;

static inline uint64_t load_prefix(const uint8_t *p, int len) {
    uint64_t v = 0;
    for (int i = 0; i < len; i++) v = (v << 8) | p[i];
    return v;
}

static inline uint32_t hash64(uint64_t x) {
    x *= 0x9E3779B97F4A7C15ULL;
    return (uint32_t)(x >> 54) & HMASK;
}

static void build_table(SymTable *t, const uint8_t *sym_bytes,
                        const uint8_t *sym_lens, int n_sym) {
    memset(t, 0, sizeof(*t));
    for (int i = 0; i < 256; i++) t->byte_code[i] = 0xFFFF;
    memset(t->two_code, 0xFF, sizeof(t->two_code));
    t->max_len = 1;
    for (int s = 0; s < n_sym; s++) {
        int len = sym_lens[s];
        const uint8_t *p = sym_bytes + s * 8;
        if (len == 1) { t->byte_code[p[0]] = (uint16_t)s; continue; }
        if (len == 2) {
            t->two_code[((uint32_t)p[0] << 8) | p[1]] = (uint16_t)s;
            t->first_len_mask[p[0]] |= 1;
            if (len > t->max_len) t->max_len = len;
            continue;
        }
        int li = len - 2;
        uint64_t key = load_prefix(p, len);
        uint32_t h = hash64(key ^ ((uint64_t)len << 56));
        while (t->used[li][h]) h = (h + 1) & HMASK;
        t->used[li][h] = 1;
        t->keys[li][h] = key;
        t->codes[li][h] = (uint16_t)s;
        t->has_len |= (uint8_t)(1 << li);
        t->first_len_mask[p[0]] |= (uint8_t)(1 << li);
        if (len > t->max_len) t->max_len = len;
    }
}

static inline int lookup(const SymTable *t, int len, uint64_t key) {
    int li = len - 2;
    if (!(t->has_len & (1 << li))) return -1;
    uint32_t h = hash64(key ^ ((uint64_t)len << 56));
    while (t->used[li][h]) {
        if (t->keys[li][h] == key) return t->codes[li][h];
        h = (h + 1) & HMASK;
    }
    return -1;
}

/* out must have capacity >= 2*n. Returns bytes written. */
long fsst_encode(const uint8_t *sym_bytes, const uint8_t *sym_lens, int n_sym,
                 const uint8_t *in, long n, uint8_t *out) {
    SymTable t;
    build_table(&t, sym_bytes, sym_lens, n_sym);
    long o = 0, i = 0;
    while (i < n) {
        long rem = n - i;
        int maxl = t.max_len < rem ? t.max_len : (int)rem;
        int code = -1, mlen = 1;
        const uint8_t *p = in + i;
        /* candidate lengths = lengths of symbols starting with p[0], capped
         * by rem; typically 0-2 bits set, so most positions hash 0-2 times */
        uint8_t m = (maxl >= 2)
            ? (uint8_t)(t.first_len_mask[p[0]] & ((1u << (maxl - 1)) - 1u))
            : 0;
        if (m) {
            int toplen = 31 - __builtin_clz(m) + 2;
            uint64_t key = ((uint64_t)p[0] << 8) | p[1];
            uint64_t pv[9];
            pv[2] = key;
            for (int len = 3; len <= toplen; len++) {
                key = (key << 8) | p[len - 1];
                pv[len] = key;
            }
            for (int len = toplen; len >= 3; len--) {
                if (!(m & (1u << (len - 2)))) continue;
                int c = lookup(&t, len, pv[len]);
                if (c >= 0) { code = c; mlen = len; break; }
            }
            if (code < 0 && (m & 1)) {  /* len-2: direct-mapped, no hash */
                uint16_t c2 = t.two_code[(uint32_t)pv[2]];
                if (c2 != 0xFFFF) { code = c2; mlen = 2; }
            }
        }
        if (code < 0) {
            uint16_t c1 = t.byte_code[p[0]];
            if (c1 != 0xFFFF) out[o++] = (uint8_t)c1;
            else { out[o++] = ESCAPE; out[o++] = p[0]; }
        } else {
            out[o++] = (uint8_t)code;
        }
        i += mlen;
    }
    return o;
}

/* out must have capacity >= 8*n + 8 (symbols copied 8-wide). */
long fsst_decode(const uint8_t *sym_bytes, const uint8_t *sym_lens, int n_sym,
                 const uint8_t *in, long n, uint8_t *out) {
    long o = 0;
    for (long i = 0; i < n; i++) {
        uint8_t c = in[i];
        if (c == ESCAPE) {
            out[o++] = in[++i];
        } else {
            memcpy(out + o, sym_bytes + (long)c * 8, 8);
            o += sym_lens[c];
        }
    }
    return o;
}
