/* Single-pass WET-style HTML -> text extraction hot loop.
 *
 * Byte-for-byte equivalent to the module's regex spec (see webextract.py:
 * ONE leftmost-first structural alternation <script-block>|<style-block>|
 * <!--comment-->|<tag> replaced by a space, then six sequential literal
 * entity passes with &amp; last, then ASCII-whitespace collapse + trim),
 * but fused into one left-to-right scan per row:
 *
 * - structural: at '<' try, in alternation order, script block / style
 *   block / comment / bare tag; a matched region becomes whitespace.  A
 *   block whose opener matches but whose closer is missing falls through
 *   to the bare-tag rule at the same position — exactly the regex's
 *   alternative-failure behavior; a '<' with no '>' anywhere ahead is
 *   literal text (the whole alternation fails).
 * - entities: at '&' at most ONE of the six literals can match (their
 *   second bytes are pairwise distinct: n l g q # a), so first-match here
 *   equals the sequential passes; decoded output is never rescanned,
 *   which is precisely the documented &amp;-last guarantee.
 * - whitespace: the six ASCII ws bytes (0x09-0x0D, 0x20) and every
 *   structural replacement and &nbsp; set a pending-space flag that emits
 *   a single ' ' before the next non-ws byte; leading/trailing runs thus
 *   vanish — identical to b" ".join(b.split()).
 *
 * The equivalence is pinned by tests/test_webextract.py against the
 * independent Python `re` reference on edge cases, webtable tag soup
 * (including sliced/unbalanced tags and invalid UTF-8) and fuzzed input.
 */
#include <stdint.h>
#include <string.h>

static inline int ci_eq(uint8_t a, uint8_t p) {
    /* fold ONLY when the pattern byte is a letter: a blanket |0x20 would
     * alias control bytes onto punctuation (0x0D onto '-', 0x1C onto '<') */
    if (p >= 'a' && p <= 'z') return (a | 0x20) == p;
    return a == p;
}

static inline int is_ws(uint8_t c) {
    return c == ' ' || (c >= 0x09 && c <= 0x0D);
}

/* does in[i..] start with the lowercase literal pat (case-insensitive)? */
static inline int ci_starts(const uint8_t *in, long i, long n,
                            const char *pat, int len) {
    if (i + len > n) return 0;
    for (int k = 0; k < len; k++)
        if (!ci_eq(in[i + k], (uint8_t)pat[k])) return 0;
    return 1;
}

/* first case-insensitive occurrence of pat at or after i; -1 if none */
static inline long ci_find(const uint8_t *in, long i, long n,
                           const char *pat, int len) {
    uint8_t c0 = (uint8_t)pat[0];
    for (; i + len <= n; i++)
        if (ci_eq(in[i], c0) && ci_starts(in, i, n, pat, len)) return i;
    return -1;
}

/* first '>' at or after i; -1 if none (the bare-tag <[^>]*> scan) */
static inline long find_gt(const uint8_t *in, long i, long n) {
    const uint8_t *p = memchr(in + i, '>', (size_t)(n - i));
    return p ? (long)(p - in) : -1;
}

/* Extract one row of html bytes into out; returns bytes written.
 * out needs capacity >= n (every rule shrinks or keeps length). */
static long extract_row(const uint8_t *in, long n, uint8_t *out) {
    long i = 0, o = 0;
    int pending = 0;            /* a ws run awaits its single ' ' */
#define EMIT(ch) do { if (pending) { out[o++] = ' '; pending = 0; } \
                      out[o++] = (uint8_t)(ch); } while (0)
#define EMIT_WS() do { if (o > 0) pending = 1; } while (0)
    while (i < n) {
        uint8_t c = in[i];
        if (c == '<') {
            long close = -1;
            if (ci_starts(in, i, n, "<script", 7)) {
                long gt = find_gt(in, i + 7, n);
                if (gt >= 0) {
                    long end = ci_find(in, gt + 1, n, "</script>", 9);
                    if (end >= 0) close = end + 9;
                }
            } else if (ci_starts(in, i, n, "<style", 6)) {
                long gt = find_gt(in, i + 6, n);
                if (gt >= 0) {
                    long end = ci_find(in, gt + 1, n, "</style>", 8);
                    if (end >= 0) close = end + 8;
                }
            } else if (i + 4 <= n && in[i+1] == '!' && in[i+2] == '-' &&
                       in[i+3] == '-') {
                long end = ci_find(in, i + 4, n, "-->", 3);
                if (end >= 0) close = end + 3;
            }
            if (close < 0) {
                long gt = find_gt(in, i + 1, n);   /* bare-tag fallback */
                if (gt >= 0) close = gt + 1;
            }
            if (close >= 0) { EMIT_WS(); i = close; }
            else { EMIT('<'); i++; }               /* no '>' ahead: literal */
        } else if (c == '&') {
            /* six case-SENSITIVE literals; second byte discriminates, so
             * first-match == the sequential passes */
            if (i + 6 <= n && memcmp(in + i, "&nbsp;", 6) == 0) {
                EMIT_WS(); i += 6;
            } else if (i + 4 <= n && memcmp(in + i, "&lt;", 4) == 0) {
                EMIT('<'); i += 4;
            } else if (i + 4 <= n && memcmp(in + i, "&gt;", 4) == 0) {
                EMIT('>'); i += 4;
            } else if (i + 6 <= n && memcmp(in + i, "&quot;", 6) == 0) {
                EMIT('"'); i += 6;
            } else if (i + 5 <= n && memcmp(in + i, "&#39;", 5) == 0) {
                EMIT('\''); i += 5;
            } else if (i + 5 <= n && memcmp(in + i, "&amp;", 5) == 0) {
                EMIT('&'); i += 5;
            } else {
                EMIT('&'); i++;
            }
        } else if (is_ws(c)) {
            EMIT_WS(); i++;
        } else {
            EMIT(c); i++;
        }
    }
#undef EMIT
#undef EMIT_WS
    return o;
}

/* Batch entry: rows are data[off[r] .. off[r+1]) (Arrow large_binary
 * layout).  Outputs are written consecutively separated by one 0x00 byte
 * (the caller's join sentinel); out_off[r] = start of row r's output,
 * out_off[nrows] = total INCLUDING separators.  out needs capacity
 * off[nrows] - off[0] + nrows. */
long wet_extract_batch(const uint8_t *data, const int64_t *off, long nrows,
                       uint8_t *out, int64_t *out_off) {
    long o = 0;
    for (long r = 0; r < nrows; r++) {
        if (r > 0) out[o++] = 0;
        out_off[r] = o;
        o += extract_row(data + off[r], off[r + 1] - off[r], out + o);
    }
    out_off[nrows] = o;
    return o;
}
