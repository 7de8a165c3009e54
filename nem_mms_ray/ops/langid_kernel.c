/* Fused language-ID scan: utf8 decode + \w-token runs + stopword-key
 * pack + lookup + per-language hit counts, one pass per doc.
 *
 * Mirrors the numpy fast path of ops/curate.LangId.__call__ exactly
 * (test_langid_native_parity): classification tables are PASSED IN from
 * Python (`ops/textstats._bmp_tables` — built from Python's own regex
 * engine and str.lower, so semantics stay Python's by construction);
 * this file only fuses the passes.  Per doc over its utf8 byte range:
 *
 *   cp      = utf8 decode (input is an Arrow utf8 buffer: valid by
 *             construction)
 *   word    = word_tbl[min(cp, 0xFFFF)] and cp <= 0xFFFF
 *   token   = maximal runs of (word | cp == 0x27)        ["\w'"]
 *   key     = for runs of length <= max_word_len: little-endian pack of
 *             min(lower_tbl[cp], 0xFF) per codepoint
 *   hits    = binary-search key in the sorted distinct stopword-key
 *             table; on hit, add that key's language BITMASK
 *   unsafe  = any astral cp, or any word cp with !safe_tbl[cp]
 *             (expanding lowercase) -> the doc re-runs through the
 *             Python scalar formula, as in the numpy path
 *
 * Outputs: n_tokens[d], hits[d*n_langs + l], unsafe[d].  The caller
 * keeps argmax / tie-break / score rounding in Python (identical code
 * path for both backends).
 *
 * Textbook algorithms (UTF-8 decode, binary search); original code.
 */

#include <stdint.h>

static long lower_bound_u64(const uint64_t *a, long n, uint64_t x) {
    long lo = 0, hi = n;
    while (lo < hi) {
        long mid = lo + ((hi - lo) >> 1);
        if (a[mid] < x) lo = mid + 1; else hi = mid;
    }
    return lo;
}

void langid_batch(const uint8_t *flat, const int64_t *starts,
                  const int64_t *ends, long n_docs,
                  const uint8_t *word_tbl,     /* [65536] bool */
                  const uint8_t *safe_tbl,     /* [65536] bool */
                  const uint32_t *lower_tbl,   /* [65536] */
                  const uint64_t *keys, long n_keys,  /* sorted distinct */
                  const uint64_t *lang_mask,   /* [n_keys] bitmask */
                  long max_word_len, long n_langs,
                  int64_t *n_tokens,           /* [n_docs] out */
                  int64_t *hits,               /* [n_docs*n_langs] out */
                  uint8_t *unsafe) {           /* [n_docs] out */
    for (long d = 0; d < n_docs; d++) {
        const uint8_t *p = flat + starts[d];
        const uint8_t *end = flat + ends[d];
        long ntok = 0;
        int bad = 0;
        int in_tok = 0;
        long tok_len = 0;
        uint64_t key = 0;
        int overlong = 0;
        int64_t *h = hits + d * n_langs;
        for (long l = 0; l < n_langs; l++) h[l] = 0;
        while (p < end) {
            uint32_t cp;
            uint8_t b0 = *p;
            if (b0 < 0x80) { cp = b0; p += 1; }
            else if (b0 < 0xE0) {
                cp = ((uint32_t)(b0 & 0x1F) << 6) | (p[1] & 0x3F);
                p += 2;
            } else if (b0 < 0xF0) {
                cp = ((uint32_t)(b0 & 0x0F) << 12)
                     | ((uint32_t)(p[1] & 0x3F) << 6) | (p[2] & 0x3F);
                p += 3;
            } else {
                cp = ((uint32_t)(b0 & 0x07) << 18)
                     | ((uint32_t)(p[1] & 0x3F) << 12)
                     | ((uint32_t)(p[2] & 0x3F) << 6) | (p[3] & 0x3F);
                p += 4;
            }
            uint32_t cp_c = cp > 0xFFFF ? 0xFFFF : cp;
            int astral = cp > 0xFFFF;
            int is_word = word_tbl[cp_c] && !astral;
            if (astral || (is_word && !safe_tbl[cp_c])) bad = 1;
            if (is_word || cp == 0x27) {
                if (!in_tok) { in_tok = 1; tok_len = 0; key = 0; overlong = 0; }
                if (tok_len < max_word_len) {
                    uint32_t lc = lower_tbl[cp_c];
                    if (lc > 0xFF) lc = 0xFF;
                    key |= (uint64_t)lc << (8 * tok_len);
                } else {
                    overlong = 1;
                }
                tok_len++;
            } else if (in_tok) {
                in_tok = 0;
                ntok++;
                if (!overlong) {
                    long j = lower_bound_u64(keys, n_keys, key);
                    if (j < n_keys && keys[j] == key) {
                        uint64_t m = lang_mask[j];
                        for (long l = 0; l < n_langs; l++)
                            h[l] += (int64_t)((m >> l) & 1u);
                    }
                }
            }
        }
        if (in_tok) {
            ntok++;
            if (!overlong) {
                long j = lower_bound_u64(keys, n_keys, key);
                if (j < n_keys && keys[j] == key) {
                    uint64_t m = lang_mask[j];
                    for (long l = 0; l < n_langs; l++)
                        h[l] += (int64_t)((m >> l) & 1u);
                }
            }
        }
        n_tokens[d] = ntok;
        unsafe[d] = (uint8_t)bad;
    }
}

/* Fused token-stats scan (ops/textstats.token_stats_batch fast path):
 * one utf8 decode pass per doc computing
 *   n_tokens = non-empty pieces split on ASCII-whitespace runs (the
 *              byte rule: multibyte codepoints are never split points)
 *   n_chars  = codepoint count
 *   n_punct  = count of . , ! ? ; : codepoints
 *   mb_ws    = doc contains a multibyte \s codepoint (the exact
 *              divergence set — Python recomputes those docs through
 *              the scalar formulas, as the numpy path does)
 * ws_ascii: uint8[128] table of the ASCII \s set; mb_ws_cps: sorted
 * uint32 codepoints of every multibyte \s char. */
void token_stats_batch_scan(const uint8_t *flat, const int64_t *starts,
                            const int64_t *ends, long n_docs,
                            const uint8_t *ws_ascii,
                            const uint32_t *mb_ws_cps, long n_mb_ws,
                            int64_t *n_tokens, int64_t *n_chars,
                            int64_t *n_punct, uint8_t *mb_ws) {
    for (long d = 0; d < n_docs; d++) {
        const uint8_t *p = flat + starts[d];
        const uint8_t *end = flat + ends[d];
        long ntok = 0, nch = 0, npc = 0;
        int in_tok = 0, has_mb = 0;
        while (p < end) {
            uint32_t cp;
            uint8_t b0 = *p;
            if (b0 < 0x80) { cp = b0; p += 1; }
            else if (b0 < 0xE0) {
                cp = ((uint32_t)(b0 & 0x1F) << 6) | (p[1] & 0x3F);
                p += 2;
            } else if (b0 < 0xF0) {
                cp = ((uint32_t)(b0 & 0x0F) << 12)
                     | ((uint32_t)(p[1] & 0x3F) << 6) | (p[2] & 0x3F);
                p += 3;
            } else {
                cp = ((uint32_t)(b0 & 0x07) << 18)
                     | ((uint32_t)(p[1] & 0x3F) << 12)
                     | ((uint32_t)(p[2] & 0x3F) << 6) | (p[3] & 0x3F);
                p += 4;
            }
            nch++;
            int is_ws = (cp < 128) && ws_ascii[cp];
            if (is_ws) {
                in_tok = 0;
            } else {
                if (!in_tok) { in_tok = 1; ntok++; }
                if (cp == '.' || cp == ',' || cp == '!' || cp == '?'
                    || cp == ';' || cp == ':') npc++;
                if (cp >= 0x80 && !has_mb) {
                    long lo = 0, hi = n_mb_ws;
                    while (lo < hi) {
                        long mid = lo + ((hi - lo) >> 1);
                        if (mb_ws_cps[mid] < cp) lo = mid + 1; else hi = mid;
                    }
                    if (lo < n_mb_ws && mb_ws_cps[lo] == cp) has_mb = 1;
                }
            }
        }
        n_tokens[d] = ntok;
        n_chars[d] = nch;
        n_punct[d] = npc;
        mb_ws[d] = (uint8_t)has_mb;
    }
}
