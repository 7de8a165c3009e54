"""BPE tokenizer training + application (`ops/bpe.py`): word-frequency
DuckDB oracle, merge-loop parity against a naive from-scratch reference,
segmentation properties, and end-to-end determinism across partitioning.

The word-frequency oracle lives here (not in the driver's queries())
because the correctness report caps at 50 rows — same convention as the
scrub/decontam/chunking oracles.
"""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _naive_train(word_freqs: list[tuple[str, int]], n_merges: int,
                 min_freq: int = 2) -> list[tuple[str, str]]:
    """From-scratch reference: recount EVERY pair each round (no
    incremental index), same tie rule (max count, then lexicographically
    smallest pair)."""
    words = {i: (list(w), f) for i, (w, f) in enumerate(word_freqs)}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words.values():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best_n = max(counts.values())
        if best_n < min_freq:
            break
        best = min(p for p, n in counts.items() if n == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        for i, (syms, f) in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, f)
    return merges


def test_train_bpe_matches_naive_classic():
    """The Sennrich toy corpus and a seeded random corpus both train to
    the exact merge sequence the from-scratch reference produces."""
    from nem_mms_ray.ops.bpe import train_bpe

    toy = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    got = train_bpe(pd.DataFrame(toy, columns=["word", "n"]), n_merges=10)
    assert got == _naive_train(toy, 10)
    assert got[0] == ("e", "s")  # es appears 9x — the classic first merge

    rng = np.random.default_rng(7)
    alphabet = list("abcdef")
    corpus = [("".join(rng.choice(alphabet, rng.integers(1, 9))),
               int(rng.integers(1, 40))) for _ in range(120)]
    for n_merges in (1, 7, 25, 60):
        got = train_bpe(pd.DataFrame(corpus, columns=["word", "n"]),
                        n_merges=n_merges)
        assert got == _naive_train(corpus, n_merges), n_merges


def test_train_bpe_min_freq_and_input_forms():
    """min_freq stops the loop early; Dataset/Table/iterable inputs all
    train identically."""
    from nem_mms_ray.ops.bpe import train_bpe

    toy = [("ab", 3), ("cd", 1)]
    assert train_bpe(pd.DataFrame(toy, columns=["word", "n"]),
                     n_merges=5, min_freq=2) == [("a", "b")]
    assert train_bpe(pd.DataFrame(toy, columns=["word", "n"]),
                     n_merges=5, min_freq=1) == [("a", "b"), ("c", "d")]
    tbl = pa.table({"word": ["ab", "cd"], "n": [3, 1]})
    assert train_bpe(tbl, n_merges=5) == [("a", "b")]
    assert train_bpe(iter(toy), n_merges=5) == [("a", "b")]


def test_encode_word_properties():
    """Segmentation is lossless (concat == word), bounded (1..len(word)
    tokens), and respects merge rank order (lowest rank merges first)."""
    from nem_mms_ray.ops.bpe import _encode_word, train_bpe

    corpus = [("banana", 10), ("bandana", 5), ("ananas", 3)]
    merges = train_bpe(pd.DataFrame(corpus, columns=["word", "n"]),
                       n_merges=8, min_freq=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("banana", "bandana", "ananas", "ban", "xyz", "a", ""):
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w
        if w:
            assert 1 <= len(toks) <= len(w)
    # rank order: the first learned merge applies before later ones —
    # ("a","n") trains first here, so "an" must appear as a unit
    assert merges[0] == ("a", "n")
    assert "an" in {t for t in _encode_word("an", ranks)}


def test_word_frequencies_matches_duckdb(ray_session):
    """word_frequencies over sf0.001 documents equals the DuckDB
    lower+split+count mirror frame-for-frame; the max_words cap equals
    the SQL's ORDER BY n DESC, word LIMIT."""
    import ray.data as rd

    from nem_mms_ray.ops.bpe import word_frequencies

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    got = (word_frequencies(ds).to_pandas()
           .sort_values("word").reset_index(drop=True))
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT w AS word, count(*)::BIGINT AS n FROM (
            SELECT unnest(list_filter(
                regexp_split_to_array(lower(coalesce(text, '')), '\\s+'),
                x -> x <> '')) AS w
            FROM read_parquet('{SF_DIR}/documents.parquet'))
        GROUP BY 1 ORDER BY 1
    """).df()
    assert got["word"].tolist() == want["word"].tolist()
    assert got["n"].tolist() == want["n"].astype(int).tolist()

    top = word_frequencies(ds, max_words=50).to_pandas()
    want_top = want.sort_values(["n", "word"],
                                ascending=[False, True]).head(50)
    assert top["word"].tolist() == want_top["word"].tolist()
    assert top["n"].tolist() == want_top["n"].astype(int).tolist()


def test_apply_bpe_end_to_end(ray_session):
    """Train on the corpus's own top words, apply, and check per-doc
    invariants plus exact equality with a per-doc scalar mirror and
    partition invariance."""
    import ray.data as rd

    from nem_mms_ray.ops.bpe import (_encode_word, apply_bpe, train_bpe,
                                     word_frequencies)
    from nem_mms_ray.ops.textkernels import tokenize_column

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    merges = train_bpe(word_frequencies(ds, max_words=500), n_merges=200)
    # min_freq=2 dries the pair pool before 200 on this 500-word table —
    # the early-stop contract; what matters is a usable vocabulary
    assert 50 <= len(merges) <= 200

    got = (apply_bpe(ds, merges, concurrency=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    ranks = {p: i for i, p in enumerate(merges)}
    flat, doc_idx = tokenize_column(docs.column("text"))
    words = flat.to_pylist()
    n_tok = np.zeros(docs.num_rows, np.int64)
    n_words = np.zeros(docs.num_rows, np.int64)
    for w, d in zip(words, doc_idx):
        n_tok[d] += len(_encode_word(w, ranks))
        n_words[d] += 1
    want = pd.DataFrame({
        "doc_id": docs.column("doc_id").to_numpy(),
        "n": n_tok}).sort_values("doc_id").reset_index(drop=True)
    assert got["n_bpe_tokens"].tolist() == want["n"].tolist()
    # merges compress: fewer subwords than characters, at least one per word
    assert (got["n_bpe_tokens"].to_numpy() >= np.sort(n_words)[0]).all()

    again = (apply_bpe(ds.repartition(7), merges, concurrency=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert again["n_bpe_tokens"].tolist() == got["n_bpe_tokens"].tolist()


def test_apply_bpe_emit_tokens_roundtrip(ray_session):
    """emit_tokens=True: per-doc subword lists concatenate back to the
    doc's lowercased whitespace words, in order."""
    import ray.data as rd

    from nem_mms_ray.ops.bpe import apply_bpe, train_bpe

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["Hello hello world", "abab abab baba",
                          None, ""], pa.string()),
    })
    merges = train_bpe(pd.DataFrame(
        [("hello", 4), ("abab", 4), ("baba", 2), ("world", 1)],
        columns=["word", "n"]), n_merges=6, min_freq=1)
    got = (apply_bpe(rd.from_arrow(tbl), merges, emit_tokens=True,
                     concurrency=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    joined = ["".join(t) for t in got["bpe_tokens"]]
    assert joined == ["hellohelloworld", "ababababbaba", "", ""]
    assert got["n_bpe_tokens"].tolist() == [
        len(t) for t in got["bpe_tokens"]]
    assert got["n_bpe_tokens"][2] == 0 and got["n_bpe_tokens"][3] == 0


def test_more_merges_never_increase_tokens(ray_session):
    """Monotonicity: training with more merges never increases the corpus
    total token count (each extra merge can only join subwords)."""
    import ray.data as rd

    from nem_mms_ray.ops.bpe import apply_bpe, train_bpe, word_frequencies

    ds = rd.read_parquet(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])
    wf = word_frequencies(ds, max_words=300).to_pandas()
    totals = []
    for n_merges in (0, 50, 300):
        merges = train_bpe(wf, n_merges=n_merges)
        tot = int(apply_bpe(ds, merges, concurrency=2)
                  .to_pandas()["n_bpe_tokens"].sum())
        totals.append(tot)
    assert totals[0] >= totals[1] >= totals[2]
    assert totals[2] < totals[0]  # 300 merges really compress
