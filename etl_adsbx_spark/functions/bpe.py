"""[EXT] Distributed BPE tokenizer fitting + Arrow encode kernel.

Fitting a subword tokenizer on the corpus is a standard stage of
training-data prep (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"; the reference pipeline's text surface
stops at the BPE-ish regex proxy in functions/text.py — this is the real
thing). The scale decomposition is the whole point:

- **corpus-sized work = ONE shuffle.** BPE statistics depend only on the
  word-frequency table: ``explode(tokens) → groupBy(word).count()``. At
  100 TB that is a single hash-agg with map-side partials on a short
  string key; nothing downstream ever touches the corpus again.
- **merge loop = vocab-sized work.** Distinct words are bounded (~10^7
  even for web-scale English, Zipf curbs growth), so the iterative
  pair-count → argmax → merge loop runs over a table millions of rows
  small, not billions. Two execution modes, identical results
  (pinned by tests/test_bpe.py):

  - ``driver_fit=True`` (default): collect the word-freq table and run
    the merge loop in-process — exactly what subword-nmt and HF
    tokenizers do, because num_merges (~32k) driver-coordinated Spark
    rounds over a small table is all fixed overhead. The collect is the
    documented bound: ~10^7 (word, freq) rows ≈ a few hundred MB.
  - ``driver_fit=False``: the same loop as Spark jobs — one tiny
    pair-count argmax action per round over the persisted symbol table,
    CC-style persist/unpersist/truncate hygiene — for the regime where
    the vocabulary itself cannot be collected (byte-level vocabs over
    non-segmented scripts, or a driver too small for its corpus).

- **encode = Arrow kernel, map-side.** Applying 32k ranked merges is a
  per-word loop no fixed-depth Catalyst expression can express
  (an expression tree one fold per merge deep is not a plan), so
  encoding uses ``mapInPandas`` with the ranks dict shipped once per
  task — the same boundary rule as operators/multimodal.py: Python only
  through Arrow, only where built-ins genuinely cannot. A per-batch
  word→tokens memo exploits Zipf (most tokens are repeats).

Merge semantics (the contract, replicated by the pure-Python reference
in tests/test_bpe.py): words are whitespace tokens of lowercased text;
initial symbols are the word's characters plus a terminal ``</w>``
marker; each round merges the adjacent pair with the highest summed word
frequency (ties: lexicographically smallest (a, b)), rewriting every
word greedily left-to-right non-overlapping; rounds stop at
``num_merges`` or when the best pair's frequency drops below
``min_freq``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .text import tokens

#: End-of-word marker appended to every word's symbol sequence. Makes
#: word boundaries reconstructible from the token stream (decode =
#: concat + replace marker with space) and keeps "er" as a suffix
#: distinct from "er" mid-word — the classic Sennrich formulation.
EOW = "</w>"

MERGES_SCHEMA = StructType(
    [
        StructField("rank", IntegerType(), False),
        StructField("a", StringType(), False),
        StructField("b", StringType(), False),
        StructField("freq", LongType(), False),
    ]
)


def word_freq(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized stage: (word, freq) over whitespace tokens of
    lowercased text. Map-side partial agg; every later BPE stage is
    vocab-sized. Empty tokens (blank docs) are dropped."""
    w = F.explode(tokens(text_col)).alias("word")
    return (
        corpus.select(w)
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """Characters of the word plus the terminal EOW marker. ``split``
    on the empty pattern keeps a trailing "" under Spark's limit=-1
    semantics — filter it."""
    chars = F.filter(F.split(word, ""), lambda s: s != "")
    return F.concat(chars, F.array(F.lit(EOW)))


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of adjacent
    (a, b) with a||b, as a single ``F.aggregate`` fold: append each
    symbol unless the accumulator's last element is ``a`` and the symbol
    is ``b``, in which case rewrite the last element to the merged
    symbol. Non-overlap falls out naturally — a merged tail no longer
    equals ``a`` (BPE symbols never collide with their own
    concatenations because every round's pair is distinct)."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, n) summed word-frequency of every adjacent symbol pair."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("a"),
            F.element_at(F.col("syms"), i + 1).alias("b"),
        ),
    )
    return (
        vocab.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
    )


def _fit_merges_local(
    wf: list[tuple[str, int]], num_merges: int, min_freq: int
) -> list[tuple[int, str, str, int]]:
    """The reference merge loop over an in-memory word-frequency list —
    identical semantics to the distributed rounds (tests pin equality).
    Maintains pair counts incrementally (only words containing the
    merged pair are rewritten), so fitting 32k merges over a 10^7-word
    vocab is minutes, not hours."""
    from collections import Counter, defaultdict

    symlists: list[list[str]] = [list(w) + [EOW] for w, _ in wf]
    freqs = [n for _, n in wf]
    counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (syms, n) in enumerate(zip(symlists, freqs)):
        for p in zip(syms, syms[1:]):
            counts[p] += n
            where[p].add(idx)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        if not counts:
            break
        # max by (count, then lexicographically smallest pair)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_freq:
            break
        merges.append((rank, a, b, int(n)))
        for idx in list(where[(a, b)]):
            syms, wn = symlists[idx], freqs[idx]
            for p in zip(syms, syms[1:]):
                counts[p] -= wn
                if counts[p] <= 0:
                    del counts[p]
                where[p].discard(idx)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symlists[idx] = out
            for p in zip(out, out[1:]):
                counts[p] += wn
                where[p].add(idx)
    return merges


def fit_bpe(
    corpus: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    min_freq: int = 2,
    driver_fit: bool = True,
) -> DataFrame:
    """Fit BPE merges on a corpus; returns the merge table
    (rank, a, b, freq) ordered by rank — the persistable tokenizer
    artifact ``bpe_encode`` consumes. See the module docstring for the
    two execution modes; results are identical."""
    wf = word_freq(corpus, text_col)
    spark = corpus.sparkSession
    if driver_fit:
        rows = [(r["word"], r["freq"]) for r in wf.collect()]
        rows.sort()  # deterministic iteration order for the local loop
        merges = _fit_merges_local(rows, num_merges, min_freq)
        return spark.createDataFrame(merges, MERGES_SCHEMA)

    vocab = wf.select(
        _initial_symbols(F.col("word")).alias("syms"), "freq"
    ).persist()
    prev: DataFrame | None = vocab
    merges = []
    for rank in range(num_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), "a", "b")
            .first()
        )  # the round's one action: tiny input, 1-row out — and it
        # MATERIALIZES the current vocab's persist, so only now is the
        # previous round's frame safe to free (unpersisting before the
        # successor materializes would cascade recomputes of every fold
        # back to round 0 — O(rounds²) work)
        if prev is not None and prev is not vocab:
            prev.unpersist()
        prev = vocab
        if best is None or best["n"] < min_freq:
            break
        a, b = best["a"], best["b"]
        merges.append((rank, a, b, int(best["n"])))
        vocab = vocab.select(
            _merge_fold(F.col("syms"), a, b).alias("syms"), "freq"
        ).persist()
        # each round folds over the prior round's plan once — linear
        # lineage growth, truncated periodically like connected_components
        # (the eager checkpoint materializes the fold, so the lazy
        # persisted frame that fed it can be freed immediately)
        if (rank + 1) % 8 == 0:
            chk = vocab.localCheckpoint(eager=True)
            vocab.unpersist()
            vocab = chk
    if prev is not None:
        prev.unpersist()
    if vocab is not prev:
        vocab.unpersist()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: repeatedly merge the lowest-rank adjacent pair —
    the standard BPE inference rule (merge order = training order)."""
    syms = list(word) + [EOW]
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # rewrite ALL occurrences of the chosen pair, left to right —
        # matches how training's merge round rewrites the word
        a, b = syms[best_i], syms[best_i + 1]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a fitted merge table: returns
    (id_col, bpe_tokens array<string>, n_bpe_tokens). Arrow
    ``mapInPandas`` kernel — the ranks dict (k/v strings, ~1 MB at 32k
    merges) ships to each task via closure broadcast; scoring is pure
    map-side, no shuffle. A per-batch word→tokens memo makes the cost
    per *distinct* word per batch (Zipf: most of the stream is the same
    few thousand words)."""
    ranks = {
        (r["a"], r["b"]): r["rank"]
        for r in merges.select("rank", "a", "b").collect()
    }
    out_schema = StructType(
        [
            StructField("_id", LongType()),
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe_tokens", IntegerType()),
        ]
    )

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in it:
            toks_out, counts = [], []
            for text in pdf["_text"]:
                doc_toks: list[str] = []
                for w in (text or "").lower().split():
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    doc_toks.extend(enc)
                toks_out.append(doc_toks)
                counts.append(len(doc_toks))
            yield pd.DataFrame(
                {"_id": pdf["_id"], "bpe_tokens": toks_out, "n_bpe_tokens": counts}
            )

    src = docs.select(
        F.col(id_col).cast("bigint").alias("_id"), F.col(text_col).alias("_text")
    )
    return (
        src.mapInPandas(encode_batches, out_schema)
        .withColumnRenamed("_id", id_col)
    )


# =========================================================================
# Pretrained GPT-2-format BPE (public merges.txt / vocab.json)
# =========================================================================
#
# The fitted tokenizer above uses the Sennrich EOW formulation; real
# corpora are usually budgeted against a PUBLISHED tokenizer. This loads
# the public GPT-2 byte-level BPE artifact format (merges.txt: one
# "a b" pair per line in merge order after an optional "#version" header;
# vocab.json: token -> id), so packing/budget ops can count real tokens.
# All semantics below are the published algorithm (Radford et al. 2019
# encoder: byte-to-unicode table, ordered-alternation pretokenizer,
# min-rank pair merging, case-preserved) — no external tokenizer library
# needed; the standard regex is re-expressed as a hand-rolled scanner
# because \p{L}/\p{N} classes need only unicodedata categories.


def gpt2_bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte->unicode printable mapping: printable latin
    bytes map to themselves, the rest to U+0100.. in order, so every byte
    string becomes a lossless printable string."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_GPT2_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def gpt2_pretokenize(text: str) -> list[str]:
    """The GPT-2 pretokenizer — the published ordered-alternation pattern
    ``'s|'t|'re|'ve|'m|'ll|'d| ?L+| ?N+| ?[^\\sLN]+|\\s+(?!\\S)|\\s+``
    as a scanner (L/N = unicode letter/number categories). Whitespace
    backtracking leaves exactly one space to prefix the next word, which
    is how GPT-2 encodes word boundaries (the Ġ convention after byte
    mapping)."""
    import unicodedata

    def is_l(ch: str) -> bool:
        return unicodedata.category(ch).startswith("L")

    def is_n(ch: str) -> bool:
        return unicodedata.category(ch).startswith("N")

    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        hit = next(
            (c for c in _GPT2_CONTRACTIONS if text.startswith(c, i)), None
        )
        if hit is not None:
            out.append(hit)
            i += len(hit)
            continue
        start = i
        j = i
        if text[j] == " " and j + 1 < n and not text[j + 1].isspace():
            j += 1  # the optional single-space lead of the word alternatives
        ch = text[j]
        if not ch.isspace():
            if is_l(ch):
                k = j
                while k < n and is_l(text[k]):
                    k += 1
            elif is_n(ch):
                k = j
                while k < n and is_n(text[k]):
                    k += 1
            else:
                k = j
                while (
                    k < n
                    and not text[k].isspace()
                    and not is_l(text[k])
                    and not is_n(text[k])
                ):
                    k += 1
            out.append(text[start:k])
            i = k
        else:
            k = j
            while k < n and text[k].isspace():
                k += 1
            if k < n and k - start > 1:
                # \s+(?!\S): backtrack to leave one char for the next token
                out.append(text[start : k - 1])
                i = k - 1
            else:
                out.append(text[start:k])
                i = k
    return out


def load_gpt2_merges(path: str) -> dict[tuple[str, str], int]:
    """Parse a public-format merges.txt into the rank dict: one "a b"
    line per merge, rank = position. Only a leading "#version..." header
    line and blanks are skipped — the real GPT-2 merges.txt contains
    legitimate merge lines that START with '#' ("# #", "## #", ... build
    the '##'/'###' vocab tokens), so a blanket '#' comment rule would
    silently mis-tokenize any text with '#' runs (markdown headings,
    hashtags, C preprocessor)."""
    ranks: dict[tuple[str, str], int] = {}
    with open(path, encoding="utf-8") as f:
        for lineno, line in enumerate(f):
            line = line.rstrip("\n")
            if not line or (lineno == 0 and line.startswith("#version")):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(f"malformed merges line: {line!r}")
            ranks[(parts[0], parts[1])] = len(ranks)
    if not ranks:
        raise ValueError(f"no merges found in {path}")
    return ranks


def load_gpt2_vocab(path: str) -> dict[str, int]:
    """Parse a public-format vocab.json (token -> id)."""
    import json

    with open(path, encoding="utf-8") as f:
        vocab = json.load(f)
    if not isinstance(vocab, dict) or not vocab:
        raise ValueError(f"vocab.json must be a non-empty object: {path}")
    return {str(k): int(v) for k, v in vocab.items()}


def _gpt2_encode_pretoken(
    tok: str, ranks: dict[tuple[str, str], int], byte_enc: dict[int, str]
) -> list[str]:
    """Byte-map one pretoken and apply the published merge rule: merge
    ALL occurrences of the lowest-rank adjacent pair, repeat until no
    ranked pair remains (``_encode_word``'s loop, minus the EOW
    marker)."""
    syms = [byte_enc[b] for b in tok.encode("utf-8")]
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        a, b = syms[best_i], syms[best_i + 1]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_pretrained(
    docs: DataFrame,
    merges_path: str,
    vocab_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a PRETRAINED public-format BPE artifact:
    returns (id_col, bpe_tokens array<string>, n_bpe_tokens int[,
    token_ids array<bigint> when ``vocab_path`` is given]). Token counts
    then feed the packing/budget ops directly (``n_bpe_tokens`` is the
    same column contract as the fitted encoder's).

    Same execution shape as ``bpe_encode``: the rank dict (~50k pairs,
    a few MB) ships once per task via closure broadcast and the kernel
    is a map-side Arrow ``mapInPandas`` with a per-batch pretoken memo —
    no shuffle, corpus-linear. Unlike the fitted encoder this is
    CASE-PRESERVING and byte-level (lossless on any input), per the
    published algorithm. Unknown-token ids are -1 (a vocab/merges
    mismatch is surfaced, not dropped)."""
    ranks = load_gpt2_merges(merges_path)
    vocab = load_gpt2_vocab(vocab_path) if vocab_path is not None else None
    byte_enc = gpt2_bytes_to_unicode()
    fields = [
        StructField("_id", LongType()),
        StructField("bpe_tokens", ArrayType(StringType())),
        StructField("n_bpe_tokens", IntegerType()),
    ]
    if vocab is not None:
        fields.append(StructField("token_ids", ArrayType(LongType())))
    out_schema = StructType(fields)

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in it:
            toks_out, counts, ids_out = [], [], []
            for text in pdf["_text"]:
                doc_toks: list[str] = []
                for w in gpt2_pretokenize(text or ""):
                    enc = memo.get(w)
                    if enc is None:
                        enc = _gpt2_encode_pretoken(w, ranks, byte_enc)
                        memo[w] = enc
                    doc_toks.extend(enc)
                toks_out.append(doc_toks)
                counts.append(len(doc_toks))
                if vocab is not None:
                    ids_out.append([vocab.get(t, -1) for t in doc_toks])
            cols = {"_id": pdf["_id"], "bpe_tokens": toks_out, "n_bpe_tokens": counts}
            if vocab is not None:
                cols["token_ids"] = ids_out
            yield pd.DataFrame(cols)

    src = docs.select(
        F.col(id_col).cast("bigint").alias("_id"), F.col(text_col).alias("_text")
    )
    return src.mapInPandas(encode_batches, out_schema).withColumnRenamed(
        "_id", id_col
    )


def bpe_decode_tokens(tokens_col: Column | str = "bpe_tokens") -> Column:
    """Inverse of encode, as a pure expression: concatenate tokens and
    turn each EOW marker back into a space — reconstructs the lowercased
    whitespace-normalized text (the roundtrip tests pin this)."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.trim(F.replace(F.concat_ws("", c), F.lit(EOW), F.lit(" ")))
