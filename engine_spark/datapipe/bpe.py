"""Distributed BPE (byte-pair encoding) vocabulary training + tokenization.

The canonical training-data-pipeline op the corpus tables feed: learn a
subword vocabulary over the corpus, then tokenize every document with it
(token ids / counts drive packing, mixing, and budget accounting).

Spark-first decomposition (Sennrich et al. 2016's algorithm, re-split into
what must be distributed and what must not):

1. **Word-frequency aggregation — distributed, the only corpus-sized
   stage.** One scan: regex pre-tokenize (the GPT-2-style split of words /
   numbers / punctuation runs) → explode → groupBy(word).count(). The
   result is vocabulary-sized, not corpus-sized, and is further capped to
   the top ``max_words`` by (count, word) so the driver collect is bounded
   no matter how degenerate the corpus (URLs, hashes) is. Everything BPE
   needs from the corpus is in this table — classic trainers (subword-nmt,
   HuggingFace tokenizers) train from exactly this word-count dict.
2. **Merge learning — driver-side over the bounded dict.** The greedy
   pair-merge loop is inherently sequential (merge i+1 depends on the
   counts AFTER merge i), so it cannot be data-parallel; running it over
   the capped word dict (not the corpus) makes it O(vocab) per round.
3. **Tokenization — distributed, map-only.** The learned merge ranks
   broadcast to executors; an Arrow-batched pandas kernel applies them
   per word with an LRU word cache (real corpora repeat words heavily, so
   amortized cost per token is near O(1)). No shuffle; output is ids or
   counts alongside doc_id.

Reference parity: eventflux-io/engine has no tokenizer; this extends the
LLM-data-pipeline axis (token counting in text_analysis is the regex
half; this is the learned-subword half).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: GPT-2-style pre-tokenizer (simplified, stdlib ``re``): leading-space
#: words, numbers, punctuation runs, whitespace runs. Applied identically
#: in the Spark word-count scan and the Python tokenize kernel — the two
#: MUST agree or trained merges would never match at apply time.
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

_WORD_END = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> DataFrame:
    """One corpus scan → (word, n) capped at the ``max_words`` most
    frequent words (ties broken by word for determinism). The cap is what
    bounds the driver collect in ``bpe_train`` at 100 TB: a web corpus
    has unbounded distinct "words" (urls, hex ids), but rank-``max_words``
    frequency is where BPE signal lives — subword-nmt's own practice.

    The regex runs JVM-side (``regexp_extract_all``): the corpus-sized
    stage stays codegen'd; only the vocabulary-sized result ever meets
    Python."""
    # function-API pattern (F.lit), NOT an F.expr SQL literal: Spark SQL
    # single-quoted strings process backslash escapes, which would silently
    # turn the \s in PRETOKEN_RE into a plain 's' and diverge from the
    # Python `re` used at tokenize time
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), F.lit(0))
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    # top-N by (n desc, word asc): deterministic, and orderBy+limit is a
    # TakeOrdered — per-partition top-N then one merge, never a full sort
    return counts.orderBy(F.col("n").desc(), F.col("word")).limit(max_words)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 1000,
    max_words: int = 100_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns them in
    rank order (the whole model — tokenization is deterministic given the
    list). Driver memory is bounded by ``max_words`` regardless of corpus
    size; the corpus is scanned exactly once."""
    freq_rows = word_frequencies(
        df.select(F.lower(F.col(text_col)).alias(text_col)) if lowercase else df,
        text_col,
        max_words,
    ).collect()
    # symbol-tuple representation with an explicit end-of-word marker so
    # merges distinguish "est" mid-word from "est</w>" at word end
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (_WORD_END,): int(r["n"]) for r in freq_rows
    }
    merges: list[tuple[str, str]] = []
    # pair counts maintained incrementally: only words CONTAINING the
    # merged pair change between rounds (classic trainer optimization —
    # full recount per round would be O(num_merges * vocab))
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[tuple[str, ...]]] = {}

    def _index(word: tuple[str, ...], n: int, sign: int) -> None:
        for i in range(len(word) - 1):
            p = (word[i], word[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + sign * n
            if sign > 0:
                pair_words.setdefault(p, set()).add(word)
            # stale entries in pair_words are filtered at use time

    for w, n in vocab.items():
        _index(w, n, +1)

    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or (c, (p[0], p[1])) > (best[1], best[0]):
                best = (p, c)
        if best is None or best[1] < 2:
            break  # nothing left worth merging
        pair = best[0]
        merges.append(pair)
        joined = pair[0] + pair[1]
        for w in [x for x in pair_words.get(pair, ()) if x in vocab]:
            n = vocab.pop(w)
            _index(w, n, -1)
            out = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == pair[0] and w[i + 1] == pair[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            vocab[nw] = vocab.get(nw, 0) + n
            _index(nw, n, +1)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def _apply_merges(
    word: str, ranks: dict[tuple[str, str], int], cache: dict[str, tuple[str, ...]]
) -> tuple[str, ...]:
    """Tokenize one pre-token with the learned ranks (lowest rank merges
    first — the BPE apply rule). LRU-ish cache: real corpora repeat words
    heavily, so the amortized cost is one dict hit per occurrence."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    sym = list(word) + [_WORD_END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    out = tuple(sym)
    if len(cache) > 50_000:
        cache.clear()  # bound executor memory; repeats refill fast
    cache[word] = out
    return out


BPE_SCHEMA = "doc_id long, n_pretokens long, n_tokens long, tokens array<string>"


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    lowercase: bool = True,
    keep_tokens: bool = False,
) -> DataFrame:
    """Tokenize every document with a trained merge list: (doc_id,
    n_pretokens, n_tokens[, tokens]) via Arrow-batched mapInPandas.
    Map-only — the merge ranks ride the closure (broadcast by Spark's task
    serialization; the model is num_merges tuples, kilobytes), text never
    shuffles, and per-word results are cached per executor."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    pat = re.compile(PRETOKEN_RE)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, tuple[str, ...]] = {}
        for pdf in batches:
            rows = []
            for did, txt in zip(pdf["doc_id"], pdf[text_col]):
                t = "" if txt is None else str(txt)
                if lowercase:
                    t = t.lower()
                pres = pat.findall(t)
                n_tok = 0
                toks: list[str] = []
                for wrd in pres:
                    pieces = _apply_merges(wrd, ranks, cache)
                    n_tok += len(pieces)
                    if keep_tokens:
                        toks.extend(pieces)
                rows.append(
                    (
                        int(did),
                        len(pres),
                        n_tok,
                        toks if keep_tokens else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_pretokens", "n_tokens", "tokens"],
            )

    return df.mapInPandas(run, schema=BPE_SCHEMA)
