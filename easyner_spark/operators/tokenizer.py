"""Distributed BPE tokenizer training (fixed merge rounds).

Tokenizer training is the one corpus-scale job every pretraining
pipeline runs before the model ever sees a byte: byte-pair encoding
(Sennrich et al. 2016) greedily merges the most frequent adjacent
symbol pair, k times. At 10^12 documents the naive formulation (hold
every document's symbol sequence, rescan per merge) is impossible —
the classic scale trick, used here, is that BPE only ever needs the
WORD-FREQUENCY table: one corpus scan collapses 10^12 docs to a
bounded (word, freq) vocabulary, and every merge round then operates
on that small table (pair counting weighted by freq, argmax, merge
rewrite). Each round is one bounded aggregate plus a broadcast 1-row
join — no corpus rescan, no driver-side loop over data (the argmax
row never leaves the plan).

Cross-engine representation: a word's symbol sequence is the string
"{s1}{s2}…{sk}" — each symbol brace-wrapped. Merging pair (a, b) is
then the plain string rewrite replace(repr, "{a}{b}", "{ab}"), whose
standard non-overlapping left-to-right scan IS greedy BPE merge
order (consecutive matches share no characters, so "{a}{a}{a}" with
merge (a,a) gives "{aa}{a}" exactly like the canonical fold), and
DuckDB's replace() agrees byte for byte — which is what makes a full
value oracle possible for a data-dependent iterative algorithm.
Words are restricted to lowercase printable-ASCII ([!-z], which
excludes the brace delimiters and multi-code-unit characters that
Java regex and RE2 would split differently); out-of-range words are
dropped identically on both engines.

No reference analog (callebalik/EasyNER tokenizes with pretrained HF
vocabularies, scripts/ner_inference.py); this is part of the
beyond-reference training-data battery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = "^[!-z]+$"  # lowercase printable ASCII, no braces/|/~


def bpe_word_freqs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, freq) — lowercased whitespace-token frequencies over the
    corpus, restricted to the cross-engine-safe alphabet (WORD_RE).
    The ONE corpus-sized pass of BPE training; everything after runs
    on this bounded vocabulary."""
    w = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
    return (
        docs.select(w)
        .where(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _syms(repr_col: str = "repr") -> Column:
    """Split "{a}{b}{c}" back into [a, b, c]."""
    r = F.col(repr_col)
    return F.split(F.expr(f"substring({repr_col}, 2, length({repr_col}) - 2)"), r"\}\{")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(l, r, cnt) — adjacent-pair frequencies, weighted by word freq.
    transform's second lambda arg is the 0-based index (engine
    contract); slice element i pairs with element_at(syms, i + 2)."""
    pairs = F.expr(
        "transform(slice(syms, 1, size(syms) - 1),"
        " (s, i) -> struct(s AS l, element_at(syms, i + 2) AS r))"
    )
    return (
        vocab.select(_syms().alias("syms"), "freq")
        .where(F.size("syms") > 1)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _argmax_pair(pair_counts: DataFrame) -> DataFrame:
    """The winning merge: highest count, ties to the lexicographically
    smallest (l, r) — a total order, so re-runs and other engines pick
    the identical pair. TakeOrderedAndProject over the bounded pair
    table; the row stays in the plan (no driver collect)."""
    return pair_counts.orderBy(
        F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
    ).limit(1)


def _initial_vocab(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    return (
        bpe_word_freqs(docs, text_col=text_col, id_col=id_col)
        .select(F.regexp_replace("word", "(.)", "{$1}").alias("repr"), "freq")
        .localCheckpoint(eager=True)
    )


def _rewrite(vocab: DataFrame, m: DataFrame) -> DataFrame:
    """Apply one merge rule (a 1-row broadcast left-join-on-true, so
    an empty rule table leaves the vocab untouched)."""
    carry = [c for c in vocab.columns if c != "repr"]
    return (
        vocab.join(F.broadcast(m), F.lit(True), "left")
        .select(
            F.when(F.col("left").isNull(), F.col("repr"))
            .otherwise(
                F.replace(
                    F.col("repr"),
                    F.concat(F.lit("{"), "left", F.lit("}{"), "right", F.lit("}")),
                    F.concat(F.lit("{"), "left", F.col("right"), F.lit("}")),
                )
            )
            .alias("repr"),
            *carry,
        )
        .localCheckpoint(eager=True)
    )


def _train(
    vocab: DataFrame, n_merges: int, rewrite_last: bool
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """Run the merge loop; returns (merges, final_vocab, per-round
    1-row merge frames). The last round's rewrite is skipped unless
    the caller reads the vocab."""
    merges: DataFrame | None = None
    rounds: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        m = _argmax_pair(_pair_counts(vocab)).select(
            F.lit(rank).alias("merge_rank"),
            F.col("l").alias("left"),
            F.col("r").alias("right"),
            F.col("cnt").alias("pair_count"),
        )
        # eager-checkpoint the 1-row rule: every consumer (the merges
        # union, this loop's rewrite, bpe_encode's second rewrite
        # chain) would otherwise recompute the round's vocab-wide
        # pair aggregate
        m = m.localCheckpoint(eager=True)
        rounds.append(m)
        merges = m if merges is None else merges.unionByName(m)
        if rank < n_merges or rewrite_last:
            vocab = _rewrite(vocab, m)
    return merges, vocab, rounds


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(merge_rank, left, right, pair_count) — the first `n_merges`
    BPE merge rules learned from the corpus, in learning order.
    merge_rank is 1-based; a round whose vocabulary has no adjacent
    pairs left emits no row (ranks stay contiguous from 1).

    Plan shape per round: one bounded pair aggregate -> 1-row argmax
    -> broadcast left-join-on-true rewriting the vocab reprs. k rounds
    chain k such stages over the vocab table only; the corpus is
    scanned exactly once — the word-frequency table is eagerly
    localCheckpoint'ed (the same lineage cap pagerank and
    connected_components use), and so is each round's rewritten vocab,
    so the final union of per-round argmax rows re-reads bounded
    checkpointed state instead of re-deriving r rounds per branch."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    vocab = _initial_vocab(docs, text_col, id_col)
    merges, _, _rounds = _train(vocab, n_merges, rewrite_last=False)
    return merges


def bpe_token_counts(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(token, freq) — the corpus token-frequency table AFTER applying
    the learned `n_merges` BPE rules: what the trained tokenizer
    actually emits, the vocabulary-coverage / compression readout
    every tokenizer-training run ends with. Same scale shape as
    bpe_merges (one corpus scan, then bounded-vocab rounds) plus one
    final bounded explode-aggregate over the rewritten reprs."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    vocab = _initial_vocab(docs, text_col, id_col)
    _, final, _rounds = _train(vocab, n_merges, rewrite_last=True)
    return (
        final.select(F.explode(_syms()).alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_merges_oracle_sql(
    n_merges: int = 6,
    text_col: str = "text",
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`bpe_merges`: the same word-frequency
    collapse, then `n_merges` unrolled CTE rounds (pair explode via
    list_transform over generate_series, ORDER BY cnt DESC, l, r
    LIMIT 1 argmax, the identical brace replace rewrite)."""
    return _bpe_oracle_sql(n_merges, text_col, source, final_tokens=False)


def bpe_token_counts_oracle_sql(
    n_merges: int = 6,
    text_col: str = "text",
    source: str = "documents",
) -> str:
    """DuckDB twin of :func:`bpe_token_counts`: the merge rounds plus
    the final rewrite, then unnest + sum over the rewritten reprs."""
    return _bpe_oracle_sql(n_merges, text_col, source, final_tokens=True)


def _bpe_rounds_parts(
    k: int, text_col: str, source: str, rewrite_last: bool
) -> list[str]:
    """WITH-chain fragments for the k training rounds (w, v0,
    p{r}/m{r} per round, v{r} rewrites except optionally the last) —
    shared by every BPE oracle so the round logic cannot drift."""
    parts = [
        f"""
WITH w AS (
  SELECT word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(string_split_regex(lower({text_col}), '\\s+')) AS word
    FROM {source}
  ) WHERE regexp_full_match(word, '[!-z]+')
  GROUP BY word
),
v0 AS (SELECT regexp_replace(word, '(.)', '{{\\1}}', 'g') AS repr, freq FROM w)"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f""",
p{r} AS (
  SELECT l, r, sum(freq)::BIGINT AS cnt FROM (
    SELECT unnest(list_transform(generate_series(1, length(syms) - 1),
                                 i -> {{'l': syms[i], 'r': syms[i + 1]}}),
                  recursive := true), freq
    FROM (SELECT string_split(substr(repr, 2, length(repr) - 2), '}}{{') AS syms,
                 freq
          FROM v{r - 1} WHERE length(repr) > 0)
    WHERE length(syms) > 1
  ) GROUP BY l, r
),
m{r} AS (SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"""
        )
        if r < k or rewrite_last:
            parts.append(
                f""",
v{r} AS (
  SELECT CASE WHEN m.l IS NULL THEN v.repr
              ELSE replace(v.repr, '{{' || m.l || '}}{{' || m.r || '}}',
                                   '{{' || m.l || m.r || '}}') END AS repr,
         v.freq
  FROM v{r - 1} v LEFT JOIN m{r} m ON TRUE
)"""
            )
    return parts


def _bpe_oracle_sql(
    n_merges: int, text_col: str, source: str, final_tokens: bool
) -> str:
    k = int(n_merges)
    if k < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    parts = _bpe_rounds_parts(k, text_col, source, rewrite_last=final_tokens)
    if final_tokens:
        parts.append(
            f"""
SELECT token, sum(freq)::BIGINT AS freq FROM (
  SELECT unnest(string_split(substr(repr, 2, length(repr) - 2), '}}{{')) AS token,
         freq
  FROM v{k}
) GROUP BY token"""
        )
    else:
        selects = "\nUNION ALL\n".join(
            f"SELECT {r}::INT AS merge_rank, l AS left, r AS right, cnt AS pair_count FROM m{r}"
            for r in range(1, k + 1)
        )
        parts.append("\n" + selects)
    return "".join(parts)


def bpe_encode(
    docs: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, word_idx, tok_idx, token) — the corpus ENCODED by the
    tokenizer trained on it: train the `n_merges` rules (same rounds
    as bpe_merges), then apply them to every document's word stream.
    word_idx is the word's index in the raw whitespace split (indices
    of dropped out-of-alphabet words leave gaps — a deterministic,
    resume-stable position key); tok_idx numbers the word's subword
    tokens.

    Scale shape: training as in bpe_merges (corpus scanned once into
    the checkpointed word-freq table); ENCODING never rescans words
    per rule — the k learned rules chain k 1-row broadcast rewrites
    over the DISTINCT-WORD table (bounded, same rewrite primitive
    training uses), and the corpus joins that encoded dictionary ONCE
    on the uniform word key. Explode fan-out is bounded by word
    length."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    vocab = _initial_vocab(docs, text_col, id_col)
    _, _, rounds = _train(vocab, n_merges, rewrite_last=False)
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "word_idx", "word"
        ),
    ).where(F.col("word").rlike(WORD_RE))
    enc = (
        words.select("word")
        .distinct()
        .select(
            "word", F.regexp_replace("word", "(.)", "{$1}").alias("repr")
        )
        .localCheckpoint(eager=True)
    )
    for m in rounds:
        enc = _rewrite(enc, m)
    enc = enc.select("word", _syms().alias("syms"))
    return words.join(enc, "word").select(
        F.col(id_col),
        F.col("word_idx").cast("long").alias("word_idx"),
        F.posexplode("syms").alias("tok_idx", "token"),
    ).select(
        id_col,
        "word_idx",
        F.col("tok_idx").cast("long").alias("tok_idx"),
        "token",
    )


def bpe_encode_oracle_sql(
    n_merges: int = 6,
    text_col: str = "text",
    source: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bpe_encode`: the shared training rounds
    (_bpe_rounds_parts), then the same k chained rewrites over the
    distinct-word dictionary and one word join."""
    k = int(n_merges)
    if k < 1:
        raise ValueError(f"n_merges must be >= 1: {n_merges}")
    parts = _bpe_rounds_parts(k, text_col, source, rewrite_last=False)
    parts.append(
        f""",
wi AS (
  SELECT {id_col},
         generate_subscripts(string_split_regex(lower({text_col}), '\\s+'), 1)
           - 1 AS word_idx,
         unnest(string_split_regex(lower({text_col}), '\\s+')) AS word
  FROM {source}
),
wf AS (SELECT {id_col}, word_idx, word FROM wi
       WHERE regexp_full_match(word, '[!-z]+')),
r0 AS (SELECT word, regexp_replace(word, '(.)', '{{\\1}}', 'g') AS repr
       FROM (SELECT DISTINCT word FROM wf))"""
    )
    for r in range(1, k + 1):
        parts.append(
            f""",
r{r} AS (
  SELECT word,
         CASE WHEN m.l IS NULL THEN v.repr
              ELSE replace(v.repr, '{{' || m.l || '}}{{' || m.r || '}}',
                                   '{{' || m.l || m.r || '}}') END AS repr
  FROM r{r - 1} v LEFT JOIN m{r} m ON TRUE
)"""
        )
    parts.append(
        f""",
enc AS (SELECT word,
               string_split(substr(repr, 2, length(repr) - 2), '}}{{') AS syms
        FROM r{k})
SELECT wf.{id_col}, wf.word_idx::BIGINT AS word_idx,
       generate_subscripts(e.syms, 1) - 1 AS tok_idx,
       unnest(e.syms) AS token
FROM wf JOIN enc e USING (word)
"""
    )
    return "".join(parts)
