"""Corpus-preparation operators for training-data pipelines: sequence
chunking, repeated-span (substring-level) duplication analysis, corpus
unigram language-model scoring, and one-pass column profiling.

These extend the reference's surface (localsql has no corpus tooling —
its entire relational layer is a SQLite delegate, localsql/localsql.py:230)
with the operations a 100 TB LLM-data pipeline runs between ingest and
tokenization.  Every function is pure DataFrame composition — row-local
expressions plus the minimum number of key shuffles — and every workload
query built on them carries an exact DuckDB oracle (portable md5 hashing,
decimal-summed reductions), so the correctness gate checks the real
algorithm.

Span-level dedup follows the observation of Lee et al., "Deduplicating
Training Data Makes Language Models Better" (arXiv:2107.06499): document-
level near-dup misses long verbatim substrings shared across otherwise-
distinct documents; scanning fixed-length token windows catches them.
Their suffix-array construction is replaced by a rolling window + hash
groupBy — the Spark-native formulation with the same detection semantics
for windows of the chosen length, and embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from functools import reduce as functools_reduce

from localsql_spark.operators import spread
from localsql_spark.operators import text as T


def _tokens(text: Column) -> Column:
    """Normalized whitespace tokens — the corpus-wide tokenization shared
    with the shingle/minhash family (operators.text.normalize_text)."""
    return F.split(T.normalize_text(text), " ")


def _token_table(docs: DataFrame, doc_id_col: str,
                 text_col: str) -> DataFrame:
    """``(doc_id, toks)`` with the corpus tokenized EXACTLY ONCE behind a
    persist barrier.  The barrier is load-bearing, not a cache nicety: an
    aliased projection alone gets CollapseProject-inlined into whatever
    sits above the position Generate, re-splitting the full text for
    every generated row — O(T^2) per document, measured as a 114s -> ~2s
    cliff on a 6400-token/doc fixture.  spread() first: a small parquet
    input otherwise packs into ONE scan split (maxPartitionBytes
    coalescing) and the token explode serializes on a single core —
    measured 9.3s vs 2.7s for MORE data in SCALE.md."""
    from localsql_spark.operators import track_persist

    return track_persist(
        spread(docs).select(doc_id_col,
                            _tokens(F.col(text_col)).alias("toks")))


def _span_stream(base: DataFrame, span: int, doc_id_col: str,
                 include_pos: bool = False) -> DataFrame:
    """Rolling ``span``-token window hashes over a :func:`_token_table`:
    ``(doc_id[, pos], span_hash)``, one row per window start — row-local
    (explode over a bounded index sequence, no joins), O(T x span) per
    document since the slice reads the materialized token array."""
    n = F.size("toks")
    idx = F.when(n >= span, F.sequence(F.lit(0), n - span)
                 ).otherwise(F.array().cast("array<int>"))
    cols = [doc_id_col, "pos"] if include_pos else [doc_id_col]
    return (base.select(doc_id_col, "toks", F.explode(idx).alias("pos"))
            .select(*cols,
                    F.md5(F.concat_ws(
                        " ", F.slice(F.col("toks"), F.col("pos") + 1, span)))
                    .alias("span_hash")))


# ---------------------------------------------------------------------------
# Sequence chunking
# ---------------------------------------------------------------------------

def chunk_documents(docs: DataFrame, chunk: int = 64, overlap: int = 16,
                    doc_id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into fixed-size token windows with overlap — the
    training-sequence preparation step between cleaning and tokenization
    (the stride-chunking HuggingFace/Megatron pipelines apply before
    packing).

    One row per (doc, chunk): ``doc_id, chunk_id, n_tok, chunk_hash`` where
    ``chunk_hash`` is the md5 of the space-joined chunk tokens (portable:
    the DuckDB oracle reproduces it bit-for-bit).

    Scale shape: entirely row-local — tokenize, compute the chunk count
    arithmetically, explode a bounded index sequence, slice.  Zero
    shuffles, linear in total tokens, embarrassingly parallel at any
    corpus size.  Short documents produce exactly one (possibly short)
    chunk, so no document is silently dropped.
    """
    step = chunk - overlap
    if step <= 0:
        raise ValueError("chunk must exceed overlap")
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n.cast("double") - overlap) / step), F.lit(1)).cast("int")
    out = (spread(docs).select(doc_id_col, toks.alias("toks"),
                       F.explode(F.sequence(F.lit(0), n_chunks - 1))
                       .alias("chunk_id")))
    sl = F.slice(F.col("toks"), F.col("chunk_id") * step + 1, chunk)
    return out.select(
        doc_id_col, "chunk_id",
        F.size(sl).cast("long").alias("n_tok"),
        F.md5(F.concat_ws(" ", sl)).alias("chunk_hash"))


def pack_sequences(docs: DataFrame, capacity: int = 128,
                   n_shards: int = 8, doc_id_col: str = "doc_id",
                   text_col: str = "text",
                   n_tok_col: str | None = None) -> DataFrame:
    """Greedy next-fit sequence packing: assign whole documents to fixed
    token-budget training sequences (bins of ``capacity`` tokens) — the
    batch-construction step after chunking/tokenization that decides what
    shares a context window (packing raises accelerator utilization by
    filling windows instead of padding; the streaming-friendly next-fit
    variant is the one production pipelines use because it is one ordered
    pass, not a bin search).

    Determinism: documents are sharded by the portable 32-bit hash of
    their id and walked within each shard in (salted-hash, id) order — a
    reproducible shuffle independent of input partitioning.  The fold
    places each document into the current bin if it fits, else opens a
    new bin; a document longer than ``capacity`` gets a bin of its own
    (``oversize`` true) rather than being dropped — chunk first
    (:func:`chunk_documents`) if truncation is the intended policy.

    Returns one row per document: ``doc_id, shard, seq, pos, n_tok,
    oversize`` where (shard, seq) identifies the packed sequence and
    ``pos`` the document's position inside it.

    Scale shape: token counting and shard/order hashing are row-local;
    the fold is ONE shuffle on the shard key into an Arrow-batched
    per-shard pandas pass (the fold is order-dependent by construction,
    so it cannot be an algebraic aggregate — applyInPandas is the honest
    expression).  Shards are independent deterministic streams: size
    ``n_shards`` so one shard's (id, n_tok) pairs fit an executor —
    ~24 bytes/doc means millions of docs per shard are comfortable, and
    the output is identical at any shard-internal parallelism.
    """
    import numpy as np
    import pandas as pd

    from localsql_spark.operators import hash32

    # n_tok_col: pack pre-tokenized items (e.g. chunk_documents output,
    # the realistic chunk -> pack pipeline order) without re-tokenizing;
    # the id column must still uniquely key the items
    n_tok = (F.col(n_tok_col) if n_tok_col is not None
             else F.size(_tokens(F.col(text_col))))
    base = (spread(docs).select(
        F.col(doc_id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tok"),
        F.pmod(hash32(F.col(doc_id_col).cast("string")),
               F.lit(n_shards)).cast("int").alias("shard"),
        hash32(F.concat(F.lit("pack:"),
                        F.col(doc_id_col).cast("string"))).alias("oh")))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["oh", "doc_id"]).reset_index(drop=True)
        n = len(pdf)
        seqs = np.empty(n, dtype="int64")
        poss = np.empty(n, dtype="int64")
        fill, seq, pos = capacity + 1, -1, 0  # sentinel forces a first bin
        for i, nt in enumerate(pdf["n_tok"].to_numpy()):
            if fill + nt > capacity:
                seq, fill, pos = seq + 1, 0, 0
            seqs[i], poss[i] = seq, pos
            fill += nt
            pos += 1
        pdf["seq"] = seqs
        pdf["pos"] = poss
        return pdf[["doc_id", "shard", "seq", "pos", "n_tok"]]

    # the output schema carries doc_id at its INPUT dtype — packing string
    # chunk ids (chunk_documents output, the documented chunk -> pack
    # pipeline) must not fail on a hardcoded 'doc_id long'
    from pyspark.sql.types import (IntegerType, LongType, StructField,
                                   StructType)
    out_schema = StructType([
        StructField("doc_id", base.schema["doc_id"].dataType),
        StructField("shard", IntegerType()),
        StructField("seq", LongType()),
        StructField("pos", LongType()),
        StructField("n_tok", LongType())])
    out = base.groupBy("shard").applyInPandas(fold, out_schema)
    return out.select("doc_id", "shard",
                      F.col("seq").cast("int").alias("seq"),
                      F.col("pos").cast("int").alias("pos"), "n_tok",
                      (F.col("n_tok") > capacity).alias("oversize"))


# ---------------------------------------------------------------------------
# Repeated-span (substring-level) duplication
# ---------------------------------------------------------------------------

def repeated_spans(docs: DataFrame, span: int = 8, min_docs: int = 2,
                   doc_id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Token windows of length ``span`` that occur verbatim in at least
    ``min_docs`` DISTINCT documents — substring-level duplication that
    document-level MinHash misses (arXiv:2107.06499: boilerplate headers,
    license blocks, templated paragraphs shared across documents).

    Returns one row per duplicated span: ``span_hash, n_docs,
    n_occurrences, first_doc, last_doc``.

    Scale shape: the rolling window is row-local (explode over a bounded
    index sequence — O(tokens) rows, no joins); the single shuffle is the
    groupBy on the 128-bit span hash, where map-side partial aggregation
    collapses within-partition repeats before the exchange.  The output is
    filtered to cross-document spans, so downstream consumers (masking,
    span-removal) join a small table back, not the full span stream.
    """
    spans = _span_stream(_token_table(docs, doc_id_col, text_col),
                         span, doc_id_col)
    return (spans.groupBy("span_hash")
            .agg(F.countDistinct(doc_id_col).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occurrences"),
                 F.min(doc_id_col).alias("first_doc"),
                 F.max(doc_id_col).alias("last_doc"))
            .filter(F.col("n_docs") >= min_docs))


# ---------------------------------------------------------------------------
# Corpus unigram language-model scoring
# ---------------------------------------------------------------------------

def unigram_logprob(docs: DataFrame, doc_id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Score each document by its mean per-token corpus unigram
    log-probability — the cheap statistical-LM quality signal (the CCNet /
    Wikipedia-LM filtering idea at its simplest: documents whose tokens are
    globally improbable are disproportionately noise, mojibake, or
    boilerplate-free gibberish).

    Output: ``doc_id, n_tokens, avg_logprob`` (base-10, higher = more
    typical of the corpus).

    Two passes over the token stream, two key shuffles total: (1) global
    word frequencies — groupBy(word) with map-side combine, Zipf-bounded
    output; (2) re-attach frequencies to the token stream by a word-key
    join and aggregate per document.  The frequency table is left to
    Catalyst/AQE to broadcast when it fits (it usually does — vocabulary
    grows ~O(corpus^0.5) under Heaps' law); at 100 TB with an unbounded
    vocabulary the same plan degrades gracefully to a repartition join on
    the word key.

    Determinism: per-word log10 is rounded to 9 decimals and summed as
    DECIMAL(28,9), so partial-aggregation order (Spark) vs sequential order
    (DuckDB) cannot perturb the doc-level sum; the one double division is
    IEEE-deterministic.
    """
    words = (spread(docs).select(doc_id_col,
                         F.explode(_tokens(F.col(text_col))).alias("word"))
             .filter(F.col("word") != ""))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    lp = (freq.crossJoin(F.broadcast(total))
          .select("word",
                  F.round(F.log10(F.col("cnt").cast("double")
                                  / F.col("total")), 9)
                  .cast("decimal(28,9)").alias("lp")))
    return (words.join(lp, "word")
            .groupBy(doc_id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("lp").alias("_sum_lp"))
            .select(doc_id_col, "n_tokens",
                    F.round(F.col("_sum_lp").cast("double")
                            / F.col("n_tokens"), 6).alias("avg_logprob")))


# ---------------------------------------------------------------------------
# One-pass column profiling
# ---------------------------------------------------------------------------

def profile_columns(df: DataFrame,
                    cols: list[tuple[str, str]]) -> DataFrame:
    """Data-quality profile of a table in ONE aggregation pass: per column,
    null count, exact distinct count, and canonical min/max.

    ``cols`` is a list of (column_name, kind) with kind in ``num`` (any
    numeric — min/max surfaced as rounded doubles), ``str`` (min/max as-is)
    or ``date`` (min/max formatted yyyy-MM-dd) — canonical forms chosen so
    every engine renders the same value (raw double→string or
    timestamp→string formatting is engine-specific; these are not).

    Output: one row per column — ``col_name, n_nulls, n_distinct, min_num,
    max_num, min_str, max_str`` (the num/str pair not applicable to the
    column's kind is NULL).

    Scale shape: a single global aggregate; the multiple COUNT(DISTINCT)s
    compile to one Expand + two-phase hash aggregate (rows × |cols|
    intermediate, map-side partial), then the one-row result is exploded
    row-local into the per-column layout.  No per-column scans, no driver
    loop — profiling cost is one pass over the table regardless of how
    many columns are profiled.
    """
    aggs: list[Column] = []
    for name, kind in cols:
        c = F.col(name)
        aggs.append(F.count(F.when(c.isNull(), 1)).alias(f"__nn_{name}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{name}"))
        if kind == "num":
            aggs.append(F.round(F.min(c).cast("double"), 4)
                        .alias(f"__mn_{name}"))
            aggs.append(F.round(F.max(c).cast("double"), 4)
                        .alias(f"__mx_{name}"))
        elif kind == "date":
            aggs.append(F.date_format(F.min(c), "yyyy-MM-dd")
                        .alias(f"__mn_{name}"))
            aggs.append(F.date_format(F.max(c), "yyyy-MM-dd")
                        .alias(f"__mx_{name}"))
        else:
            aggs.append(F.min(c).cast("string").alias(f"__mn_{name}"))
            aggs.append(F.max(c).cast("string").alias(f"__mx_{name}"))
    one = df.agg(*aggs)
    structs = []
    for name, kind in cols:
        is_num = kind == "num"
        structs.append(F.struct(
            F.lit(name).alias("col_name"),
            F.col(f"__nn_{name}").cast("long").alias("n_nulls"),
            F.col(f"__nd_{name}").cast("long").alias("n_distinct"),
            (F.col(f"__mn_{name}") if is_num else F.lit(None)
             .cast("double")).alias("min_num"),
            (F.col(f"__mx_{name}") if is_num else F.lit(None)
             .cast("double")).alias("max_num"),
            (F.lit(None).cast("string") if is_num
             else F.col(f"__mn_{name}")).alias("min_str"),
            (F.lit(None).cast("string") if is_num
             else F.col(f"__mx_{name}")).alias("max_str")))
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# Temperature-based source rebalancing
# ---------------------------------------------------------------------------

def temperature_mix(docs: DataFrame, alpha: float = 0.5,
                    source_col: str = "source",
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic temperature-rebalanced sampling across sources: each
    source's keep probability is ``min(1, (c_s / c_min) ** (alpha - 1))``
    — the smallest source keeps everything, larger sources are downsampled
    so effective counts scale like ``c_s ** alpha`` (the multilingual /
    multi-source mixture-temperature recipe: alpha=1 keeps natural
    proportions, alpha->0 approaches uniform across sources).

    Selection is the reproducible hash-mod idiom (md5-derived rank of
    ``doc_id`` vs a per-source integer threshold), so the same rows are
    kept on every engine, every run, every cluster — no RNG state.

    Scale shape: one count-by-source aggregate (tiny), the per-source
    thresholds broadcast back, one row-local filter.  Output: kept rows as
    ``(doc_id, source, thr)`` where ``thr`` is the per-source threshold in
    parts-per-million.
    """
    from localsql_spark.operators import hash32

    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("c"))
    cmin = counts.agg(F.min("c").alias("mc"))
    rates = (counts.crossJoin(F.broadcast(cmin))
             .select(source_col,
                     F.floor(F.least(
                         F.lit(1.0),
                         F.pow(F.col("c").cast("double") / F.col("mc"),
                               alpha - 1.0)) * 1_000_000)
                     .cast("long").alias("thr")))
    return (docs.join(F.broadcast(rates), source_col)
            .filter(hash32(F.col(id_col)) % 1_000_000 < F.col("thr"))
            .select(id_col, source_col, "thr"))


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al., arXiv:1508.07909)
# ---------------------------------------------------------------------------

def word_frequencies(docs: DataFrame, doc_id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(word, cnt) over the normalized token stream — the Zipf-bounded
    working set every BPE round aggregates over (vocabulary-sized, NOT
    corpus-sized: ~O(corpus^0.5) under Heaps' law)."""
    return (spread(docs)
            .select(F.explode(_tokens(F.col(text_col))).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _chars(word) -> Column:
    """Split a word into its character symbols (the BPE base vocabulary).
    Spark's split keeps the trailing empty match of the zero-width pattern
    (limit=-1 semantics), so filter it out."""
    return F.filter(F.split(word, "(?!^)"), lambda c: c != "")


def bpe_pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies weighted by word count: the
    statistic BOTH the merge picker and the driver-gate query consume.
    ``symbols`` carries (word, cnt, syms: array<string>).  Row-local pair
    construction (zip with own tail — exact length, see
    operators.selection._features for the Int32 slice trap) + one
    map-side-combined groupBy; output is pair-vocabulary-sized.

    The aggregation keys on the (a, b) STRUCT, never on a joined string:
    symbols may themselves contain the display separator '|' (merged
    symbols are arbitrary substrings), and string-keyed counts would
    collide e.g. ('x|','y') with ('x','|y').  Output carries the exact
    (a, b) columns plus a formatted ``pair`` = 'a|b' for display and
    oracle comparison only."""
    tail_len = F.greatest(F.size("syms") - 1, F.lit(0))
    pairs = F.slice(
        F.zip_with(F.col("syms"), F.slice(F.col("syms"), 2, tail_len),
                   lambda a, b: F.struct(a.alias("a"), b.alias("b"))),
        1, tail_len)
    return (symbols.select("cnt", F.explode(pairs).alias("pr"))
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
            .select("a", "b", F.concat_ws("|", "a", "b").alias("pair"), "n"))


def _apply_merge(sym_col: Column, a: str, b: str) -> Column:
    """Rewrite a symbol array under merge (a, b) -> 'ab': a left-to-right
    fold that joins each leftmost non-overlapping adjacent (a, b) — the
    exact BPE application order.  Row-local F.aggregate; 'aaa' under
    (a, a) becomes ['aa', 'a'], matching the reference algorithm."""
    return F.aggregate(
        sym_col, F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (x == b),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b)))
        ).otherwise(F.concat(acc, F.array(x))))


def bpe_train(docs: DataFrame, n_merges: int = 8,
              doc_id_col: str = "doc_id",
              text_col: str = "text") -> list[tuple[str, str, int]]:
    """Byte-pair-encoding merge training (Sennrich et al., arXiv:1508.07909
    — public algorithm): ``n_merges`` rounds of count-adjacent-pairs ->
    merge the most frequent (ties broken lexicographically on the pair, so
    the result is deterministic across engines and runs).

    Returns [(a, b, count), ...] in merge order — the tokenizer model.

    Scale shape: the loop runs over the DISTINCT-WORD table (Zipf-bounded),
    not the corpus; each round is one bounded pair aggregation + a
    row-local array rewrite, with a lazy ``localCheckpoint`` lineage cut
    per round (same discipline as the connected-components loops — without
    it the nested-fold plan grows per round).  Only the single argmax row
    reaches the driver each round.

    In the SMALL-INPUT regime (estimated corpus scan splits below half
    the cores — the er.py broadcast gate, optimization round 14) the
    vocabulary table collects to the driver and the rounds run locally
    (:func:`_bpe_train_local`, bit-identical by construction and pinned
    by test_bpe_local_matches_distributed): the per-round cost at that
    size is Spark plan analysis, not compute — ~0.2s of driver latency
    per round for a sub-millisecond aggregation.  At real scale the gate
    keeps the distributed loop, since the vocabulary (Heaps-bounded but
    corpus-derived) must never collect.
    """
    words = word_frequencies(docs, doc_id_col, text_col)
    from localsql_spark.operators import small_input_regime

    if small_input_regime(docs):
        return _bpe_train_local(
            [(r["word"], r["cnt"]) for r in words.collect()], n_merges)
    return _bpe_train_distributed(words, n_merges)


def _bpe_train_distributed(words: DataFrame,
                           n_merges: int) -> list[tuple[str, str, int]]:
    """The distributed merge loop over the (word, cnt) table — the
    at-scale path of :func:`bpe_train` (see its docstring)."""
    symbols = (words.select("word", "cnt",
                            _chars(F.col("word")).alias("syms"))
               .localCheckpoint(eager=False))
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (bpe_pair_counts(symbols)
               .orderBy(F.col("n").desc(), F.col("pair"), F.col("a"))
               .limit(1).collect())
        if not top or top[0]["n"] < 2:
            break  # nothing left worth merging
        a, b = top[0]["a"], top[0]["b"]  # exact symbols — never re-split
        merges.append((a, b, int(top[0]["n"])))
        symbols = (symbols.select(
            "word", "cnt", _apply_merge(F.col("syms"), a, b).alias("syms"))
            .localCheckpoint(eager=False))
    return merges


def _bpe_train_local(word_counts: list[tuple[str, int]],
                     n_merges: int) -> list[tuple[str, str, int]]:
    """Driver-side image of :func:`_bpe_train_distributed` over the
    COLLECTED vocabulary, replicating every decision point exactly:

    - ``list(word)`` splits by code point, which is what Java regex's
      zero-width ``(?!^)`` split produces (match boundaries never land
      inside a surrogate pair);
    - pair counts key on the (a, b) tuple (the struct-key discipline);
    - the argmax orders by (n desc, 'a|b', a) with Python's code-point
      string comparison, which equals Spark's UTF8String binary order
      (UTF-8 byte order is code-point order);
    - the merge rewrite joins each leftmost non-overlapping adjacent
      (a, b), the exact ``_apply_merge`` fold;
    - counts are exact ints; the n < 2 stop rule is shared.

    Pinned against the distributed loop by
    test_bpe_local_matches_distributed on adversarial vocabulary."""
    syms: list[tuple[list[str], int]] = [
        (list(w), int(c)) for w, c in word_counts]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, cnt in syms:
            for i in range(len(s) - 1):
                pr = (s[i], s[i + 1])
                counts[pr] = counts.get(pr, 0) + cnt
        if not counts:
            break
        (a, b), n = min(
            counts.items(),
            key=lambda kv: (-kv[1], kv[0][0] + "|" + kv[0][1], kv[0][0]))
        if n < 2:
            break
        merges.append((a, b, n))
        ab = a + b
        nxt: list[tuple[list[str], int]] = []
        for s, cnt in syms:
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = ab
                else:
                    out.append(x)
            nxt.append((out, cnt))
        syms = nxt
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str, int]],
               doc_id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Apply a trained merge list to every document: (doc_id, n_tokens_ws,
    n_bpe_symbols) — the compression measurement (symbols shrink toward
    tokens-worth-of-subwords as merges apply).  Row-local: the merge list
    is a constant folded into the plan."""
    toks = _tokens(F.col(text_col))
    per_word = F.transform(toks, lambda w: _chars(w))
    for a, b, _ in merges:
        per_word = F.transform(per_word,
                               lambda syms: _apply_merge(syms, a, b))
    return (spread(docs)
            .select(doc_id_col, F.size(toks).alias("n_tokens_ws"),
                    F.aggregate(per_word, F.lit(0),
                                lambda acc, syms: acc + F.size(syms))
                    .alias("n_bpe_symbols")))


def token_budget_plan(docs: DataFrame, budget_tokens: int,
                      alpha: float = 0.5, source_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """Token-budget mix planning: given a training-token budget and a
    mixture temperature, compute each source's token allocation and the
    sampling rate that realizes it — the planning table a pipeline
    operator reads BEFORE launching a 100 TB selection job.

    Per source: available tokens ``c_s`` (whitespace count, exact),
    temperature share ``p_s = c_s^alpha / sum(c^alpha)``, target
    ``t_s = round(budget * p_s)``, rate ``min(1, t_s / c_s)``, and a
    ``capped`` flag where the source cannot fill its allocation (the
    operator decides whether to re-run with redistributed budget —
    deliberately surfaced, not silently waterfilled).

    One count aggregate (rows = |sources|) + window-sum normalization on
    that bounded table; nothing corpus-sized moves.  Determinism: exact
    integer token counts, shares rounded to 9, one double division.
    """
    from pyspark.sql import Window

    toks = F.size(F.filter(F.split(T.normalize_text(F.col(text_col)), " "),
                           lambda w: w != ""))
    per = (spread(docs).groupBy(source_col)
           .agg(F.sum(toks).cast("bigint").alias("c_tokens")))
    whole = Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing)
    pw = F.pow(F.col("c_tokens").cast("double"), alpha)
    share = F.round(pw / F.sum(pw).over(whole), 9)
    target = F.round(share * budget_tokens).cast("bigint")
    rate = F.round(F.least(F.lit(1.0),
                           target.cast("double") / F.col("c_tokens")), 9)
    return (per.select(source_col, "c_tokens",
                       share.alias("share"),
                       target.alias("target_tokens"),
                       rate.alias("rate"),
                       (target > F.col("c_tokens")).alias("capped")))


def doc_novelty_scores(docs: DataFrame, span: int = 8,
                       doc_id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document novelty: the fraction of a document's ``span``-token
    windows that appear in NO other document — the inverse of the
    repeated-span signal (Lee et al. arXiv:2107.06499 measure exactly
    this duplication fraction per document).  A low-novelty document is
    mostly boilerplate/template even if no single other document is a
    near-duplicate of it; selection pipelines downweight or drop it.

    Scale shape: one span explode (row-local) feeding BOTH the global
    span-frequency aggregate and the per-doc count — the span stream is
    persisted so the corpus is scanned once; the frequency join is on the
    span hash (map-side-combined groupBy, the repeated_spans shuffle).
    Short documents (< span tokens) have no windows and report novelty
    1.0 over 0 spans (nothing shared, trivially).

    Output: ``(doc_id, n_spans, n_shared_spans, novelty)`` with novelty
    rounded to 6.
    """
    from localsql_spark.operators import track_persist

    spans = track_persist(
        _span_stream(_token_table(docs, doc_id_col, text_col),
                     span, doc_id_col))
    shared = (spans.groupBy("span_hash")
              .agg(F.countDistinct(doc_id_col).alias("nd"))
              .filter(F.col("nd") >= 2).select("span_hash"))
    per_doc = (spans.join(shared.withColumn("_sh", F.lit(1)),
                          "span_hash", "left")
               .groupBy(doc_id_col)
               .agg(F.count(F.lit(1)).alias("n_spans"),
                    F.sum(F.coalesce(F.col("_sh"), F.lit(0)))
                    .cast("bigint").alias("n_shared_spans")))
    novelty = F.round(
        1.0 - F.try_divide(F.col("n_shared_spans").cast("double"),
                           F.col("n_spans")), 6)
    # docs with zero windows never enter the span stream: left-join the
    # full doc list back so they report (0, 0, 1.0)
    base = spread(docs).select(doc_id_col)
    return (base.join(per_doc, doc_id_col, "left")
            .select(doc_id_col,
                    F.coalesce(F.col("n_spans"), F.lit(0)).alias("n_spans"),
                    F.coalesce(F.col("n_shared_spans"), F.lit(0))
                    .alias("n_shared_spans"),
                    F.coalesce(novelty, F.lit(1.0)).alias("novelty")))


def remove_repeated_spans(docs: DataFrame, span: int = 8,
                          doc_id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Excise cross-document duplicated substrings: every token covered by
    an 8-token window that appears verbatim in >= 2 distinct documents is
    removed from the rebuilt text — the ACTION following
    :func:`repeated_spans` detection (Lee et al. arXiv:2107.06499 remove
    the duplicated substring occurrences themselves, not whole
    documents, because boilerplate lives inside otherwise-good pages).

    Scale shape: the span stream is persisted (one corpus scan feeds the
    shared-hash aggregate AND the per-doc coverage list); the coverage
    join returns only the duplicated positions — bounded by the corpus's
    duplication mass, typically a small fraction; the text rebuild first
    folds the sorted covered starts into disjoint merged intervals (one
    ``aggregate()``, O(C)), then emits the surviving indices as the gap
    complement (O(T) output construction) — O(T + C) per doc, so a
    boilerplate-heavy document (|covered| ~ T) no longer degenerates to
    the O(T^2) interpreted-HOF trap the winnowing docstring measures.
    Token-exact and deterministic, so the rebuilt text is
    oracle-checkable bit-for-bit.

    Output: ``(doc_id, n_tokens_before, n_tokens_after, cleaned_hash)``
    with cleaned_hash = md5 of the space-joined surviving tokens.
    """
    from localsql_spark.operators import track_persist

    # the cached token table serves the span stream AND the final rebuild
    # join, so the corpus is tokenized exactly once end to end (see
    # _token_table for why the persist barrier is load-bearing)
    base = _token_table(docs, doc_id_col, text_col)
    spans = track_persist(
        _span_stream(base, span, doc_id_col, include_pos=True))
    shared = (spans.groupBy("span_hash")
              .agg(F.countDistinct(doc_id_col).alias("nd"))
              .filter(F.col("nd") >= 2).select("span_hash"))
    covered = (spans.join(shared, "span_hash")
               .groupBy(doc_id_col)
               .agg(F.sort_array(F.collect_set("pos")).alias("cps")))
    joined = (base.join(covered, doc_id_col, "left")
              .select(doc_id_col, "toks",
                      F.coalesce(F.col("cps"),
                                 F.array().cast("array<int>")).alias("cps")))
    # token j survives iff NO covered window start p has p <= j <= p+span-1.
    # Coverage gaps come straight from consecutive SORTED starts: a gap
    # [p_i+span, p_{i+1}-1] exists iff p_{i+1} > p_i + span, plus the head
    # gap before the first start and the tail gap after the last window.
    # zip-with-successor emits each gap once with no per-element
    # accumulator copying — O(T + C) total (an aggregate() that rebuilds
    # its interval array per element is O(C^2) in Spark's interpreted
    # HOF evaluator and bent the curve at |covered| ~ T; measured).
    n_toks = F.size("toks")
    empty_int = F.array().cast("array<int>")
    size_c = F.size("cps")
    first = F.element_at("cps", 1)
    last = F.element_at("cps", -1)
    succ = F.slice("cps", 2, F.greatest(size_c - 1, F.lit(0)))
    mid_gaps = F.zip_with(
        "cps", succ,
        lambda a, b: F.when(b.isNotNull() & (b > a + span),
                            F.sequence(a + span, b - 1))
                      .otherwise(empty_int))
    head_gap = F.when(first > 0,
                      F.sequence(F.lit(0), first - 1)).otherwise(empty_int)
    tail_gap = F.when(last + span <= n_toks - 1,
                      F.sequence(last + span, n_toks - 1)
                      ).otherwise(empty_int)
    kept = F.when(
        size_c == 0,
        F.when(n_toks > 0, F.sequence(F.lit(0), n_toks - 1))
        .otherwise(empty_int)
    ).otherwise(F.flatten(F.concat(F.array(head_gap), mid_gaps,
                                   F.array(tail_gap))))
    kept_toks = F.transform(kept, lambda j: F.element_at("toks", j + 1))
    return joined.select(
        doc_id_col,
        F.size("toks").cast("bigint").alias("n_tokens_before"),
        F.size(kept_toks).cast("bigint").alias("n_tokens_after"),
        F.md5(F.concat_ws(" ", kept_toks)).alias("cleaned_hash"))


def ngram_stream(docs: DataFrame, n: int = 2,
                 group_col: str = "source",
                 text_col: str = "text") -> DataFrame:
    """The exploded ``(group_col, g)`` n-gram occurrence stream — shared
    by the exact diversity audit and the sketch-valued incremental view.
    Row-local array expression (slice-AFTER-zip so no short tail grams
    leak — the _features trap), exploded once; no shuffle."""
    toks = F.array_remove(_tokens(F.col(text_col)), "")
    rest = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    shifted = [F.slice(toks, 1 + j,
                       F.greatest(F.size(toks) - j, F.lit(0)))
               for j in range(n)]
    grams = F.slice(
        functools_reduce(
            lambda acc, nxt: F.zip_with(acc, nxt,
                                        lambda a, b: F.concat_ws(" ", a, b)),
            shifted), 1, rest)
    return (spread(docs).select(F.col(group_col),
                                F.explode(grams).alias("g")))


def ngram_diversity(docs: DataFrame, n: int = 2, group_col: str = "source",
                    doc_id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Corpus-level n-gram diversity per group — the cross-document
    type/token ratio (distinct n-grams / total n-gram occurrences) of each
    source/domain/snapshot.  The per-document repetition signals
    (text.dup_ngram_fraction) cannot see COLLAPSE ACROSS documents: a
    source whose documents are individually diverse but globally
    templated (mirrors, boilerplate farms, machine generation) shows a
    normal per-doc profile and a tiny corpus TTR — the data-mixing audit
    run before weighting sources (Gopher's per-source analyses,
    arXiv:2112.11446 §A3).

    Output: ``{group_col}, n_docs, total_ngrams, distinct_ngrams, ttr``
    (one row per group, ttr = 0.0 for groups with no n-grams).

    Scale shape: the n-gram stream is a row-local array expression
    exploded once; the only wide ops are the per-group count-distinct
    (one partial-agg shuffle, distinct set bounded by vocabulary^n but in
    practice Heaps-sublinear) and a tiny per-group doc count joined back.
    No Python, no driver collection; groups parallelize independently.
    """
    exploded = ngram_stream(docs, n=n, group_col=group_col,
                            text_col=text_col)
    agg = exploded.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("total_ngrams"),
        F.countDistinct("g").alias("distinct_ngrams"))
    d = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.coalesce("total_ngrams", F.lit(0))
    dist = F.coalesce("distinct_ngrams", F.lit(0))
    return (d.join(agg, group_col, "left")
            .select(group_col, "n_docs",
                    total.alias("total_ngrams"),
                    dist.alias("distinct_ngrams"),
                    F.round(F.when(total > 0,
                                   dist.cast("double") / total)
                            .otherwise(F.lit(0.0)), 6).alias("ttr")))
