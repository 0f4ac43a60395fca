"""Text analysis operators for the documents table.

Training-data-pipeline extensions (no reference analog; the reference's
closest relative is the per-flow entropy/statistics extractors). All
JVM-side column expressions — regex + length arithmetic, no UDFs —
so they codegen and push down. Every operator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Java regex \s == [ \t\n\x0B\f\r]; spelled out explicitly so the
# DuckDB (RE2) oracles can use the IDENTICAL class — RE2's \s lacks
# \x0B, a latent hash-divergence on vertical-tab whitespace
WS = r"[ \t\n\x0B\f\r]"

# tiny stopword lists drive both the language-ID heuristic and the
# quality score; deterministic, engine-portable
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "que", "de", "es"),
}

_EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def _guard_scan(df: DataFrame, id_col: str | None) -> DataFrame:
    """Scan-parallelism guard for the regex-heavy map-side operators
    below (r8): their expensive stage is the projection itself, and scan
    parallelism equals the input's FILE layout — a small single-file
    corpus runs every regexp in ONE task (measured: ts_pii_scrub 4.1 s
    serialized vs ~0.5 s spread at 32 cores). Same treatment as the LSH
    family (operators/buckets.py); a no-op at real scale where scan
    partitions >= slots. ``id_col=None`` (or a missing column) disables
    — callers chaining several guarded operators disable all but the
    first (the guard reads the FILE layout, so a second call would
    re-add an identical exchange; the word_ngrams gotcha)."""
    from .buckets import ensure_min_scan_parallelism

    if id_col and id_col in df.columns:
        return ensure_min_scan_parallelism(df, id_col)
    return df


def _word_count(text: Column, word: str) -> Column:
    """Occurrences of a whole word (case-insensitive) via regexp_count."""
    return F.regexp_count(F.lower(text), F.lit(rf"\b{word}\b"))


def with_token_counts(
    df: DataFrame, text_col: str = "text", id_col: str | None = "doc_id"
) -> DataFrame:
    """Whitespace token count + BPE-ish subword count (runs of letters,
    runs of digits, single punctuation = one token each)."""
    df = _guard_scan(df, id_col)
    t = F.col(text_col)
    ws = F.size(F.array_remove(F.split(t, WS + "+"), ""))
    bpe = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"))
    return df.withColumn("n_tokens_ws", ws.cast("long")).withColumn(
        "n_tokens_bpe", bpe.cast("long")
    )


def with_quality_score(
    df: DataFrame, text_col: str = "text", id_col: str | None = "doc_id"
) -> DataFrame:
    """Heuristic quality features: length, punct ratio, stopword ratio,
    mean word length, uppercase ratio, and a composite [0,1] score."""
    df = _guard_scan(df, id_col)
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    n_punct = F.regexp_count(t, F.lit(r"[^\w \t\n\x0B\f\r]")).cast("double")
    n_upper = F.regexp_count(t, F.lit(r"[A-Z]")).cast("double")
    n_words = F.size(F.array_remove(F.split(t, WS + "+"), "")).cast("double")
    n_stop = sum(
        (_word_count(t, w) for w in _EN_STOPWORDS), F.lit(0)
    ).cast("double")

    safe_chars = F.greatest(n_chars, F.lit(1.0))
    safe_words = F.greatest(n_words, F.lit(1.0))
    punct_ratio = n_punct / safe_chars
    stop_ratio = n_stop / safe_words
    upper_ratio = n_upper / safe_chars
    mean_word_len = (n_chars - (n_words - 1)) / safe_words

    score = (
        F.least(n_words / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(upper_ratio * F.lit(5.0), F.lit(1.0))) * 0.1
    )
    return (
        df.withColumn("n_chars_", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("upper_ratio", upper_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("quality_score", score)
    )


def with_lang_id(
    df: DataFrame, text_col: str = "text", id_col: str | None = "doc_id"
) -> DataFrame:
    """N-gram-heuristic language ID: score = marker-word hits per
    language; argmax wins, 'und' (undetermined) when all scores are 0.
    Ties break by language code order (deterministic)."""
    df = _guard_scan(df, id_col)
    t = F.col(text_col)
    scores = {
        lang: sum((_word_count(t, w) for w in words), F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    out = df
    for lang, s in scores.items():
        out = out.withColumn(f"score_{lang}", s.cast("long"))
    return out.withColumn("lang_pred", pred)


def with_fingerprint(df: DataFrame, text_col: str = "text", k: int = 8) -> DataFrame:
    """Document fingerprint: md5 of the normalized text (lowercase,
    whitespace collapsed) plus a winnowing-style prefix key (first k hex
    chars) usable for cheap bucketing."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS + "+", " "))
    fp = F.md5(norm)
    return df.withColumn("fingerprint", fp).withColumn(
        "fingerprint_bucket", F.substring(fp, 1, k)
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int | None = None,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03
    shape): char k-gram rolling hashes, then the minimum hash of every
    window of ``w`` consecutive grams; the DISTINCT selected hashes are
    the doc's fingerprint set — robust to local edits (any shared
    substring of length >= k+w-1 guarantees a shared fingerprint).

    All JVM-side: normalized text -> transform(sequence(...)) k-gram
    array (no Python), posexplode, md5 per gram, min over a
    rows-between frame partitioned by doc. Per-doc partitions are
    bounded by doc length (cap with ``max_chars`` for harder bounds).
    Docs shorter than k grams emit nothing; docs with fewer than ``w``
    grams emit their single overall-min hash.

    Output: (id, fp_hash) — one row per distinct selected hash.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS + "+", " "))
    if max_chars is not None:
        norm = F.substring(norm, 1, max_chars)
    d = df.select(F.col(id_col), norm.alias("_norm"))
    gram_arr = F.when(
        F.length("_norm") >= k,
        F.expr(
            f"transform(sequence(1, length(_norm) - {k} + 1),"
            f" i -> substring(_norm, i, {k}))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    # gram count is known BEFORE the explode (length arithmetic), so the
    # window-validity filter needs no count-over-partition second window
    n_grams = F.greatest(F.length("_norm") - F.lit(k - 1), F.lit(0))
    grams = d.select(
        id_col, n_grams.alias("_n"), F.posexplode(gram_arr).alias("_p", "_gram")
    ).select(
        id_col, "_n", (F.col("_p") + 1).alias("pos"), F.md5("_gram").alias("_h")
    )
    wmin = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    sel = grams.withColumn("_mh", F.min("_h").over(wmin)).filter(
        (F.col("pos") <= F.col("_n") - F.lit(w - 1))
        | ((F.col("_n") < w) & (F.col("pos") == 1))
    )
    return sel.select(F.col(id_col), F.col("_mh").alias("fp_hash")).distinct()


def word_ngrams(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "gram_hash",
    guard: bool = True,
) -> DataFrame:
    """(id, gram_hash) — md5 of each word ``n``-gram of the normalized
    text (lowercase, whitespace collapsed), one row per gram POSITION
    (not deduped: callers that need distinct grams dedupe after their
    own filter, so the exchange carries the filtered subset, not every
    gram of every document). Gram construction is map-side (split ->
    transform over a sequence -> explode, no UDF); the only shuffle this
    function can introduce is the small-scan parallelism guard below,
    which no-ops at real scale.

    Docs with fewer than ``n`` words emit nothing (the guarded
    ``when`` matters: Spark's sequence(1, 0) would generate a
    DESCENDING [1, 0], not an empty array).

    Scan-parallelism guard: the transform/slice/concat_ws gram builder
    is a higher-order expression (evaluates INTERPRETED per element),
    so a single-file table would serialize it in one task — same
    treatment as the LSH family (operators/buckets.py); a no-op at
    real scale where scan partitions >= slots. Callers that already
    applied the guard to ``df`` pass ``guard=False`` — the guard reads
    the FILE layout, so a second call re-adds an identical full-input
    exchange instead of no-oping on the in-plan repartition (the
    documented inputFiles gotcha; with_repetition_stats paid it twice
    before r6)."""
    from .buckets import ensure_min_scan_parallelism

    if guard:
        df = ensure_min_scan_parallelism(df, id_col)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS + "+", " "))
    d = df.select(F.col(id_col), F.split(norm, " ").alias("_w"))
    grams = F.when(
        F.size("_w") >= n,
        F.expr(
            f"transform(sequence(1, size(_w) - {n} + 1),"
            f" i -> md5(concat_ws(' ', slice(_w, i, {n}))))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(id_col, F.explode(grams).alias(out_col))


def chunk_sliding(
    df: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_text: bool = True,
) -> DataFrame:
    """Sliding-window document chunking — the RAG / context-window prep
    step: split each document's token stream into windows of
    ``max_tokens`` whitespace tokens advancing by ``max_tokens -
    overlap``, so consecutive chunks share ``overlap`` tokens. One row
    per (doc, chunk): ``chunk_idx``, ``tok_start`` (0-based), ``n_toks``
    (the actual window size — the final chunk may be shorter), and the
    chunk text (``emit_text=False`` skips reassembly when only offsets
    are needed).

    A document shorter than ``max_tokens`` yields exactly one chunk; an
    empty document yields none. The last window is the FIRST whose end
    reaches the document's end — a window fully contained in its
    predecessor is never emitted (chunks = 1 + ceil((n - max_tokens) /
    stride) for n > max_tokens, else 1).

    100 TB shape: pure map-side — split -> sequence -> posexplode ->
    slice, no UDF, no shuffle at all (the one guard repartition no-ops
    at real scale); integer arithmetic end-to-end, so any SQL engine
    re-derives the layout exactly. Unlike ``pack_sequences`` (which
    needs a cross-document cumsum), chunking is per-document, so the
    operator parallelizes embarrassingly at any corpus size.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < max_tokens, got {overlap}"
        )
    from .buckets import ensure_min_scan_parallelism

    stride = max_tokens - overlap
    df = ensure_min_scan_parallelism(df, id_col)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS + "+", " "))
    d = df.select(
        F.col(id_col),
        F.when(F.length(norm) > 0, F.split(norm, " "))
        .otherwise(F.array().cast("array<string>"))
        .alias("_w"),
    ).select(
        id_col, "_w", F.size("_w").cast("long").alias("_n")
    )
    # chunks = 1 + ceil((n - max_tokens)/stride), floored at 1 for any
    # non-empty doc; integral `div` truncates toward zero but greatest(0)
    # absorbs the negative-numerator case on both engine and oracle side
    n_chunks = F.when(
        F.col("_n") > 0,
        F.lit(1)
        + F.greatest(
            F.lit(0).cast("long"),
            F.expr(f"(_n - {max_tokens} + {stride} - 1) div {stride}"),
        ),
    ).otherwise(F.lit(0)).cast("int")
    d = d.withColumn("_nc", n_chunks).filter(F.col("_nc") > 0).select(
        id_col, "_w", "_n",
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_idx", "_"),
    )
    tok_start = (F.col("chunk_idx").cast("long") * stride).alias("tok_start")
    n_toks = F.least(
        F.lit(max_tokens).cast("long"),
        F.col("_n") - F.col("chunk_idx") * stride,
    ).alias("n_toks")
    cols = [
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        tok_start,
        n_toks,
    ]
    if emit_text:
        # slice is 1-based; window = tokens [start+1, start+max_tokens]
        cols.append(
            F.concat_ws(
                " ",
                F.expr(f"slice(_w, chunk_idx * {stride} + 1, {max_tokens})"),
            ).alias("chunk_text")
        )
    return d.select(*cols)


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """Benchmark decontamination core: docs sharing >= ``min_shared``
    DISTINCT word ``n``-grams with the benchmark set (the standard
    test-set-overlap rule for LLM training corpora).

    100 TB shape: the benchmark side (a test set — thousands of docs,
    not billions) reduces to a distinct gram-hash set and BROADCASTS;
    the corpus side explodes its grams map-side and left-semi-joins
    against the broadcast, so only MATCHED (doc, gram) rows — bounded by
    actual contamination, tiny by construction — reach the
    countDistinct exchange. The corpus never shuffles its gram stream.

    Returns (id_col, n_shared) for contaminated docs only."""
    bench = benchmark if bench_text_col is None else benchmark.withColumnRenamed(
        bench_text_col, text_col
    )
    if bench_id_col not in bench.columns:  # only the gram SET matters
        # NOT lit(0): word_ngrams' scan guard repartitions by the id
        # column, and a constant id would hash every row to ONE
        # partition — the opposite of what the guard is for
        bench = bench.withColumn(bench_id_col, F.monotonically_increasing_id())
    bench_grams = word_ngrams(bench, n, text_col, bench_id_col).select(
        "gram_hash"
    ).distinct()
    doc_grams = word_ngrams(docs, n, text_col, id_col)
    matched = doc_grams.join(F.broadcast(bench_grams), "gram_hash", "left_semi")
    return (
        matched.groupBy(id_col)
        .agg(F.countDistinct("gram_hash").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Drop documents that overlap the benchmark set (see
    ``contaminated_ids``). The anti-join's right side is the
    contaminated-id set — proportional to contamination, so broadcast
    in practice."""
    bad = contaminated_ids(
        docs, benchmark, n, min_shared, text_col, id_col, bench_text_col
    ).select(id_col)
    return docs.join(bad, id_col, "left_anti")


def with_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_2gram_max: float = 0.18,
    dup_word_max: float = 0.63,
    min_bigrams: int = 20,
) -> DataFrame:
    """Repetition-based quality signals (the Gopher filter family, Rae
    et al. 2021 appendix A1.1, adapted from character- to word-count
    fractions): duplicate-word fraction, most-frequent-word fraction,
    duplicate- and top-2-gram fractions, plus a composite
    ``flag_repetitive`` on the documented thresholds.

    100 TB shape: ONE explode of the token stream feeding a
    map-combinable (doc, word) count, and the shared ``word_ngrams``
    explode feeding a (doc, gram) count — no per-row higher-order
    quadratic scans (an `array_max(transform(array_distinct...))`
    expression would evaluate interpreted and O(len^2) per document;
    the grouped form shuffles one combined row per distinct term
    instead)."""
    from .buckets import ensure_min_scan_parallelism

    df = ensure_min_scan_parallelism(df, id_col)  # see word_ngrams
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS + "+", " "))
    toks = df.select(F.col(id_col), F.explode(F.split(norm, " ")).alias("_w"))
    wc = toks.groupBy(id_col, "_w").agg(F.count("*").alias("_c"))
    words = wc.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("n_words"),
        F.count("*").cast("long").alias("n_distinct_words"),
        F.max("_c").cast("long").alias("_top_w"),
    )
    bc = word_ngrams(
        df, n=2, text_col=text_col, id_col=id_col, guard=False  # guarded above
    ).groupBy(
        id_col, "gram_hash"
    ).agg(F.count("*").alias("_c"))
    bigrams = bc.groupBy(id_col).agg(
        F.sum("_c").cast("long").alias("_n_bg"),
        F.count("*").cast("long").alias("_nd_bg"),
        F.max("_c").cast("long").alias("_top_bg"),
    )
    j = words.join(bigrams, id_col, "left")  # single-word docs: no bigrams
    nw = F.col("n_words").cast("double")
    nbg = F.coalesce(F.col("_n_bg"), F.lit(0)).cast("double")
    dup_w = (nw - F.col("n_distinct_words")) / F.greatest(nw, F.lit(1.0))
    top_w = F.col("_top_w") / F.greatest(nw, F.lit(1.0))
    dup_bg = F.when(nbg > 0, (nbg - F.col("_nd_bg")) / nbg).otherwise(0.0)
    top_bg = F.when(nbg > 0, F.col("_top_bg") / nbg).otherwise(0.0)
    # length gate (the Gopher filters apply to documents with enough
    # content): a short doc's top 2-gram trivially dominates (4 distinct
    # bigrams -> 0.25 > 0.18), so the top-2gram criterion only votes
    # once the doc has >= min_bigrams bigrams
    top_bg_gated = F.when(nbg >= min_bigrams, top_bg).otherwise(0.0)
    return j.select(
        id_col,
        "n_words",
        dup_w.alias("dup_word_frac"),
        top_w.alias("top_word_frac"),
        dup_bg.alias("dup_2gram_frac"),
        top_bg.alias("top_2gram_frac"),
        ((top_bg_gated > top_2gram_max) | (dup_w > dup_word_max)).alias(
            "flag_repetitive"
        ),
    )


# PII scrubbing patterns, applied IN ORDER (emails first, so an IP-like
# host part inside an address can't double-count; each count is taken on
# the text as it stands after the previous replacement). Every pattern
# is written in the common Java-regex / RE2 subset — no lookarounds, no
# backreferences — so the DuckDB oracle runs the IDENTICAL strings.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def with_pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "scrubbed_text",
    id_col: str | None = "doc_id",
) -> DataFrame:
    """PII redaction — the pre-training privacy pass: replace emails,
    IPv4 literals, and NANP-style phone numbers with typed placeholder
    tokens, and count each category (``n_email``, ``n_ipv4``,
    ``n_phone``) so downstream curation can gate on PII density.

    Semantics are SEQUENTIAL over ``PII_PATTERNS``: each category is
    counted on the text AFTER the previous category's replacement (an
    IPv4-looking host inside an already-redacted email is never
    double-counted), which makes the output a pure function any engine
    re-derives exactly.

    100 TB shape: pure regexp column expressions — map-side, codegen,
    zero UDF; the scan's pushed projection carries only the text
    column. Scales with bytes scanned, embarrassingly (the one guard
    repartition below no-ops at real scale — see ``_guard_scan``)."""
    df = _guard_scan(df, id_col)
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select("*", *counts, cur.alias(out_col))


def with_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    out_col: str = "filtered_text",
    id_col: str | None = "doc_id",
) -> DataFrame:
    """C4-style line-level boilerplate filter (Raffel et al. 2020 §2.2,
    public heuristics): keep only lines that end in terminal punctuation
    (``. ! ? "``) AND have at least ``min_words`` whitespace words; flag
    documents containing 'lorem ipsum' or a curly brace (boilerplate /
    code tells) so a doc-level gate can drop them wholesale. Emits
    per-document ``n_lines``, ``n_kept``, ``has_lorem``, ``has_brace``,
    ``doc_keep`` (no flags and at least one surviving line) and the
    rebuilt ``filtered_text`` (kept lines joined by newline, original
    order and original — untrimmed — line text).

    100 TB shape: split → higher-order filter → array_join, all
    map-side JVM column expressions — zero UDF; the higher-order
    lambda evaluates interpreted per LINE (a handful per document, not
    per char — cheap, unlike the per-token HOF pitfall in CLAUDE.md).
    Scales with bytes scanned, embarrassingly (the one guard
    repartition no-ops at real scale — see ``_guard_scan``)."""
    df = _guard_scan(df, id_col)
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def _keep(ln: Column) -> Column:
        words = F.size(
            F.filter(F.split(F.trim(ln), WS + "+"), lambda w: w != F.lit(""))
        )
        return (words >= F.lit(min_words)) & F.trim(ln).rlike(r'[.!?"]$')

    kept = F.filter(lines, _keep)
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    return df.select(
        "*",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace & (F.size(kept) > 0)).alias("doc_keep"),
        F.array_join(kept, "\n").alias(out_col),
    )


def with_bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_smooth: float = 0.5,
    vocab_size: int | None = None,
) -> DataFrame:
    """Corpus-trained bigram-LM quality score (the CCNet-style
    perplexity filter, Wenzek et al. 2020, public method): train an
    add-k-smoothed bigram model ON THE CORPUS ITSELF and score each
    document by the mean negative log probability of its bigrams —
    low = fluent/typical, high = noisy/boilerplate. No external model:
    P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V) with c(·) corpus counts
    and V the unigram vocabulary size, so any SQL engine re-derives the
    score exactly (ROUND(,6) guards the ln ulp). Emits ``n_bigrams``
    and ``avg_neg_logp`` per document (log-perplexity; exp() of it is
    the perplexity if a caller wants the conventional unit).

    100 TB shape: tokenization and bigram construction are map-side
    (the zip_with concat is one interpreted HOF eval per token — same
    cost class as the tokenizing regex, NOT the per-element-matrix
    pitfall in CLAUDE.md); bigram and unigram counts are map-combinable
    groupBys; the score join keys on the bigram string (sort-merge at
    web scale where the bigram vocabulary outgrows a broadcast — at toy
    scale AQE broadcasts it on its own) and the final per-doc mean is
    one more map-combinable agg. ``V`` (unigram vocabulary size): pass
    ``vocab_size`` from table statistics at real scale; when None it is
    a bounded scalar count() (one long), same discipline as
    tfidf_topk's N."""
    from .buckets import ensure_min_scan_parallelism

    if k_smooth <= 0.0:
        raise ValueError(f"k_smooth must be positive, got {k_smooth}")
    df = ensure_min_scan_parallelism(df, id_col)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS + "+", " "))
    toks = df.select(
        F.col(id_col),
        F.array_remove(F.split(norm, " "), "").alias("w"),
    )
    n = F.size("w")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("w", 1, n - 1),
            F.slice("w", 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = toks.select(id_col, F.explode(bigrams).alias("bg"))
    uni = toks.select(id_col, F.explode("w").alias("w1"))
    # r8 note: a "pre-aggregate to per-(doc, bigram) counts before the
    # probability joins" variant (guide §2.3) was built and measured
    # SLOWER on realistic corpora (same-window A/B at sf1.0: ~4.1 s vs
    # ~3.8 s) — short documents have a per-doc bigram dedup factor ~1,
    # so the extra (doc, bigram) exchange buys no row reduction. The
    # per-occurrence join form stands.
    cnt_bg = bg.groupBy("bg").agg(F.count("*").cast("long").alias("c_bg"))
    cnt_u = uni.groupBy("w1").agg(F.count("*").cast("long").alias("c_u"))
    vocab = vocab_size if vocab_size is not None else cnt_u.count()
    scored = (
        bg.join(cnt_bg, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(cnt_u, "w1")
        .withColumn(
            "neg_logp",
            -F.log(
                (F.col("c_bg").cast("double") + F.lit(float(k_smooth)))
                / (F.col("c_u").cast("double") + F.lit(float(k_smooth * vocab)))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.avg("neg_logp").alias("avg_neg_logp"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Top-``k`` salient terms per document by smoothed TF-IDF —
    the vocabulary/term-weighting step of a curation pipeline
    (near-dup explanation, topic balancing, keyword indexing).

    score = (tf / n_words) * (ln((N + 1) / (df + 1)) + 1)   [sklearn's
    smooth-idf convention], ranked per document by ROUND(score, 6) DESC
    then term ASC — the rank keys on the ROUNDED score because ln() can
    differ by 1 ulp between libms, and a near-tie between terms with
    different (tf, df) must order identically on any IEEE engine. The
    DuckDB oracle re-derives the same arithmetic with doubles cast
    before every division.

    100 TB shape: one map-side token explode into a map-combinable
    (doc, term) count; document frequency aggregates to a vocabulary-
    sized frame joined back onto the counts. Two physical forms for
    that join: the DEFAULT is an unhinted equi-join — web-scale text
    has a distinct-token count (URLs, typos, code identifiers) in the
    hundreds of millions, far past broadcastable, so at scale it runs
    sort-merge on the term key while AQE broadcasts on its own whenever
    the measured vocabulary fits; ``broadcast_vocab=True`` forces the
    hint for callers who KNOW the vocabulary is bounded (an enum-like
    token column). Per-doc n_words and the top-k rank share ONE
    exchange on the doc id (two window specs, same partitioning). The
    corpus token stream shuffles once, combined to distinct (doc, term)
    rows.

    ``N`` (corpus document count): pass ``n_docs`` from table
    statistics at real scale; when None it is computed with a bounded
    scalar ``count()`` (one long)."""
    from .buckets import ensure_min_scan_parallelism

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    df = ensure_min_scan_parallelism(df, id_col)
    if n_docs is None:
        n_docs = df.count()  # bounded scalar (one long), documented above
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS + "+", " "))
    toks = (
        df.select(F.col(id_col), F.explode(F.split(norm, " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tc = toks.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tc.groupBy("term").agg(F.count("*").cast("long").alias("df_docs"))
    j = tc.join(F.broadcast(dfreq) if broadcast_vocab else dfreq, "term")
    w_doc = Window.partitionBy(id_col)
    w_rank = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), 6).desc(), F.col("term").asc()
    )
    # cast to double BEFORE dividing on BOTH engines (exactness gotcha)
    idf = F.log(
        F.lit(float(n_docs + 1)) / (F.col("df_docs") + F.lit(1)).cast("double")
    ) + F.lit(1.0)
    scored = j.select(
        id_col,
        "term",
        "tf",
        "df_docs",
        (
            F.col("tf").cast("double")
            / F.sum("tf").over(w_doc).cast("double")
            * idf
        ).alias("score"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= k)
    )


def classifier_weights(n_buckets: int, seed: str = "qclf") -> list[float]:
    """Seeded linear-model weights for the hashed-BoW quality
    classifier: w[b] = md5-uint32("{seed}:w:{b}") / 2^31 - 1 in [-1, 1).
    md5-derived so they are EXACT dyadic rationals (denominator 2^31)
    any engine regenerates identically — the hyperplane_weights trick
    (operators/similarity.py). A production caller swaps in trained
    weights; the arithmetic shape is identical."""
    import hashlib

    return [
        int(hashlib.md5(f"{seed}:w:{b}".encode()).hexdigest()[:8], 16) / 2**31
        - 1.0
        for b in range(n_buckets)
    ]


def quality_classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    bias: float = 0.0,
    seed: str = "qclf",
    weights: list[float] | None = None,
) -> DataFrame:
    """fastText-style linear quality-classifier inference (Joulin et
    al. 2017, the public bag-of-tricks architecture; the LEARNED
    complement to the heuristic ``with_quality_score``): tokens hash
    into ``n_buckets`` buckets (md5-prefix uint32 mod B — the hashing
    trick), and the document logit is mean-pooled bucket weights:

        logit = bias + (sum_b w[b] * c[b]) / n_tokens

    Weights default to the seeded md5-derived stand-in from
    ``classifier_weights`` (exact dyadic rationals, so every product
    and partial sum is EXACT in float64 — the score is bit-identical on
    any IEEE engine regardless of summation order, for documents under
    ~2^22 tokens per bucket); pass ``weights`` to run a trained model.

    100 TB shape: tokenize + bucket-hash map-side; one map-combinable
    (doc, bucket) count (bounded fan-in: at most B distinct buckets per
    doc survive the combine); the weight table is B rows — a genuine
    model-sized broadcast (a few MB even at 2^20 buckets), NOT a
    data-dependent vocabulary (the tfidf_topk lesson); one final
    map-combinable per-doc agg. Emits (id, n_tokens, logit, keep)."""
    from .buckets import ensure_min_scan_parallelism

    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    w = weights if weights is not None else classifier_weights(n_buckets, seed)
    if len(w) != n_buckets:
        raise ValueError(f"need {n_buckets} weights, got {len(w)}")
    df = ensure_min_scan_parallelism(df, id_col)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), WS + "+", " "))
    toks = (
        df.select(F.col(id_col), F.explode(F.split(norm, " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(seed), F.col("term"))), 1, 8),
            16,
            10,
        ).cast("long")
        % F.lit(n_buckets)
    )
    tb = (
        toks.select(id_col, bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wdf = df.sparkSession.createDataFrame(
        [(b, float(x)) for b, x in enumerate(w)], "bucket long, w double"
    )
    scored = tb.join(F.broadcast(wdf), "bucket")
    agg = scored.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("w") * F.col("c").cast("double")).alias("_swc"),
    )
    logit = F.lit(float(bias)) + F.col("_swc") / F.col("n_tokens").cast("double")
    return agg.select(
        id_col,
        "n_tokens",
        logit.alias("logit"),
        (logit > 0.0).alias("keep"),
    )
