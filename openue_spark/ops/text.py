"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), document
fingerprinting (normalized-text hash), and fixed-token-window chunking with
stride (LLM training-prep). All pure built-in column expressions
(whole-stage codegen, no Python), each with a DuckDB oracle in contract.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "in", "and", "to", "is", "was", "for", "on"]
# NOTE: this string is spliced into a Spark SQL literal, whose parser
# escape-processes backslashes — hence the doubled \\s.
BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\\s]"


def with_token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower(text), '{BPE_ISH_RE}', 0)")).alias(
            "bpe_tokens"
        ),
    )


def with_quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score.

    - len_score: 1 if 50 <= n_chars <= 5000 else 0
    - punct_ratio: punctuation chars / chars
    - stopword_ratio: stopword tokens / tokens
    - quality_score = len_score * (1 - punct_ratio) * least(1, 4 * stopword_ratio)
    All ratios rounded to 4 decimals (oracle-compare hygiene).
    """
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    tokens = r"split(trim(lower(text)), '\\s+')"
    n_tok = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE size({tokens}) END"
    n_sw = (
        f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE"
        f" size(filter({tokens}, t -> array_contains(array({sw}), t))) END"
    )
    punct = "length(text) - length(regexp_replace(text, '[.,;:!?]', ''))"
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.expr(n_tok).alias("n_tokens"),
        F.expr(
            f"round(CASE WHEN length(text) = 0 THEN 0.0"
            f" ELSE ({punct}) / cast(length(text) as double) END, 4)"
        ).alias("punct_ratio"),
        F.expr(
            f"round(CASE WHEN {n_tok} = 0 THEN 0.0"
            f" ELSE ({n_sw}) / cast({n_tok} as double) END, 4)"
        ).alias("stopword_ratio"),
        F.expr(
            f"round((CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1.0 ELSE 0.0 END)"
            f" * (1.0 - CASE WHEN length(text) = 0 THEN 0.0"
            f"          ELSE ({punct}) / cast(length(text) as double) END)"
            f" * least(1.0, 4.0 * CASE WHEN {n_tok} = 0 THEN 0.0"
            f"          ELSE ({n_sw}) / cast({n_tok} as double) END), 4)"
        ).alias("quality_score"),
    )


def chunk_token_windows(
    docs: DataFrame, max_tokens: int = 64, stride: int = 48
) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text): every
    document split into fixed-size token windows — the standard LLM
    training-prep step (max_tokens per window, overlapping when
    stride < max_tokens). Whitespace tokens; window starts are
    0, stride, 2*stride, ... < n_tokens, so the tail window may be short
    and every token appears in >= 1 window. Empty/whitespace-only docs
    emit no chunks. Fully deterministic: chunk_idx = start_tok / stride.

    Scale shape: a per-row explode — zero shuffles, parallelism rides the
    input partitions; output row count is ~n_tokens/stride per doc. The
    tokenized array is materialized behind a barrier before the window
    lambda consumes it (CollapseProject would otherwise inline the split
    INTO the transform lambda and re-run it once per window — the
    measured-14x re-evaluation hazard documented in CLAUDE.md).
    """
    from .dedup import _barrier

    toked = _barrier(
        docs.where(F.length(F.trim(F.col("text"))) > 0).select(
            "doc_id",
            F.split(F.trim(F.col("text")), r"\s+").alias("_toks"),
        )
    )
    windows = F.expr(
        f"transform(sequence(0, size(_toks) - 1, {stride}),"
        f" s -> struct(CAST(s AS BIGINT) AS start_tok,"
        f"   CAST(size(slice(_toks, s + 1, {max_tokens})) AS BIGINT)"
        f"     AS n_chunk_tokens,"
        f"   array_join(slice(_toks, s + 1, {max_tokens}), ' ')"
        f"     AS chunk_text))"
    )
    return toked.select(
        "doc_id", F.posexplode(windows).alias("_pos", "_w")
    ).select(
        "doc_id",
        F.col("_pos").cast("long").alias("chunk_idx"),
        F.col("_w.start_tok").alias("start_tok"),
        F.col("_w.n_chunk_tokens").alias("n_chunk_tokens"),
        F.col("_w.chunk_text").alias("chunk_text"),
    )


# Tiny character-trigram profiles for the n-gram language-ID heuristic.
# Real deployments load bigger per-language profiles; the mechanism —
# distinct-trigram overlap against broadcast profile arrays — is what
# scales (one pass, no shuffle, profile size is a constant).
TRIGRAMS_EN = ["the", "and", "ing", "ion", "ent", "he ", " th", "er ", "in ", " an"]
TRIGRAMS_ES = ["de ", "os ", " de", "la ", "el ", "que", "ue ", " la", "as ", "ión"]


def lang_id_ngram(docs: DataFrame) -> DataFrame:
    """(doc_id, en_hits, es_hits, lang_pred): character-trigram language
    ID — count how many DISTINCT trigrams of the lowercased text appear
    in each language's profile; predict the higher-overlap language
    (ties -> 'en'). Pure column algebra (sequence + transform + intersect),
    zero shuffles; the integer hit counts make the row value-checkable
    even on a monolingual corpus."""
    tri = (
        "CASE WHEN length(lower(text)) < 3"
        " THEN cast(array() as array<string>)"
        " ELSE array_distinct(transform("
        "  sequence(1, length(lower(text)) - 2),"
        "  i -> substring(lower(text), i, 3))) END"
    )

    def lit_arr(grams: list[str]) -> str:
        return "array(" + ", ".join(f"'{g}'" for g in grams) + ")"

    return docs.select(
        "doc_id",
        F.expr(f"size(array_intersect({tri}, {lit_arr(TRIGRAMS_EN)}))")
        .cast("long")
        .alias("en_hits"),
        F.expr(f"size(array_intersect({tri}, {lit_arr(TRIGRAMS_ES)}))")
        .cast("long")
        .alias("es_hits"),
    ).withColumn(
        "lang_pred",
        F.when(F.col("en_hits") >= F.col("es_hits"), F.lit("en")).otherwise(
            F.lit("es")
        ),
    )


def token_df(docs: DataFrame, min_df: int = 1) -> DataFrame:
    """(token, df, tf): corpus-level vocabulary statistics — document
    frequency (docs containing the token) and term frequency (total
    occurrences) per lowercased whitespace token. The vocab-building pass
    behind df-based quality filters and posting-list caps.

    Scale shape: explode + one groupBy(token) — tf is a plain count
    (partial-aggregatable map-side) and df a count_distinct(doc_id) whose
    partials dedup map-side per (token, doc) before the shuffle; no
    driver state, no collect. Hot tokens ("the") are single keys, but
    their shuffled payload is already the deduped (token, doc_id) set —
    the same bound a posting-list build pays.
    """
    toks = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    out = toks.groupBy("token").agg(
        F.count_distinct("doc_id").cast("long").alias("df"),
        F.count(F.lit(1)).cast("long").alias("tf"),
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def collocations(docs: DataFrame, min_count: int = 5) -> DataFrame:
    """(w1, w2, n_ab, n_a, n_b, pmi_e9): adjacent-token collocation
    extraction ranked by pointwise mutual information — the classic
    vocab/tokenizer-prep pass that surfaces multi-word units ("new york")
    worth merging before BPE training. ``pmi_e9 = n_ab * 10^9 div
    (n_a * n_b)`` is monotone in true PMI ``log(p_ab / (p_a * p_b))``
    for a fixed corpus (the dropped ``N^2/M`` factor and the log are
    constant/monotone), so ranking by it IS ranking by PMI — while
    staying pure integer arithmetic (decimal(38,0) product, integer
    ``div`` == DuckDB HUGEINT ``//``), so the score hash-compares
    cross-engine at any corpus size with no float division anywhere
    (CLAUDE.md integer-score rule). ``n_ab <= min(n_a, n_b)`` bounds
    the quotient at 10^9 — always bigint-safe.

    Scale shape: two algebraic groupBys (bigram and unigram counts, both
    partial-aggregating map-side — a hot bigram collapses to one row per
    map task) and two joins of the min_count-filtered bigram table
    against the unigram counts on single token keys. The unigram side is
    the corpus VOCABULARY (sublinear in corpus size), so AQE broadcasts
    it when small and shuffle-joins otherwise — no unconditional
    broadcast hint (CLAUDE.md gated-broadcast invariant). min_count
    prunes the long tail BEFORE the joins."""
    tok = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("tk")
    )
    uni = (
        tok.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    big = (
        tok.where(F.size("tk") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> struct(element_at(tk, i) AS w1,"
                    " element_at(tk, i + 1) AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    return (
        big.join(uni.select(F.col("w").alias("w1"), F.col("n").alias("n_a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n").alias("n_b")), "w2")
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(
                "cast(n_ab as decimal(38,0)) * 1000000000"
                " div (cast(n_a as decimal(38,0)) * n_b)"
            ).alias("pmi_e9"),
        )
    )


def winnow_fp_arrays(docs: DataFrame, k: int = 3, window: int = 4) -> DataFrame:
    """(doc_id, fps): the per-document DISTINCT winnowing fingerprint set
    as an array column — the shared builder behind `winnow_fingerprints`
    (exploded index rows) and `ops.dedup.winnow_near_dup_pairs` (which
    also needs the per-doc set SIZE for the containment denominator).

    Accepts (doc_id, text) — whitespace-tokenized here — or a
    pre-tokenized (doc_id, tokens) corpus verbatim (the same contract as
    the ops.dedup family).

    Scale shape: three narrow per-row stages (tokenize, hash, window-min)
    with barriers between them — each stage's lambda body references the
    previous stage's computed array, exactly the shape CollapseProject
    would otherwise inline and re-evaluate per element (the measured-14x
    hazard). Zero shuffles.
    """
    from .dedup import _barrier

    if "tokens" in docs.columns:
        pre = docs.where(F.size("tokens") > 0).select(
            "doc_id", F.col("tokens").alias("_toks")
        )
    else:
        pre = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("_toks"),
        )
    toked = _barrier(pre)
    hashed = _barrier(
        toked.select(
            "doc_id",
            F.expr(
                f"transform(sequence(1, greatest(size(_toks) - {k - 1}, 1)),"
                f" i -> cast(conv(substring("
                f"   md5(concat_ws(' ', slice(_toks, i, {k}))), 1, 8),"
                f"  16, 10) as bigint))"
            ).alias("_hs"),
        )
    )
    return hashed.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform("
            f" sequence(1, greatest(size(_hs) - {window - 1}, 1)),"
            f" j -> array_min(slice(_hs, j, {window}))))"
        ).alias("fps"),
    )


def winnow_fingerprints(docs: DataFrame, k: int = 3, window: int = 4) -> DataFrame:
    """(doc_id, fp): winnowing document fingerprints (Schleimer/Wilkerson/
    Aiken's MOSS algorithm — the rolling-hash fingerprint standard): hash
    every ROLLING word k-gram to a 32-bit int (md5 prefix, the repo's
    engine-portable int hash), then keep the MINIMUM hash of every
    `window` consecutive k-gram hashes, dedup'd per document and exploded
    to rows. Guarantees: any shared run of window+k-1 tokens between two
    documents yields at least one shared fingerprint, while storage is
    ~1/window of the k-gram count — the near-dup/plagiarism index trade.

    Build shape: see `winnow_fp_arrays` (barrier-separated narrow stages,
    zero shuffles) — this is that builder plus one explode. Fingerprints
    are already distinct within a document, and cross-document duplicates
    are the SIGNAL (shared fingerprints = candidate near-dups, joinable
    on fp).
    """
    return winnow_fp_arrays(docs, k=k, window=window).select(
        "doc_id", F.explode("fps").alias("fp")
    )


def pack_sequences(
    items: DataFrame,
    order_cols: list[str],
    n_tokens_col: str = "n_tokens",
    context_len: int = 512,
    n_shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """(*order_cols, n_tokens, shard, pack_idx, pack_offset, straddles):
    GPT-style contiguous sequence packing — concatenate items in stable
    `order_cols` order within each shard and cut a training sequence
    every `context_len` tokens. Each item gets the pack it STARTS in
    (pack_idx), its token offset within that pack (pack_offset), and a
    `straddles` flag when it crosses the cut into the next pack (the
    standard concat-then-split data loader crosses document boundaries;
    the flag lets an attention-masking loader find the split points).

    Assignment is a pure function of (salt, keys, token counts): the
    shard is a hash bucket of the first order column, so re-runs,
    backfills and engine ports reproduce byte-identical packs (same
    md5-prefix mechanism as ops/sampling — and like hash_split, growing
    the corpus only APPENDS to a shard's tail packs).

    Scale shape: ONE shuffle (hash-partition by shard) + a per-shard
    sort/window for the running offset. Contiguous packing is inherently
    sequential per output stream; shards ARE the parallel unit (one per
    output file, like a tokenizer-run's shards) — size n_shards to the
    cluster, not to the data."""
    from pyspark.sql import Window

    from .sampling import hash_bucket

    if context_len <= 0 or n_shards <= 0:
        raise ValueError(
            f"context_len ({context_len}) and n_shards ({n_shards}) must be"
            " positive"
        )
    shard = (
        F.conv(hash_bucket(F.col(order_cols[0]), salt, digits=4), 16, 10).cast(
            "long"
        )
        % n_shards
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = items.select(
        *order_cols,
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        shard.alias("shard"),
    )
    n_tok = F.col("n_tokens")
    offset = (F.sum(n_tok).over(w) - n_tok).alias("_off")
    return (
        base.select("*", offset)
        .select(
            *order_cols,
            "n_tokens",
            "shard",
            # integer floor division (Spark `div`), matching the DuckDB
            # oracle's `//`: exact at any magnitude — a double quotient
            # cast to long would drift past 2^53 cumulative tokens
            # (ADVICE r4). _off is a non-negative bigint cumulative sum.
            F.expr(f"_off div {int(context_len)}").alias("pack_idx"),
            (F.col("_off") % context_len).alias("pack_offset"),
            (F.col("_off") % context_len + F.col("n_tokens") > context_len).alias(
                "straddles"
            ),
        )
    )


def repetition_stats(docs: DataFrame, n: int = 2) -> DataFrame:
    """(doc_id, n_tokens, dup_token_frac, top_ngram_frac, dup_ngram_frac):
    within-document repetition statistics — the Gopher/MassiveText
    repetition filters (Rae et al. 2021, Appendix A; reused by RefinedWeb
    / FineWeb) restated over whitespace tokens:

    - dup_token_frac: fraction of token occurrences that are repeats of
      an earlier token (1 - distinct/total).
    - top_ngram_frac: fraction of n-gram positions covered by the single
      most frequent n-gram.
    - dup_ngram_frac: fraction of n-gram positions whose n-gram occurs
      more than once.

    Docs with fewer than n tokens (or empty) report zero fractions; all
    fractions rounded to 4 decimals (oracle-compare hygiene). Filter on
    these columns (e.g. dup_ngram_frac > 0.75) to drop degenerate
    machine-generated / boilerplate documents before training.

    Scale shape: pure per-row column algebra, zero shuffles. The n-gram
    array and its distinct set are materialized behind a barrier before
    the counting lambda reads them (CollapseProject would otherwise
    inline the n-gram build INTO the per-distinct-gram filter lambda and
    re-run it once per distinct gram — the measured-14x hazard). Per-row
    cost is O(distinct * total) gram comparisons — bounded by chunking
    upstream (chunk_token_windows) for pathological megadocs."""
    from .dedup import _barrier

    toked = _barrier(
        docs.select(
            "doc_id",
            F.when(
                F.length(F.trim(F.col("text"))) == 0,
                F.expr("cast(array() as array<string>)"),
            )
            .otherwise(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
            .alias("_toks"),
        )
    )
    grams = _barrier(
        toked.select(
            "doc_id",
            F.size("_toks").alias("_nt"),
            F.size(F.array_distinct("_toks")).alias("_ndt"),
            F.expr(
                f"CASE WHEN size(_toks) < {n}"
                " THEN cast(array() as array<string>)"
                f" ELSE transform(sequence(1, size(_toks) - {n - 1}),"
                f"   i -> concat_ws(' ', slice(_toks, i, {n}))) END"
            ).alias("_ng"),
        )
    )
    counted = _barrier(
        grams.select(
            "doc_id",
            "_nt",
            "_ndt",
            F.size("_ng").alias("_nn"),
            F.expr(
                "transform(array_distinct(_ng),"
                " g -> size(filter(_ng, x -> x = g)))"
            ).alias("_cnts"),
        )
    )
    return counted.select(
        "doc_id",
        F.col("_nt").cast("long").alias("n_tokens"),
        F.expr(
            "round(CASE WHEN _nt = 0 THEN 0.0"
            " ELSE (_nt - _ndt) / cast(_nt as double) END, 4)"
        ).alias("dup_token_frac"),
        F.expr(
            "round(CASE WHEN _nn = 0 THEN 0.0"
            " ELSE array_max(_cnts) / cast(_nn as double) END, 4)"
        ).alias("top_ngram_frac"),
        F.expr(
            "round(CASE WHEN _nn = 0 THEN 0.0"
            " ELSE aggregate(_cnts, 0, (a, c) -> a + if(c > 1, c, 0))"
            "  / cast(_nn as double) END, 4)"
        ).alias("dup_ngram_frac"),
    )


def with_fingerprint(docs: DataFrame) -> DataFrame:
    """Normalized-text fingerprint: md5 of whitespace-collapsed lowercase
    text — catches near-exact duplicates that differ only in spacing/case."""
    return docs.select(
        "doc_id",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))).alias(
            "fingerprint"
        ),
    )
