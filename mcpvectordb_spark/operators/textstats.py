"""Text-analysis operators for training-data curation.

All pure column expressions (JVM-side, codegen'd, oracle-mirrorable):
language-ID (stopword-marker heuristic), quality scoring (length/punct/
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (md5 canonical + polynomial rolling hash).

The reference has none of these (it is a retrieval server); they extend its
ingest gate (SURVEY.md §2.10 R5) into a curation pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.dedup import normalize_text

# Marker stopwords per language for the heuristic classifier.  Deterministic
# and tiny on purpose — a plan literal, not a model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "和", "在"),
}

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# BPE-ish lexer: words | digit runs | single punctuation (tokenizer.py has
# the python twin used inside chunking).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def ws_tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_ish_token_count(text: Column, piece: int = 4) -> Column:
    """Lexer tokens, with alpha words longer than ``piece`` split into
    ceil(len/piece) subword pieces — approximates subword inflation."""
    toks = F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)
    per = F.transform(
        toks,
        lambda t: F.when(
            t.rlike("^[A-Za-z]+$") & (F.length(t) > piece),
            F.ceil(F.length(t) / F.lit(float(piece))).cast("long"),
        ).otherwise(F.lit(1).cast("long")),
    )
    return F.aggregate(per, F.lit(0).cast("long"), lambda acc, x: acc + x)


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(list(words))))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.split(normalize_text(text), " ")
    return {lang: _count_in(toks, markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """argmax over marker-word counts; ties and all-zero → 'und'.
    Deterministic tie policy: a language wins only with a strictly greater
    count than every other (checked in fixed key order)."""
    scores = lang_scores(text)
    langs = list(scores)
    expr = F.lit("und")
    # build reversed so earlier langs take precedence on construction order
    for lang in reversed(langs):
        others = [scores[o] for o in langs if o != lang]
        strictly_max = (scores[lang] > 0)
        for o in others:
            strictly_max = strictly_max & (scores[lang] > o)
        expr = F.when(strictly_max, F.lit(lang)).otherwise(expr)
    return expr


def quality_columns(text_col: str) -> dict[str, Column]:
    """The quality feature expressions, reusable via withColumn (no join
    needed to attach them to an existing frame).

    score = 0.4·len_score + 0.3·(1−punct_ratio) + 0.3·stop_score, where
    len_score saturates at 200 words and stop_score at a 5% stopword rate —
    a simple, fully-SQL-portable heuristic in the C4/Gopher-rules spirit.

    NULL text scores like empty text (0.3): without the coalesce, NULL
    features would slip through F.least (which skips NULLs) and score 0.7,
    ranking NULL docs above real ones.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = ws_tokens(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop = _count_in(F.transform(toks, F.lower), STOPWORDS)
    len_score = F.least(n_words / F.lit(200.0), F.lit(1.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, stop / n_words).otherwise(F.lit(0.0))
    stop_score = F.least(stop_ratio / F.lit(0.05), F.lit(1.0))
    score = 0.4 * len_score + 0.3 * (1.0 - punct_ratio) + 0.3 * stop_score
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc quality features + composite score (see quality_columns)."""
    cols = quality_columns(text_col)
    return df.select(F.col(id_col), *[expr.alias(name) for name, expr in cols.items()])


def md5_fingerprint(text: Column) -> Column:
    """Canonical-form md5 (exact-dedup key)."""
    return F.md5(normalize_text(text))


def rolling_fingerprint(text: Column, mod: int = 2_147_483_647, base: int = 31) -> Column:
    """Polynomial rolling hash over the characters of the normalized text:
    h = fold(chars, h·base + code(c) mod p).  Portable: DuckDB mirrors it
    with list_reduce + ord()."""
    chars = F.split(normalize_text(text), "")
    return F.aggregate(
        F.filter(chars, lambda c: c != ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % mod,
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-stop per-document profile used by the curation pipeline."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        ws_token_count(t).alias("ws_tokens"),
        bpe_ish_token_count(t).alias("bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        md5_fingerprint(t).alias("md5_fp"),
        rolling_fingerprint(t).alias("rolling_fp"),
    )


def repetition_columns(text_col: str) -> dict[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021, table A1 spirit):
    within-document duplication is the strongest single predictor of
    low-quality scraped text.

    - ``dup_line_frac``: 1 − distinct(non-blank lines)/lines — boilerplate
      and template pages repeat whole lines;
    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      total bigrams — degenerate generators loop on short phrases;
    - ``repetitive_flag``: either signal past its (documented) threshold
      WITH a minimum-support gate — dup_line_frac > 0.30 over ≥3 lines, or
      top_bigram_frac > 0.20 over ≥10 bigrams (short texts trivially have
      1/n-high fractions; Gopher's filters likewise apply to long docs).

    Pure column expressions (no UDF, no shuffle).  r10 optimization (guide
    §1.2 step 2 "per-task work"): the top-bigram count was
    O(distinct·total) string comparisons per document
    (transform(array_distinct(bg), b -> size(filter(bg, x = b))) — a
    nested codegen loop that dominated the registry lane at 4.2 s); the
    max frequency of any element equals the longest run in the SORTED
    array, so one array_sort (O(n log n)) + one linear fold replaces the
    quadratic scan.  Same integer count, same division, same rounding —
    value-identical by construction."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0, 1.0 - F.size(F.array_distinct(lines)) / n_lines
    ).otherwise(F.lit(0.0))
    words = ws_tokens(F.lower(t))
    n_bg = F.size(words) - 1
    bigrams = F.when(
        n_bg > 0,
        F.transform(
            F.slice(words, 1, F.greatest(n_bg, F.lit(0))),
            lambda w, i: F.concat_ws(" ", w, F.element_at(words, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # longest run in the sorted bigram array == max occurrence count of any
    # bigram (bigrams are non-empty strings — "w1 w2" — so the "" init
    # sentinel never matches a real element)
    top_count = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )
    top_bg = F.when(n_bg > 0, top_count / n_bg).otherwise(F.lit(0.0))
    return {
        "dup_line_frac": F.round(dup_line, 6),
        "top_bigram_frac": F.round(top_bg, 6),
        "repetitive_flag": ((n_lines >= 3) & (dup_line > 0.30))
        | ((n_bg >= 10) & (top_bg > 0.20)),
    }


def repetition_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    cols = repetition_columns(text_col)
    return df.select(F.col(id_col), *[expr.alias(name) for name, expr in cols.items()])


# Shared with the DuckDB oracle (literalized into the SQL): keep tiny and
# lowercase-only so both engines agree byte-for-byte.
KEYWORD_STOPWORDS = (
    "the", "and", "for", "are", "but", "not", "you", "all", "with", "this",
    "that", "from", "her", "has", "have", "was", "were", "its", "can", "will",
)


def keywords_tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_len: int = 3,
) -> DataFrame:
    """Top-k keywords per document by smoothed TF-IDF over the whole corpus.

    tf(t,d) = occurrences of t in d;  idf(t) = ln((N+1)/(df_t+1)) + 1
    (sklearn's smooth-idf formula — public, engine-agnostic); score ties
    break on the term string, so output order is total and portable.

    Scale shape: one explode → (doc,term) partial-agg (map-side combine),
    one vocab-keyed agg for document frequencies, a vocab equi-join (AQE
    may broadcast it), and a per-document window.  All shuffles are keyed;
    nothing is quadratic in corpus size.  The N scalar rides in as a
    1-row broadcast crossJoin — the same pattern as the TPC-H scalar
    subqueries."""
    terms = F.filter(
        F.regexp_extract_all(F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit("[a-z0-9]+"), 0),
        lambda t: (F.length(t) >= min_len) & ~t.isin(list(KEYWORD_STOPWORDS)),
    )
    exploded = df.select(F.col(id_col), F.explode(terms).alias("term"))
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1.0),
        )
    )
    # ranked-cut discipline: the smooth-idf ln() is a libm call whose last
    # ulp may differ between engines — rank on the 6dp-rounded score on
    # BOTH sides (caught by tools/rankkey_report.py, r8)
    w = Window.partitionBy(id_col).orderBy(
        F.round(F.col("score"), 6).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", F.round("score", 6).alias("score"), "rank")
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    empirical unigram distribution — the cheap, model-free stand-in for the
    CCNet/KenLM perplexity filter (Wenzek et al. 2020): word-salad and
    OOV-dense documents land far below the corpus mode and can be gated by
    a percentile threshold downstream.

    logp(doc) = mean_t ln(count(t)/N) over the doc's tokens, where counts
    come from the whole corpus (so every token has count ≥ 1 — no
    smoothing needed when scoring the corpus against itself).

    Scale shape: identical to TF-IDF — one explode (tokens shuffle as
    (id, term) pairs), one vocab-keyed agg, a vocab equi-join, one doc
    agg.  Nothing quadratic; the N scalar is a 1-row broadcast."""
    terms = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: t != ""
    )
    exploded = df.select(F.col(id_col).alias("id"), F.explode(terms).alias("term"))
    # r9 (guide §3.1): freq is vocabulary-sized, so the scoring join is
    # explicitly broadcast and the exploded corpus never shuffles by term.
    # r10: freq is additionally PINNED — profiled, the freq broadcast
    # build and the bare n_total count each re-ran the corpus
    # tokenize→explode independently (broadcast exchanges never share
    # subtrees), i.e. three full corpus explodes per execution.  With the
    # vocabulary-sized model statistic materialized once, N derives from
    # the pin as Σc (the exact same long the explode count produced) and
    # the explode runs twice (model pass + scoring pass) — the CCNet
    # two-pass floor.  This is the r9 "derive N from freq" idea made
    # correct: it lost THEN because both derivations replayed the agg;
    # the pin is what makes sharing actually share.
    freq = (
        exploded.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    n_total = freq.agg(F.sum("c").cast("long").alias("n_total"))
    return (
        exploded.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(n_total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("n_total"))), 6).alias("avg_logprob"),
        )
    )


def bpe_pair_counts(df: DataFrame, text_col: str, top_n: int = 50) -> DataFrame:
    """Corpus-wide adjacent-symbol pair frequencies — the inner statistic
    of one BPE training iteration (Sennrich et al. 2016): starting from
    the character alphabet, the pair chosen for the next merge is exactly
    the head of this ranking.  Word-internal pairs only (no cross-word
    merges), weighted by word occurrence.

    Scale shape: per-row character pairing stays inside codegen (split +
    transform — no UDF); pairs shuffle pre-aggregated by the map-side
    combine of one keyed agg; the top-n is a distributed
    TakeOrderedAndProject.  This is the once-per-merge-round job a
    distributed tokenizer trainer runs 30k times with a shrinking
    pair table."""
    words = F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda w: F.length(w) >= 2)
    pairs_per_word = F.transform(
        words,
        lambda w: F.transform(
            F.sequence(F.lit(1), F.length(w) - 1),
            lambda i: F.concat(F.substr(w, i, F.lit(1)), F.lit(" "), F.substr(w, i + 1, F.lit(1))),
        ),
    )
    exploded = df.select(F.explode(F.flatten(pairs_per_word)).alias("pair"))
    counts = exploded.groupBy("pair").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
        .select("pair", "cnt")
    )


def doc_pmi_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df_frac: float = 0.01,
    max_df_frac: float = 0.10,
    min_pair: int = 5,
    top_n: int = 30,
) -> DataFrame:
    """Document-level pointwise mutual information for word pairs
    (Church & Hanks 1990): pmi(a,b) = ln(N·n_ab / (df_a·df_b)) over
    document co-occurrence — the classic collocation / association miner.

    The df band [min_df_frac·N, max_df_frac·N] prunes the vocabulary
    BEFORE the pair explode: ubiquitous words (uninformative, and the
    quadratic blowup) and rare words (unstable PMI) both drop, so the
    per-doc pair fanout is bounded by the band's per-doc vocabulary
    squared — the knob that keeps this off the all-pairs cliff at corpus
    scale.  min_pair then prunes noise pairs before ranking.

    Returns top_n (term_a, term_b, n_pair, pmi), ranked pmi desc with a
    (term_a, term_b) total-order tiebreak.
    """
    from mcpvectordb_spark.operators.bm25 import tokens_col

    # r9 optimization: words feeds dfreq AND the band probe, and wb feeds
    # BOTH sides of the pair self-join — without the pins the corpus
    # explode+distinct ran three times per execution.  The pinned tables
    # are exactly the (doc, term) index and its band slice a collocation
    # miner materializes before pair mining.
    words = (
        df.select(F.col(id_col).alias("doc"), F.explode(tokens_col(F.col(text_col))).alias("term"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_docs = F.broadcast(df.agg(F.count(F.lit(1)).cast("double").alias("__n")))
    dfreq = words.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    band = F.broadcast(
        dfreq.crossJoin(n_docs)
        .filter(
            (F.col("df") >= F.ceil(F.col("__n") * min_df_frac))
            & (F.col("df") <= F.floor(F.col("__n") * max_df_frac))
        )
        .select("term", "df")
    )
    wb = words.join(band, "term").select("doc", "term", "df").localCheckpoint(
        eager=False
    )
    a = wb.select("doc", F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    b = wb.select("doc", F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    pairs = (
        a.join(b, "doc")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "df_a", "df_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair)
    )
    scored = pairs.crossJoin(n_docs).select(
        "term_a", "term_b", "n_pair",
        F.log(F.col("n_pair") * F.col("__n") / (F.col("df_a") * F.col("df_b"))).alias("pmi"),
    )
    # 6dp-rounded ranking key — ln() differs across engine libms in the
    # last ulp (round-7 ranked-cut discipline; oracle sorts the rounded
    # output alias)
    return scored.orderBy(
        F.round(F.col("pmi"), 6).desc(), F.asc("term_a"), F.asc("term_b")
    ).limit(top_n)


def deflate_ratio(df: DataFrame, id_col: str, text_col: str, level: int = 6) -> DataFrame:
    """Per-document zlib-deflate compression ratio — the classic
    model-free repetitiveness signal (RefinedWeb/MassiveText-adjacent):
    boilerplate and template spam compress far below natural prose
    (ratio ≪ 0.4), while high-entropy noise sits near (or above) 1.0.
    Complements :func:`repetition_stats`' n-gram fractions with a
    whole-document measure that catches long-range repetition n-grams
    miss.

    Compression is inherently byte-level Python work → a sanctioned
    Arrow ``mapInPandas`` kernel (the chunker/embedder class, SURVEY.md
    §2.9): map-only, no shuffle, output is three numbers per doc — the
    text never leaves the stage.  ``level`` is pinned (zlib output is
    stable for a given library version + level) so the catalog gate can
    golden-digest the full result."""
    out_schema = f"{id_col} long, n_bytes long, n_deflate long, deflate_ratio double"

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                b = (t or "").encode("utf-8")
                c = zlib.compress(b, level) if b else b""
                rows.append(
                    (int(i), len(b), len(c), round(len(c) / len(b), 4) if b else 1.0)
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_bytes", "n_deflate", "deflate_ratio"]
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def logprob_buckets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    §4.3): score every doc with :func:`unigram_logprob`, split the corpus
    at the discrete tercile thresholds of the score distribution, and
    label the top third ``head`` (most fluent), then ``middle``/``tail``.
    CCNet trains on head+middle and drops or down-weights tail; the labels
    here feed the same downstream sampling.

    Scale shape: the scoring pass is the unigram_logprob profile (one
    explode + two keyed aggs); the two thresholds are a 1-row scalar
    broadcast (percentile_disc over the rounded scores — deterministic,
    engine-mirrorable exactly like ``length_buckets``); assignment is a
    map-side comparison."""
    scored = unigram_logprob(df, id_col, text_col)
    thresholds = scored.agg(
        F.expr("percentile_disc(0.3333333333333333) WITHIN GROUP (ORDER BY avg_logprob)").alias("_t1"),
        F.expr("percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY avg_logprob)").alias("_t2"),
    )
    return (
        scored.crossJoin(F.broadcast(thresholds))
        .withColumn(
            "bucket",
            F.when(F.col("avg_logprob") > F.col("_t2"), F.lit("head"))
            .when(F.col("avg_logprob") > F.col("_t1"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .drop("_t1", "_t2")
    )


def encoding_artifacts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Mojibake / encoding-damage detector (the ftfy problem class):
    counts the three loudest artifact families — UTF-8-read-as-Latin-1
    sequences ('Ã', 'â€', 'Â '), C0 control characters that never belong
    in prose, and U+FFFD replacement characters from lossy decodes — and
    flags docs past threshold.  Web crawls are full of double-encoded
    text; this is the cheap scan-side gate that catches it before
    tokenization bakes the damage in.

    Pure codegen ``regexp_count`` expressions, map-only, exactly
    mirrorable in SQL (``len(regexp_extract_all(...))``)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_moji = F.regexp_count(t, F.lit("Ã|â€|Â "))
    n_ctrl = F.regexp_count(t, F.lit(r"[\x00-\x08\x0b\x0c\x0e-\x1f]"))
    n_repl = F.regexp_count(t, F.lit("�"))
    return df.select(
        F.col(id_col),
        n_moji.cast("long").alias("n_mojibake"),
        n_ctrl.cast("long").alias("n_control"),
        n_repl.cast("long").alias("n_replacement"),
        ((n_moji >= 3) | (n_repl > 0) | (n_ctrl > 0)).alias("damaged"),
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    max_chars: int = 500,
) -> DataFrame:
    """MOSS winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003): hash
    every character k-gram of the normalized text, then keep, for each
    window of ``w`` consecutive k-gram positions, the minimum hash —
    rightmost occurrence on ties.  The selected set is the document
    fingerprint: any shared substring of length >= k+w-1 between two docs
    is guaranteed to share a selected hash, with ~2/(w+1) selection density.

    Returns (id, fp_pos, h40) — one row per selected fingerprint.

    Spark-first shape: positions explode from a per-doc ``sequence`` (no
    Python), the k-gram hash is the portable md5 hexint48 reduced to 40
    bits, and the rightmost-min-per-window is ONE window-function pass:
    min over a ROWS frame of the combined key h40·2^16 + (2^16-1-pos),
    which orders lexicographically by (hash asc, pos desc) — the argmin
    trick that avoids a self-join.  One shuffle, keyed by doc id.
    ``max_chars`` caps the explode fanout per doc (the head of a document
    is what fingerprint matching needs; full-text span dedup is
    dedup.dup_span_fraction's job).
    """
    from mcpvectordb_spark.operators.dedup import fan_out, hexint48

    t = F.substring(normalize_text(F.col(text_col)), 1, max_chars)
    base = fan_out(df).select(F.col(id_col).alias("id"), t.alias("_t"))
    grams = base.filter(F.length("_t") >= k).select(
        "id",
        "_t",
        F.explode(F.sequence(F.lit(1), F.length("_t") - (k - 1))).alias("pos"),
    )
    h40 = F.pmod(hexint48(F.col("_t").substr(F.col("pos"), F.lit(k))), F.lit(1 << 40))
    keyed = grams.select(
        "id",
        "pos",
        (h40 * (1 << 16) + ((1 << 16) - 1 - F.col("pos"))).alias("_ck"),
    )
    frame = (
        Window.partitionBy("id").orderBy("pos").rowsBetween(-(w - 1), Window.currentRow)
    )
    sel = (
        keyed.withColumn("_sel", F.min("_ck").over(frame))
        .filter(F.col("pos") >= w)  # full windows only
        .select("id", F.col("_sel"))
        .distinct()
    )
    # integer decode: _sel can exceed 2^53, so `div`, never double `/`
    return sel.select(
        "id",
        (F.lit((1 << 16) - 1) - F.pmod(F.col("_sel"), F.lit(1 << 16))).alias("fp_pos"),
        F.expr(f"_sel div {1 << 16}").alias("h40"),
    )


def chi2_terms(
    docs: DataFrame,
    class_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    top_k: int = 10,
) -> DataFrame:
    """Supervised chi-square term selection (the classic feature-selection
    screen of Yang & Pedersen 1997): for every (term, class) pair, the
    one-vs-rest 2x2 document-presence contingency

        a = class docs containing t      b = other docs containing t
        c = class docs without t         d = other docs without t

    scores  chi2 = N(ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)),  and the top_k
    terms per class are reported — the supervised sibling of the
    unsupervised keywords_tfidf above, and the standard first screen for
    class-discriminative vocabulary (domain markers, template
    boilerplate) in a corpus-curation pipeline.

    Exactness: a/b/c/d are exact BIGINTs from two vocab-bounded groupBys;
    chi2 flows through *,-,/ on doubles only (no libm calls), so both
    engines rank identically, with ties broken by the term string.

    Scale shape: presence dedups per (doc, term) — one distinct over the
    posting explosion — then every later table is vocab x classes, never
    corpus-sized; the per-class ranking is TWO-PHASE (top_k within
    (class, hash-bucket), then top_k over the <= 32*top_k survivors) so
    no window partition is ever vocab-sized.  Classes are an enum
    domain; class totals broadcast.
    """
    from mcpvectordb_spark.operators.dedup import fan_out

    words = F.split(normalize_text(F.col(text_col)), " ")
    pres = (
        fan_out(docs)
        .select(
            F.col(class_col).alias("cls"),
            F.col(id_col).alias("d"),
            F.explode(words).alias("t"),
        )
        .filter(F.col("t") != "")
        .distinct()
    )
    # r9 optimization: a_tab feeds t_tot AND the chi2 join — the pin stops
    # the corpus explode+distinct+agg (the expensive pass) from running
    # twice; a_tab itself is vocab x classes, cheap to hold.
    a_tab = (
        pres.groupBy("t", "cls")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .localCheckpoint(eager=False)
    )
    t_tot = a_tab.groupBy("t").agg(F.sum("a").cast("long").alias("df_t"))
    # class totals pinned (enum-sized); the corpus total derives from
    # them, so documents is scanned once for presence + once for counts
    c_tot = (
        docs.groupBy(class_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_c"))
        .withColumnRenamed(class_col, "cls")
        .localCheckpoint(eager=True)
    )
    n_tot = c_tot.agg(F.sum("n_c").cast("long").alias("n_docs"))
    j = (
        a_tab.join(t_tot, "t")
        .join(F.broadcast(c_tot), "cls")
        .crossJoin(F.broadcast(n_tot))
        # df_t == n_docs would zero the (c+d) margin — a term present in
        # EVERY document carries no class signal and is dropped, which
        # also keeps the chi2 division total under ANSI mode
        .filter(
            (F.col("df_t") >= min_df)
            & (F.col("n_c") < F.col("n_docs"))
            & (F.col("df_t") < F.col("n_docs"))
        )
    )
    ad = F.col("a").cast("double")
    bd = (F.col("df_t") - F.col("a")).cast("double")
    cd = (F.col("n_c") - F.col("a")).cast("double")
    dd_ = (F.col("n_docs") - F.col("n_c") - bd).cast("double")
    nd = F.col("n_docs").cast("double")
    num = nd * (ad * dd_ - bd * cd) * (ad * dd_ - bd * cd)
    den = (ad + bd) * (cd + dd_) * (ad + cd) * (bd + dd_)
    scored = j.select(
        "cls", "t", F.col("a").alias("df_class"), (num / den).alias("__chi2")
    )
    # two-phase top-k so no window partition is ever vocab-sized: rank
    # within (class, hash-bucket) first — the global top_k is a subset of
    # the union of per-bucket top_ks — then rank the <= 32*top_k
    # survivors per class.  Classes are an enum; buckets bound the big
    # window's partitions at vocab/32.
    wb = Window.partitionBy("cls", F.pmod(F.xxhash64("t"), F.lit(32))).orderBy(
        F.col("__chi2").desc(), "t"
    )
    cand = scored.withColumn("__r", F.row_number().over(wb)).filter(
        F.col("__r") <= top_k
    )
    w = Window.partitionBy("cls").orderBy(F.col("__chi2").desc(), "t")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("cls"),
            F.col("rank").cast("long").alias("rank"),
            F.col("t").alias("term"),
            "df_class",
            F.round("__chi2", 4).alias("chi2"),
        )
    )
