"""Text-quality / corpus-curation operators (LLM training-data pipeline):
language identification, quality scoring, token counting, document
fingerprinting.

Reference provenance: the reference's processor/transform stages operate
on social-media text [REC src/etl/.DS_Store:4664,5104]; the concrete ops
are mandated by the driver north star (BASELINE.json:6 — "text analysis"
as a first-class LLM-pipeline family).

All four are single-pass, shuffle-free per-document projections (narrow
transformations): at 100 TB they stream through the scan with zero data
movement, and every expression is JVM-side (whole-stage codegen, no
Python UDFs). Cross-dialect conventions per SURVEY.md §2.1: float
outputs rounded to 4, integer arithmetic for anything compared exactly,
identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register

# Deterministic n-gram lexicon for language ID: (language, marker n-gram,
# weight) — character n-grams scored by substring-occurrence count. On
# this synthetic shared-vocab corpus the decision is arbitrary but
# deterministic; the operator's value is the scoring/argmax plumbing,
# which is exactly what a real char-n-gram profile model (textcat) needs.
_LANG_MARKERS: dict[str, list[tuple[str, int]]] = {
    "de": [("sc", 2), ("rg", 1)],
    "en": [("th", 2), ("ta", 1)],
    "es": [("qu", 2), ("or", 1)],
    "fr": [("ou", 2), ("li", 1)],
    "zh": [("st", 2), ("ba", 1)],
}

# Modulus for the polynomial rolling hash (fits in 64-bit with the *31
# step: acc < p ⇒ acc*31 + x < 3.2e10 ≪ 2^63, no overflow either engine).
_FP_MOD = 1_000_000_007


def _occurrences(col: Column, s: str) -> Column:
    """Occurrence count of substring ``s`` × len(s) — the char-diff trick
    (length minus length-after-removal), kept un-divided so the score
    stays in exact integer arithmetic on both engines."""
    return F.length(col) - F.length(F.replace(col, F.lit(s), F.lit("")))


def _occ_sql(s: str) -> str:
    return f"(length(text) - length(replace(text, '{s}', '')))"


def _lang_score_sql(lang: str) -> str:
    terms = [f"{w} * {_occ_sql(m)}" for m, w in _LANG_MARKERS[lang]]
    return " + ".join(terms)


_LANGS = sorted(_LANG_MARKERS)
_ARGMAX_SQL = "CASE " + " ".join(
    "WHEN "
    + " AND ".join(f"s_{a} >= s_{b}" for b in _LANGS if b != a)
    + f" THEN '{a}'"
    for a in _LANGS
) + " END"


@register(
    "q_text_langid",
    oracle=f"""
    SELECT doc_id, lang, {_ARGMAX_SQL} AS pred_lang
    FROM (
        SELECT doc_id, lang,
               {", ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in _LANGS)}
        FROM documents
    )
    """,
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via character-n-gram lexicon scoring: per-language
    marker-gram occurrence counts → integer scores → argmax with
    alphabetical tiebreak (the classic textcat profile shape, fixed
    profiles, fully deterministic)."""
    d = table(spark, sf_dir, "documents")
    scores = {
        lang: sum(
            (_occurrences(F.col("text"), m) * F.lit(w) for m, w in markers),
            start=F.lit(0),
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    scored = d.select(
        "doc_id", "lang", *[scores[lang].alias(f"s_{lang}") for lang in _LANGS]
    )
    pred = F.lit(None).cast("string")
    # Build the WHEN chain in alphabetical priority order (mirrors the
    # oracle's CASE): first language that ties-or-beats all others wins.
    chain = None
    for a in _LANGS:
        cond = None
        for b in _LANGS:
            if b == a:
                continue
            c = F.col(f"s_{a}") >= F.col(f"s_{b}")
            cond = c if cond is None else (cond & c)
        chain = F.when(cond, a) if chain is None else chain.when(cond, a)
    return scored.select("doc_id", "lang", chain.alias("pred_lang"))


@register(
    "q_text_quality",
    oracle="""
    -- e-notation literals force DOUBLE (DuckDB parses 0.4 as DECIMAL);
    -- +1e-9 before round(…,4) moves exact .5 ties off the boundary —
    -- Spark rounds doubles via decimal-string HALF_UP, DuckDB via
    -- binary ×10^4, so ties break differently otherwise.
    SELECT doc_id, n_tok,
           round(stop_cnt / n_tok::DOUBLE + 1e-9, 4) AS stop_ratio,
           round(4e-1 * least(n_tok::DOUBLE / 5e1, 1e0)
                 + 3e-1 * (1e0 - stop_cnt / n_tok::DOUBLE)
                 + 3e-1 * least((n_char / n_tok::DOUBLE) / 8e0, 1e0)
                 + 1e-9,
                 4) AS quality
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tok,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ('a', 'the'))) AS stop_cnt,
               length(replace(text, ' ', '')) AS n_char
        FROM documents
    )
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score: length saturation + stopword ratio +
    mean-token-length saturation (the Gopher/C4-style rule-based filter
    family), weights fixed, all JVM-side."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    stop_cnt = F.size(
        F.filter(toks, lambda t: t.isin("a", "the"))
    ).cast("double")
    n_char = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
        "double"
    )
    quality = (
        0.4 * F.least(n_tok / 50.0, F.lit(1.0))
        + 0.3 * (1.0 - stop_cnt / n_tok)
        + 0.3 * F.least((n_char / n_tok) / 8.0, F.lit(1.0))
    )
    # +1e-9 matches the oracle's tie-nudge before round (see oracle note).
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.round(stop_cnt / n_tok + 1e-9, 4).alias("stop_ratio"),
        F.round(quality + 1e-9, 4).alias("quality"),
    )


@register(
    "q_text_tokens",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
               AS re_tokens,
           round(length(replace(text, ' ', ''))
                 / len(string_split(text, ' '))::DOUBLE, 4) AS chars_per_token
    FROM documents
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish lexer
    regex (letter runs | digit runs | single punctuation) — the
    pre-tokenizer shape used for corpus token budgeting."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    re_toks = F.regexp_extract_all(
        F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
    )
    n_char = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return d.select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        F.size(re_toks).alias("re_tokens"),
        F.round(n_char / F.size(toks).cast("double"), 4).alias(
            "chars_per_token"
        ),
    )


@register(
    "q_text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(
                   7::BIGINT,
                   list_transform(
                       string_split(lower(text), ' '),
                       t -> (length(t) * 131 + ascii(t)) % {_FP_MOD})),
               (acc, x) -> (acc * 31 + x) % {_FP_MOD}) AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    the token stream (per-token (len*131 + first-char) mod p, rolled with
    acc*31 + x mod p, seed 7). Engine-portable pure-integer arithmetic —
    same value on any engine, unlike xxhash/md5 whose implementations
    differ; at 100 TB this is the cheap pre-cluster key for exact and
    shift-tolerant dedup."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    tok_h = F.transform(
        toks,
        lambda t: (F.length(t).cast("long") * 131 + F.ascii(t).cast("long"))
        % _FP_MOD,
    )
    fp = F.aggregate(
        tok_h,
        F.lit(7).cast("long"),
        lambda acc, x: (acc * 31 + x) % _FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "q_text_repetition",
    oracle="""
    WITH g AS (
        SELECT doc_id, 'w' AS kind,
               unnest(string_split(lower(text), ' ')) AS gram
        FROM documents
        UNION ALL
        SELECT doc_id, 'b' AS kind,
               unnest(list_transform(
                   range(1, len(string_split(lower(text), ' '))),
                   i -> string_split(lower(text), ' ')[i] || ' ' ||
                        string_split(lower(text), ' ')[i + 1])) AS gram
        FROM documents
    ),
    c AS (
        SELECT doc_id, kind, gram, count(*) AS n
        FROM g GROUP BY doc_id, kind, gram
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN kind = 'w' THEN n END) AS BIGINT) AS n_words,
           CAST(sum(CASE WHEN kind = 'w' THEN 1 END) AS BIGINT)
               AS n_distinct,
           round((sum(CASE WHEN kind = 'w' THEN n END)
                  - sum(CASE WHEN kind = 'w' THEN 1 END))::DOUBLE
                 / sum(CASE WHEN kind = 'w' THEN n END) + 1e-9, 4)
               AS dup_word_frac,
           round(max(CASE WHEN kind = 'w' THEN n END)::DOUBLE
                 / sum(CASE WHEN kind = 'w' THEN n END) + 1e-9, 4)
               AS top_word_frac,
           round(max(CASE WHEN kind = 'b' THEN n END)::DOUBLE
                 / sum(CASE WHEN kind = 'b' THEN n END) + 1e-9, 4)
               AS top_bigram_frac
    FROM c GROUP BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filters (the Gopher/MassiveText family):
    per document, the duplicate-word fraction, most-common-word fraction,
    and most-common-bigram fraction — the signals that catch boilerplate,
    keyword stuffing, and templated spam in a pre-training corpus.

    Single tagged-union pass: words and bigrams explode as ('w'|'b',
    gram) rows in ONE Generate (bigrams via the zip_with-against-shifted-
    self trick, never per-index HOF slicing), count per (doc, kind, gram)
    with map-side combine, then one conditional-agg rollup per doc — no
    self-join between the word and bigram branches.  Both shuffles key on
    doc_id(+gram): at 100 TB this scales like any word-count.  Ratios are
    int-over-int double division (bit-identical across engines) with the
    +1e-9 tie nudge before round(…, 4) per SURVEY.md §2.1."""
    d = table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    bigrams = F.filter(
        F.zip_with(
            words,
            F.slice(words, 2, F.lit(1 << 30)),
            lambda a, b: F.when(b.isNotNull(), F.concat_ws(" ", a, b)),
        ),
        lambda s: s.isNotNull(),
    )
    tag = lambda kind, arr: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(kind).alias("kind"), g.alias("gram"))
    )
    g = d.select(
        "doc_id", F.explode(F.concat(tag("w", words), tag("b", bigrams))).alias("g")
    ).select("doc_id", F.col("g.kind").alias("kind"), F.col("g.gram").alias("gram"))
    c = g.groupBy("doc_id", "kind", "gram").agg(F.count("*").alias("n"))
    w_n = F.when(F.col("kind") == "w", F.col("n"))
    b_n = F.when(F.col("kind") == "b", F.col("n"))
    per = c.groupBy("doc_id").agg(
        F.sum(w_n).alias("n_words"),
        F.sum(F.when(F.col("kind") == "w", F.lit(1))).alias("n_distinct"),
        F.max(w_n).alias("top_wn"),
        F.sum(b_n).alias("n_bigrams"),
        F.max(b_n).alias("top_bn"),
    )
    nudge = F.lit(1e-9)
    return per.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.round(
            (F.col("n_words") - F.col("n_distinct")).cast("double")
            / F.col("n_words")
            + nudge,
            4,
        ).alias("dup_word_frac"),
        F.round(
            F.col("top_wn").cast("double") / F.col("n_words") + nudge, 4
        ).alias("top_word_frac"),
        F.round(
            F.col("top_bn").cast("double") / F.col("n_bigrams") + nudge, 4
        ).alias("top_bigram_frac"),
    )


# Decontamination: flag corpus docs sharing ≥ this many distinct 3-token
# shingles with any "benchmark" doc (the held-out eval set a training
# corpus must not leak). The fixture benchmark is the deterministic 5%
# slice doc_id % 20 == 0.
_CONTAM_MIN_HITS = 3


def _contam_oracle() -> str:
    from polybot_data_etl_spark.functions.dedup import _SHINGLES_SQL

    return f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
    ),
    bench AS (
        SELECT s, doc_id AS bench_id FROM sh WHERE doc_id % 20 = 0
    ),
    corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0)
    SELECT c.doc_id,
           CAST(count(DISTINCT c.s) AS BIGINT) AS n_hit,
           CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench
    FROM corpus c JOIN bench b USING (s)
    GROUP BY c.doc_id
    HAVING count(DISTINCT c.s) >= {_CONTAM_MIN_HITS}
    """


@register("q_text_contamination", oracle=_contam_oracle())
def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: flag training docs that share ≥ 3
    distinct 3-token shingles with any benchmark document — the n-gram
    decontamination step every pre-training corpus runs against its eval
    sets before the mix is finalized.

    The benchmark set here is the deterministic doc_id % 20 == 0 slice
    (5%); a real deployment swaps in the eval-set table unchanged.

    Shape: both sides reuse the dedup family's shingle kernel (zip_with,
    per-doc distinct), explode to (doc_id, shingle) rows, and meet in ONE
    equi-join keyed on the shingle string — benchmark sets are tiny
    relative to a 100 TB corpus, so AQE broadcasts the bench side and the
    corpus side streams through map-side; the per-doc distinct counts are
    a standard two-phase agg on doc_id. No pairwise doc×doc work ever
    materializes."""
    from polybot_data_etl_spark.functions.dedup import shingles

    d = table(spark, sf_dir, "documents")
    # shingles() is per-doc distinct, so (doc_id, s) needs no dedup on
    # either branch.
    sh = d.select("doc_id", F.explode(shingles()).alias("s"))
    is_bench = F.col("doc_id") % 20 == 0
    bench = sh.filter(is_bench).select("s", F.col("doc_id").alias("bench_id"))
    corpus = sh.filter(~is_bench)
    return (
        corpus.join(bench, "s")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("s").alias("n_hit"),
            F.count_distinct("bench_id").alias("n_bench"),
        )
        .filter(F.col("n_hit") >= _CONTAM_MIN_HITS)
    )


# Gopher-rule thresholds (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1 shape) —
# bounds adapted to the synthetic corpus scale so both outcomes occur.
_GOPHER_MIN_WORDS = 20
_GOPHER_MAX_WORDS = 100_000
_GOPHER_MIN_MEAN_WLEN = 3
_GOPHER_MAX_MEAN_WLEN = 10
_GOPHER_MIN_STOP_HITS = 2        # distinct stopwords present, of ('a','the')
_GOPHER_MIN_UNIQ_FRAC = 0.30     # unique-word fraction (repetition guard)


@register(
    "q_text_gopher",
    oracle=f"""
    SELECT doc_id,
           n_words,
           round(mean_wlen + 1e-9, 4) AS mean_wlen,
           round(uniq_frac + 1e-9, 4) AS uniq_frac,
           CAST(ok_len AS BOOLEAN) AS ok_len,
           CAST(ok_wlen AS BOOLEAN) AS ok_wlen,
           CAST(ok_stop AS BOOLEAN) AS ok_stop,
           CAST(ok_uniq AS BOOLEAN) AS ok_uniq,
           CAST(ok_len AND ok_wlen AND ok_stop AND ok_uniq AS BOOLEAN)
               AS keep
    FROM (
        SELECT doc_id, n_words,
               n_char / CAST(n_words AS DOUBLE) AS mean_wlen,
               n_uniq / CAST(n_words AS DOUBLE) AS uniq_frac,
               n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
                   AS ok_len,
               n_char / CAST(n_words AS DOUBLE)
                   BETWEEN {_GOPHER_MIN_MEAN_WLEN}
                       AND {_GOPHER_MAX_MEAN_WLEN} AS ok_wlen,
               stop_hits >= {_GOPHER_MIN_STOP_HITS} AS ok_stop,
               n_uniq / CAST(n_words AS DOUBLE) >= {_GOPHER_MIN_UNIQ_FRAC}
                   AS ok_uniq
        FROM (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_words,
                   length(replace(text, ' ', '')) AS n_char,
                   len(list_distinct(string_split(text, ' '))) AS n_uniq,
                   len(list_filter(list_distinct(string_split(text, ' ')),
                                   t -> t IN ('a', 'the'))) AS stop_hits
            FROM documents
        )
    )
    """,
)
def q_text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule filter: per-document word count, mean word
    length, stopword presence, and unique-word fraction, each gated by a
    fixed threshold, plus the conjunctive keep flag (the rule-based
    pre-filter stage of a pre-training corpus pipeline; Rae et al. 2021
    §A1 rule family, thresholds adapted to the fixture corpus).

    Shape: single-pass narrow projection — four array expressions per
    document, zero shuffles, fully whole-stage-codegen. At 100 TB this
    streams through the scan; the keep flag then drives a pushdown-able
    filter in downstream stages."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    uniq = F.array_distinct(toks)
    n_words = F.size(toks)
    n_char = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_uniq = F.size(uniq)
    stop_hits = F.size(
        F.filter(uniq, lambda t: t.isin("a", "the"))
    )
    mean_wlen = n_char / n_words.cast("double")
    uniq_frac = n_uniq / n_words.cast("double")
    ok_len = (n_words >= _GOPHER_MIN_WORDS) & (n_words <= _GOPHER_MAX_WORDS)
    ok_wlen = (mean_wlen >= _GOPHER_MIN_MEAN_WLEN) & (
        mean_wlen <= _GOPHER_MAX_MEAN_WLEN
    )
    ok_stop = stop_hits >= _GOPHER_MIN_STOP_HITS
    ok_uniq = uniq_frac >= _GOPHER_MIN_UNIQ_FRAC
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wlen + F.lit(1e-9), 4).alias("mean_wlen"),
        F.round(uniq_frac + F.lit(1e-9), 4).alias("uniq_frac"),
        ok_len.alias("ok_len"),
        ok_wlen.alias("ok_wlen"),
        ok_stop.alias("ok_stop"),
        ok_uniq.alias("ok_uniq"),
        (ok_len & ok_wlen & ok_stop & ok_uniq).alias("keep"),
    )


@register(
    "q_text_readability",
    oracle="""
    SELECT doc_id,
           n_words,
           syllables,
           round(206.835 - 1.015 * n_words
                 - 84.6 * (syllables / CAST(n_words AS DOUBLE))
                 + 1e-9, 2) AS flesch
    FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               len(regexp_extract_all(text, '[aeiou]+')) AS syllables
        FROM documents
    )
    """,
)
def q_text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability proxy: syllables estimated as vowel
    groups (`[aeiou]+` runs), one "sentence" per document (the corpus
    has no sentence punctuation), score = 206.835 − 1.015·words −
    84.6·(syllables/word). Single-pass regexp projection, zero
    shuffles; the vowel-group syllable estimator is the standard cheap
    stand-in the readability literature uses when a dictionary is
    unavailable."""
    d = table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    syl = F.size(F.regexp_extract_all(F.col("text"), F.lit("[aeiou]+"), 0))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        syl.alias("syllables"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * n_words
            - F.lit(84.6) * (syl / n_words.cast("double"))
            + F.lit(1e-9),
            2,
        ).alias("flesch"),
    )


@register(
    "q_text_code_detect",
    oracle="""
    WITH f AS (
        SELECT doc_id, lang,
               length(text) AS n_chars,
               length(text)
                   - length(regexp_replace(text, '[{}();=<>\\[\\]|&]', '',
                                           'g')) AS n_sym,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ('def', 'return', 'import',
                                          'function', 'var', 'const',
                                          'class', 'void', 'int')))
                   AS n_kw,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    s AS (
        SELECT doc_id, lang,
               round(n_sym * 1e0 / n_chars + 1e-9, 4) AS sym_ratio,
               round(n_kw * 1e0 / n_tok + 1e-9, 4) AS kw_ratio,
               CAST(n_sym * 1e0 / n_chars > 0.03
                    OR n_kw * 1e0 / n_tok > 0.05 AS BOOLEAN) AS looks_code
        FROM f
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN looks_code THEN 1 ELSE 0 END) AS BIGINT)
               AS n_code,
           round(avg(sym_ratio) + 1e-9, 4) AS mean_sym_ratio,
           round(avg(kw_ratio) + 1e-9, 4) AS mean_kw_ratio
    FROM s GROUP BY lang
    """,
)
def q_text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection per language: symbol density
    ({}();=<>[]|&) and programming-keyword hit rate, with a two-rule
    code verdict — the corpus-composition signal that decides whether
    a 'text' source is actually scraped source code (which a prose
    quality gate would wrongly score as garbage, and a code mix
    actually wants).

    Shape: pure scan-side regex/array projections (whole-stage
    codegen'd, zero shuffle) → one k-language map-side-combined agg.
    Ratios are integer-count quotients — identical cross-engine."""
    d = table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_sym = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[{}();=<>\[\]|&]", "")
    )
    toks = F.split(F.col("text"), " ")
    kw = F.size(
        F.filter(
            toks,
            lambda t: t.isin(
                "def", "return", "import", "function", "var", "const",
                "class", "void", "int",
            ),
        )
    )
    n_tok = F.size(toks)
    sym_ratio = n_sym * 1.0 / n_chars
    kw_ratio = kw * 1.0 / n_tok
    s = d.select(
        "lang",
        F.round(sym_ratio + F.lit(1e-9), 4).alias("sym_ratio"),
        F.round(kw_ratio + F.lit(1e-9), 4).alias("kw_ratio"),
        ((sym_ratio > 0.03) | (kw_ratio > 0.05)).alias("looks_code"),
    )
    return s.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("looks_code"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_code"),
        F.round(F.avg("sym_ratio") + F.lit(1e-9), 4).alias(
            "mean_sym_ratio"
        ),
        F.round(F.avg("kw_ratio") + F.lit(1e-9), 4).alias("mean_kw_ratio"),
    )


@register(
    "q_text_langid_eval",
    oracle=f"""
    WITH pred AS (
        SELECT lang, {_ARGMAX_SQL} AS pred_lang
        FROM (
            SELECT lang,
                   {", ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in _LANGS)}
            FROM documents
        )
    ),
    cells AS (
        SELECT lang, pred_lang, count(*) AS n
        FROM pred GROUP BY lang, pred_lang
    ),
    tot AS (
        SELECT cells.*, sum(n) OVER (PARTITION BY lang) AS lang_total
        FROM cells
    )
    SELECT lang, pred_lang, CAST(n AS BIGINT) AS n,
           round(n / CAST(lang_total AS DOUBLE) + 1e-9, 4) AS share_of_lang,
           CAST(lang = pred_lang AS BOOLEAN) AS correct
    FROM tot ORDER BY lang, pred_lang
    """,
)
def q_text_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the q_text_langid heuristic against the
    corpus's labeled `lang` column: per (truth, prediction) cell count
    and its share of the truth language — the eval that tells you the
    classifier's per-language recall (the diagonal) and exactly WHICH
    languages it confuses before anyone filters a corpus with it.  The
    multiclass counterpart of q_ml_confusion's binary table.

    Shape: the scorer is the same zero-shuffle narrow projection as
    q_text_langid; the evaluation is ONE map-side-combined hash agg to
    the ≤|langs|² cell frame, with the truth-language marginal from a
    window over that tiny frame.  Counts are exact integers."""
    pred = q_text_langid(spark, sf_dir).select("lang", "pred_lang")
    cells = pred.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    tot = cells.withColumn(
        "lang_total", F.sum("n").over(Window.partitionBy("lang"))
    )
    return tot.select(
        "lang",
        "pred_lang",
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("n") / F.col("lang_total").cast("double") + F.lit(1e-9), 4
        ).alias("share_of_lang"),
        (F.col("lang") == F.col("pred_lang")).alias("correct"),
    ).orderBy("lang", "pred_lang")


_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_URL = "https?://[^ ]+"
_PII_LONGNUM = "[0-9]{6,}"


@register(
    "q_text_pii",
    oracle=f"""
    WITH d AS (
        SELECT source,
               len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
               len(regexp_extract_all(text, '{_PII_URL}')) AS n_url,
               len(regexp_extract_all(text, '{_PII_LONGNUM}')) AS n_num
        FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS emails,
           CAST(sum(n_url) AS BIGINT) AS urls,
           CAST(sum(n_num) AS BIGINT) AS long_numbers,
           round(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS doc_rate_email,
           round(sum(CASE WHEN n_url > 0 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS doc_rate_url,
           round(sum(CASE WHEN n_num > 0 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS doc_rate_number,
           CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END)
                / CAST(count(*) AS DOUBLE) > 1e-2 AS BOOLEAN)
               AS needs_scrub
    FROM d GROUP BY source ORDER BY source
    """,
)
def q_text_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-prevalence audit per source: email / URL / long-number hit
    counts and document rates — the MEASUREMENT half of the privacy
    pipeline (q_text_scrub is the redaction half): which ingest
    sources leak contact info, at what density, and which cross the
    must-scrub threshold before the corpus ships.  Patterns are the
    exact ones q_text_scrub redacts, so rate-here ⇒ rewritten-there.

    Shape: pure narrow per-document regexp_extract_all counts (ASCII
    character classes — identical RE2/Java semantics) inside
    whole-stage codegen, then ONE map-side-combined per-source agg;
    zero shuffles before the k-row frame."""
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    counts = d.select(
        "source",
        F.size(F.regexp_extract_all(t, F.lit(_PII_EMAIL), 0)).alias(
            "n_email"
        ),
        F.size(F.regexp_extract_all(t, F.lit(_PII_URL), 0)).alias("n_url"),
        F.size(F.regexp_extract_all(t, F.lit(_PII_LONGNUM), 0)).alias(
            "n_num"
        ),
    )
    n = F.count("*")
    rate = lambda c: F.round(
        F.sum(F.when(F.col(c) > 0, 1).otherwise(0)) / n.cast("double")
        + F.lit(1e-9),
        4,
    )
    return (
        counts.groupBy("source")
        .agg(
            n.cast("bigint").alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("emails"),
            F.sum("n_url").cast("bigint").alias("urls"),
            F.sum("n_num").cast("bigint").alias("long_numbers"),
            rate("n_email").alias("doc_rate_email"),
            rate("n_url").alias("doc_rate_url"),
            rate("n_num").alias("doc_rate_number"),
            (
                F.sum(F.when(F.col("n_email") > 0, 1).otherwise(0))
                / n.cast("double")
                > 0.01
            ).alias("needs_scrub"),
        )
        .orderBy("source")
    )


@register(
    "q_text_source_diversity",
    oracle="""
    WITH s AS (
        SELECT source, count(*) AS docs,
               sum(len(list_filter(string_split(lower(text), ' '),
                                   t -> t <> ''))) AS toks
        FROM documents GROUP BY source
    ),
    t AS (
        SELECT s.*, sum(docs) OVER () AS all_docs,
               sum(toks) OVER () AS all_toks
        FROM s
    ),
    a AS (
        SELECT count(*) AS k,
               max(all_docs) AS n,
               -sum((docs / CAST(all_docs AS DOUBLE))
                    * ln(docs / CAST(all_docs AS DOUBLE))) AS h_docs,
               sum(pow(toks / CAST(all_toks AS DOUBLE), 2)) AS hhi_toks,
               max(toks) / CAST(max(all_toks) AS DOUBLE) AS top_tok_share
        FROM t
    )
    SELECT CAST(k AS BIGINT) AS n_sources,
           CAST(n AS BIGINT) AS n_docs,
           round(h_docs + 1e-9, 4) AS doc_entropy,
           round(exp(h_docs) + 1e-9, 4) AS effective_sources,
           round(hhi_toks + 1e-9, 4) AS token_hhi,
           round(top_tok_share + 1e-9, 4) AS top_source_token_share,
           CAST(exp(h_docs) < k * 5e-1 AS BOOLEAN) AS concentrated
    FROM a
    """,
)
def q_text_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-diversity card over ingest sources: Shannon entropy of
    the document mix (and its exponential — the EFFECTIVE number of
    sources), token-mass HHI, and the largest source's token share —
    the one-glance answer to 'is this corpus really N sources, or one
    crawl wearing N hats?' that every data card and mixing plan
    (q_mix_budget et al.) should lead with.

    Shape: ONE map-side-combined per-source agg (docs + token counts
    from the split-length expression, no explode needed), marginals
    via windows over the k-row source frame, a 1-row reduce.  Token
    counts are exact integers; entropy/HHI identical algebra."""
    d = table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), " "), lambda x: x != ""
        )
    )
    s = d.groupBy("source").agg(
        F.count("*").alias("docs"), F.sum(toks).alias("toks")
    )
    from pyspark.sql import Window as W

    wa = W.partitionBy()
    t = s.select(
        "*",
        F.sum("docs").over(wa).alias("all_docs"),
        F.sum("toks").over(wa).alias("all_toks"),
    )
    pd_ = F.col("docs") / F.col("all_docs").cast("double")
    pt = F.col("toks") / F.col("all_toks").cast("double")
    a = t.agg(
        F.count("*").alias("k"),
        F.max("all_docs").alias("n"),
        (-F.sum(pd_ * F.log(pd_))).alias("h_docs"),
        F.sum(F.pow(pt, 2)).alias("hhi_toks"),
        (F.max("toks") / F.max("all_toks").cast("double")).alias(
            "top_tok_share"
        ),
    )
    h = F.col("h_docs")
    return a.select(
        F.col("k").cast("bigint").alias("n_sources"),
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(h + F.lit(1e-9), 4).alias("doc_entropy"),
        F.round(F.exp(h) + F.lit(1e-9), 4).alias("effective_sources"),
        F.round(F.col("hhi_toks") + F.lit(1e-9), 4).alias("token_hhi"),
        F.round(F.col("top_tok_share") + F.lit(1e-9), 4).alias(
            "top_source_token_share"
        ),
        (F.exp(h) < F.col("k") * 0.5).alias("concentrated"),
    )


@register(
    "q_text_fertility",
    oracle="""
    WITH d AS (
        SELECT lang,
               len(list_filter(string_split(lower(text), ' '),
                               t -> t <> '')) AS n_tok,
               length(replace(text, ' ', '')) AS n_char
        FROM documents
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(sum(n_char) AS BIGINT) AS n_chars,
           round(sum(n_char) / CAST(sum(n_tok) AS DOUBLE) + 1e-9, 4)
               AS chars_per_token,
           round(sum(n_tok) / CAST(count(*) AS DOUBLE) + 1e-9, 4)
               AS tokens_per_doc,
           CAST(sum(n_char) / CAST(sum(n_tok) AS DOUBLE)
                > (SELECT 12e-1 * sum(n_char) / sum(n_tok) FROM d)
                AS BOOLEAN) AS high_fertility
    FROM d GROUP BY lang ORDER BY lang
    """,
)
def q_text_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility profile per language: characters per
    (whitespace) token and tokens per document — THE multilingual
    tokenizer-equity metric: a language whose chars/token runs ≫ the
    corpus average will fragment into more subwords per word under a
    shared vocab (longer sequences, higher cost, worse quality), and
    this flags those languages before vocabulary training.  The
    per-language drill-down beside q_text_oov's per-source view.

    Shape: pure narrow per-document length arithmetic (split-length +
    char count, zero explode) → ONE map-side-combined per-lang agg;
    the corpus-average fertility baseline is a 1-row aggregate
    broadcast into the flag comparison.  Counts are exact integers."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    )
    n_char = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    base = d.select("lang", n_tok.alias("n_tok"), n_char.alias("n_char"))
    overall = base.agg(
        (F.sum("n_char") / F.sum("n_tok").cast("double")).alias("corpus_cpt")
    )
    per = base.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("n_char").cast("bigint").alias("n_chars"),
    )
    cpt = F.col("n_chars") / F.col("n_tokens").cast("double")
    return (
        per.crossJoin(F.broadcast(overall))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.round(cpt + F.lit(1e-9), 4).alias("chars_per_token"),
            F.round(
                F.col("n_tokens") / F.col("n_docs").cast("double")
                + F.lit(1e-9),
                4,
            ).alias("tokens_per_doc"),
            (cpt > 1.2 * F.col("corpus_cpt")).alias("high_fertility"),
        )
        .orderBy("lang")
    )
