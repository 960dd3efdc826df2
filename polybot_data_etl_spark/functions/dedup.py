"""Near-duplicate detection family beyond exact/MinHash (SURVEY.md §2
extension; driver north star BASELINE.json:6 — "dedup" as a first-class
LLM-pipeline operator family):

  * q_dedup_ngram    — n-gram (3-token shingle) Jaccard pairs via an
                       inverted-index join with a document-frequency cap
                       on the candidate stage (SpotSigs-style).
  * q_dedup_simhash  — SimHash (64-bit, Charikar) near-dup pairs with
                       banded LSH candidate generation + Hamming verify.
  * q_dedup_embed    — embedding-cosine near-dup pairs with deterministic
                       random-hyperplane LSH bucketing + exact cosine
                       verify.

All three are hash-checked against DuckDB: every hash involved is a
*portable* integer computation (character-level polynomial rolling hash
mod 1e9+7, sign-of-projection hyperplanes from a fixed integer formula)
so both engines derive bit-identical fingerprints — unlike xxhash64/md5
whose cross-engine values differ (q_dedup_minhash moved onto the same
portable family in round 2 and is now hash-checked too).

Scale posture (100 TB): no operator here does an all-pairs crossJoin.
Candidate generation is always an equi-join on a bucket key (shingle,
band value, hyperplane bucket) — a hash-partitioned shuffle whose
fan-out is controlled (df cap for shingles; 16-bit bands / 4-bit
hyperplane buckets keep bucket sizes ~n/2^16, ~n/16); only candidates
pay the exact verification. Fingerprint computation itself is a narrow
per-row projection (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register

# Shared modulus with functions/quality.py's fingerprint: keeps every
# intermediate < 1.3e11 ≪ 2^63, so no overflow in either engine.
_P = 1_000_000_007

_NGRAM_DF_CAP = 100          # shingles seen in more docs don't generate candidates
_NGRAM_JACCARD = 0.5         # verified pair threshold

_SIMHASH_BANDS = 4           # 4 bands × 16 bits = 64-bit fingerprint
_SIMHASH_BITS = 16
# With 4 bands, banding is pigeonhole-COMPLETE for Hamming ≤ 3 (a pair
# differing in ≤3 bits must agree on ≥1 whole band) — the LSH candidate
# stage is then exact, not probabilistic.
_HAMMING_MAX = 3

_HYPER_BANDS = 4             # 4 bands × 4 hyperplanes for embedding LSH
_HYPER_BITS = 4
_HYPER_BITS_SCALED = 8       # corpus-scale band width (bits ~ log2 n dial)
_EMBED_SIM = 0.45            # exact-cosine verify threshold (rounded 4)
_HYPER_MIX = 2_654_435_761   # Knuth multiplicative-hash constant


# ---------------------------------------------------------------------------
# portable primitives (Spark side; each has an exact DuckDB twin in the
# oracle SQL below)

def tokens(col: str = "text") -> Column:
    """Distinct non-empty whitespace tokens of lower(text)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(F.col(col)), " "), lambda t: t != "")
    )


def char_hash(t: Column) -> Column:
    """Polynomial rolling hash over the characters of a token, mod 1e9+7.

    Identical in DuckDB as
    ``list_reduce(list_transform(string_split(t,''), c -> ascii(c)::BIGINT),
    (a,x) -> (a*31+x) % 1000000007)`` (verified bit-equal)."""
    return F.aggregate(
        F.transform(F.split(t, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % _P,
    )


_CHAR_HASH_SQL = (
    "list_reduce(list_transform(string_split({t}, ''), c -> ascii(c)::BIGINT),"
    " (a, x) -> (a * 31 + x) % 1000000007)"
)

_TOKENS_SQL = (
    "list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> ''))"
)

# SimHash votes are term-frequency weighted (classic Charikar): every
# occurrence votes, so docs drawn from a shared vocabulary still get
# distinct fingerprints (distinct-token voting collapses them).
_ALL_TOKENS_SQL = "list_filter(string_split(lower(text), ' '), t -> t <> '')"


def all_tokens(col: str = "text") -> Column:
    """Non-empty whitespace tokens of lower(text), duplicates kept."""
    return F.filter(F.split(F.lower(F.col(col)), " "), lambda t: t != "")


def shingles(col: str = "text", n: int = 3) -> Column:
    """Distinct 3-token shingles (whole text as one shingle if shorter).

    Built by zipping the token array with its own 1- and 2-shifted
    slices, NOT by per-index ``slice(words, i, 3)`` lambdas: a captured
    array expression inside a Spark higher-order-function lambda is
    re-evaluated on every element (O(tokens²) per document in the
    interpreted HOF path), while ``zip_with`` evaluates each argument
    array exactly once per row (O(tokens))."""
    words = F.split(F.lower(F.col(col)), " ")
    big = F.lit(1 << 30)
    pairs = F.zip_with(
        words, F.slice(words, 2, big), lambda a, b: F.concat_ws(" ", a, b)
    )
    triples = F.zip_with(
        pairs,
        F.slice(words, 3, big),
        lambda ab, c: F.when(c.isNotNull(), F.concat_ws(" ", ab, c)),
    )
    tri = F.filter(triples, lambda s: s.isNotNull())
    return F.array_distinct(
        F.when(F.size(words) >= n, tri).otherwise(
            F.array(F.concat_ws(" ", words))
        )
    )


_SHINGLES_SQL = """
    list_distinct(CASE
        WHEN len(string_split(lower(text), ' ')) >= 3
        THEN list_transform(
               range(1, len(string_split(lower(text), ' ')) - 1),
               i -> array_to_string(string_split(lower(text), ' ')[i:i+2], ' '))
        ELSE [array_to_string(string_split(lower(text), ' '), ' ')]
    END)"""


# ---------------------------------------------------------------------------
# n-gram Jaccard

_NGRAM_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
    ),
    dfreq AS (
        SELECT s FROM sh GROUP BY s HAVING count(*) <= {_NGRAM_DF_CAP}
    ),
    rare AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfreq USING (s)),
    sizes AS (SELECT doc_id, count(*) AS n FROM rare GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ni
        FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT a_id, b_id,
           round(ni / (za.n + zb.n - ni)::DOUBLE, 4) AS jaccard
    FROM inter
    JOIN sizes za ON za.doc_id = a_id
    JOIN sizes zb ON zb.doc_id = b_id
    WHERE round(ni / (za.n + zb.n - ni)::DOUBLE, 4) >= {_NGRAM_JACCARD}
    """


# Shared candidate frame, memoized per (application, sf_dir): FIVE
# registered queries consume the df-capped shingle-intersection pairs
# (q_dedup_ngram, q_dedup_containment directly; q_dedup_clusters,
# q_pipeline_curate, q_pipeline_leakage through q_dedup_ngram), and a
# production curation DAG persists this intermediate once per run
# rather than re-indexing the corpus per consumer.  The cache holds the
# LAZY localCheckpoint frame object, so the first action materializes
# it executor-locally and every later consumer in the same session
# reads the materialized blocks (VERDICT r4 #3: the measured
# q_dedup_clusters/q_pipeline_* tail was exactly this recomputation).
_SIZED_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}

# Memoized q_dedup_embed verified-pair frame (r7): consumed by the
# query itself and q_dedup_threshold_sweep.
_EMBED_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = {}

# One RLock guards every memoized build in this module: concurrent
# plan-producer threads (bench.py r7) must not double-run the EAGER
# component_labels union-find or double-build the shared pair frame.
# Reentrant because ngram_component_labels builds THROUGH
# q_dedup_ngram → sized_shingle_pairs.
_PAIR_CACHE_LOCK = __import__("threading").RLock()


def _evict_dead_sessions(cache: dict, app_id: str) -> None:
    """Drop entries from other (dead) SparkSessions — a restarting
    process must not pin Py4J refs into dead JVMs forever.  Caller
    holds the module lock."""
    for k in [k for k in cache if k[0] != app_id]:
        del cache[k]


def clear_pair_cache() -> None:
    """Drop memoized candidate frames (tests / fixture swaps).

    Takes the build lock: clearing concurrently with an in-flight
    memoized build must not let the builder re-insert a frame pinned
    to the pre-swap file listing right after the clear."""
    from polybot_data_etl_spark.catalog import clear_table_cache
    from polybot_data_etl_spark.functions.text import clear_minhash_cache
    from polybot_data_etl_spark.operators.graph import clear_edges_cache
    from polybot_data_etl_spark.plans.bounds import clear_bounds_cache

    with _PAIR_CACHE_LOCK:
        _SIZED_PAIRS_CACHE.clear()
        _CC_LABELS_CACHE.clear()
        _EMBED_PAIRS_CACHE.clear()
    clear_minhash_cache()
    clear_edges_cache()
    clear_table_cache()
    clear_bounds_cache()


# Memoized CC labels over the n-gram pair graph, keyed like
# _SIZED_PAIRS_CACHE: FIVE registered queries consume the cluster
# assignment (q_dedup_clusters, q_dedup_cluster_sizes, q_mix_dedup_loss
# directly; q_pipeline_curate and q_pipeline_leakage through the label
# frame), and component_labels is EAGER (limit probe + local union-find
# per call) — a production curation DAG materializes the assignment
# once per run, so the engine does too.
_CC_LABELS_CACHE: dict[tuple[str, str], DataFrame] = {}


def ngram_component_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, lbl) for every edge-endpoint doc of the q_dedup_ngram
    pair graph — memoized per (application, sf_dir); see
    component_labels for semantics and the eager-execution contract."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _PAIR_CACHE_LOCK:
        cached = _CC_LABELS_CACHE.get(key)
        if cached is not None:
            return cached
        _evict_dead_sessions(_CC_LABELS_CACHE, key[0])
        pairs = q_dedup_ngram(spark, sf_dir).select("a_id", "b_id")
        labels = component_labels(pairs)
        _CC_LABELS_CACHE[key] = labels
        return labels


def sized_shingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a_id, b_id, ni, n_a, n_b): candidate doc pairs sharing ≥1
    df-capped shingle, with intersection and signature sizes.

    Shingles with document frequency > 100 are excluded from the
    signature (a hot shingle contributes quadratic join fan-out at
    scale, and a pair sharing *only* ubiquitous shingles is not a
    near-dup).

    Shape: the df-cap is applied BEFORE any posting list exists — ONE
    shuffle keyed by shingle feeds a spill-safe window count
    (WindowExec's per-group row buffer spills to disk, unlike an
    aggregation buffer), the cap filters hot shingles as plain rows,
    and only then does collect_list build postings — so a hot shingle
    (df ≫ cap) never materializes its doc_id list anywhere, and
    surviving lists are bounded ≤ df-cap elements.  The collect runs on
    the window's output, which is already hash-partitioned by s, so the
    cap costs a per-partition sort, not a second shuffle (a
    count-aggregate + semi-join formulation was measured 2× worse: the
    partial-agg below its exchange defeats exchange reuse and the
    shingle explode runs twice).  Candidate pairs are generated INSIDE
    each posting row by a double explode (codegen Generate, no
    self-join), then one pair-keyed aggregate counts intersections."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _PAIR_CACHE_LOCK:
        cached = _SIZED_PAIRS_CACHE.get(key)
        if cached is not None:
            return cached
        _evict_dead_sessions(_SIZED_PAIRS_CACHE, key[0])
        return _build_sized_shingle_pairs(spark, sf_dir, key)


def _build_sized_shingle_pairs(
    spark: SparkSession, sf_dir: str, key: tuple[str, str]
) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.explode(shingles()).alias("s"))
    w_s = Window.partitionBy("s")
    rare = (
        sh.withColumn("df", F.count("*").over(w_s))
        .filter(F.col("df") <= _NGRAM_DF_CAP)
        .drop("df")
    )
    # Three consumers hang off the postings frame (sizes joined at both
    # pair endpoints + the pair generator), and Catalyst plans each as a
    # separate physical subtree — without a cut, the windowed shingle
    # pass (the expensive stage) executes 3× per run (verified in the
    # executed plan: Window ×3, ReusedExchange 0).  A LAZY localCheckpoint
    # pins the bounded (≤ df-cap per list) postings frame so it computes
    # once per execution; cost at scale = one extra executor-local
    # materialization of a frame already capped by the df filter.
    postings = (
        rare.groupBy("s")
        .agg(F.collect_list("doc_id").alias("ids"))
        .localCheckpoint(eager=False)
    )
    # doc signature sizes from the (bounded) postings, not from `rare`:
    # every consumer of the window node re-executes it, so hanging both
    # postings AND sizes off `rare` would run the windowed shingle pass
    # twice — off postings, the explode is over ≤ df-cap lists.
    sizes = (
        postings.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    inter = (
        postings.select(F.explode("ids").alias("a_id"), "ids")
        .select("a_id", F.explode("ids").alias("b_id"))
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("ni"))
    )
    sized = inter.join(
        sizes.withColumnsRenamed({"doc_id": "a_id", "n": "n_a"}), "a_id"
    ).join(sizes.withColumnsRenamed({"doc_id": "b_id", "n": "n_b"}), "b_id")
    # Memoize the LAZY frame: the expensive shingle-window stage lives
    # behind the postings checkpoint, which materializes on the first
    # consumer's action and is then reused by every other consumer.
    # The cheap tail (double explode + two joins) stays lazy —
    # checkpointing `sized` itself was measured 3.5× WORSE on first
    # touch (it materializes every pre-threshold candidate pair instead
    # of letting each consumer's filter stream over them).
    _SIZED_PAIRS_CACHE[key] = sized
    return sized


@register("q_dedup_ngram", oracle=_NGRAM_ORACLE)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dup pairs (SpotSigs-style): Jaccard over the
    df-capped shingle signature set — a threshold filter over the shared
    `sized_shingle_pairs` candidate frame (see its docstring for the
    full inverted-index shape and df-cap rationale)."""
    sized = sized_shingle_pairs(spark, sf_dir)
    jac = F.round(
        F.col("ni")
        / (F.col("n_a") + F.col("n_b") - F.col("ni")).cast("double"),
        4,
    )
    return (
        sized.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= _NGRAM_JACCARD)
        .select("a_id", "b_id", "jaccard")
    )


_CONTAIN_MIN = 0.8  # max-containment threshold for subset/quote pairs


_CONTAIN_ORACLE = f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SHINGLES_SQL}) AS s FROM documents
    ),
    dfreq AS (
        SELECT s FROM sh GROUP BY s HAVING count(*) <= {_NGRAM_DF_CAP}
    ),
    rare AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfreq USING (s)),
    sizes AS (SELECT doc_id, count(*) AS n FROM rare GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ni
        FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT a_id, b_id,
           round(ni / least(za.n, zb.n)::DOUBLE, 4) AS containment
    FROM inter
    JOIN sizes za ON za.doc_id = a_id
    JOIN sizes zb ON zb.doc_id = b_id
    WHERE round(ni / least(za.n, zb.n)::DOUBLE, 4) >= {_CONTAIN_MIN}
    """


@register("q_dedup_containment", oracle=_CONTAIN_ORACLE)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT pairs: ni / min(|A|, |B|) ≥ 0.8 — catches
    subset/quote relationships (a short doc embedded in a long one)
    that symmetric Jaccard misses: a 50-shingle doc fully contained in
    a 500-shingle doc has Jaccard ≈ 0.1 but containment 1.0.  The
    asymmetric twin of q_dedup_ngram, sharing its df-capped inverted
    index, posting-list pair generation, and scale posture (the shared
    memoized `sized_shingle_pairs` frame)."""
    sized = sized_shingle_pairs(spark, sf_dir)
    cont = F.round(
        F.col("ni") / F.least(F.col("n_a"), F.col("n_b")).cast("double"), 4
    )
    return (
        sized.withColumn("containment", cont)
        .filter(F.col("containment") >= _CONTAIN_MIN)
        .select("a_id", "b_id", "containment")
    )


# ---------------------------------------------------------------------------
# SimHash

def simhash_bands(d: DataFrame, n_bands: int = _SIMHASH_BANDS) -> DataFrame:
    """(doc_id, b0..b{n-1}): a 16·n_bands-bit SimHash split into
    n_bands×16-bit band values (default 4 → the 64-bit contract; 8 →
    the 128-bit width twin, SURVEY r12).

    Bit k (k = 16*band + i) is the sign of Σ_token-occurrences ±1 where
    a token votes +1 iff ``(char_hash(token) * (2k+3)) % p`` is odd — a
    portable per-(token, bit) pseudo-random bit, TF-weighted since every
    occurrence votes.

    Computed as an Arrow ``mapInPandas`` kernel — a shuffle-free
    scan-side map, like `hyperplane_buckets`: factorize the batch's
    tokens, do the char hash + 64 vote bits ONCE per *unique* token
    (corpora repeat tokens; the per-token work is memoized across
    batches too), then fold per-doc vote sums as a counts-matrix matmul
    (small vocab) or a scatter-add (large vocab).  All arithmetic is
    plain int64, bit-identical to the SQL twin.

    Measured history at sf0.1 (SCALE.md): 64 F.aggregate HOF calls over
    a captured hash array ~46 s (interpreted HOF re-evaluates the array
    per element); explode tokens → one 64-`sum()` hash-agg 3.9 s (but
    shuffles n_tokens rows and re-groups); this kernel removes the
    shuffle entirely."""
    import numpy as np
    import pandas as pd

    n_bits = n_bands * _SIMHASH_BITS
    mult = (2 * np.arange(n_bits, dtype=np.int64) + 3)
    memo: dict = {}

    def votes_for(tok: str):
        v = memo.get(tok)
        if v is None:
            h = 0
            for c in tok:
                h = (h * 31 + ord(c)) % _P
            v = 2 * ((h * mult) % _P % 2) - 1
            memo[tok] = v
        return v

    # r13 (guide §4.2, the minhash_signatures lesson): the V[codes]
    # gather materializes (token-instances × 64) int64 — ~0.5-1 GB per
    # default-size Arrow batch at corpus scale.  Re-chunk to ≤2 000
    # docs per slice (per-doc accumulations are batch-independent, so
    # output is bit-identical); smaller slices also land on the fast
    # bincount path more often.
    chunk_docs = 2000

    def fingerprint(batches):
        for whole in batches:
            for lo in range(0, len(whole), chunk_docs):
                pdf = whole.iloc[lo : lo + chunk_docs]
                yield from _fingerprint_chunk(pdf)

    def _fingerprint_chunk(pdf):
        if len(pdf) == 0:
            return
        toks = (
            pdf["text"].str.lower().str.split(" ").reset_index(drop=True)
        ).explode()
        toks = toks[toks != ""]
        doc_pos = toks.index.to_numpy()
        codes, uniques = pd.factorize(toks.to_numpy())
        V = np.stack([votes_for(t) for t in uniques])
        if len(uniques) <= 2048:
            counts = np.bincount(
                doc_pos * len(uniques) + codes,
                minlength=len(pdf) * len(uniques),
            ).reshape(len(pdf), len(uniques))
            accs = counts @ V
        else:
            accs = np.zeros((len(pdf), n_bits), dtype=np.int64)
            np.add.at(accs, doc_pos, V[codes])
        bits = accs > 0
        out = {"doc_id": pdf["doc_id"].to_numpy()}
        for b in range(n_bands):
            band = np.zeros(len(pdf), dtype=np.int64)
            for i in range(_SIMHASH_BITS):
                band += bits[:, _SIMHASH_BITS * b + i].astype(np.int64) << i
            out[f"b{b}"] = band
        yield pd.DataFrame(out)

    return d.select("doc_id", "text").filter(
        F.col("text").isNotNull()  # NULL text = absent, never a crash
    ).mapInPandas(
        fingerprint,
        ", ".join(["doc_id long"] + [f"b{b} long" for b in range(n_bands)]),
    )


def _simhash_bands_sql() -> str:
    bands = ", ".join(
        f"""list_sum(list_transform(range(0, {_SIMHASH_BITS}),
            i -> CASE WHEN list_sum(list_transform(hlist,
                        h -> 2 * ((h * (2 * (i + {16 * b}) + 3))
                                  % 1000000007 % 2) - 1)) > 0
                 THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS b{b}"""
        for b in range(_SIMHASH_BANDS)
    )
    return f"""
        SELECT doc_id, {bands}
        FROM (
            SELECT doc_id,
                   list_transform({_ALL_TOKENS_SQL},
                                  t -> {_CHAR_HASH_SQL.format(t='t')}) AS hlist
            FROM documents
        )"""


_SIMHASH_WIDE_BANDS = 8      # 8 x 16 = the 128-bit width twin (r12)
_WIDE_HAMMING_MAX = 7        # ~ the 64-bit <=3 similarity cut at 2x width
_SIMHASH_BLOCK_SIZES = (11, 11, 11, 11, 10, 10)   # 6 blocks over 64 bits
_SIMHASH_BLOCK_AGREE = 3                           # Hamming<=3 corrupts <=3 blocks


def _simhash_combinatorial_keys(fp64: Column | None = None) -> list:
    """The C(6,3) = 20 combinatorial band keys over the 64-bit
    fingerprint.

    Split the fingerprint into 6 blocks (4x11 + 2x10 bits); a pair with
    Hamming <= 3 corrupts at most 3 blocks, so it agrees on >= 3 of 6 —
    bucket on every 3-subset of blocks (20 bands, 31-33-bit keys, ~2^32
    band space).  Pigeonhole-complete for <= 3 exactly like 4x16-bit
    banding, but the band space no longer crowds at ~65k docs.

    ``fp64``: the packed 64-bit fingerprint column.  When None the
    packing is inlined from the b0..b3 band columns of
    :func:`simhash_bands` — correct but an ~8x larger expression tree,
    since Catalyst does not CSE the reassembly across the 20 keys
    (measured r12: the inlined form's Generate node alone was a
    multi-hundred-node tree; the registered plan now projects ``fp0``
    once and passes it here, guide §2.3 "project before the
    exchange")."""
    from itertools import combinations

    starts = tuple(
        sum(_SIMHASH_BLOCK_SIZES[:i]) for i in range(len(_SIMHASH_BLOCK_SIZES))
    )
    if fp64 is None:
        # reassemble the 64-bit fingerprint (bit k lives at position k:
        # simhash_bands packs bit 16·b + i at bit i of column b{b})
        fp64 = sum(
            F.shiftleft(F.col(f"b{b}"), _SIMHASH_BITS * b)
            for b in range(_SIMHASH_BANDS)
        )
    blocks = [
        # unsigned shift: b3 >= 2^15 sets bit 63 and an arithmetic
        # shift would sign-extend into every high block
        F.shiftrightunsigned(fp64, starts[m]).bitwiseAND(
            F.lit((1 << _SIMHASH_BLOCK_SIZES[m]) - 1)
        )
        for m in range(len(_SIMHASH_BLOCK_SIZES))
    ]
    return [
        (blocks[i] * F.lit(1 << 22)) + (blocks[j] * F.lit(1 << 11)) + blocks[k]
        for i, j, k in combinations(
            range(len(_SIMHASH_BLOCK_SIZES)), _SIMHASH_BLOCK_AGREE
        )
    ]


def _simhash_pack(n_cols: int) -> list:
    """Packed-fingerprint projection: the 16-bit band columns b0..b{n-1}
    of :func:`simhash_bands` packed 4-per-long into fp0[, fp1] — bit
    16·c + i of the fingerprint lands at bit (16·c + i) mod 64 of word
    (c // 4).  One long instead of four halves the posting payload and
    collapses every downstream band/Hamming expression onto a single
    column (r12 expression-tree fix; see _simhash_combinatorial_keys)."""
    n_packed = (n_cols + 3) // 4
    return [
        sum(
            F.shiftleft(F.col(f"b{4 * p + i}"), _SIMHASH_BITS * i)
            for i in range(min(4, n_cols - 4 * p))
        ).alias(f"fp{p}")
        for p in range(n_packed)
    ]


def _simhash_scheme_keys(scheme: str, n_cols: int) -> list:
    """Band-key expressions over the packed fp0[, fp1] columns, in the
    scheme's canonical band order.  Values are bit-identical to the
    historical per-column forms (classic: band m == column b{m}; wide:
    band m == b{2m} + (b{2m+1} << 16)); only the source columns
    changed, so posting buckets — and therefore candidate and verified
    pair sets — are unchanged."""
    if scheme == "classic":  # band m == 16-bit slice m of fp0
        return [
            F.shiftrightunsigned(F.col("fp0"), _SIMHASH_BITS * m).bitwiseAND(
                F.lit((1 << _SIMHASH_BITS) - 1)
            )
            for m in range(_SIMHASH_BANDS)
        ]
    if scheme == "wide":  # band m == 32-bit slice m of (fp0, fp1)
        return [
            F.shiftrightunsigned(
                F.col(f"fp{m // 2}"), 32 * (m % 2)
            ).bitwiseAND(F.lit((1 << 32) - 1))
            for m in range(n_cols // 2)
        ]
    if scheme == "comb":
        return _simhash_combinatorial_keys(F.col("fp0"))
    raise ValueError(f"unknown simhash banding scheme {scheme!r}")


def _simhash_min_band(xcols: list, scheme: str):
    """Index of the FIRST band on which two fingerprint records agree
    (same enumeration order as the scheme's band keys), computed from
    the pair's PROJECTED xor words x0[, x1] (x{p} = a.fp{p} ^ b.fp{p}).

    Multi-band LSH emits every colliding pair once PER agreeing band —
    an exact duplicate (Hamming 0) agrees on all bands, so the naive
    chain needs a distinct() over a candidate stream inflated by the
    band count (20x combinatorial / 4x classic on the dup-heavy part
    of a corpus — the dominant cost at sf0.1, measured r12).  Keeping
    a pair only where the CURRENT band equals its minimal agreeing
    band makes each pair survive exactly once, turning the distinct
    shuffle into a codegen'd filter.  Band-key equality is block
    equality (keys are injective packings), so "agrees on band c" is
    recomputable from the pair's own fingerprints — no extra state.

    Shape matters twice over: a direct 20-way when-chain re-derives
    the 64-bit xor under every combo term — an expression tree big
    enough to fall out of whole-stage codegen (measured 6.7 s for
    674 k rows).  This form reads the xor WORDS (projected once by
    _simhash_verify_pairs — r12: the previous version re-packed both
    fingerprints from their b-columns and re-xored under every block
    term), derives one block-agreement mask, and maps it through a
    2^n_blocks-entry literal lookup array built driver-side — a
    handful of shifts and one element_at per row.

    Schemes: ``classic`` (4 bands == 16-bit slices of x0), ``comb``
    (20 bands == 3-subsets of 6 blocks of x0), ``wide`` (4 bands ==
    32-bit slices of (x0, x1)).
    """
    from itertools import combinations

    if scheme == "classic":  # band m == 16-bit slice m
        agree = [
            F.shiftrightunsigned(xcols[0], _SIMHASH_BITS * m).bitwiseAND(
                F.lit((1 << _SIMHASH_BITS) - 1)
            )
            == 0
            for m in range(_SIMHASH_BANDS)
        ]
        combos = [(m,) for m in range(_SIMHASH_BANDS)]
    elif scheme == "wide":  # band m == 32-bit slice m of (x0, x1)
        agree = [
            F.shiftrightunsigned(xcols[m // 2], 32 * (m % 2)).bitwiseAND(
                F.lit((1 << 32) - 1)
            )
            == 0
            for m in range(_SIMHASH_WIDE_BANDS // 2)
        ]
        combos = [(m,) for m in range(_SIMHASH_WIDE_BANDS // 2)]
    elif scheme == "comb":  # band c == 3-subset c of the 6 blocks
        starts = tuple(
            sum(_SIMHASH_BLOCK_SIZES[:i])
            for i in range(len(_SIMHASH_BLOCK_SIZES))
        )
        agree = [
            F.shiftrightunsigned(xcols[0], starts[m]).bitwiseAND(
                F.lit((1 << _SIMHASH_BLOCK_SIZES[m]) - 1)
            )
            == 0
            for m in range(len(_SIMHASH_BLOCK_SIZES))
        ]
        combos = list(
            combinations(
                range(len(_SIMHASH_BLOCK_SIZES)), _SIMHASH_BLOCK_AGREE
            )
        )
    else:
        raise ValueError(f"unknown simhash banding scheme {scheme!r}")
    n_blocks = len(agree)

    def min_band_for_mask(mask: int) -> int:
        for idx, combo in enumerate(combos):
            if all(mask & (1 << m) for m in combo):
                return idx
        return -1  # no agreeing band: unreachable for a real collision

    lookup = F.array(
        *[F.lit(min_band_for_mask(mask)) for mask in range(1 << n_blocks)]
    )
    mask_col = sum(
        agree[m].cast("int") * F.lit(1 << m) for m in range(n_blocks)
    )
    return F.element_at(lookup, mask_col + 1)


def _simhash_verify_pairs(
    fp: DataFrame,
    scheme: str,
    n_cols: int = _SIMHASH_BANDS,
    hamming_max: int = _HAMMING_MAX,
) -> DataFrame:
    """Banded-LSH candidate generation + Hamming verify shared by the
    registered combinatorial plan, the classic 4x16 witness, and the
    128-bit width twin.

    Candidates come from per-(band, value) posting lists — ONE shuffle
    keyed by the band value, pairs generated inside each posting row by
    a double explode (the same pattern as q_dedup_minhash /
    q_dedup_ngram).  Each posting element carries the doc's full
    fingerprint, so the Hamming verify reads the exploded pair directly
    AND the minimal-agreeing-band dedup (:func:`_simhash_min_band`)
    replaces the final distinct() with a filter: the whole query is ONE
    linear chain off the Python fingerprint kernel with a single
    shuffle (the posting groupBy) — no self-join, no join-back to fp,
    no pair-stream re-shuffle.

    r12 expression-tree fix (guide §2.3/§7.2): the fingerprint is
    packed 4 band-columns-per-long ONCE (fp0[, fp1] — the posting
    payload drops from 1+n_cols to 1+⌈n_cols/4⌉ longs), every band key
    reads the packed word instead of re-assembling it, and the pair
    stage projects the xor words x{p} = a.fp{p}^b.fp{p} once for both
    the Hamming sum and the min-band mask.  The previous inlined form
    repeated the 4-shiftleft packing under each of the 20 Generate
    keys and 6 more times under the min-band filter — a plan whose
    codegen/compile alone measurably dominated the query at sf0.1
    (6.2-7.2 s in-suite vs ~1.2 s warm re-run)."""
    n_packed = (n_cols + 3) // 4
    fpk = fp.select("doc_id", *_simhash_pack(n_cols))
    rec = F.struct(
        "doc_id", *[F.col(f"fp{p}") for p in range(n_packed)]
    ).alias("rec")
    banded = fpk.select(
        rec,
        F.posexplode(
            F.array(*_simhash_scheme_keys(scheme, n_cols))
        ).alias("band", "value"),
    )
    postings = (
        banded.groupBy("band", "value")
        .agg(F.collect_list("rec").alias("recs"))
        .filter(F.size("recs") >= 2)
    )
    pairs = (
        postings.select("band", F.explode("recs").alias("a"), "recs")
        .select("band", "a", F.explode("recs").alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "band",
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            *[
                F.col(f"a.fp{p}").bitwiseXOR(F.col(f"b.fp{p}")).alias(f"x{p}")
                for p in range(n_packed)
            ],
        )
    )
    xcols = [F.col(f"x{p}") for p in range(n_packed)]
    ham = sum(F.bit_count(x) for x in xcols).cast("long")
    # verify FIRST (bit_count over the projected xor — cheapest), then
    # keep each surviving pair only at its minimal agreeing band
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= hamming_max)
        .filter(F.col("band") == _simhash_min_band(xcols, scheme))
        .select("a_id", "b_id", "hamming")
    )


@register(
    "q_dedup_simhash",
    oracle=f"""
    WITH fp AS ({_simhash_bands_sql()}),
    cand AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM fp a JOIN fp b
          ON a.doc_id < b.doc_id
         AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
    )
    SELECT a_id, b_id, hamming FROM (
        SELECT c.a_id, c.b_id,
               (bit_count(xor(fa.b0, fb.b0)) + bit_count(xor(fa.b1, fb.b1))
                + bit_count(xor(fa.b2, fb.b2))
                + bit_count(xor(fa.b3, fb.b3)))::BIGINT AS hamming
        FROM cand c
        JOIN fp fa ON fa.doc_id = c.a_id
        JOIN fp fb ON fb.doc_id = c.b_id
    )
    WHERE hamming <= {_HAMMING_MAX}
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit TF-weighted Charikar fingerprint,
    combinatorial (Gionis-style) banded-LSH candidate generation,
    Hamming <= 3 verification on candidates.

    Registered plan (round 12, VERDICT r11 #1): C(6,3) = 20 bands over
    3-subsets of 6 fingerprint blocks (~2^32 band space) instead of the
    classic 4x16-bit banding (2^16 band space).  Both are
    pigeonhole-complete for Hamming <= 3, so the verified pair set is
    IDENTICAL (pinned exact-equal vs :func:`simhash_pairs_classic` in
    tests/test_round11.py) and the DuckDB oracle — which enumerates the
    classic candidates, a superset-equivalent route to the same <= 3
    pairs — is unchanged.

    Why the flip: the x100 measured point (SCALE.md) showed the classic
    banding's candidate mass growing x67.6 for x10 docs at 500k docs
    (2.09G candidate pairs) — chance collisions grow n²/2^16 no matter
    how sparse real near-dups are once the corpus passes ~65k docs.
    The combinatorial form trades 20 posting rows per doc instead of 4
    (5x shuffle mass) for a 2^16 → ~2^32 bucket space — the right side
    of that trade everywhere past ~10^5 docs, and band space good to
    ~10^9 docs."""
    fp = simhash_bands(table(spark, sf_dir, "documents"))
    return _simhash_verify_pairs(fp, "comb")


def simhash_pairs_classic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic 4x16-bit-banding SimHash plan — q_dedup_simhash's
    registered form through round 11, demoted to a pytest witness when
    the combinatorial banding took over (VERDICT r11 #1).

    Two docs collide iff >= 1 of the 4 16-bit bands is equal —
    pigeonhole-complete for Hamming <= 3 like the registered
    combinatorial form, so the verified pair set is EQUAL (the pin in
    tests/test_round11.py).  Kept because it is the natural small-corpus
    plan (4 posting rows per doc instead of 20) and because the
    equality pin is the registered plan's exactness proof."""
    fp = simhash_bands(table(spark, sf_dir, "documents"))
    return _simhash_verify_pairs(fp, "classic")


def simhash_pairs_wide(
    spark: SparkSession, sf_dir: str, hamming_max: int = _WIDE_HAMMING_MAX
) -> DataFrame:
    """The 128-bit WIDTH twin (test-only, VERDICT r11 #5): the same
    Charikar vote formula extended to bits 0..127 (8x16-bit columns),
    banded 4x32 (band m == the injective packing of columns 2m, 2m+1),
    Hamming <= 7 verify — ~the 64-bit <=3 similarity cut at twice the
    width (3.5/64 per-bit error rate).

    What the width buys — MEASURED (r12, sf0.001): the twin is a
    PRECISION knob, not a recall knob.  Of the 448 pairs the 64-bit
    <=3 contract emits, 356 (~80%) have second-half Hamming >= 8 —
    their true per-bit disagreement rate is moderate (~0.1) and the
    64-bit <=3 hit was a Binomial lucky draw (P(Binom(64, .1) <= 3) is
    small but the fixture has many moderately-similar pairs to draw
    from); two pairs even have IDENTICAL first 64 bits while differing
    on >= 8 of the second 64.  Doubling the width halves the per-bit
    variance, so the <=7/128 cut (the same nominal rate as 3.5/64)
    rejects those artifacts while keeping every truly-near pair:
    text-identical dups have Hamming 0/128, collide on all four bands,
    and are pinned always-emitted (tests/test_round12.py).  Candidate
    mass also sharpens: a 32-bit band agreement implies far deeper
    agreement than a 16-bit one, so the correlated near-miss candidate
    mass (Hamming 4-6/64 content overlap — 188 k of the 243 k sf0.1
    candidates under any complete 64-bit banding) drops (pinned).

    Because the emitted SET genuinely differs from the 64-bit contract
    (deliberately — the rejected 80% are the false-positive tail),
    this is a NEW semantic: a survey row of its own if ever
    registered, never a flip of q_dedup_simhash.  Recall caveat at the
    margin: 4x32 banding is pigeonhole-complete only for <= 3 of 128,
    so pairs at 4..7/128 with errors spread across all four bands can
    be missed (28 of 448 measured at sf0.001)."""
    fp = simhash_bands(
        table(spark, sf_dir, "documents"), _SIMHASH_WIDE_BANDS
    )
    return _simhash_verify_pairs(
        fp,
        "wide",
        n_cols=_SIMHASH_WIDE_BANDS,
        hamming_max=hamming_max,
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup via hyperplane LSH

def hyperplane_weight(k: int, j: int) -> int:
    """±1 weight of hyperplane k at dimension j — fixed integer formula,
    reproduced verbatim in the oracle SQL (no RNG, engine-portable)."""
    return 2 * ((k * 64 + j) * _HYPER_MIX % _P % 2) - 1


def hyperplane_buckets(
    e: DataFrame, bands: int = _HYPER_BANDS, bits: int = _HYPER_BITS
) -> DataFrame:
    """(vec_id, band, bucket): `bands` LSH bands, each a `bits`-bit
    sign-of-projection bucket over deterministic ±1 hyperplanes.

    Defaults (4×4 = 16 buckets/band) are the fixture calibration the
    registered queries and their oracles pin; at corpus scale `bits`
    must grow ~log2(n) so bucket occupancy stays bounded — measured in
    SCALE.md "ANN calibration": at 200 k vectors the 4-bit default
    makes LSH candidate generation COST MORE THAN BRUTE FORCE (each
    band bucket holds ~n/16), while 12-bit buckets restore the win at
    the same recall.  The weight formula is generic in the hyperplane
    index, so wider configurations stay deterministic.

    Computed as an Arrow ``mapInPandas`` kernel: each batch stacks its
    vectors into an (n × 64) float64 matrix and does ONE ``X @ W``
    matmul against the fixed (64 × 16) hyperplane matrix, then packs
    sign bits into per-band bucket ids.  Embarrassingly parallel — no
    shuffle at all, so at 100 TB this stage is a pure scan-side map.
    Measured alternatives all lose: posexplode → 64-row weight join →
    16-sum hash-agg shuffles n×64 rows and re-groups them (~1.6×
    slower); 16 codegen projections of 64 signed element_at terms each
    blow up planning/compile time (~2× slower); interpreted HOF folds
    re-evaluate captured arrays per element (~5-10× slower)."""
    import numpy as np
    import pandas as pd

    n_hyper = bands * bits
    W = np.array(
        [[float(hyperplane_weight(k, j)) for k in range(n_hyper)] for j in range(64)],
        dtype=np.float64,
    )

    def bucketize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # Sign threshold is 1e-9, not 0: the BLAS matmul here and the
            # oracle's sequential list_sum can differ in the last ulp, and
            # a projection landing exactly on the boundary would flip
            # bucket membership between engines.  Both sides compare
            # against the same epsilon (cf. q_text_quality's tie-nudge).
            signs = (X @ W) > 1e-9
            out = []
            for band in range(bands):
                b = np.zeros(len(pdf), dtype=np.int64)
                for i in range(bits):
                    b += signs[:, band * bits + i].astype(np.int64) << i
                out.append(
                    pd.DataFrame(
                        {"vec_id": pdf["vec_id"], "band": band, "bucket": b}
                    )
                )
            yield pd.concat(out)

    return e.select("vec_id", "embedding").filter(
        F.col("embedding").isNotNull()  # NULL vector = absent
    ).mapInPandas(
        bucketize, "vec_id long, band int, bucket long"
    )


def _hyper_buckets_sql(
    bands: int = _HYPER_BANDS, bits: int = _HYPER_BITS
) -> str:
    """DuckDB twin of hyperplane_buckets as UNION ALL over bands.

    Parameterized by (bands, bits) exactly like the Spark kernel, so a
    wider registered calibration (q_dedup_embed_scaled, 8-bit) gets a
    real hash-checked oracle instead of a rows-only downgrade — the
    hyperplane family is a fixed integer formula, no RNG."""
    parts = []
    for band in range(bands):
        bucket = " + ".join(
            f"""CASE WHEN list_sum(list_transform(range(0, 64),
                 j -> embedding[j + 1]::DOUBLE
                      * (2 * (({band * bits + i} * 64 + j)
                              * {_HYPER_MIX} % 1000000007 % 2) - 1))) > 1e-9
               THEN {1 << i} ELSE 0 END"""
            for i in range(bits)
        )
        parts.append(
            f"SELECT vec_id, {band} AS band, ({bucket})::BIGINT AS bucket"
            " FROM embeddings"
        )
    return " UNION ALL ".join(parts)


# Max members of one (band, bucket) group handed to a single verify
# task.  Buckets above this tile into blocks so one hot bucket (skewed
# hyperplane cell) can never OOM an executor: with T tiles the largest
# matmul is TILE × TILE instead of n_bucket².
_EMBED_TILE = 4096


def _empty_pairs():
    import pandas as pd

    return pd.DataFrame({"a_id": [], "b_id": [], "sim": []}).astype(
        {"a_id": "int64", "b_id": "int64", "sim": "float64"}
    )


def _pairs_frame(ids_a, ids_b, X_a, X_b, within: bool, thresh=None):
    """Near-threshold pairs between two member blocks (one block twice
    when ``within``): a blocked X_a @ X_b.T matmul pre-filters, then the
    few survivors get a sequential-accumulation dot (same left-to-right
    order as DuckDB's list_inner_product) so the value that reaches
    round() is engine-portable, not BLAS-ordering-dependent."""
    import numpy as np
    import pandas as pd

    if thresh is None:
        thresh = _EMBED_SIM
    S = X_a @ X_b.T
    if within:
        ia, ib = np.triu_indices(len(ids_a), k=1)
    else:
        ia = np.repeat(np.arange(len(ids_a)), len(ids_b))
        ib = np.tile(np.arange(len(ids_b)), len(ids_a))
    keep = S[ia, ib] >= thresh - 5e-5
    ia, ib = ia[keep], ib[keep]
    sims = np.empty(len(ia), dtype=np.float64)
    for k in range(len(ia)):
        acc = 0.0
        for x, y in zip(X_a[ia[k]].tolist(), X_b[ib[k]].tolist()):
            acc += x * y
        sims[k] = acc
    lhs, rhs = ids_a[ia], ids_b[ib]
    return pd.DataFrame(
        {
            "a_id": np.minimum(lhs, rhs),
            "b_id": np.maximum(lhs, rhs),
            "sim": sims,
        }
    )


def _tile_pairs(pdf):
    """Per-(band, bucket, ta, tb) exact verify over one tile pair."""
    import numpy as np

    if len(pdf) < 2:
        return _empty_pairs()
    ta, tb = int(pdf["ta"].iat[0]), int(pdf["tb"].iat[0])
    if ta == tb:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        return _pairs_frame(ids, ids, X, X, within=True)
    a = pdf[pdf["tile"] == ta]
    b = pdf[pdf["tile"] == tb]
    if len(a) == 0 or len(b) == 0:
        return _empty_pairs()
    return _pairs_frame(
        a["vec_id"].to_numpy(),
        b["vec_id"].to_numpy(),
        np.stack(a["embedding"].to_numpy()).astype(np.float64),
        np.stack(b["embedding"].to_numpy()).astype(np.float64),
        within=False,
    )


@register(
    "q_dedup_embed",
    oracle=f"""
    WITH bk AS ({_hyper_buckets_sql()}),
    cand AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM bk a JOIN bk b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, sim FROM (
        SELECT c.a_id, c.b_id,
               round(list_inner_product(ea.embedding::DOUBLE[],
                                        eb.embedding::DOUBLE[]) + 1e-9, 4) AS sim
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.a_id
        JOIN embeddings eb ON eb.vec_id = c.b_id
    )
    WHERE sim >= {_EMBED_SIM}
    """,
)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: random-hyperplane LSH candidate
    generation (4 bands × 4 bits; a pair collides iff some band's 4 sign
    bits all agree) + exact cosine ≥ 0.45 verify on candidates only.

    The 100 TB path for vector dedup: candidate volume is
    Σ_buckets |bucket|² / 2 instead of n²/2, and the verify runs as
    blocked BLAS matmuls inside ``applyInPandas``, so no candidate pair
    is ever materialized as a row unless it survives the threshold.
    Vectors attach to bucket rows via a plain equi-join on vec_id — a
    shuffle join at scale (AQE broadcasts it only when the table is
    genuinely small); force-broadcasting the full vector store would
    ship every embedding to every executor.  Over-full buckets (skewed
    hyperplane cells) tile: members hash into ⌈n_bucket/_EMBED_TILE⌉
    blocks and every block pair verifies independently, so the largest
    single task is _EMBED_TILE² regardless of skew (bucket sizes come
    from a tiny (band,bucket) count aggregate, broadcast back — never a
    per-bucket sort).  Rounding carries a +1e-9 nudge on both engines
    so a sim at a .00005 boundary can't round apart.  Recall is the
    standard LSH trade-off (≈1-(1-p^4)^4, p = 1 - θ/π); add bands to
    raise it.

    The verified pair frame is memoized per (application, sf_dir)
    like the MinHash pairs: q_dedup_threshold_sweep consumes it, so a
    session running both pays the hyperplane kernel + tiled verify
    once."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _PAIR_CACHE_LOCK:
        cached = _EMBED_PAIRS_CACHE.get(key)
        if cached is None:
            _evict_dead_sessions(_EMBED_PAIRS_CACHE, key[0])
            cached = _build_embed_pairs(spark, sf_dir).localCheckpoint(
                eager=False
            )
            _EMBED_PAIRS_CACHE[key] = cached
        return cached


def _build_embed_pairs(
    spark: SparkSession,
    sf_dir: str,
    bands: int = _HYPER_BANDS,
    bits: int = _HYPER_BITS,
) -> DataFrame:
    """Candidate generation + tiled exact verify behind
    :func:`q_dedup_embed`.  ``bands``/``bits`` default to the fixture
    calibration the registered oracle pins; at corpus scale ``bits``
    grows ~log₂ n so bucket occupancy stays bounded (the ×100
    measured point showed pair work exactly ×100 for ×10 rows at the
    4-bit default — SCALE.md §"×100 point"; the recall trade per
    configuration is §"ANN calibration").  A wider configuration's
    verified output is a SUBSET of the default's (same verify, fewer
    candidates) — pinned with its recall floor in
    tests/test_round11.py."""
    e = table(spark, sf_dir, "embeddings")
    # bk feeds the size aggregate AND the tiled join — without a cut the
    # hyperplane sign-bit matmul (the Arrow kernel) executes twice per
    # run.  The frame is (vec_id, band, bucket): narrow, bands× the
    # vector count, far smaller than the vectors themselves.
    bk = hyperplane_buckets(e, bands, bits).localCheckpoint(eager=False)
    sizes = bk.groupBy("band", "bucket").agg(F.count("*").alias("n_bucket"))
    ntiles = F.greatest(
        F.lit(1), F.ceil(F.col("n_bucket") / F.lit(_EMBED_TILE))
    ).cast("int")
    tiled = (
        bk.join(F.broadcast(sizes), ["band", "bucket"])
        .withColumn("ntiles", ntiles)
        .withColumn("tile", F.pmod(F.col("vec_id"), F.col("ntiles")).cast("int"))
    )
    # A row in tile t participates in every tile pair (ta ≤ tb) that
    # includes t: (t, tb) for tb ≥ t plus (ta, t) for ta < t — `ntiles`
    # copies per row, which is exactly 1 for buckets within the cap.
    tile_sets = F.concat(
        F.transform(
            F.sequence(F.col("tile"), F.col("ntiles") - 1),
            lambda tb: F.struct(F.col("tile").alias("ta"), tb.alias("tb")),
        ),
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.col("tile")),
                lambda ta: F.struct(ta.alias("ta"), F.col("tile").alias("tb")),
            ),
            lambda s: s["ta"] < s["tb"],
        ),
    )
    pairs = (
        tiled.join(e.select("vec_id", "embedding"), "vec_id")
        .withColumn("tp", F.explode(tile_sets))
        .select(
            "band", "bucket", "vec_id", "embedding", "tile",
            F.col("tp.ta").alias("ta"), F.col("tp.tb").alias("tb"),
        )
        .groupBy("band", "bucket", "ta", "tb")
        .applyInPandas(_tile_pairs, schema="a_id long, b_id long, sim double")
    )
    return (
        pairs.withColumn("sim", F.round(F.col("sim") + F.lit(1e-9), 4))
        .filter(F.col("sim") >= _EMBED_SIM)
        .select("a_id", "b_id", "sim")
        .distinct()
    )


@register(
    "q_dedup_embed_scaled",
    oracle=f"""
    WITH bk AS ({_hyper_buckets_sql(_HYPER_BANDS, _HYPER_BITS_SCALED)}),
    cand AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM bk a JOIN bk b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, sim FROM (
        SELECT c.a_id, c.b_id,
               round(list_inner_product(ea.embedding::DOUBLE[],
                                        eb.embedding::DOUBLE[]) + 1e-9, 4) AS sim
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.a_id
        JOIN embeddings eb ON eb.vec_id = c.b_id
    )
    WHERE sim >= {_EMBED_SIM}
    """,
)
def q_dedup_embed_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at the CORPUS-SCALE band width:
    the same hyperplane-LSH + tiled exact-verify plan as
    :func:`q_dedup_embed`, with 8-bit bands instead of the fixture's
    4-bit calibration (VERDICT r11 #2).

    Why a registered twin: the ×100 measured point (SCALE.md) showed
    pair work at the 4-bit width growing EXACTLY ×100 for ×10 rows
    (n²/2⁴ — a fixed 16-bucket-per-band space is quadratic at any n).
    Band width must grow ~log₂ n for bucket occupancy to stay bounded;
    8 bits is the dial position for ~10⁵-10⁶ vectors (measured 4×+
    candidate-mass reduction on the fixture, tests/test_round11.py).
    The verified output is a SUBSET of the 4-bit output with the
    recall the LSH math predicts (≈1-(1-p⁸)⁴) — the fixture pin keeps
    a 40% recall floor; production raises `bands` to buy recall back
    at the wider width.

    The oracle is the SAME deterministic hyperplane family widened to
    8 bits — hash-checked, not rows-only, because the weight formula
    `hyperplane_weight(k, j)` is pure integer arithmetic reproduced in
    SQL."""
    return _build_embed_pairs(
        spark, sf_dir, bands=_HYPER_BANDS, bits=_HYPER_BITS_SCALED
    )


# ---------------------------------------------------------------------------
# dedup cluster assignment (connected components over near-dup pairs)

_CC_MAX_ITERS = 20
# Edge-count ceiling for the driver-local union-find fast path; above
# it the distributed min-label supersteps run.  100k 16-byte pairs is a
# ~2 MB driver pull — far under any broadcast threshold.
_CC_LOCAL_EDGES = 100_000


@register(
    "q_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_NGRAM_ORACLE}),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION ALL
        SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document assignment: connected components over the
    n-gram near-dup pair graph — every doc gets the MIN doc_id of its
    duplicate cluster (singletons get themselves).  This is the step
    that turns pairwise dedup output into an actionable keep/drop list
    for a training-data mix.

    Iterative min-label propagation as DataFrame ops: each superstep
    joins labels to the (symmetric) edge list, takes the per-node min
    of own + neighbor labels, and checks convergence via the label-sum
    invariant (labels only decrease; equal sum ⇒ fixpoint).  One
    driver-side scalar read per superstep — the standard Pregel
    conduct, not a collect of data.  Lineage is truncated per step with
    localCheckpoint so plan depth stays O(1).  Near-dup clusters are
    dense (band collisions link most members pairwise), so convergence
    takes ~2-3 supersteps; a worst-case long-path graph would switch to
    the alternating large-star/small-star formulation (O(log n)
    supersteps, same join shapes).  Oracle: DuckDB recursive CTE over
    the identical pair graph.
    """
    d = table(spark, sf_dir, "documents")
    nodes = d.select(F.col("doc_id").alias("node"))
    labels = ngram_component_labels(spark, sf_dir)
    return (
        nodes.join(labels, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("lbl", "node").alias("cluster_id"),
        )
    )


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iters: int = _CC_MAX_ITERS
) -> DataFrame:
    """Min-label connected components over an undirected pair graph.

    ``nodes``: one column ``node`` (every vertex, including isolated
    ones); ``pairs``: columns ``a_id``/``b_id``.  Returns (node, lbl)
    where lbl = min node id of the component.  See q_dedup_clusters for
    the superstep mechanics and scale notes.

    The supersteps run over ``component_labels`` — i.e. only the nodes
    that appear in an edge.  Isolated nodes (the overwhelming majority
    of a corpus under near-dup thresholds) never enter the iteration;
    they are labeled by a single left join at the end."""
    labels = component_labels(pairs, max_iters=max_iters)
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("lbl", "node").alias("lbl")
    )


def component_labels(
    pairs: DataFrame,
    max_iters: int = _CC_MAX_ITERS,
    algorithm: str = "propagation",
    local_threshold: int = _CC_LOCAL_EDGES,
) -> DataFrame:
    """Min-label propagation restricted to edge-endpoint nodes.

    ``algorithm="star"`` switches to the alternating large-star/
    small-star formulation (component_labels_star) — O(log n)-ish
    supersteps on ANY graph shape vs propagation's O(diameter).
    Near-dup graphs are dense (2-3 supersteps), so propagation is the
    default; the star fallback is for pathological long-path graphs.

    Returns (node, lbl) for every node with degree ≥ 1 only.  Each
    superstep shuffles O(|E|) rows — the dup-pair graph, not the corpus
    — so the iteration cost is bound by the near-dup rate, not the
    table size (at 100 TB the pair graph is orders of magnitude smaller
    than the document set).

    Execution contract: EAGER.  The pair frame is materialized at call
    time (localCheckpoint + size probe) to pick the local-vs-superstep
    path; below ``local_threshold`` edges the returned frame is a
    driver-materialized createDataFrame.  Callers must pass exactly the
    two edge-endpoint columns (``a_id``, ``b_id``); extras raise."""
    if algorithm == "star":
        return component_labels_star(pairs, max_iters=max_iters)
    if algorithm != "propagation":
        raise ValueError(f"unknown CC algorithm: {algorithm!r}")
    # Size-adaptive local fast path: near-dup pair graphs are orders of
    # magnitude smaller than the corpus, and below _CC_LOCAL_EDGES the
    # distributed supersteps pay 4-6 jobs of fixed overhead to shuffle
    # a frame that fits in one driver pandas batch — union-find those
    # locally (the adaptive local-execution escape hatch graph engines
    # use for small components).  Above the threshold: supersteps.
    if set(pairs.columns) != {"a_id", "b_id"}:
        raise ValueError(
            "component_labels expects exactly columns a_id/b_id, got "
            f"{pairs.columns}"
        )
    # One job decides the path AND delivers the local edge list: the
    # LAZY checkpoint persists whatever partitions the limit probe
    # computes (the distributed path below finishes the rest without
    # recomputing them), and when the probe comes back under the
    # threshold its frame IS the complete edge list — no separate
    # count job, no second toPandas scan (VERDICT r4 #3: the former
    # eager-checkpoint + count + toPandas tripled the fixed job
    # overhead on the common small-graph path).
    pairs = pairs.select("a_id", "b_id").localCheckpoint(eager=False)
    pdf = pairs.limit(local_threshold + 1).toPandas()
    if len(pdf) <= local_threshold:
        # name-addressed, not positional — a reordered projection must
        # not silently swap edge endpoints (ADVICE r4)
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["a_id"], pdf["b_id"]):
            a, b = int(a), int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = [(n, find(n)) for n in parent]
        spark = pairs.sparkSession
        if not rows:
            return spark.createDataFrame([], "node long, lbl long")
        return spark.createDataFrame(rows, "node long, lbl long")
    edges = pairs.unionByName(
        pairs.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    edges = edges.localCheckpoint(eager=True)

    # Superstep 1 needs no join: the initial labels are the identity, so
    # the propagated neighbor-min is just min(src) per dst — and because
    # the edge list is symmetric, grouping by dst also enumerates every
    # degree-≥1 node, replacing a separate distinct() pass.  One shuffle
    # seeds the iteration one hop ahead.
    labels = (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(F.min("src").alias("nmin"))
        .select("node", F.least(F.col("node"), F.col("nmin")).alias("lbl"))
        .localCheckpoint(eager=True)
    )
    def one_hop(lbls: DataFrame) -> DataFrame:
        prop = (
            edges.join(lbls, edges.src == lbls.node)
            .groupBy("dst")
            .agg(F.min("lbl").alias("nlbl"))
        )
        return lbls.join(prop, lbls.node == prop.dst, "left").select(
            "node",
            F.least(
                F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
            ).alias("lbl"),
        )

    prev_sum = labels.agg(F.sum("lbl")).collect()[0][0]
    for _ in range(max_iters):
        # TWO hops per checkpointed superstep: the checkpoint + scalar
        # convergence collect dominate wall time at toy scale (fixed job
        # overhead ≫ the O(|E|) shuffle), so batching two propagations
        # between cuts halves that overhead for diameter > 1 graphs; a
        # converged graph pays one extra no-op join, nothing more.  The
        # fixpoint is unchanged — min-label propagation is monotone, so
        # any propagation schedule reaches the same labels.
        labels = one_hop(one_hop(labels)).localCheckpoint(eager=True)
        new_sum = labels.agg(F.sum("lbl")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def component_labels_star(
    pairs: DataFrame, max_iters: int = _CC_MAX_ITERS
) -> DataFrame:
    """Alternating large-star/small-star connected components (the
    MapReduce CC construction of Kiveris et al., "Connected Components
    in MapReduce and Beyond", SoCC 2014) — the documented fallback for
    pathological long-path graphs where min-label propagation needs
    O(diameter) supersteps.

    Each round rewrites the undirected edge set with two neighborhood-
    min operations (each one groupBy + join over O(|E|) rows):
      * large-star(u): every neighbor v > u re-attaches to
        m = min(Γ(u) ∪ {u});
      * small-star(u): every neighbor v ≤ u (and u itself) attaches
        to m.
    The edge set converges to a star forest rooted at each component's
    min node in O(log² n) rounds (O(log n) observed); labels are then
    read straight off the star edges.  Returns (node, lbl) for
    degree-≥1 nodes only, exactly like component_labels."""
    # canonical undirected orientation (u < v); self-pairs drop out
    e = (
        pairs.select(
            F.least("a_id", "b_id").alias("u"),
            F.greatest("a_id", "b_id").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(edges: DataFrame) -> DataFrame:
        return edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def _canon(emitted: DataFrame) -> DataFrame:
        return (
            emitted.select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _checksum(edges: DataFrame):
        row = edges.agg(
            F.count("*").alias("n"),
            # xor-fold, not sum: ANSI mode makes a long sum of 2^63-range
            # hashes an overflow error
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _checksum(e)
    for _ in range(max_iters):
        # large-star: neighbors v > u hook onto u's neighborhood min
        sym = _sym(e)
        nmin = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = _canon(
            sym.filter(F.col("v") > F.col("u"))
            .join(nmin, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        # small-star: neighbors v ≤ u (plus u) hook onto the min
        sym = _sym(large)
        nmin = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        small = _canon(
            sym.filter(F.col("v") < F.col("u"))
            .join(nmin, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(
                nmin.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
        ).localCheckpoint(eager=True)
        cur = _checksum(small)
        e = small
        if cur == prev:
            break
        prev = cur
    # fixpoint = star forest with canonical edges (root, v): the u side
    # is the component min.  Roots label themselves.
    return (
        e.select(F.col("v").alias("node"), F.col("u").alias("lbl"))
        .unionByName(
            e.select(F.col("u").alias("node"), F.col("u").alias("lbl"))
        )
        .groupBy("node")
        .agg(F.min("lbl").alias("lbl"))
    )


@register(
    "q_dedup_paragraph",
    oracle="""
    WITH ch AS (
        SELECT doc_id, substring(text, CAST(s AS INTEGER), 40) AS chunk
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(1, n_chars, 40)) AS s
            FROM documents WHERE n_chars >= 1
        )
    ),
    freq AS (
        SELECT chunk, count(DISTINCT doc_id) AS nd
        FROM ch GROUP BY chunk
    )
    SELECT ch.doc_id,
           cast(count(*) AS BIGINT) AS n_chunks,
           cast(sum(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_chunks,
           round(sum(CASE WHEN f.nd > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*) + 1e-9, 4) AS dup_frac
    FROM ch JOIN freq f USING (chunk)
    GROUP BY ch.doc_id
    """,
)
def q_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (the C4 recipe: dedup at PARAGRAPH
    granularity, not document granularity — boilerplate and quoted
    passages repeat across pages whose full texts differ).  Documents
    are segmented into fixed 40-char paragraphs (the synthetic corpus
    has no newlines; a real corpus splits on '\\n\\n' with the same
    plan); a paragraph is duplicated when it appears in >1 distinct
    document.  Output: the per-doc cleaning manifest — total segments,
    duplicated segments, duplicated fraction — that the curation
    pipeline uses to strip or down-weight docs.

    Shape: narrow Generate (sequence+substring, codegen) → ONE hash agg
    on the paragraph text (count distinct doc, map-side combined) →
    equi-join back on the paragraph key → per-doc hash agg.  Nothing
    quadratic: cost is O(total segments).  At 100 TB the group/join key
    becomes xxhash64(paragraph) so the shuffle carries 8-byte keys
    instead of strings — same plan, smaller exchange (kept as the raw
    string here for cross-engine oracle parity)."""
    # Empty docs: Spark's sequence(1, 0, 40) throws where DuckDB's
    # generate_series returns empty — filter them out on BOTH sides so
    # the edge is a no-op, not a crash/divergence (ADVICE r4).
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 1)
    s = F.explode(
        F.sequence(
            F.lit(1).cast("long"), F.col("n_chars"), F.lit(40).cast("long")
        )
    ).alias("s")
    ch = d.select("doc_id", "text", s).select(
        "doc_id", F.expr("substring(text, CAST(s AS INT), 40)").alias("chunk")
    )
    freq = ch.groupBy("chunk").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    dup = F.when(F.col("nd") > 1, 1).otherwise(0)
    return (
        ch.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(dup).cast("bigint").alias("n_dup_chunks"),
            F.round(
                F.sum(dup) / F.count("*") + F.lit(1e-9), 4
            ).alias("dup_frac"),
        )
    )


# --- SemDeDup: per-cluster dense semantic near-dup ---------------------------

# Cosine threshold for "semantically duplicate" within a cluster.  Low
# because the synthetic embeddings are near-orthogonal (max pairwise
# ~0.47); a real corpus uses ~0.95+ unchanged through the same plan.
_SEM_SIM = 0.30


def _sem_pairs(pdf):
    """Per-cluster kernel: dense G @ G.T over one cluster's members
    (the SemDeDup inner loop), portable-dot re-verify for survivors."""
    if len(pdf) < 2:
        return _empty_pairs()
    import numpy as np

    pdf = pdf.sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return _pairs_frame(ids, ids, X, X, within=True, thresh=_SEM_SIM)


@register(
    "q_dedup_semantic",
    oracle=f"""
    SELECT a.vec_id AS kept_id, b.vec_id AS dup_id,
           round(list_inner_product(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 4) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_inner_product(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 4) >= {_SEM_SIM}
    """,
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic near-dup
    removal scoped WITHIN pre-assigned clusters — pairwise cosine only
    among members of the same cluster, keep the lowest id of each
    over-threshold pair. Cluster = the fixture `label` (stand-in for the
    k-means assignment step, which q_embed_kmeans provides).

    Shape: ONE shuffle to group by cluster, then an applyInPandas dense
    G@G.T per cluster — exactly the paper's per-cluster inner loop. The
    matmul pre-filters with slack; survivors are re-verified with a
    sequential-accumulation dot so the rounded value is engine-portable.
    At 100 TB, cluster size is bounded by the k-means k (paper uses
    k≈√n); an over-big cluster tiles through the same `_tile_pairs`
    machinery as q_dedup_embed (bucket → _EMBED_TILE blocks)."""
    e = table(spark, sf_dir, "embeddings")
    pairs = (
        e.select("label", "vec_id", "embedding")
        .filter(F.col("embedding").isNotNull())  # NULL vector = absent
        .groupBy("label")
        .applyInPandas(
            lambda pdf: _sem_pairs(pdf),
            "a_id long, b_id long, sim double",
        )
    )
    return (
        pairs.select(
            F.col("a_id").alias("kept_id"),
            F.col("b_id").alias("dup_id"),
            F.round("sim", 4).alias("sim"),
        )
        .filter(F.col("sim") >= _SEM_SIM)
    )


_XSRC_ORACLE = f"""
    WITH sh AS (
        SELECT DISTINCT source, unnest({_SHINGLES_SQL}) AS s
        FROM documents
    ),
    sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.source <> b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b,
           CAST(i.shared AS BIGINT) AS shared_shingles,
           CAST(zb.n AS BIGINT) AS n_b,
           round(i.shared * 1e0 / zb.n + 1e-9, 4) AS containment
    FROM inter i JOIN sizes zb ON zb.source = i.src_b
    """


@register("q_dedup_cross_source", oracle=_XSRC_ORACLE)
def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source containment matrix: for every ordered source pair
    (A, B), the fraction of B's distinct 3-gram shingles that also
    occur in A — the "is crawl B mostly crawl A?" readout that decides
    whether a new source is worth ingesting BEFORE any doc-level
    dedup runs (q_dedup_containment's question lifted from documents
    to corpora).

    Shape: one shingle explode → distinct (source, shingle) frame →
    per-shingle source posting lists (≤|sources| elements, bounded by
    the source catalog, not the corpus) → pairs by double explode
    INSIDE each posting row (the q_dedup_ngram conduct — never a raw
    self-join on the shingle key) → one pair-keyed count +  a
    broadcast sizes join.  Output is |sources|² rows at any scale."""
    d = table(spark, sf_dir, "documents")
    sh = d.select(
        "source", F.explode(shingles()).alias("s")
    ).distinct()
    postings = sh.groupBy("s").agg(
        F.collect_set("source").alias("srcs")
    )
    # KEEP the diagonal through the pair aggregate (r12): the (src,
    # src) count is exactly that source's distinct-shingle size, so
    # the per-source sizes ride the same ≤|sources|²-row frame instead
    # of a second scan→explode→distinct pass feeding a separate
    # groupBy + broadcast join (the shared-subtree trap: `sh` as two
    # consumers re-ran the expensive distinct twice — executed plan
    # went 2 scans / 4 Exchange to 1 scan / 2 Exchange, where the new
    # second Exchange is a window over the bounded pair matrix).
    allp = (
        postings.select(F.explode("srcs").alias("src_a"), "srcs")
        .select("src_a", F.explode("srcs").alias("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("shared"))
    )
    w_b = Window.partitionBy("src_b")
    return (
        allp.withColumn(
            "n_b",
            F.max(
                F.when(F.col("src_a") == F.col("src_b"), F.col("shared"))
            ).over(w_b),
        )
        .filter(F.col("src_a") != F.col("src_b"))
        .select(
            "src_a",
            "src_b",
            F.col("shared").cast("bigint").alias("shared_shingles"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("shared") / F.col("n_b") + F.lit(1e-9), 4
            ).alias("containment"),
        )
    )


@register(
    "q_dedup_cluster_sizes",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_NGRAM_ORACLE}),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION ALL
        SELECT b_id AS src, a_id AS dst FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    clusters AS (
        SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
    ),
    by_cluster AS (
        SELECT cluster_id, count(*) AS sz FROM clusters GROUP BY cluster_id
    )
    SELECT cast(sz AS BIGINT) AS cluster_size,
           cast(count(*) AS BIGINT) AS n_clusters,
           cast(sz * count(*) AS BIGINT) AS n_docs
    FROM by_cluster GROUP BY sz ORDER BY sz
    """,
)
def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the curation readout layered
    on q_dedup_clusters: how many clusters of each size exist and how
    many documents they hold.  This is the number a data card quotes
    ("92% of docs are singletons; the largest dup cluster has 14
    copies") and the input to a dedup-rate budget: docs removable by
    keep-one-per-cluster = Σ over sizes (n_docs − n_clusters).

    Shape: the cluster assignment reuses q_dedup_clusters (which itself
    reads the memoized shared shingle-pair frame, so in a session that
    already ran any dedup consumer the pair stage is free) → one agg to
    cluster sizes (shuffle keyed by cluster_id, O(corpus) rows but
    map-side combined) → one agg over the ≤max-size distinct sizes.
    At 100 TB both reduces are bounded: the first by document count,
    the second by the largest cluster size (tiny).  Oracle: the same
    recursive-CTE components aggregated twice."""
    clusters = q_dedup_clusters(spark, sf_dir)
    by_cluster = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("sz")
    )
    return (
        by_cluster.groupBy("sz")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .select(
            F.col("sz").cast("bigint").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


@register(
    "q_dedup_threshold_sweep",
    oracle=f"""
    WITH bk AS ({_hyper_buckets_sql()}),
    cand AS (
        SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        FROM bk a JOIN bk b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id
    ),
    pairs AS (
        SELECT sim FROM (
            SELECT round(list_inner_product(ea.embedding::DOUBLE[],
                                            eb.embedding::DOUBLE[])
                         + 1e-9, 4) AS sim
            FROM cand c
            JOIN embeddings ea ON ea.vec_id = c.a_id
            JOIN embeddings eb ON eb.vec_id = c.b_id
        ) WHERE sim >= {_EMBED_SIM}
    ),
    thr AS (SELECT unnest([0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.8, 0.9])
                AS threshold)
    SELECT t.threshold,
           CAST(count(p.sim) AS BIGINT) AS n_pairs,
           round(avg(p.sim) + 1e-9, 4) AS mean_sim
    FROM thr t LEFT JOIN pairs p ON p.sim >= t.threshold
    GROUP BY t.threshold ORDER BY t.threshold
    """,
)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dedup threshold sensitivity: cumulative near-dup pair
    counts at a grid of cosine cutoffs over the verified candidate set
    — the curve that picks the production threshold (too low merges
    distinct docs, too high keeps near-copies; the knee is the
    operating point).  Counts below the LSH design threshold
    (_EMBED_SIM) are not reported — candidate recall is only
    guaranteed above it.

    Shape: reuses q_dedup_embed's bucketed candidate + verify plan
    (never an all-pairs product); the sweep is the verified pair frame
    × an 8-row threshold grid — bounded both sides."""
    pairs = q_dedup_embed(spark, sf_dir).select("sim")
    thr = pairs.sparkSession.createDataFrame(
        [(t,) for t in (0.45, 0.5, 0.55, 0.6, 0.65, 0.7, 0.8, 0.9)],
        "threshold double",
    )
    return (
        F.broadcast(thr)
        .join(pairs, pairs["sim"] >= thr["threshold"], "left")
        .groupBy("threshold")
        .agg(
            F.count("sim").cast("bigint").alias("n_pairs"),
            F.round(F.avg("sim") + F.lit(1e-9), 4).alias("mean_sim"),
        )
        .orderBy("threshold")
    )


# --- winnowing (MOSS local fingerprinting) --------------------------------

_WIN_W = 4          # winnowing window (consecutive k-gram hashes)
_WIN_SHARED = 2     # min shared fingerprints to report a pair
_WIN_FP_DF_CAP = 100


@register(
    "q_dedup_winnowing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    grams AS (
        SELECT doc_id, i AS pos,
               list_reduce(list_transform(
                   string_split(array_to_string(ws[i:i+2], ' '), ''),
                   c -> ascii(c)::BIGINT),
                   (a, x) -> (a * 31 + x) % {_P}) AS h
        FROM toks, unnest(range(1, greatest(len(ws) - 1, 2))) AS t(i)
    ),
    fps AS (
        SELECT DISTINCT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {_WIN_W - 1} FOLLOWING) AS fp
        FROM grams
    ),
    capped AS (
        SELECT fp FROM fps GROUP BY fp
        HAVING count(*) <= {_WIN_FP_DF_CAP}
    ),
    rare AS (SELECT fps.doc_id, fps.fp FROM fps JOIN capped USING (fp)),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               count(*) AS shared_fp
        FROM rare a JOIN rare b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT a_id, b_id, CAST(shared_fp AS BIGINT) AS shared_fp
    FROM pairs WHERE shared_fp >= {_WIN_SHARED}
    """,
)
def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS local-fingerprinting
    algorithm): per document, take the POSITIONAL sequence of 3-gram
    hashes, slide a w=4 window, keep each window's minimum — the
    guarantee is that any shared substring of ≥ w+k−1 tokens yields at
    least one shared fingerprint, making this the partial-overlap
    detector (plagiarism / quote / template reuse) that whole-document
    MinHash misses.  Pairs sharing ≥ 2 df-capped fingerprints are
    reported with their shared count.  (Tail-inclusive variant:
    windows at every position including partial tails — identical
    frame semantics on both engines.)

    Shape: fingerprints come from an Arrow ``mapInPandas`` kernel
    (the minhash_signatures pattern — shuffle-free scan-side map:
    positional gram hashes with the shared portable char-fold hash,
    memoized per unique gram; the w-window min as one vectorized
    sliding-window reduction; per-doc distinct) — the interpreted
    per-char HOF fold was measured 25× slower.  Candidategeneration is the same df-capped inverted-index equi-join as
    q_dedup_ngram — never an all-pairs product.  At 100 TB fingerprint
    density is |tokens|/w per doc (w tunes index size)."""
    import numpy as np
    import pandas as pd

    memo: dict = {}

    def gram_hash(s: str) -> int:
        h = memo.get(s)
        if h is None:
            h = 0
            for c in s:
                h = (h * 31 + ord(c)) % _P
            memo[s] = h
        return h

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_doc, out_fp = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = text.lower().split(" ")
                m = max(len(words) - 2, 1)
                hs = np.fromiter(
                    (
                        gram_hash(" ".join(words[i : i + 3]))
                        for i in range(m)
                    ),
                    dtype=np.int64,
                    count=m,
                )
                # tail-inclusive w-window min: pad with +inf so the
                # last w-1 windows shrink, matching the SQL frame
                pad = np.full(_WIN_W - 1, np.iinfo(np.int64).max)
                sw = np.lib.stride_tricks.sliding_window_view(
                    np.concatenate([hs, pad]), _WIN_W
                )
                fps = np.unique(sw.min(axis=1))
                out_doc.extend([doc_id] * len(fps))
                out_fp.extend(fps.tolist())
            yield pd.DataFrame({"doc_id": out_doc, "fp": out_fp})

    d = table(spark, sf_dir, "documents")
    fps = d.select("doc_id", "text").filter(
        F.col("text").isNotNull()  # NULL text = absent
    ).mapInPandas(
        kernel, "doc_id long, fp long"
    )
    fps = fps.localCheckpoint(eager=False)
    capped = fps.groupBy("fp").agg(F.count("*").alias("dfreq")).filter(
        F.col("dfreq") <= _WIN_FP_DF_CAP
    )
    rare = fps.join(capped.select("fp"), "fp")
    a = rare.select(F.col("doc_id").alias("a_id"), "fp")
    b = rare.select(F.col("doc_id").alias("b_id"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").cast("bigint").alias("shared_fp"))
        .filter(F.col("shared_fp") >= _WIN_SHARED)
    )


def _capture_recapture_oracle() -> str:
    from polybot_data_etl_spark.functions.text import _minhash_oracle

    return f"""
    WITH mh AS (
        SELECT a_id, b_id FROM ({_minhash_oracle()})
    ),
    ng AS (
        SELECT a_id, b_id FROM ({_NGRAM_ORACLE})
    ),
    counts AS (
        SELECT (SELECT count(*) FROM mh) AS n1,
               (SELECT count(*) FROM ng) AS n2,
               (SELECT count(*) FROM mh
                JOIN ng ON ng.a_id = mh.a_id AND ng.b_id = mh.b_id) AS m
    )
    SELECT CAST(n1 AS BIGINT) AS n_minhash,
           CAST(n2 AS BIGINT) AS n_ngram,
           CAST(m AS BIGINT) AS n_both,
           round((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1 + 1e-9, 2)
               AS chapman_total,
           round(n1 / ((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1)
                 + 1e-9, 4) AS coverage_minhash,
           round(n2 / ((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1)
                 + 1e-9, 4) AS coverage_ngram
    FROM counts
    """


@register("q_dedup_capture_recapture", oracle=_capture_recapture_oracle())
def q_dedup_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture estimate of the TRUE near-duplicate pair
    count: treat the MinHash-LSH pairs and the shingle-index n-gram
    pairs as two independent 'captures' of the same underlying
    duplicate population and apply the Chapman estimator
    N̂ = (n1+1)(n2+1)/(m+1) − 1 — the ecology trick that tells you how
    many near-dup pairs BOTH methods miss (each method's coverage =
    its count / N̂), turning two imperfect dedup passes into a
    defensible completeness number for the data card.

    Shape: reuses both registered pair plans (bucketed candidate
    generation on each side), one pair-keyed join for the overlap,
    three 1-row counts → closed-form algebra.  The two pair families
    are INDEPENDENT job DAGs, so their cold materialization (each
    behind its family's memoized checkpoint) is forced from two
    threads and overlaps in the scheduler (VERDICT r5 #7) — the
    first-consumer cost drops from sum to max of the two cold stages;
    warm consumers hit both caches and the forcing count is a ~ms
    scan of the tiny materialized pair blocks.  (Round 8: the old
    extra eager localCheckpoint per side duplicated blocks the
    parents' memo checkpoints already hold — the count() action keeps
    the cold-overlap property without the copy.)"""
    from concurrent.futures import ThreadPoolExecutor

    from polybot_data_etl_spark.functions.text import q_dedup_minhash

    with ThreadPoolExecutor(max_workers=2) as pool:
        mh_f = pool.submit(lambda: q_dedup_minhash(spark, sf_dir).count())
        ng_f = pool.submit(lambda: q_dedup_ngram(spark, sf_dir).count())
        mh_f.result(), ng_f.result()
    # ONE full-outer join + ONE aggregate computes all three counts
    # (r12): the old shape ran the minhash pair tail twice (semi-join
    # probe + its own count), the ngram tail twice, three 1-row count
    # jobs and two crossJoins — each pair family's post-checkpoint
    # explode²+join tail re-executes per consumer, so halving the
    # consumers halves the exec-side work.  Pair frames are unique by
    # construction on (a_id, b_id), so the outer join is 1:1 and
    # sum-of-markers == the old count(*)s exactly.
    mh = (
        q_dedup_minhash(spark, sf_dir)
        .select("a_id", "b_id")
        .withColumn("in_mh", F.lit(1))
    )
    ng = (
        q_dedup_ngram(spark, sf_dir)
        .select("a_id", "b_id")
        .withColumn("in_ng", F.lit(1))
    )
    c = (
        mh.join(ng, ["a_id", "b_id"], "full_outer")
        .agg(
            F.coalesce(F.sum("in_mh"), F.lit(0)).alias("n1"),
            F.coalesce(F.sum("in_ng"), F.lit(0)).alias("n2"),
            F.coalesce(
                F.sum(F.col("in_mh") * F.col("in_ng")), F.lit(0)
            ).alias("m"),
        )
    )
    n1, n2, m = F.col("n1"), F.col("n2"), F.col("m")
    nhat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1
    # try_divide: on an empty/duplicate-free corpus N̂ = 0 and the
    # coverage ratios are undefined — NULL, not an ANSI
    # DIVIDE_BY_ZERO crash (round-6 empty-input audit); on any corpus
    # with pairs N̂ > 0 and this is a plain division (oracle parity
    # unchanged).
    return c.select(
        n1.cast("bigint").alias("n_minhash"),
        n2.cast("bigint").alias("n_ngram"),
        m.cast("bigint").alias("n_both"),
        F.round(nhat + F.lit(1e-9), 2).alias("chapman_total"),
        F.round(F.try_divide(n1, nhat) + F.lit(1e-9), 4).alias(
            "coverage_minhash"
        ),
        F.round(F.try_divide(n2, nhat) + F.lit(1e-9), 4).alias(
            "coverage_ngram"
        ),
    )
