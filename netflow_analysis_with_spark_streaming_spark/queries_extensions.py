"""LLM-pipeline extension corpus (SURVEY.md §2.9): dedup, similarity
search, text analysis over `documents` / `embeddings`.

Oracle strategy: hashing uses md5 (bit-identical in DuckDB) so MinHash
signatures, SimHash and fingerprints are *exactly* differential-tested
— not rows-only. Jaccard values are ratios of integers (identical
doubles in both engines). Only the LSH-bucketed ANN variant is
rows-only (its recall is property-tested in tests/test_extensions.py).

Scale notes inline; the common theme: never all-pairs. Candidate
generation is always a bucket/band equi-join (LSH banding, shingle
inverted index) so the join key distributes and AQE can split skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import tables
from .functions import text as T
from .functions import vectors as V
from .queries import register

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
_ROWS_PER_BAND = N_MINHASH // N_BANDS

# DuckDB-side mirrors of the Spark tokenization (single normalization
# for both engines: trim, collapse whitespace, split on single space).
# list_filter: empty/whitespace-only text must tokenize to [] not ['']
# — mirrors functions/text.words exactly
_WORDS_SQL = (
    "list_filter(string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' '),"
    " w -> w <> '')"
)
_SHINGLES_CTE = f"""
toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle
  FROM toks, unnest(range(1, len(w) - 1)) t(i)
)
"""


# --- Exact deduplication ---------------------------------------------------


def _dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep the lowest doc_id per identical text.

    Scale: hash-groupBy on text shuffles once on the text hash; at
    100 TB group on fingerprint(text) instead (fixed-width key,
    same result, 1/100 the shuffle bytes) — that variant is
    dedup_fingerprint below.
    """
    docs = tables.load(spark, "documents", sf_dir)
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select("keep_doc_id", "n_copies")
        .orderBy("keep_doc_id")
    )


_DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text ORDER BY keep_doc_id
"""


def _dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint dedup: md5 of normalized text as the group key —
    the fixed-width-key variant of exact dedup (the 100 TB shape)."""
    docs = tables.load(spark, "documents", sf_dir)
    return (
        docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_doc_id")
    )


_DEDUP_FINGERPRINT_SQL = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
       MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY keep_doc_id
"""


# --- MinHash LSH near-dup --------------------------------------------------


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct pairs — the inverted-index base.

    Words are materialized into a column before shingling so the
    tokenizer runs once per document, not once per lambda element.

    Distinct via per-row ``array_distinct`` BEFORE the explode (round
    15, guide §2.4): a (doc_id, shingle) pair is unique iff the
    shingle is unique within its own document, so the global
    ``.distinct()`` — a full shuffle of every wide (doc_id,
    shingle-string) row — was deduplicating rows that only ever
    collide inside one array. Same rows out, zero exchanges."""
    return docs.select(
        "doc_id", T.words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.explode(F.array_distinct(T.shingles_from_words(F.col("w"), 3))).alias(
            "shingle"
        ),
    )


def _dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: sig_i = min over shingles of h_i(shingle).

    Computed per ROW — array_min over the doc's hashed shingle array
    (round 15; see _minhash_sig_frame): the signature is a
    per-document quantity, so no explode and no groupBy(doc_id)
    shuffle exist anymore. The k hashes derive from ONE md5 via an
    affine family (k md5 calls measured ~5x slower); md5 base makes
    it exactly oracle-checked.
    """
    return _minhash_sig_frame(spark, sf_dir).orderBy("doc_id")


def _minhash_sig_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature frame WITHOUT the entry's presentation orderBy.
    Consumers (banding, candidates, star edges) must take this form:
    the orderBy leaked a rangepartitioning exchange + global sort (and
    its sampling pass) into every downstream plan — twice in the
    self-join/hub-join plans, since each side re-evaluated the subtree
    (round 15, guide §2.4 'an orderBy used only to make output
    deterministic').

    Signatures are computed PER ROW (array_min over the doc's hashed
    shingle array, T.minhash_sig_cols) instead of explode +
    groupBy(doc_id): the signature is a per-document quantity, so the
    old form shuffled one (doc_id, shingle-string) row per shingle
    purely to regroup what was never apart. ZERO exchanges remain in
    this frame. The empty-array filter reproduces explode's
    drop-empty-docs semantics exactly; MIN over the exploded multiset
    equals array_min over the array, so the signatures entry and every
    downstream oracle are unchanged (hash-verified)."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    sh = docs.select(
        "doc_id",
        T.shingles_from_words(T.words(F.col("text")), 3).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    hashed = sh.select(
        "doc_id", F.transform("_sh", lambda s: T.md5_hash32(s)).alias("_h")
    )
    return hashed.select("doc_id", *T.minhash_sig_cols(F.col("_h"), N_MINHASH))


_BASE_H_SQL = T.md5_hash32_sql("shingle", 0)
_MINHASH_SIG_SQL = (
    "WITH "
    + _SHINGLES_CTE
    + "SELECT doc_id, "
    + ", ".join(
        f"MIN({T.affine_hash32_sql(_BASE_H_SQL, s)}) AS sig_{s}"
        for s in range(N_MINHASH)
    )
    + " FROM sh GROUP BY doc_id ORDER BY doc_id"
)


def _minhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band_key) frame — the ONE definition of the banding
    scheme, shared by the all-pairs candidate entry and the star-edge
    entry so the star-vs-clique component-equivalence invariant
    (dedup_components' input) cannot drift between them. One explode
    over an array of band keys instead of an N_BANDS-way union of
    selects: the union fanned the whole signature pipeline out once
    per branch in the physical plan (no cross-branch CSE). Consumes
    the UNORDERED signature frame — the signatures entry's
    presentation orderBy leaked a rangepartitioning exchange + global
    sort into every banded plan (round 15)."""
    sig = _minhash_sig_frame(spark, sf_dir)
    band_keys = F.array(
        *[
            F.concat_ws(
                "-",
                F.lit(str(b)),
                *[
                    F.col(f"sig_{b * _ROWS_PER_BAND + r}").cast("string")
                    for r in range(_ROWS_PER_BAND)
                ],
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_keys).alias("band_key"))


def _dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing any of 4 bands (4 sigs each) become
    candidate near-dup pairs — never an all-pairs comparison.

    Scale: each band is an equi-join on a concatenated band key; the
    expected bucket size is tiny unless docs truly collide. A HOT
    band bucket makes this entry's all-pairs OUTPUT quadratic by
    semantics — _dedup_minhash_star_edges is the scale path for that
    case (BASELINE.md round-13 skew probes).

    The banded frame is persisted across the self-join (round 15,
    guide §5 'reused AND recomputing is more expensive'): the two
    join sides are the same subtree, but the planner broadcasts one
    side, so nothing is shared and the tokenize->shingle->MinHash
    pipeline ran once PER SIDE. Banded rows are (doc_id, band_key) —
    4 narrow rows per doc, a small fraction of the corpus — and
    track_persist hands the handle to tables.clear_caches.
    """
    banded = tables.track_persist(_minhash_banded(spark, sf_dir))
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(right, "band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _band_key_sql(b: int) -> str:
    cols = " , ".join(
        f"CAST(sig_{b * _ROWS_PER_BAND + r} AS VARCHAR)" for r in range(_ROWS_PER_BAND)
    )
    return f"concat_ws('-', '{b}', {cols})"


# CTE chain + final select split out so the connected-components oracle
# can embed the same candidate pairs inside a WITH RECURSIVE
_MINHASH_CAND_CTES = (
    _SHINGLES_CTE
    + ", sig AS (SELECT doc_id, "
    + ", ".join(
        f"MIN({T.affine_hash32_sql(_BASE_H_SQL, s)}) AS sig_{s}"
        for s in range(N_MINHASH)
    )
    + " FROM sh GROUP BY doc_id), banded AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {_band_key_sql(b)} AS band_key FROM sig" for b in range(N_BANDS)
    )
    + ")"
)
_MINHASH_CAND_SELECT = (
    "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM banded a JOIN banded b USING (band_key) "
    "WHERE a.doc_id < b.doc_id"
)
_MINHASH_CAND_SQL = (
    "WITH "
    + _MINHASH_CAND_CTES
    + " "
    + _MINHASH_CAND_SELECT
    + " ORDER BY doc_a, doc_b"
)


def _dedup_minhash_star_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STAR-reduced LSH candidate edges — the viral-bucket scale path
    (round 13): per band bucket, emit (bucket-min doc, other doc)
    instead of all pairs. A bucket of B docs yields B-1 edges, not
    B(B-1)/2 — and since the star spans exactly the docs the clique
    spans, CONNECTED COMPONENTS over star edges equal components over
    all-pairs candidates (pinned by
    test_star_edges_components_equivalence). That matters because a
    20%-hot band key (one boilerplate template across a 100 TB corpus)
    makes the all-pairs output itself quadratic — no join strategy
    fixes SEMANTICS that emit C(0.2n, 2) rows. Dedup pipelines only
    need the components, so the star is the honest representation.

    Scale shape: min(doc_id) per band key partial-aggregates map-side
    (the hot key collapses before the shuffle); the join back is an
    AQE-skew-splittable equi-join; output is linear in corpus size no
    matter how viral the bucket. Measured: tools/scaling_probe.py
    --skew, BASELINE.md round-13 skew probes."""
    return _star_edges_frame(spark, sf_dir).orderBy("doc_a", "doc_b")


def _star_edges_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The star-reduced edge set WITHOUT the presentation sort — the
    form consumers that don't need ordering (dedup_components' persist
    + union-find) should take: the trailing orderBy added a global
    range exchange + sort that the component labels are invariant to
    (round 14, guide §2.4 'an orderBy used only to make output
    deterministic').

    Hub via WINDOW min, not groupBy+join-back (round 15): the join
    form evaluated the whole tokenize->shingle->MinHash subtree once
    PER SIDE — the hub aggregate's exchange carries partial aggs, so
    the probe side's exchange cannot be reused, and at small scale the
    static planner turns the join into a broadcast, which shares
    nothing. The window computes signatures ONCE behind a single
    band_key exchange; min-over-the-whole-partition equals the groupBy
    min row for row, so the edge set (and the component labels built
    from it) is unchanged. Per-bucket work stays linear in bucket size
    — the rows are (doc_id, band_key), never pairs — so the
    viral-bucket story is intact."""
    banded = _minhash_banded(spark, sf_dir)
    hub = F.min("doc_id").over(Window.partitionBy("band_key"))
    return (
        banded.withColumn("hub", hub)
        .filter(F.col("doc_id") > F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )


_MINHASH_STAR_SQL = (
    "WITH "
    + _MINHASH_CAND_CTES
    + ", hubs AS (SELECT band_key, MIN(doc_id) AS hub FROM banded GROUP BY 1) "
    "SELECT DISTINCT hub AS doc_a, doc_id AS doc_b "
    "FROM banded JOIN hubs USING (band_key) WHERE doc_id > hub "
    "ORDER BY doc_a, doc_b"
)


# --- n-gram Jaccard similarity join ----------------------------------------


def _similarity_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most similar doc pairs by exact 3-shingle Jaccard.

    Candidate pairs come from the shingle inverted index (docs sharing
    >= 1 shingle) — the join key is the shingle, not the pair, so this
    is a distributed equi-join + groupBy, never O(n^2). Jaccard =
    |common| / (|a|+|b|-|common|) is a ratio of exact ints (identical
    doubles in DuckDB).
    """
    docs = tables.load_parallel(spark, "documents", sf_dir)
    # persist the shingle inverted index: it feeds the size aggregate
    # AND both self-join sides — unpersisted, the tokenize+explode+
    # distinct subtree executed 3x (12 document scans in the physical
    # plan). Shingle rows are ~50/doc — MBs, not a memory concern.
    sh = tables.track_persist(_shingle_sets(docs))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias(
                "jaccard"
            ),
        )
    )
    # Global top-20 via orderBy().limit() — plans as a distributed
    # TakeOrderedAndProject (per-partition 20-row heaps merged on one
    # reducer), NOT a row_number() over an unpartitioned window, which
    # would funnel the full candidate set through a single task.
    top = jac.orderBy(F.col("jaccard").desc(), F.col("doc_a"), F.col("doc_b")).limit(20)
    # constant partition key: the window only ranks the 20 surviving
    # rows — partitionBy(lit) documents that and silences WindowExec's
    # single-partition warning
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("jaccard").desc(), F.col("doc_a"), F.col("doc_b")
    )
    return (
        top.withColumn("rank", F.row_number().over(w))  # 20 rows: trivial
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"), "rank")
        .orderBy("rank")
    )


_NGRAM_JACCARD_SQL = (
    "WITH "
    + _SHINGLES_CTE
    + """,
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b,
         common / (sa.n_sh + sb.n_sh - common) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, ROUND(jaccard, 6) AS jaccard, rank FROM (
  SELECT doc_a, doc_b, jaccard,
         ROW_NUMBER() OVER (ORDER BY jaccard DESC, doc_a, doc_b) AS rank
  FROM jac
) WHERE rank <= 20 ORDER BY rank
"""
)


# --- SimHash ----------------------------------------------------------------


def _dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over the distinct-word set: bit b is set iff the
    sum over words of (+1 if bit b of h(word) else -1) is positive.

    One explode + one groupBy(doc_id) with 32 conditional sums —
    all codegen'd; near-dup docs differ in a few bits (compare via
    hamming distance on the signature at query time).
    """
    docs = tables.load_parallel(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", F.explode(T.words(F.col("text"))).alias("word")
    ).distinct()
    h = T.md5_hash32(F.col("word"), 99)
    sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s_{b}")
        for b in range(32)
    ]
    agg = toks.groupBy("doc_id").agg(*sums)
    simhash = None
    for b in range(32):
        bit = F.when(F.col(f"s_{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        simhash = bit if simhash is None else simhash + bit
    return agg.select("doc_id", simhash.cast("long").alias("simhash")).orderBy("doc_id")


def _dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming <= 1 via exact query
    expansion: each signature probes with itself plus its 32
    single-bit flips; pairs are found by EXACT signature equality
    against the probe set — an equi-join on a 32-bit key, no band
    buckets, no post-filter, provably complete for the radius.

    This replaced a byte-band join that the synthetic corpus (tiny
    vocabulary -> saturated signatures) degraded toward all-pairs
    (~8s -> ~2s at sf0.1). For larger radii r, expansion costs
    C(32,<=r) probes and banding wins again; both are equi-joins —
    the shape that distributes and lets AQE split skew.
    """
    # persist: the signature aggregate feeds both the probe expansion
    # and the match side of the join — 2x the 32-sum groupBy otherwise
    sig = tables.track_persist(_dedup_simhash(spark, sf_dir))
    flips = F.array(*([F.lit(-1)] + [F.lit(b) for b in range(32)]))
    probes = (
        sig.select(
            F.col("doc_id").alias("doc_a"),
            F.col("simhash").alias("sig_a"),
            F.explode(flips).alias("bit"),
        )
        .select(
            "doc_a",
            "sig_a",
            F.when(F.col("bit") < 0, F.col("sig_a"))
            .otherwise(F.expr("sig_a ^ shiftleft(1L, bit)"))
            .alias("variant"),
        )
    )
    other = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("variant"))
    return (
        probes.join(other, "variant")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("sig_a ^ variant")).alias("hamming"),
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
        # saturated synthetic signatures produce ~673k pairs at sf0.1;
        # bound the materialized result deterministically (the full
        # candidate join still executes — this is an output cap, not a
        # pruning shortcut).
        .limit(200)
    )


_SIMHASH_PAIRS_SQL = """
WITH sig AS ({SIG}),
probes AS (
  SELECT doc_id AS doc_a, simhash AS sig_a,
         CASE WHEN b < 0 THEN simhash ELSE xor(simhash, (CAST(1 AS BIGINT) << b)) END AS variant
  FROM sig, unnest(range(-1, 32)) t(b)
)
SELECT DISTINCT doc_a, s.doc_id AS doc_b,
       bit_count(xor(sig_a, s.simhash)) AS hamming
FROM probes JOIN sig s ON s.simhash = probes.variant
WHERE doc_a < s.doc_id
ORDER BY doc_a, doc_b
LIMIT 200
"""


_H_WORD = T.md5_hash32_sql("word", 99)
_SIMHASH_SQL = (
    f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
),
sums AS (
  SELECT doc_id, """
    + ", ".join(
        f"SUM(CASE WHEN ({_H_WORD} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s_{b}"
        for b in range(32)
    )
    + " FROM toks GROUP BY doc_id) SELECT doc_id, CAST("
    + " + ".join(f"(CASE WHEN s_{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(32))
    + " AS BIGINT) AS simhash FROM sums ORDER BY doc_id"
)


# --- Vector similarity search ----------------------------------------------


def _similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (vec_id < 10).

    The baseline ANN path: broadcast the small query set, one pass
    over the candidates, per-query top-k heap via row_number window
    partitioned by query. Exact; O(Q x N) — use the LSH variant when
    Q is large.
    """
    emb = tables.load(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


_COSINE_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q, embeddings e WHERE e.vec_id <> query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
"""


def _similarity_lsh_topk(
    spark: SparkSession, sf_dir: str, multi_probe: bool = True
) -> DataFrame:
    """LSH-bucketed ANN: random-hyperplane sign buckets prune the
    candidate set before exact cosine re-ranking.

    Multi-probe: each query also probes the `planes` buckets at
    hamming distance 1 from its own (the classic multi-probe LSH
    trade — recall rises steeply because near-misses usually flip
    exactly one marginal hyperplane, while the candidate set grows
    only (planes+1)/2^planes of the corpus). Probe expansion is an
    explode on the tiny broadcast query side; the big side is
    untouched.

    Rows-only driver check (the hyperplane formula is Spark-side);
    recall vs the brute-force baseline is property-tested in
    tests/test_extensions.py. Scale: the bucket equi-join replaces the
    cross join — this is the 100 TB path.
    """
    emb = tables.load(spark, "embeddings", sf_dir)
    dim = 64
    # adaptive plane count (one columnless count job): the fixed
    # planes=4 this replaces made bucket populations linear in the
    # corpus — 25x at the 100x probe. ann_planes stays at 4 up to
    # 3840 vectors, so the static DuckDB mirror (_lsh_topk_sql,
    # planes=4) remains bit-identical at the sf0.01/sf0.1 oracle
    # scales (500 / 2000 vectors); at probe scale the bucket count
    # grows to hold per-bucket work ~flat instead
    planes = V.ann_planes(emb.count())
    with_bucket = emb.withColumn("bucket", V.lsh_bucket(F.col("embedding"), dim, planes))
    q = with_bucket.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "bucket",
    )
    if multi_probe:
        probe_buckets = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b)).cast("int")
                for b in range(planes)
            ],
        )
        q = q.select(
            "query_id", "q_emb", F.explode(probe_buckets).alias("bucket")
        )
    cands = with_bucket.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def _similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: queries probe the 4 nearest of 16 centroid
    lists, exact cosine re-rank inside the probed lists only.

    Scale: the probe is a semi-join on cluster id — each query scans
    ~(n_probe/n_centroids) of the corpus instead of all of it, and
    cluster lists distribute across executors. Rows-only driver check;
    recall vs brute force is property-tested (IVF recall > LSH recall
    at equal prune ratios is the expected shape).
    """
    import numpy as np

    emb = tables.load(spark, "embeddings", sf_dir)
    assigned, cent = V.ivf_index(emb, n_centroids=16)
    q_rows = sorted(
        emb.filter(F.col("vec_id") < 10).select("vec_id", "embedding").collect(),
        key=lambda r: r["vec_id"],
    )
    q_mat = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    probes = V.ivf_probe_clusters(q_mat, cent, n_probe=4)
    probe_pairs = [
        (int(r["vec_id"]), int(c)) for r, row in zip(q_rows, probes) for c in row
    ]
    probe_df = spark.createDataFrame(probe_pairs, "query_id long, cluster int")
    q_df = spark.createDataFrame(
        [(int(r["vec_id"]), list(map(float, r["embedding"]))) for r in q_rows],
        "query_id long, q_emb array<float>",
    )
    cands = (
        assigned.join(F.broadcast(probe_df), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q_df), "query_id")
    )
    scored = cands.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def _similarity_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: top-20 most-similar distinct
    pairs across the corpus (threshold-free — the synthetic corpus has
    no true dups, a fixed threshold would return zero evidence).

    Scale: the pair space is pruned by a numpy block kernel
    (vectors.neardup_candidates_blockwise — BLAS matmul per Arrow
    batch against a broadcast unit-norm matrix, ~40x faster than
    per-pair lambdas); each row keeps its top-20 so the global top-20
    is provably retained. At 100 TB the broadcast side becomes
    IVF/LSH buckets instead.
    """
    emb = tables.load(spark, "embeddings", sf_dir)
    cand = V.neardup_candidates(emb, k_per_row=20)
    # distributed TakeOrderedAndProject, rank derived post-limit (20
    # rows) — never an unpartitioned window over the candidate set
    top = cand.orderBy(F.col("cos").desc(), F.col("id_a"), F.col("id_b")).limit(20)
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("cos").desc(), F.col("id_a"), F.col("id_b")
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("id_a", "id_b", "rank")
        .orderBy("rank")
    )


_EMBEDDING_NEARDUP_SQL = """
WITH scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, rank FROM (
  SELECT id_a, id_b, ROW_NUMBER() OVER (ORDER BY cos DESC, id_a, id_b) AS rank
  FROM scored
) WHERE rank <= 20 ORDER BY rank
"""


# --- Text analysis ----------------------------------------------------------

_EN_STOPWORDS = ["the", "a", "of", "and", "is"]
_STOP_PAT = r"\b(" + "|".join(_EN_STOPWORDS) + r")\b"
_MARKER_CASE_SQL = " ".join(
    "WHEN "
    + " AND ".join(
        f"len(regexp_extract_all(text, '\\b({'|'.join(T.LANG_MARKERS[lang])})\\b')) >= "
        f"len(regexp_extract_all(text, '\\b({'|'.join(T.LANG_MARKERS[other])})\\b'))"
        for other in sorted(T.LANG_MARKERS)
        if other != lang
    )
    + f" THEN '{lang}'"
    for lang in sorted(T.LANG_MARKERS)
)


def _text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analytics: token counts (whitespace + BPE-ish),
    quality score, language-ID guess, fingerprint — the standard
    pretraining-corpus annotation pass, all codegen'd expressions."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    text = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        T.token_count_ws(text).alias("tokens_ws"),
        T.token_count_bpe(text).alias("tokens_bpe"),
        T.quality_score(text, _EN_STOPWORDS).alias("quality"),
        T.lang_guess(text).alias("lang_guess"),
        T.fingerprint(text).alias("fp"),
    ).orderBy("doc_id")


_TEXT_ANALYSIS_SQL = f"""
SELECT doc_id, lang,
       len({_WORDS_SQL}) AS tokens_ws,
       len(regexp_extract_all(text, '{T.TOKEN_PATTERN}')) AS tokens_bpe,
       ROUND(GREATEST(0.0,
             LEAST(len({_WORDS_SQL}) / 50.0, 1.0) * 0.4
           + LEAST((len(regexp_extract_all(text, '{_STOP_PAT}'))
                    / GREATEST(len({_WORDS_SQL}), 1)) * 5, 1.0) * 0.4
           + (1 - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                  / GREATEST(length(text), 1)) * 0.2), 4) AS quality,
       CASE {_MARKER_CASE_SQL} ELSE 'de' END AS lang_guess,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents ORDER BY doc_id
"""


def _text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus roll-up per language: volume, token mass, mean quality —
    the filter-threshold dashboard for a data pipeline."""
    docs = tables.load(spark, "documents", sf_dir)
    text = F.col("text")
    per_doc = docs.select(
        "lang",
        T.token_count_ws(text).alias("tok"),
        T.quality_score(text, _EN_STOPWORDS).alias("q"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("tok").alias("total_tokens"),
            F.round(F.avg("q"), 3).alias("avg_quality"),
        )
        .orderBy("lang")
    )


_TEXT_STATS_SQL = f"""
SELECT lang, COUNT(*) AS docs,
       CAST(SUM(len({_WORDS_SQL})) AS BIGINT) AS total_tokens,
       ROUND(AVG(ROUND(GREATEST(0.0,
             LEAST(len({_WORDS_SQL}) / 50.0, 1.0) * 0.4
           + LEAST((len(regexp_extract_all(text, '{_STOP_PAT}'))
                    / GREATEST(len({_WORDS_SQL}), 1)) * 5, 1.0) * 0.4
           + (1 - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                  / GREATEST(length(text), 1)) * 0.2), 4)), 3) AS avg_quality
FROM documents GROUP BY lang ORDER BY lang
"""


# --- Multimodal columns -----------------------------------------------------


def _multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: attach payloads -> Arrow-batched
    mapInPandas decode (stubbed codec, real plumbing) -> typed meta +
    feature vector. Exactly oracle-checked because the fake decode is
    md5-derived. Sampled to every 5th doc to bound the Python stage.

    The feature vector is emitted as `feature_fp`, a comma-joined
    string of the underlying md5-derived 32-bit ints (feature[k] =
    int/2^32 is exact in a double, so round(x*2^32) recovers the int
    losslessly) — array columns break the driver's canonicalizer and
    float formatting differs across engines; integer strings do not.
    """
    from .functions import multimodal as M

    docs = tables.load(spark, "documents", sf_dir).filter(F.col("doc_id") % 5 == 0)
    feature_fp = F.concat_ws(
        ",",
        F.transform(
            F.col("feature"),
            lambda x: F.round(x * F.lit(4294967296.0)).cast("long").cast("string"),
        ),
    )
    return (
        M.decode_media(M.attach_payload(docs))
        .select(
            "doc_id",
            "media_type",
            "width",
            "height",
            "n_frames",
            feature_fp.alias("feature_fp"),
        )
        .orderBy("doc_id")
    )


def _mm_int(seed: int) -> str:
    return f"CAST(('0x' || substr(md5(text || ':{seed}'), 1, 8)) AS BIGINT)"


_MULTIMODAL_SQL = (
    "SELECT doc_id, "
    "CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type, "
    f"CAST({_mm_int(0)} % 1920 + 1 AS INTEGER) AS width, "
    f"CAST({_mm_int(1)} % 1080 + 1 AS INTEGER) AS height, "
    f"CAST({_mm_int(2)} % 240 + 1 AS INTEGER) AS n_frames, "
    "concat_ws(','"
    + "".join(f", CAST({_mm_int(10 + k)} AS VARCHAR)" for k in range(8))
    + ") AS feature_fp FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_id"
)


def _udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas_udf extension tier exercised end-to-end: Arrow-batched
    text normalization over documents (SURVEY.md §2.8). Built-in
    equivalents exist (and are what the parity ops use); this entry
    proves the extension surface itself is wired and correct."""
    from .functions import udfs as U

    docs = tables.load(spark, "documents", sf_dir).filter(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id",
        F.substring(U.normalize_text_pudf(F.col("text")), 1, 40).alias("norm_prefix"),
        F.length(U.normalize_text_pudf(F.col("text"))).alias("norm_len"),
    ).orderBy("doc_id")


_UDF_SURFACE_SQL = """
SELECT doc_id,
       substring(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), 1, 40) AS norm_prefix,
       length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS norm_len
FROM documents WHERE doc_id % 5 = 0 ORDER BY doc_id
"""


def _multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: every 50th frame of each (fake-decoded)
    payload — the 1-to-N Arrow batch shape where output rows exceed
    input rows. Exactly oracle-checked (frame count and hashes are
    md5-derived from the payload)."""
    from .functions import multimodal as M

    docs = tables.load(spark, "documents", sf_dir).filter(F.col("doc_id") % 25 == 0)
    return (
        M.sample_frames(M.attach_payload(docs), step=50)
        .orderBy("doc_id", "frame_idx")
    )


_FRAME_SAMPLE_SQL = f"""
WITH m AS (
  SELECT doc_id, text, {_mm_int(2)} % 240 + 1 AS n_frames
  FROM documents WHERE doc_id % 25 = 0
)
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       md5(text || ':frame:' || CAST(i AS VARCHAR)) AS frame_hash
FROM m, unnest(range(0, n_frames, 50)) t(i)
ORDER BY doc_id, frame_idx
"""


def _similarity_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN, exactly oracle-checked: the deterministic
    Knuth-multiplicative hyperplanes make the whole index — sign
    buckets, hamming-1 probe expansion, candidate equi-join, cosine
    re-rank — a pure function of the embeddings, so DuckDB rebuilds it
    bit-identically from the same integer formula (the same move that
    made MinHash banding oracle-able). The OTHER index family (IVF,
    k-means-trained) stays a rows-only extra (`similarity_ivf_topk`):
    its Lloyd iterations sum floats in engine-dependent order, so its
    evidence is the recall property test, not a hash."""
    return _similarity_lsh_topk(spark, sf_dir)


def _lsh_plane_sql(j: int, dim: int = 64) -> str:
    """DuckDB mirror of vectors.hyperplane — same integer formula, so
    both engines derive bit-identical plane vectors."""
    return (
        f"list_transform(range(0,{dim}), k -> "
        f"((({j}*{dim}+k) * 2654435761) % 4294967296) / 2147483648.0 - 1)"
    )


def _lsh_topk_sql(planes: int = 4, dim: int = 64, multi_probe: bool = True) -> str:
    plane_defs = ", ".join(f"{_lsh_plane_sql(j, dim)} AS pl{j}" for j in range(planes))
    bucket_expr = " + ".join(
        f"CASE WHEN list_dot_product(emb, pl{j}) >= 0 THEN {1 << j} ELSE 0 END"
        for j in range(planes)
    )
    probes = (
        "[bucket, " + ", ".join(f"xor(bucket, {1 << b})" for b in range(planes)) + "]"
        if multi_probe
        else "[bucket]"
    )
    return f"""
WITH planes AS (SELECT {plane_defs}),
b AS (
  SELECT vec_id, emb, ({bucket_expr}) AS bucket
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), planes
),
q AS (
  SELECT vec_id AS query_id, emb AS q_emb, u.probe AS bucket
  FROM b, UNNEST({probes}) AS u(probe)
  WHERE vec_id < 10
),
cand AS (
  SELECT query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(q_emb, b.emb) AS cos
  FROM q JOIN b USING (bucket) WHERE b.vec_id <> query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM cand)
WHERE rank <= 5 ORDER BY query_id, rank
"""


_LSH_TOPK_SQL = _lsh_topk_sql(multi_probe=True)
_LSH_SINGLE_PROBE_SQL = _lsh_topk_sql(multi_probe=False)


_COLLATE_BATCH = 8
_COLLATE_PARTS = 8  # salt partitions per bucket for the prefix sum


def _multimodal_batch_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing + fixed-size batch collation — the step a
    100 TB image-training pipeline runs between decode and the data
    loader (DALI/webdataset-style): group samples whose decoded
    geometry collates to the same resize target, then pack each bucket
    into deterministic fixed-size batches.

    Bucketing is INTEGER-EXACT (cross-multiplied width/height
    comparisons, no float log of the aspect ratio), so both engines
    agree bit-for-bit. Batch numbering reuses corpus_pack_bins'
    two-phase prefix sum, per bucket: salt each bucket into
    _COLLATE_PARTS sub-partitions, local row_number, then a
    (#buckets x #parts)-row offset table — the only windows are the
    per-(bucket,salt) local ranks and a per-bucket window over exactly
    _COLLATE_PARTS rows, so no bucket ever becomes one giant task.
    Batch order within a bucket is (salt, doc_id) — any deterministic
    order collates; this one needs no global sort."""
    from .functions import multimodal as M

    docs = tables.load(spark, "documents", sf_dir).filter(F.col("doc_id") % 5 == 0)
    dec = M.decode_media(M.attach_payload(docs)).select("doc_id", "width", "height")
    w, h = F.col("width"), F.col("height")
    bucket = (
        F.when(2 * w >= 3 * h, F.lit(4))      # ar >= 1.5   -> wide
        .when(5 * w >= 6 * h, F.lit(3))       # ar >= 1.2   -> landscape
        .when(6 * w >= 5 * h, F.lit(2))       # ar >= 0.833 -> square-ish
        .when(3 * w >= 2 * h, F.lit(1))       # ar >= 0.667 -> portrait
        .otherwise(F.lit(0))                  # tall
    )
    t = dec.select(
        "doc_id",
        bucket.alias("bucket"),
        (T.md5_hash32(F.col("doc_id").cast("string"), seed=11) % _COLLATE_PARTS).alias(
            "p"
        ),
    )
    w_local = Window.partitionBy("bucket", "p").orderBy("doc_id")
    local = t.withColumn("rn", F.row_number().over(w_local))
    w_off = (
        Window.partitionBy("bucket").orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        t.groupBy("bucket", "p")
        .agg(F.count("*").alias("cnt"))
        .withColumn("off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
        .select("bucket", "p", "off")
    )
    idx = F.col("off") + F.col("rn") - 1
    packed = local.join(F.broadcast(offsets), ["bucket", "p"]).select(
        "doc_id",
        "bucket",
        idx.alias("idx"),
        F.floor(idx / _COLLATE_BATCH).cast("long").alias("batch_idx"),
    )
    return (
        packed.groupBy("bucket", "batch_idx")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.min("doc_id").alias("min_doc"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "doc_id"))),
                        lambda x: x["doc_id"].cast("string"),
                    ),
                    ",",
                )
            ).alias("ids_md5"),
        )
        .orderBy("bucket", "batch_idx")
    )


_COLLATE_SQL = f"""
WITH dec AS (
  SELECT doc_id,
         {_mm_int(0)} % 1920 + 1 AS width,
         {_mm_int(1)} % 1080 + 1 AS height
  FROM documents WHERE doc_id % 5 = 0
),
t AS (
  SELECT doc_id,
         CASE WHEN 2*width >= 3*height THEN 4
              WHEN 5*width >= 6*height THEN 3
              WHEN 6*width >= 5*height THEN 2
              WHEN 3*width >= 2*height THEN 1
              ELSE 0 END AS bucket,
         {T.md5_hash32_sql("CAST(doc_id AS VARCHAR)", 11)} % {_COLLATE_PARTS} AS p
  FROM dec
),
l AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket, p ORDER BY doc_id) AS rn
  FROM t
),
o AS (
  SELECT bucket, p,
         COALESCE(SUM(cnt) OVER (PARTITION BY bucket ORDER BY p
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM (SELECT bucket, p, COUNT(*) AS cnt FROM t GROUP BY bucket, p)
),
packed AS (
  SELECT l.doc_id, l.bucket, o.off + l.rn - 1 AS idx,
         (o.off + l.rn - 1) // {_COLLATE_BATCH} AS batch_idx
  FROM l JOIN o USING (bucket, p)
)
SELECT bucket, CAST(batch_idx AS BIGINT) AS batch_idx,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       MIN(doc_id) AS min_doc,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY idx)) AS ids_md5
FROM packed
GROUP BY bucket, batch_idx
ORDER BY bucket, batch_idx
"""


# Driver tier (order set in queries.py). dedup_fingerprint covers
# dedup_exact's grouping semantics with the fixed-width-key shape;
# minhash candidates / simhash pairs hash-cover their signature stages
# (band keys and hamming distances are functions of the signatures);
# the folded constituents keep pytest oracle coverage as extras.
def _multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec round-trip (round 11): payloads are genuine
    RIFF/WAVE containers (16-bit PCM mono, stdlib ``wave`` writer),
    decode runs the REAL parser + numpy feature extraction
    (functions/multimodal.synth_wav / decode_wav) — no fake codec on
    this path. The signal is synthesized deterministically per doc
    (integer hash sequence), so the oracle recomputes the EXPECTED
    sample stream and its features (RMS energy, zero-crossing rate)
    straight from the formula in SQL: a byte mangled anywhere in the
    binary-column plumbing, a WAV header mis-pack, or a parser bug
    shifts the recovered samples and breaks the hash. Image/video
    decode stays honestly stubbed (no Pillow/ffmpeg in this
    environment); audio needs only the stdlib."""
    from .functions import multimodal as M

    docs = tables.load(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 20 == 0
    )
    return (
        M.decode_wav(M.synth_wav(docs))
        .select(
            "doc_id",
            "sample_rate",
            "n_samples",
            "duration_s",
            "rms",
            "zcr",
        )
        .orderBy("doc_id")
    )


_WAV_DECODE_SQL = """
WITH docs AS (
  SELECT doc_id,
         CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
         CAST(256 + (doc_id % 64) AS INTEGER) AS n_samples
  FROM documents WHERE doc_id % 20 = 0
),
samples AS (
  SELECT d.doc_id, d.sample_rate, d.n_samples, i,
         ((d.doc_id * 2654435761 + i * 97) % 65536) - 32768 AS s
  FROM docs d, unnest(range(0, d.n_samples)) t(i)
),
lagged AS (
  SELECT doc_id, sample_rate, n_samples, s,
         LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM samples
)
SELECT doc_id, sample_rate, n_samples,
       ROUND(CAST(n_samples AS DOUBLE) / sample_rate, 6) AS duration_s,
       ROUND(SQRT(CAST(SUM(s * s) AS DOUBLE) / n_samples), 6) AS rms,
       ROUND(CAST(SUM(CASE WHEN s * prev < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / (n_samples - 1), 6) AS zcr
FROM lagged
GROUP BY doc_id, sample_rate, n_samples
ORDER BY doc_id
"""


def _multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec round-trip (round 12, mirroring the round-11
    WAV win): payloads are genuine PNG containers — 8-bit grayscale,
    chunked IHDR/IDAT/IEND with real CRC32s, every scanline filter
    type (None/Sub/Up/Average/Paeth) applied by the encoder, the
    deflate stream split across two IDAT chunks — and decode runs a
    genuine parser (functions/multimodal.synth_png / decode_png):
    signature, chunk walk with CRC verification, multi-IDAT
    concatenation, inflate, full unfiltering, then numpy features
    over the recovered pixel matrix. The pixel field derives from an
    integer-hash formula, so the oracle recomputes the EXPECTED image
    in SQL; the position-weighted checksum pins every pixel to its
    exact location — a filter mis-applied on either side, a CRC slip,
    or a dropped IDAT chunk breaks the hash. Video decode stays
    honestly stubbed (no ffmpeg in this environment); images, like
    audio, need only the stdlib."""
    from .functions import multimodal as M

    docs = tables.load(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 20 == 0
    )
    return (
        M.decode_png(M.synth_png(docs))
        .select(
            "doc_id",
            "width",
            "height",
            "lum_sum",
            "bright_px",
            "px_checksum",
        )
        .orderBy("doc_id")
    )


_PNG_DECODE_SQL = """
WITH docs AS (
  SELECT doc_id,
         CAST(4 + doc_id % 13 AS INTEGER) AS width,
         CAST(3 + doc_id % 11 AS INTEGER) AS height
  FROM documents WHERE doc_id % 20 = 0
),
px AS (
  SELECT d.doc_id, d.width, d.height, x, y,
         (d.doc_id * 2654435761 + y * 131 + x * 17) % 256 AS p
  FROM docs d,
       unnest(range(0, d.height)) ty(y),
       unnest(range(0, d.width)) tx(x)
)
SELECT doc_id, width, height,
       CAST(SUM(p) AS BIGINT) AS lum_sum,
       CAST(SUM(CASE WHEN p >= 128 THEN 1 ELSE 0 END) AS BIGINT)
           AS bright_px,
       CAST(SUM(p * (y * width + x + 1)) AS BIGINT) AS px_checksum
FROM px
GROUP BY doc_id, width, height
ORDER BY doc_id
"""


def _multimodal_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize through genuine codecs end to end (round 12):
    synth_png's containers are PARSED (CRC-verified chunk walk, full
    unfilter), nearest-neighbor resampled to an 8x6 thumbnail — source
    pixel (floor(x*w/8), floor(y*h/6)), downsampling most docs and
    UPsampling the narrow ones (w ranges 4..16), so both directions
    are live — RE-ENCODED as real PNGs (functions/multimodal.
    resize_png), and decoded AGAIN for features. One hash pins the
    encoder, the parser, and the resampler in both directions: the
    oracle recomputes the expected thumbnail straight from the
    integer-hash pixel formula in SQL, so a sampling off-by-one, a
    re-encode filter bug, or a mangled thumbnail byte all break it.
    This is the 'resize' op of the multimodal training-data pipeline
    (SURVEY §2.9), previously impossible to do genuinely under the
    fake codec."""
    from .functions import multimodal as M

    docs = tables.load(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 20 == 0
    )
    return (
        M.decode_png(M.resize_png(M.synth_png(docs), 8, 6))
        .select(
            "doc_id",
            "width",
            "height",
            "lum_sum",
            "bright_px",
            "px_checksum",
        )
        .orderBy("doc_id")
    )


_PNG_RESIZE_SQL = """
WITH docs AS (
  SELECT doc_id,
         4 + doc_id % 13 AS w,
         3 + doc_id % 11 AS h
  FROM documents WHERE doc_id % 20 = 0
),
px AS (
  SELECT d.doc_id, x, y,
         (d.doc_id * 2654435761
          + (CAST(FLOOR(y * d.h / 6.0) AS BIGINT)) * 131
          + (CAST(FLOOR(x * d.w / 8.0) AS BIGINT)) * 17) % 256 AS p
  FROM docs d,
       unnest(range(0, 6)) ty(y),
       unnest(range(0, 8)) tx(x)
)
SELECT doc_id,
       CAST(8 AS INTEGER) AS width,
       CAST(6 AS INTEGER) AS height,
       CAST(SUM(p) AS BIGINT) AS lum_sum,
       CAST(SUM(CASE WHEN p >= 128 THEN 1 ELSE 0 END) AS BIGINT)
           AS bright_px,
       CAST(SUM(p * (y * 8 + x + 1)) AS BIGINT) AS px_checksum
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""


def _multimodal_wav_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio resample through genuine codecs end to end (round
    12, the audio twin of _multimodal_png_resize): synth_wav's
    containers are PARSED with the stdlib ``wave`` reader,
    nearest-neighbor resampled to 16 kHz — 8 kHz docs upsample 2x
    (sample duplication), 12 kHz docs hit the 4/3 fractional path,
    16 kHz docs pass through identity — RE-ENCODED as real WAV
    containers at the new rate (functions/multimodal.resample_wav),
    and decoded AGAIN for signal features. The oracle recomputes the
    resampled sample stream straight from the integer-hash formula in
    SQL (output sample i = source sample floor(i*sr/16000)), so an
    index off-by-one, a re-pack bug, or a mangled byte breaks the
    hash. This is the sample-rate-conversion op of the multimodal
    training pipeline (SURVEY §2.9)."""
    from .functions import multimodal as M

    docs = tables.load(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 20 == 0
    )
    return (
        M.decode_wav(M.resample_wav(M.synth_wav(docs), 16000))
        # duration_s is omitted on purpose: n_out/16000 lands on exact
        # half-ties at 6 decimals for odd n_out (e.g. 373/16000 =
        # 0.0233125) where Python and DuckDB round differently; it is
        # fully derivable from n_samples/sample_rate, so the hash loses
        # nothing by excluding the tie-rounding artifact
        .select("doc_id", "sample_rate", "n_samples", "rms", "zcr")
        .orderBy("doc_id")
    )


_WAV_RESAMPLE_SQL = """
WITH docs AS (
  SELECT doc_id,
         8000 + (doc_id % 3) * 4000 AS sr,
         256 + (doc_id % 64) AS n
  FROM documents WHERE doc_id % 20 = 0
),
sized AS (
  SELECT doc_id, sr, n,
         CAST(FLOOR(n * 16000.0 / sr) AS BIGINT) AS n_out
  FROM docs
),
samples AS (
  SELECT d.doc_id, d.n_out, i,
         ((d.doc_id * 2654435761
           + CAST(FLOOR(i * d.sr / 16000.0) AS BIGINT) * 97) % 65536)
         - 32768 AS s
  FROM sized d, unnest(range(0, d.n_out)) t(i)
),
lagged AS (
  SELECT doc_id, n_out, i, s,
         LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM samples
)
SELECT doc_id,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(n_out AS INTEGER) AS n_samples,
       ROUND(SQRT(CAST(SUM(s * s) AS DOUBLE) / n_out), 6) AS rms,
       ROUND(CAST(SUM(CASE WHEN s * prev < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / (n_out - 1), 6) AS zcr
FROM lagged
GROUP BY doc_id, n_out
ORDER BY doc_id
"""


def _multimodal_avi_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container frame sampling (round 12): a video CODEC
    genuinely can't be had here (no ffmpeg), but frame EXTRACTION is a
    container operation, and uncompressed AVI needs only ``struct`` —
    payloads are genuine RIFF containers (avih/strh/strf headers,
    8-bit DIB frames with real 4-byte stride padding and bottom-up row
    order, idx1 index), and sampling runs a genuine parser
    (functions/multimodal.synth_avi + sample_frames_avi): every 3rd
    frame emits one row (the 1-to-N mapInPandas shape) with mean
    luminance and a position-weighted pixel checksum. The oracle
    recomputes the sampled frames straight from the integer-hash pixel
    formula in SQL — a stride/flip bug, a frame-count mismatch between
    avih and movi, or a mangled chunk breaks the hash. The fake
    ``sample_frames`` stays as the documented plug point for real
    compressed codecs."""
    from .functions import multimodal as M

    docs = tables.load(spark, "documents", sf_dir).filter(
        F.col("doc_id") % 20 == 0
    )
    return (
        M.sample_frames_avi(M.synth_avi(docs), step=3)
        .select("doc_id", "frame_idx", "lum_sum", "px_checksum")
        .orderBy("doc_id", "frame_idx")
    )


_AVI_FRAME_SAMPLE_SQL = """
WITH docs AS (
  SELECT doc_id,
         5 + doc_id % 5 AS w,
         3 + doc_id % 4 AS h,
         4 + doc_id % 9 AS n
  FROM documents WHERE doc_id % 20 = 0
),
px AS (
  SELECT d.doc_id, d.w, d.h, f, x, y,
         (d.doc_id * 2654435761 + f * 509 + y * 131 + x * 17) % 256 AS p
  FROM docs d,
       unnest(range(0, d.n)) tf(f),
       unnest(range(0, d.h)) ty(y),
       unnest(range(0, d.w)) tx(x)
  WHERE f % 3 = 0
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(SUM(p) AS BIGINT) AS lum_sum,
       CAST(SUM(p * (y * w + x + 1)) AS BIGINT) AS px_checksum
FROM px
GROUP BY doc_id, f, w, h
ORDER BY doc_id, frame_idx
"""


register(
    "multimodal_avi_frame_sample",
    _multimodal_avi_frame_sample,
    _AVI_FRAME_SAMPLE_SQL,
    driver=False,
)
# multimodal_decode retired to the pytest tier round 12 (rotation for
# multimodal_png_decode): the fake md5 codec's driver evidence is a
# strict subset of the real PNG codec's — same binary-column +
# mapInPandas plumbing, but the real entry adds a genuine parser with
# CRC/filter coverage. Oracle intact — still differential in pytest.
register("multimodal_decode", _multimodal_decode, _MULTIMODAL_SQL, driver=False)
register(
    "multimodal_png_resize", _multimodal_png_resize, _PNG_RESIZE_SQL, driver=False
)
register(
    "multimodal_wav_resample",
    _multimodal_wav_resample,
    _WAV_RESAMPLE_SQL,
    driver=False,
)
register(
    "multimodal_wav_decode", _multimodal_wav_decode, _WAV_DECODE_SQL, driver=False
)
register(
    # promoted to the driver window round 12 in multimodal_decode's
    # slot (see the rotation note above)
    "multimodal_png_decode", _multimodal_png_decode, _PNG_DECODE_SQL
)
# retired to the pytest tier round 9 (slot went to
# storage_versioned_merge): its driver hash evidence near-duplicated
# multimodal_decode's — same mapInPandas stub-codec plumbing, only the
# batch shape differs — and the frame-sampling semantics stay
# oracle-diffed here in tests/test_oracle_corpus.py
register(
    "multimodal_frame_sample",
    _multimodal_frame_sample,
    _FRAME_SAMPLE_SQL,
    driver=False,
)
register("multimodal_batch_collate", _multimodal_batch_collate, _COLLATE_SQL, driver=False)
register("udf_surface", _udf_surface, _UDF_SURFACE_SQL)
register("dedup_fingerprint", _dedup_fingerprint, _DEDUP_FINGERPRINT_SQL)
register("dedup_minhash_candidates", _dedup_minhash_candidates, _MINHASH_CAND_SQL)
register(
    "dedup_minhash_star_edges", _dedup_minhash_star_edges, _MINHASH_STAR_SQL, driver=False
)
register("similarity_ngram_jaccard", _similarity_ngram_jaccard, _NGRAM_JACCARD_SQL)
register(
    # retired to the pytest tier round 10: its hamming-band hash
    # evidence near-duplicated dedup_minhash_candidates' banded-LSH
    # evidence (VERDICT r9 ask #4); oracle stays exact in
    # tests/test_oracle_corpus.py. Slot went to storage_feed_stream.
    "dedup_simhash_pairs",
    _dedup_simhash_pairs,
    _SIMHASH_PAIRS_SQL.replace("{SIG}", _SIMHASH_SQL),
    driver=False,
)
# Retired to the pytest tier round 12 (verdict-r11 ask #8): three
# driver slots carried build-path top-k over the same embeddings;
# the slot went to similarity_ann_serve — the SERVING path (durable
# range-clustered index, manifest-stats pruning, the 100x-flat one).
# Oracle intact — still differential in pytest.
register(
    "similarity_cosine_topk",
    _similarity_cosine_topk,
    _COSINE_TOPK_SQL,
    driver=False,
)
register("similarity_ann_topk", _similarity_ann_topk, _LSH_TOPK_SQL)
register(
    "similarity_embedding_neardup", _similarity_embedding_neardup, _EMBEDDING_NEARDUP_SQL
)

# --- PII redaction + corpus n-gram stats (training-pipeline passes) ---------

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_IP_RE = "\\d+\\.\\d+\\.\\d+\\.\\d+"


def _text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (the pre-training redaction pass): emails and IPs are
    replaced with typed placeholders and counted. The corpus ships no
    PII, so a deterministic contact line synthesized from doc_id is
    appended first — redaction then has real work whose result is
    hash-compared via md5 of the scrubbed text (md5 is bit-identical
    in DuckDB). All codegen'd regexp expressions, no Python."""
    docs = tables.load(spark, "documents", sf_dir).filter(F.col("doc_id") % 4 == 0)
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(dirty, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(dirty, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(dirty, F.lit(_IP_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


_TEXT_REDACT_SQL = f"""
WITH dirty AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS d
  FROM documents WHERE doc_id % 4 = 0
)
SELECT doc_id,
       CAST(len(regexp_extract_all(d, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(d, '{_IP_RE}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(d, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_IP_RE}', '<IP>', 'g')) AS redacted_md5
FROM dirty ORDER BY doc_id
"""


def _text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus 3-gram document frequency, top 30 — the vocabulary /
    boilerplate dashboard over the shingle inverted index (same index
    the dedup family builds; one extra groupBy on the shingle)."""
    docs = tables.load(spark, "documents", sf_dir)
    return (
        _shingle_sets(docs)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("shingle"))
        .limit(30)
    )


_TEXT_NGRAM_FREQ_SQL = (
    "WITH "
    + _SHINGLES_CTE
    + """
SELECT shingle, COUNT(*) AS df FROM sh
GROUP BY shingle ORDER BY df DESC, shingle LIMIT 30
"""
)


def _text_salient_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document salient terms: top-3 words by tf/df (term frequency
    over corpus document frequency — the log-free tf-idf variant whose
    score is an exact ratio of integers, so BOTH engines produce
    bit-identical doubles and the ranking is hash-exact, unlike
    ln()-based idf which differs in the last ulp across libm
    implementations).

    Shape: one explode -> two groupBys (term-in-doc counts; corpus df)
    -> broadcast df join -> per-doc top-k window. The df side is
    vocabulary-sized — broadcastable at any corpus scale."""
    docs = tables.load(spark, "documents", sf_dir).filter(F.col("doc_id") % 10 == 0)
    toks = docs.select("doc_id", F.explode(T.words(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # corpus df over the SAME sampled corpus (self-contained oracle)
    df_ = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id", "term", (F.col("tf") / F.col("df")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", F.round("score", 6).alias("score"), "rank")
        .orderBy("doc_id", "rank")
    )


_TEXT_SALIENT_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS term
  FROM documents WHERE doc_id % 10 = 0
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (
  SELECT term, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1
)
SELECT doc_id, term, ROUND(tf / df, 6) AS score, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf / df.df DESC, tf.term) AS rank
  FROM tf JOIN df USING (term)
) WHERE rank <= 3 ORDER BY doc_id, rank
"""


_SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.1}


def _sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling (functions/sampling):
    per-language keep-fractions decided by a stable md5 hash of doc_id
    — retry/partitioning-invariant (unlike sampleBy's per-task RNG)
    and therefore exactly oracle-checkable."""
    from .functions import sampling as S

    docs = tables.load(spark, "documents", sf_dir)
    return (
        S.sample_by(docs, "lang", "doc_id", _SAMPLE_FRACTIONS, seed=11, default=0.05)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _sample_stratified_sql() -> str:
    from .functions import sampling as S

    case = (
        "CASE lang "
        + " ".join(
            f"WHEN '{k}' THEN {v}" for k, v in sorted(_SAMPLE_FRACTIONS.items())
        )
        + " ELSE 0.05 END"
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE {S.bucket_sql('doc_id', 11)} < CAST(FLOOR(({case}) * 1000000) AS BIGINT)
ORDER BY doc_id
"""


def _udaf_weighted_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF tier end-to-end: token-weighted mean quality per language
    via a grouped-aggregate pandas_udf. Oracle: SUM(tok*q)/SUM(tok)."""
    from .functions import udfs as U

    docs = tables.load(spark, "documents", sf_dir)
    text = F.col("text")
    per_doc = docs.select(
        "lang",
        T.token_count_ws(text).cast("double").alias("tok"),
        T.quality_score(text, _EN_STOPWORDS).alias("q"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(F.round(U.weighted_mean_udaf("q", "tok"), 4).alias("wq"))
        .orderBy("lang")
    )


_UDAF_SQL = f"""
SELECT lang,
       ROUND(SUM(ROUND(GREATEST(0.0,
             LEAST(len({_WORDS_SQL}) / 50.0, 1.0) * 0.4
           + LEAST((len(regexp_extract_all(text, '{_STOP_PAT}'))
                    / GREATEST(len({_WORDS_SQL}), 1)) * 5, 1.0) * 0.4
           + (1 - length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                  / GREATEST(length(text), 1)) * 0.2), 4) * len({_WORDS_SQL}))
       / SUM(len({_WORDS_SQL})), 4) AS wq
FROM documents GROUP BY lang ORDER BY lang
"""


def _udtf_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF tier end-to-end (Spark 4 Python table function): word +
    position rows from sampled docs via LATERAL. Oracle: unnest with
    a range ordinal."""
    from .functions import udfs as U

    spark.udtf.register("explode_words", U.make_explode_words_udtf())
    tables.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id, word, idx
        FROM documents, LATERAL explode_words(text)
        WHERE doc_id % 50 = 0
        ORDER BY doc_id, idx
        """
    )


_UDTF_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id % 50 = 0)
SELECT doc_id, w[i] AS word, CAST(i - 1 AS INTEGER) AS idx
FROM toks, unnest(range(1, len(w) + 1)) t(i)
ORDER BY doc_id, idx
"""


# Extra tier: folded variants, pytest-differential coverage unchanged.
register("text_salient_terms", _text_salient_terms, _TEXT_SALIENT_SQL, driver=False)
register("udaf_weighted_quality", _udaf_weighted_quality, _UDAF_SQL, driver=False)
register("udtf_explode_words", _udtf_explode_words, _UDTF_SQL, driver=False)
register("text_redact_pii", _text_redact_pii, _TEXT_REDACT_SQL, driver=False)
register("text_ngram_freq", _text_ngram_freq, _TEXT_NGRAM_FREQ_SQL, driver=False)
register("sample_stratified", _sample_stratified, _sample_stratified_sql(), driver=False)
register("dedup_exact", _dedup_exact, _DEDUP_EXACT_SQL, driver=False)
register("dedup_minhash_signatures", _dedup_minhash_signatures, _MINHASH_SIG_SQL, driver=False)
register("dedup_simhash", _dedup_simhash, _SIMHASH_SQL, driver=False)
register(
    "similarity_lsh_topk",
    lambda spark, sf_dir: _similarity_lsh_topk(spark, sf_dir, multi_probe=False),
    _LSH_SINGLE_PROBE_SQL,
    driver=False,
)  # single-probe contrast to the driver entry
register("similarity_ivf_topk", _similarity_ivf_topk, driver=False)  # rows-only


def _similarity_ann_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF SERVING path with an exact DuckDB oracle (round 11,
    verdict-r10 ask #4): the round-10 steady-state probe proved query
    latency flat in corpus size, but the path carried only probe
    timings + recall properties — this entry puts it on the hash
    line. Index build here is deterministic and SQL-mirrorable so the
    oracle can be EXACT: centroids are the 32 smallest-vec_id
    embeddings (no k-means — the sampled-seed quantizer; k-means
    quality is property-tested with similarity_ivf_topk), each vector
    is assigned to its max-cosine centroid (ties to the lower cluster
    id), and the posting lists round-trip through the REAL durable
    index — ``save_ivf_index`` (range-clustered on cluster id) then
    ``read_ivf_clusters``, which plans ONLY the probed clusters' file
    groups via manifest-stats skipping. Queries (vec_id < 8) route to
    their 4 max-cosine centroids and re-rank exact cosine top-5
    inside the probed lists. A posting list lost in the round-trip, a
    group over-pruned by the stats index, a stale snapshot mixed in,
    or a re-rank error all break the hash; the oracle recomputes
    assignment, routing, and re-rank from raw embeddings in SQL."""
    import math
    import tempfile

    import numpy as np

    # load_parallel: the single-file scan otherwise runs the per-row
    # 32-centroid scoring projection below as ONE task (round 14 —
    # the same fix every CPU-heavy per-row entry uses)
    emb = tables.load_parallel(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    )
    # centroid numbering: the 32 seed embeddings are a bounded collect
    # by construction — number them driver-side instead of an
    # unpartitioned window rank (round 13 hygiene: same 32 rows,
    # warning-free plan, hash unchanged)
    seed_rows = sorted(
        emb.filter(F.col("vec_id") < 32).collect(), key=lambda r: r["vec_id"]
    )
    # assignment: argmax cosine over the 32 centroids, ties -> lower
    # cluster id — as ONE NARROW PROJECTION (round 14, guide §2.4):
    # the centroids are a bounded driver-side list, so each row can
    # score all 32 inline via array_max over literal-centroid structs.
    # The previous crossJoin(broadcast) + groupBy(vec_id) +
    # join-back-on-vec_id shape exploded n rows into n x 32, shuffled
    # them for the max-aggregate, and shuffled AGAIN to re-attach the
    # embedding — two Exchanges and a join for what is per-row math.
    # Bit-identical semantics, piece by piece:
    # - cosine = dot(a,b) / (norm(a) * norm(b)); the row norm is
    #   hoisted into ONE column (the 32 per-element cosines shared it
    #   anyway — no expression-level CSE exists across array elements),
    #   and each centroid norm is precomputed driver-side with the
    #   SAME left-to-right double accumulation + sqrt the aggregate()
    #   HOF performs, so every IEEE operation matches the old plan's;
    # - the literal centroid arrays hold the exact float32 values
    #   widened to double, the same widening V.cosine's cast applied;
    # - struct(cos, -cluster) under array_max uses the same ordering
    #   F.max used (NaN greatest, ties -> higher negc = lower id).
    def _py_norm(vals) -> float:
        acc = 0.0
        for x in vals:
            xd = float(x)
            acc = acc + xd * xd
        return math.sqrt(acc)

    # ONE nested-array literal + transform-with-index, not 32 separate
    # dot/lit branches: each F.lit / HOF lambda costs driver->JVM round
    # trips, and building the 32-branch tree measured 2.4 s of pure
    # DRIVER time per call (phase probe, round 14) — more than the
    # whole query's executor work. Two literals + one lambda build the
    # SAME per-element expressions (element i divides by norms[i+1],
    # negc = -i), so the evaluated math is unchanged op for op.
    cents_lit = F.lit([[float(x) for x in r["embedding"]] for r in seed_rows])
    norms_lit = F.lit([_py_norm(r["embedding"]) for r in seed_rows])
    cands = F.transform(
        cents_lit,
        lambda c, i: F.struct(
            (
                V.dot(F.col("embedding"), c)
                / (F.col("_na") * F.element_at(norms_lit, i + F.lit(1)))
            ).alias("cos"),
            (-i).alias("negc"),
        ),
    )
    assigned = (
        emb.withColumn("_na", V.norm(F.col("embedding")))
        .select(
            "vec_id",
            "embedding",
            (-F.array_max(cands)["negc"]).cast("int").alias("cluster"),
        )
    )
    cent = np.array([r["embedding"] for r in seed_rows], dtype=np.float64)
    root = tempfile.mkdtemp(prefix="netflow_annserve_") + "/ivf"
    # persist across save_ivf_index's two passes (round 14): the
    # clustered overwrite samples range boundaries and then writes —
    # two evaluations of the 32-way scoring projection without the
    # cache, one with. Unpersisted right after the index lands.
    assigned = assigned.persist()
    V.save_ivf_index(root, assigned, cent)  # the durable inverted file
    assigned.unpersist()
    # ---- serving: route queries, read ONLY the probed lists ----
    # query routing is DRIVER-SIDE small-row math (round 14, guide §8
    # "decide with small rows"): the query set is 8 rows BY
    # CONSTRUCTION and every one of them is already in seed_rows
    # (vec_id < 8 is a subset of the vec_id < 32 seed collect), so the
    # 8 x 32 cosine ranking needs no crossJoin + window job at all.
    # Python float arithmetic IS IEEE double with the same
    # left-to-right accumulation the aggregate() HOF performs, so the
    # ranking (cos desc, cluster asc; NaN first, Spark's descending
    # NaN-greatest rule) is value-identical to the plan it replaces.
    def _py_cos(a, b) -> float:
        num = 0.0
        for x, y in zip(a, b):
            num = num + float(x) * float(y)
        return num / (_py_norm(a) * _py_norm(b))

    probe_rows = []
    for r in seed_rows:
        if r["vec_id"] >= 8:
            continue
        scored_c = [
            (_py_cos(r["embedding"], s["embedding"]), j)
            for j, s in enumerate(seed_rows)
        ]
        ranked = sorted(
            range(len(scored_c)),
            key=lambda j: (
                -(
                    float("inf")
                    if math.isnan(scored_c[j][0])
                    else scored_c[j][0]
                ),
                j,
            ),
        )
        probe_rows.extend(
            {"query_id": int(r["vec_id"]), "cluster": j} for j in ranked[:4]
        )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    lists = V.read_ivf_clusters(
        spark, root, {int(r["cluster"]) for r in probe_rows}
    )
    probe_df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(int(r["query_id"]), int(r["cluster"])) for r in probe_rows], 1
        ),
        "query_id long, cluster int",
    )
    scored = (
        lists.join(F.broadcast(probe_df), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


_ANN_SERVE_SQL = """
WITH cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster,
         embedding AS c_emb
  FROM embeddings WHERE vec_id < 32
),
assigned AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT e.vec_id, e.embedding, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             CAST(c.c_emb AS DOUBLE[])) DESC,
                      c.cluster) AS rn
    FROM embeddings e, cent c
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb
  FROM embeddings WHERE vec_id < 8
),
probes AS (
  SELECT query_id, cluster FROM (
    SELECT q.query_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
                                             CAST(c.c_emb AS DOUBLE[])) DESC,
                      c.cluster) AS rn
    FROM q, cent c
  ) WHERE rn <= 4
),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, a.embedding
  FROM probes p JOIN assigned a ON a.cluster = p.cluster
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT c.query_id, c.neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY c.query_id
           ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
                                           CAST(c.embedding AS DOUBLE[])) DESC,
                    c.neighbor_id) AS rank
  FROM cand c JOIN q ON q.query_id = c.query_id
) WHERE rank <= 5 ORDER BY query_id, rank
"""


# Promoted to the driver window round 12 (verdict-r11 ask #8), taking
# similarity_cosine_topk's slot: the driver window now covers the ANN
# SERVING path (durable index round-trip + pruned probing) rather
# than a third build-path variant.
register("similarity_ann_serve", _similarity_ann_serve, _ANN_SERVE_SQL)


def _similarity_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication over the embeddings table
    (vectors.semantic_dedup): k-means clusters, then within-cluster
    connected components of the cosine>=threshold graph keep only
    their least-centroid-typical member. Threshold 0.4 because the
    synthetic corpus has no true semantic dups (max pairwise cosine
    ~0.6) — at 0.4 a stable fraction of vectors prunes, so the entry
    exercises the real group-collapse path at every sf.

    Rows-only extra (k-means is the same non-mirrorable trainer as
    similarity_ivf_topk); the exact semantics are pinned by the
    planted-group property tests in tests/test_extensions.py.
    """
    emb = tables.load(spark, "embeddings", sf_dir)
    return V.semantic_dedup(emb, threshold=0.4).orderBy("vec_id")


register("similarity_semantic_dedup", _similarity_semantic_dedup, driver=False)
def _text_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped-map) surface: per-language z-score of the
    quality signal. Each language group arrives as one pandas frame —
    the natural shape for per-group model-ish transforms (normalize,
    fit, score) that SQL aggregation can't express row-wise in one
    pass. Oracle: window-function equivalent in DuckDB.

    Scale: groups shuffle by key; a group must fit one executor's
    memory — keys here are languages (bounded); for unbounded keys
    pre-bucket or use window functions instead.
    """
    docs = tables.load(spark, "documents", sf_dir)
    per_doc = docs.select(
        "doc_id", "lang", T.token_count_ws(F.col("text")).alias("tok")
    )

    def zscore(pdf):
        import pandas as pd

        mu = pdf["tok"].mean()
        sd = pdf["tok"].std(ddof=1)
        out = pdf[["doc_id", "lang"]].copy()
        # degenerate groups (single doc -> sd NaN; zero variance ->
        # sd 0) must yield NULL like the oracle's STDDEV_SAMP, not
        # NaN/inf from the division
        if pd.isna(sd) or sd == 0:
            out["tok_z"] = None
        else:
            out["tok_z"] = ((pdf["tok"] - mu) / sd).round(4)
        return out

    return per_doc.groupBy("lang").applyInPandas(
        zscore, "doc_id long, lang string, tok_z double"
    ).orderBy("doc_id")


_TEXT_ZSCORE_SQL = f"""
SELECT doc_id, lang,
       ROUND((tok - AVG(tok) OVER (PARTITION BY lang))
             / STDDEV_SAMP(tok) OVER (PARTITION BY lang), 4) AS tok_z
FROM (SELECT doc_id, lang, len({_WORDS_SQL}) AS tok FROM documents)
ORDER BY doc_id
"""


def _profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass (the pipeline-health query every ingest
    runs): per-column null counts + distinct counts + numeric range
    over events, in ONE scan (conditional aggregation, no per-column
    jobs)."""
    ev = tables.load(spark, "events", sf_dir)
    return ev.select(
        F.count("*").alias("rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user_id"),
        F.sum(F.col("event_type").isNull().cast("long")).alias("null_event_type"),
        F.sum(F.col("props").isNull().cast("long")).alias("null_props"),
        F.count_distinct("user_id").alias("distinct_users"),
        F.count_distinct("event_type").alias("distinct_types"),
        # integer 1e-4 units, not ROUND(...,4) doubles: Spark and DuckDB
        # can disagree in the last ulp of a rounded double, but
        # FLOOR(x*10000) is the same IEEE multiply + exact floor in both
        F.floor(F.min("value") * 10000).alias("min_value_e4"),
        F.floor(F.max("value") * 10000).alias("max_value_e4"),
    )


_PROFILE_SQL = """
SELECT COUNT(*) AS rows,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
       CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
       CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
       COUNT(DISTINCT user_id) AS distinct_users,
       COUNT(DISTINCT event_type) AS distinct_types,
       CAST(FLOOR(MIN(value) * 10000) AS BIGINT) AS min_value_e4,
       CAST(FLOOR(MAX(value) * 10000) AS BIGINT) AS max_value_e4
FROM events
"""


def _scalar_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order scalar surface (size, contains, slice, join,
    distinct+sort, posexplode-equivalent counting) over the tokenized
    documents — narrow per-row expressions, no shuffle until the final
    order."""
    docs = tables.load(spark, "documents", sf_dir).filter(F.col("doc_id") % 7 == 0)
    w = T.words(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.array_contains(w, "table").cast("boolean").alias("has_table"),
        F.array_join(F.slice(w, 1, 3), "_").alias("first3"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.element_at(F.array_sort(F.array_distinct(w)), 1).alias("first_sorted"),
    ).orderBy("doc_id")


_SCALAR_ARRAY_SQL = f"""
SELECT doc_id,
       len({_WORDS_SQL}) AS n_words,
       list_contains({_WORDS_SQL}, 'table') AS has_table,
       array_to_string(({_WORDS_SQL})[1:3], '_') AS first3,
       len(list_distinct({_WORDS_SQL})) AS n_distinct,
       list_sort(list_distinct({_WORDS_SQL}))[1] AS first_sorted
FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id
"""


def _dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering end-to-end: MinHash banding -> STAR-reduced
    candidate edges -> connected components -> canonical doc per
    cluster. The full LLM-corpus dedup pipeline in one plan (rows-only
    driver check; cluster correctness is tested on planted clusters).

    Round 13: the components input switched from the all-pairs
    candidates to the star edges (per band bucket, min-doc -> others)
    — the LABELS ARE IDENTICAL (a star spans exactly the docs its
    clique spans; pinned by test_star_edges_components_equivalence,
    and this entry's own oracle is unchanged), but the edge volume is
    linear in bucket size instead of quadratic, so one viral
    boilerplate bucket can no longer blow up the candidate stage
    (BASELINE.md round-13 skew probes: all-pairs fails outright at
    10x-skew while the star runs 30x flat). The all-pairs contract
    stays on the driver tier as dedup_minhash_candidates."""
    from .operators import components as C
    from .queries_streaming import _bounded_state_partitions

    # unordered edge frame: the star entry's presentation orderBy is
    # label-invariant here and only cost a global sort (round 14)
    pairs = _star_edges_frame(spark, sf_dir)
    # iterative rounds shuffle tiny label frames every pass — a vanilla
    # 200-partition session pays 200 empty tasks per round without this
    with _bounded_state_partitions(spark, 8):
        comp = C.connected_components(pairs)
        docs = tables.load(spark, "documents", sf_dir).select("doc_id")
        kept = C.dedup_keep_canonical(docs, comp)
        return (
            comp.orderBy("node")
            .unionByName(
                spark.createDataFrame(
                    [(-1, kept.count())], "node long, component long"
                )  # sentinel row carrying the surviving-doc count
            )
        )


def _similarity_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized vector search: per-vector absmax scale, int8
    codes (4x smaller than float32, 8x smaller than float64 — the
    storage/bandwidth play at 100 TB), cosine over dequantized codes,
    top-5 per query. All built-in expressions (transform/aggregate);
    recall vs full precision is property-tested.
    """
    emb = tables.load(spark, "embeddings", sf_dir)
    e = F.col("embedding")
    # two-step select: the scale column must exist before q8 reads it.
    # GREATEST floor on the divisor: an all-zero embedding gives
    # scale=0, where Spark's TINYINT cast of inf/nan yields NULL but
    # DuckDB's raises — the guard (mirrored in the oracle) keeps both
    # engines on the same, defined path (q8 = all zeros).
    scaled = emb.select(
        "vec_id",
        "embedding",
        F.greatest(
            F.array_max(F.transform(e, F.abs)), F.lit(1e-30)
        ).alias("scale"),
    )
    quant = scaled.select(
        "vec_id",
        "scale",
        F.transform(
            F.col("embedding"), lambda x: F.round(x / F.col("scale") * 127).cast("tinyint")
        ).alias("q8"),
    )
    deq = quant.select(
        "vec_id",
        F.transform(F.col("q8"), lambda c: c.cast("double") * F.col("scale") / 127).alias(
            "deq"
        ),
    )
    qs = deq.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("deq").alias("q_emb")
    )
    pairs = deq.crossJoin(F.broadcast(qs)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        V.cosine(F.col("q_emb"), F.col("deq")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


# Exact oracle for the iterative fixpoint: component labels are a pure
# function of the (already hash-exact) candidate pairs, so DuckDB
# min-label reachability via WITH RECURSIVE reproduces them exactly —
# walk(node, label) enumerates every label reachable from node along
# symmetric edges; MIN over it is the canonical component id. The
# sentinel row mirrors dedup_keep_canonical's surviving-doc count:
# docs - clustered nodes + one canonical per cluster.
_COMPONENTS_SQL = (
    "WITH RECURSIVE "
    + _MINHASH_CAND_CTES
    + ", pairs AS ("
    + _MINHASH_CAND_SELECT
    + "), edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
    "  UNION SELECT doc_b, doc_a FROM pairs), "
    "walk(node, label) AS ("
    "  SELECT u, u FROM edges"
    "  UNION"
    "  SELECT e.u, w.label FROM walk w JOIN edges e ON e.v = w.node), "
    "comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node) "
    "SELECT node, component FROM comp "
    "UNION ALL "
    "SELECT CAST(-1 AS BIGINT) AS node, "
    "       (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM comp)"
    "       + (SELECT COUNT(DISTINCT component) FROM comp) AS component "
    "ORDER BY node"
)


# Mirrors the Spark typing exactly: Spark's `/` promotes float operands
# to double while DuckDB's stays float, so every division/multiply is
# explicitly CAST to DOUBLE; ROUND is half-away-from-zero on doubles in
# both engines; rank-only output dodges float compares except at ties,
# where both engines rank the same IEEE doubles.
_QUANT_TOPK_SQL = """
WITH s AS (
  SELECT vec_id, embedding,
         GREATEST(list_max(list_transform(embedding, y -> abs(y))), 1e-30) AS scale
  FROM embeddings
),
quant AS (
  SELECT vec_id, scale,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) / CAST(scale AS DOUBLE) * 127) AS TINYINT)) AS q8
  FROM s
),
deq AS (
  SELECT vec_id,
         list_transform(q8,
           c -> CAST(c AS DOUBLE) * CAST(scale AS DOUBLE) / 127) AS deq
  FROM quant
),
q AS (SELECT vec_id AS query_id, deq AS q_emb FROM deq WHERE vec_id < 10),
scored AS (
  SELECT query_id, d.vec_id AS neighbor_id,
         list_cosine_similarity(q_emb, d.deq) AS cos
  FROM q, deq d WHERE d.vec_id <> query_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY query_id, rank
"""


register("dedup_components", _dedup_components, _COMPONENTS_SQL)
# Retired to the pytest tier in round 6 to make driver-window room for
# the streaming-curator backfill entry: quantized top-k is a variant of
# the cosine/ANN rows that keep driver coverage; its oracle still runs
# in the pytest differential and the recall property test.
register(
    "similarity_quantized_topk", _similarity_quantized_topk, _QUANT_TOPK_SQL, driver=False
)
# Retired to the pytest tier in round 6 (displaced by
# corpus_substring_dedup): its array-function semantics overlap
# scalar_functions and the suite entries; the oracle stays green in
# tests/test_oracle_corpus.py.
register("scalar_array_functions", _scalar_array_functions, _SCALAR_ARRAY_SQL, driver=False)
# Retired to the pytest tier in round 11 (displaced by
# storage_sink_stream, the native streaming sink): its grouped-agg
# pandas_udf evidence overlaps udf_surface; the exact oracle stays
# green in tests/test_oracle_corpus.py.
register(
    "text_zscore_by_lang", _text_zscore_by_lang, _TEXT_ZSCORE_SQL, driver=False
)
register("profile_columns", _profile_columns, _PROFILE_SQL)
register("text_analysis", _text_analysis, _TEXT_ANALYSIS_SQL)
def _text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between consecutive docs' prefixes —
    the exact-similarity scalar complementing the probabilistic
    detectors (Spark and DuckDB implement the same definition).
    Prefix-bounded (80 chars) because edit distance is O(len^2) per
    pair — at scale it's a RERANKER for candidate pairs, never a
    corpus-wide scan."""
    docs = tables.load(spark, "documents", sf_dir).select(
        "doc_id", F.substring("text", 1, 80).alias("p")
    )
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("p").alias("p_next")
    )
    return (
        docs.join(nxt, "doc_id")
        .select("doc_id", F.levenshtein("p", "p_next").alias("edit_dist"))
        .orderBy("doc_id")
    )


_TEXT_EDIT_SQL = """
SELECT a.doc_id, levenshtein(substring(a.text, 1, 80), substring(b.text, 1, 80)) AS edit_dist
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
ORDER BY a.doc_id
"""


_RH_P = 2147483647  # 2^31 - 1
_RH_B = 131


def _text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints, ORDER-SENSITIVE (unlike the
    set-based MinHash/SimHash family):

    - poly_hash: Rabin-Karp left fold over the word-hash sequence,
      acc = (acc*B + h) mod P — word reordering changes it;
    - winnow_min: min over the 3-gram shingle hashes (the winnowing
      selection step — robust to local edits, cheap to band on).

    Both are single-pass array folds inside codegen; exactly mirrored
    in DuckDB via list_reduce/list_transform.
    """
    docs = tables.load_parallel(spark, "documents", sf_dir)
    h = lambda c: T.md5_hash32(c, 7) % _RH_P  # noqa: E731
    pre = docs.select("doc_id", T.words(F.col("text")).alias("w"))
    sh = T.shingles_from_words(F.col("w"), 3)
    winnow = F.array_min(F.transform(sh, lambda s: h(s)))
    return pre.select(
        "doc_id",
        F.aggregate(
            F.transform(F.col("w"), lambda x: h(x)),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * _RH_B + x) % _RH_P,
        ).alias("poly_hash"),
        winnow.alias("winnow_min"),
    ).orderBy("doc_id")


_H7 = T.md5_hash32_sql("x", 7)
_H7_SH = T.md5_hash32_sql("s", 7)
_ROLLING_SQL = f"""
WITH pre AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
sh AS (
  SELECT doc_id,
         list(concat_ws(' ', w[i], w[i+1], w[i+2]) ORDER BY i) AS grams
  FROM pre, unnest(range(1, len(w) - 1)) t(i)
  GROUP BY doc_id
)
SELECT pre.doc_id,
       list_reduce(
         [CAST(0 AS BIGINT)] || list_transform(pre.w, x -> {_H7} % {_RH_P}),
         (acc, x) -> (acc * {_RH_B} + x) % {_RH_P}
       ) AS poly_hash,
       list_min(list_transform(sh.grams, s -> {_H7_SH} % {_RH_P})) AS winnow_min
FROM pre LEFT JOIN sh USING (doc_id)
ORDER BY doc_id
"""


register("text_rolling_fingerprint", _text_rolling_fingerprint, _ROLLING_SQL)
register("text_edit_distance", _text_edit_distance, _TEXT_EDIT_SQL)
# text_stats_by_lang aggregates the hash-checked per-doc text_analysis
# columns — folded to the extra tier for the driver window.
register("text_stats_by_lang", _text_stats_by_lang, _TEXT_STATS_SQL, driver=False)


# --- Training-pipeline operators round 4: decontamination, global ----------
# --- shuffle sharding, intra-doc repetition --------------------------------


def _text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (the pre-training hygiene pass): flag
    every corpus document sharing a 5-word shingle with any eval item.
    The eval set is contaminated BY CONSTRUCTION — each item is the
    first 12 words of every 83rd document — so the detector must find
    at least those source docs (asserted in tests) and any true
    near-dups.

    Scale shape: shingle inverted-index equi-join (never doc x eval
    cross product); the eval side is tiny and broadcasts. 5-gram
    shingles (not 3) keep join fan-out down — real decontamination
    uses 8-13-grams for the same reason.
    """
    docs = tables.load_parallel(spark, "documents", sf_dir)
    w = docs.select("doc_id", T.words(F.col("text")).alias("w"))
    corpus_sh = w.select(
        "doc_id", F.explode(T.shingles_from_words(F.col("w"), 5)).alias("shingle")
    ).distinct()
    eval_sh = (
        w.filter(F.col("doc_id") % 83 == 0)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.explode(
                T.shingles_from_words(F.slice(F.col("w"), 1, 12), 5)
            ).alias("shingle"),
        )
        .distinct()
    )
    hits = corpus_sh.join(F.broadcast(eval_sh), "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("shingle").alias("n_shared_shingles"),
            F.count_distinct("eval_id").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


_DECONTAMINATE_SQL = f"""
WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
corpus_sh AS (
  SELECT DISTINCT doc_id,
         concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]) AS shingle
  FROM toks, unnest(range(1, len(w) - 3)) t(i)
),
eval_sh AS (
  SELECT DISTINCT doc_id AS eval_id,
         concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]) AS shingle
  FROM (SELECT doc_id, w[1:12] AS w FROM toks WHERE doc_id % 83 = 0),
       unnest(range(1, len(w) - 3)) t(i)
)
SELECT doc_id,
       COUNT(DISTINCT shingle) AS n_shared_shingles,
       COUNT(DISTINCT eval_id) AS n_eval_docs
FROM corpus_sh JOIN eval_sh USING (shingle)
GROUP BY doc_id ORDER BY doc_id
"""


_N_SHARDS = 16


def _corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: every doc
    gets an md5 sort key (pure function of doc_id + seed — the
    reshuffle-between-epochs primitive that survives retries and
    cluster resizes, unlike orderBy(rand())); shard = key % 16. The
    checkable surface is per-shard counts, key ranges AND an
    order-sensitive md5 fingerprint of the doc sequence — proving the
    exact within-shard order, not just membership.

    Scale: one hash-partitioned shuffle on the shard id; the order
    fingerprint is a sorted collect_list per shard, bounded by shard
    size (at 100 TB, shards are written with sortWithinPartitions and
    the fingerprint becomes a streaming fold — the demo-scale
    collect_list keeps it oracle-exact)."""
    docs = tables.load(spark, "documents", sf_dir)
    keyed = docs.select(
        "doc_id",
        T.md5_hash32(F.col("doc_id").cast("string"), seed=42).alias("key"),
    ).withColumn("shard", F.col("key") % _N_SHARDS)
    return (
        keyed.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("key").alias("first_key"),
            F.max("key").alias("last_key"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("key", "doc_id"))),
                        lambda x: x["doc_id"].cast("string"),
                    ),
                    ",",
                )
            ).alias("order_md5"),
        )
        .orderBy("shard")
    )


_SHARD_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         {T.md5_hash32_sql("CAST(doc_id AS VARCHAR)", 42)} AS key
  FROM documents
)
SELECT key % {_N_SHARDS} AS shard,
       COUNT(*) AS n_docs,
       MIN(key) AS first_key,
       MAX(key) AS last_key,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY key, doc_id)) AS order_md5
FROM keyed
GROUP BY 1 ORDER BY shard
"""


def _text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition (the Gopher-style rep filter): the
    fraction of repeated 3-word shingles inside each doc. Pure narrow
    codegen expressions — no shuffle until the final order."""
    docs = tables.load(spark, "documents", sf_dir)
    w = T.words(F.col("text"))
    sh = T.shingles_from_words(w, 3)
    n_total = F.size(sh)
    n_distinct = F.size(F.array_distinct(sh))
    return (
        docs.select(
            "doc_id",
            n_total.cast("long").alias("n_shingles"),
            n_distinct.cast("long").alias("n_distinct"),
            F.when(n_total > 0, F.round(1.0 - n_distinct / n_total, 6))
            .otherwise(F.lit(None).cast("double"))
            .alias("rep_ratio"),
        )
        .orderBy("doc_id")
    )


_REPETITION_SQL = f"""
WITH sh AS (
  SELECT doc_id, list(concat_ws(' ', w[i], w[i+1], w[i+2]) ORDER BY i) AS grams
  FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
       unnest(range(1, len(w) - 1)) t(i)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(len(sh.grams), 0) AS n_shingles,
       COALESCE(len(list_distinct(sh.grams)), 0) AS n_distinct,
       CASE WHEN COALESCE(len(sh.grams), 0) > 0
            THEN ROUND(1.0 - len(list_distinct(sh.grams)) / len(sh.grams), 6)
            ELSE NULL END AS rep_ratio
FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
ORDER BY d.doc_id
"""


register("text_decontaminate", _text_decontaminate, _DECONTAMINATE_SQL, driver=False)
register("corpus_shard_shuffle", _corpus_shard_shuffle, _SHARD_SHUFFLE_SQL, driver=False)
register("text_repetition_score", _text_repetition_score, _REPETITION_SQL, driver=False)


# --- The end-to-end corpus curation pipeline -------------------------------

_CURATE_MIN_TOKENS = 30
_CURATE_MAX_REP = 0.012


def _corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE training-corpus pipeline, composed end-to-end in one plan:

      quality filter (token count + repetition ratio)
        -> exact dedup (md5 fingerprint, keep min doc_id)
        -> near-dup removal (MinHash banding -> connected components
           -> keep canonical)
        -> eval-set decontamination (5-gram overlap drop)

    Every stage is individually hash-exact against DuckDB, so the
    COMPOSITION is too — the full pipeline a user would actually run,
    verified end to end, not just its pieces. Scale: each stage is a
    narrow filter, a fingerprint groupBy, a band equi-join or a
    broadcast anti-join — the same shapes as the standalone entries.
    """
    from .operators import components as C

    docs = tables.load_parallel(spark, "documents", sf_dir)
    w = docs.select("doc_id", "lang", "text", T.words(F.col("text")).alias("w"))
    sh3 = T.shingles_from_words(F.col("w"), 3)
    # persist the METRICS projection, filter above the cache: with the
    # filter directly on the projection, predicate pushdown substitutes
    # the n_tokens/rep aliases into the condition and re-evaluates the
    # words()/shingles HOF chain ~6x per row; against the cached
    # columns the filter is two cheap comparisons (measured ~2s off
    # every invocation at sf0.1). Tiny: metrics + tokens for one small
    # table's rows. track_persist registers the handle so a bench/
    # driver loop reclaims it via tables.clear_caches between passes.
    metrics = tables.track_persist(
        w.select(
            "doc_id",
            "lang",
            "text",
            "w",
            F.size("w").cast("long").alias("n_tokens"),
            (1.0 - F.size(F.array_distinct(sh3)) / F.size(sh3)).alias("rep"),
        )
    )
    quality = metrics.filter(
        (F.col("n_tokens") >= _CURATE_MIN_TOKENS) & (F.col("rep") <= _CURATE_MAX_REP)
    )
    # exact dedup: min doc_id survives per normalized-text fingerprint
    fp = quality.withColumn("fp", T.fingerprint(F.col("text")))
    keep_ids = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    exact = tables.track_persist(fp.join(keep_ids, ["fp", "doc_id"], "left_semi"))
    # near-dup removal over the survivors: banding -> components.
    # Signatures per ROW (array_min over the hashed shingle array,
    # round 15 — see _minhash_sig_frame): no explode, no
    # groupBy(doc_id) shuffle; the empty-array filter reproduces
    # explode's drop-empty-docs semantics and MIN over the exploded
    # multiset equals array_min over the array, so the oracle's
    # explode+GROUP BY formulation still pins the values.
    shing = exact.select(
        "doc_id", T.shingles_from_words(F.col("w"), 3).alias("_sh")
    ).filter(F.size("_sh") > 0)
    hashed = shing.select(
        "doc_id", F.transform("_sh", lambda s: T.md5_hash32(s)).alias("_h")
    )
    sig = hashed.select("doc_id", *T.minhash_sig_cols(F.col("_h"), N_MINHASH))
    band_keys = F.array(
        *[
            F.concat_ws(
                "-",
                F.lit(str(b)),
                *[
                    F.col(f"sig_{b * _ROWS_PER_BAND + r}").cast("string")
                    for r in range(_ROWS_PER_BAND)
                ],
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_keys).alias("band_key"))
    # STAR-reduced edges, not the all-pairs self-join (round 15): the
    # components consumer only needs connectivity, and a star (bucket-
    # min doc -> others) spans exactly the docs the bucket's clique
    # spans, so the labels are identical (pinned by
    # test_star_edges_components_equivalence and this entry's own
    # oracle, whose SQL keeps the all-pairs formulation). Edge volume
    # is linear in bucket size instead of quadratic — the r13 viral-
    # bucket fix (dedup_components) applied to the flagship
    # composition. Hub via WINDOW min over band_key, not
    # groupBy+join-back: the join form re-evaluated the shingle+
    # MinHash subtree (over the `exact` cache) once per side; the
    # window computes it once behind a single band_key exchange, and
    # min-over-partition equals the groupBy min row for row
    # (see _star_edges_frame).
    hub = F.min("doc_id").over(Window.partitionBy("band_key"))
    pairs = (
        banded.withColumn("hub", hub)
        .filter(F.col("doc_id") > F.col("hub"))
        .select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    comp = C.connected_components(pairs)
    canon = C.dedup_keep_canonical(exact, comp)
    # decontamination: eval items carved from the ORIGINAL corpus
    eval_sh = (
        w.filter(F.col("doc_id") % 83 == 0)
        .select(
            F.explode(T.shingles_from_words(F.slice(F.col("w"), 1, 12), 5)).alias(
                "shingle"
            )
        )
        .distinct()
    )
    # cand5 is NOT pre-deduplicated (round 14): it probes a broadcast
    # hash join (no exchange on this side), and the trailing
    # distinct-on-doc_id absorbs repeated hits — the old .distinct()
    # was a full shuffle of (doc_id, 5-gram string) rows purely to
    # shrink broadcast-probe input, a bad trade at any scale.
    cand5 = canon.select(
        "doc_id", F.explode(T.shingles_from_words(F.col("w"), 5)).alias("shingle")
    )
    contaminated = cand5.join(F.broadcast(eval_sh), "shingle").select("doc_id").distinct()
    # `exact` stays cached (3 downstream consumers: shingles, canon,
    # final join — uncached it re-executes the quality+dedup subtree
    # 3x). A few MB at demo scale; LRU-evicted like any cache. Not
    # checkpointed: the caller sees the REAL composed plan.
    return (
        canon.join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    )


_CURATE_SQL = (
    "WITH RECURSIVE "
    f"toks AS (SELECT doc_id, lang, text, {_WORDS_SQL} AS w FROM documents), "
    "g AS (SELECT doc_id, list(concat_ws(' ', w[i], w[i+1], w[i+2])) AS grams "
    "      FROM toks, unnest(range(1, len(w) - 1)) t(i) GROUP BY doc_id), "
    "q AS (SELECT t.doc_id, t.lang, t.text, t.w, len(t.w) AS n_tokens "
    "      FROM toks t JOIN g USING (doc_id) "
    f"     WHERE len(t.w) >= {_CURATE_MIN_TOKENS} "
    f"       AND 1.0 - len(list_distinct(g.grams)) / len(g.grams) <= {_CURATE_MAX_REP}), "
    "f AS (SELECT q.*, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM q), "
    "keep AS (SELECT doc_id, lang, n_tokens, w FROM f "
    "         QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)), "
    "sh AS (SELECT DISTINCT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle "
    "       FROM keep, unnest(range(1, len(w) - 1)) t(i)), "
    "sig AS (SELECT doc_id, "
    + ", ".join(
        f"MIN({T.affine_hash32_sql(_BASE_H_SQL, s)}) AS sig_{s}"
        for s in range(N_MINHASH)
    )
    + " FROM sh GROUP BY doc_id), "
    "banded AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {_band_key_sql(b)} AS band_key FROM sig" for b in range(N_BANDS)
    )
    + "), "
    "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "          FROM banded a JOIN banded b USING (band_key) WHERE a.doc_id < b.doc_id), "
    "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
    "          UNION SELECT doc_b, doc_a FROM pairs), "
    "walk(node, label) AS (SELECT u, u FROM edges UNION "
    "                      SELECT e.u, wk.label FROM walk wk JOIN edges e ON e.v = wk.node), "
    "comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node), "
    "canon AS (SELECT k.* FROM keep k LEFT JOIN comp ON k.doc_id = comp.node "
    "          WHERE comp.node IS NULL OR comp.component = k.doc_id), "
    "eval_sh AS (SELECT DISTINCT concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]) AS shingle "
    "            FROM (SELECT w[1:12] AS w FROM toks WHERE doc_id % 83 = 0), "
    "                 unnest(range(1, len(w) - 3)) t(i)), "
    "cand5 AS (SELECT DISTINCT c.doc_id, "
    "                 concat_ws(' ', c.w[i], c.w[i+1], c.w[i+2], c.w[i+3], c.w[i+4]) AS shingle "
    "          FROM canon c, unnest(range(1, len(c.w) - 3)) t(i)), "
    "contaminated AS (SELECT DISTINCT doc_id FROM cand5 JOIN eval_sh USING (shingle)) "
    "SELECT c.doc_id, c.lang, c.n_tokens FROM canon c "
    "ANTI JOIN contaminated ct USING (doc_id) ORDER BY doc_id"
)


# Promoted to the driver tier in round 5: the composed curation pipeline
# is the LLM-pipeline flagship and deserves a CORRECTNESS row more than
# the near-duplicate parity singletons it displaced.
register("corpus_curate", _corpus_curate, _CURATE_SQL)


def _sample_join_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes hash sampling worth it on a star schema:
    sampling orders AND lineitem independently on the SAME key at the
    same fraction/seed yields a consistent sub-database — zero orphan
    lineitems (item sampled, order not) and zero missing lineitems
    (order sampled, item not). df.sample() cannot do this: its per-task
    RNG decides each table independently. One summary row; the zeros
    ARE the driver-checkable proof."""
    from .functions import sampling as S

    orders = tables.load(spark, "orders", sf_dir).select("o_orderkey")
    li = tables.load(spark, "lineitem", sf_dir).select("l_orderkey", "l_linenumber")
    so = S.sample_fraction(orders, "o_orderkey", 0.1, seed=5)
    sl = S.sample_fraction(li, "l_orderkey", 0.1, seed=5)
    orphans = sl.join(
        so, sl.l_orderkey == so.o_orderkey, "left_anti"
    )
    missing = (
        li.join(so, li.l_orderkey == so.o_orderkey, "left_semi")
        .join(sl, ["l_orderkey", "l_linenumber"], "left_anti")
    )
    counts = [
        so.agg(F.count("*").alias("n_orders")),
        sl.agg(F.count("*").alias("n_items")),
        orphans.agg(F.count("*").alias("orphan_items")),
        missing.agg(F.count("*").alias("missing_items")),
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


def _sample_join_consistent_sql() -> str:
    from .functions import sampling as S

    keep_o = f"{S.bucket_sql('o_orderkey', 5)} < 100000"
    keep_l = f"{S.bucket_sql('l_orderkey', 5)} < 100000"
    return f"""
SELECT
  (SELECT COUNT(*) FROM orders WHERE {keep_o}) AS n_orders,
  (SELECT COUNT(*) FROM lineitem WHERE {keep_l}) AS n_items,
  (SELECT COUNT(*) FROM lineitem WHERE {keep_l}
     AND l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE {keep_o})) AS orphan_items,
  (SELECT COUNT(*) FROM lineitem WHERE NOT ({keep_l})
     AND l_orderkey IN (SELECT o_orderkey FROM orders WHERE {keep_o})) AS missing_items
"""


register(
    "sample_join_consistent",
    _sample_join_consistent,
    _sample_join_consistent_sql(),
    driver=False,
)


def _neardup_index_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming near-dup index (streaming/neardup_index) driven
    over a deterministic two-batch backfill: even doc_ids register
    first, odd doc_ids probe second — the emitted (new, prior) pairs
    must equal the batch formulation's cross-half band join, which is
    the oracle. Proves the persistent-index detection agrees with the
    batch dedup family exactly (same md5 banding, same hits)."""
    import tempfile

    from .streaming.neardup_index import NearDupIndex

    docs = tables.load(spark, "documents", sf_dir)
    from .queries_streaming import _run_tmp_root

    idx = NearDupIndex(_run_tmp_root("netflow_ndidx_") + "/t")
    idx.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    pairs = idx.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    return pairs.orderBy("new_doc_id", "prior_doc_id")


def _half_banded_ctes(prefix: str, where: str) -> str:
    sigs = ", ".join(
        f"MIN({T.affine_hash32_sql(_BASE_H_SQL, s)}) AS sig_{s}"
        for s in range(N_MINHASH)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {_band_key_sql(b)} AS band_key FROM {prefix}_sig"
        for b in range(N_BANDS)
    )
    return (
        f"{prefix}_toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents WHERE {where}), "
        f"{prefix}_sh AS (SELECT DISTINCT doc_id, "
        f"  concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle "
        f"  FROM {prefix}_toks, unnest(range(1, len(w) - 1)) t(i)), "
        f"{prefix}_sig AS (SELECT doc_id, {sigs} FROM {prefix}_sh GROUP BY doc_id), "
        f"{prefix}_banded AS ({unions})"
    )


_NEARDUP_BACKFILL_SQL = (
    "WITH "
    + _half_banded_ctes("h1", "doc_id % 2 = 0")
    + ", "
    + _half_banded_ctes("h2", "doc_id % 2 = 1")
    + " SELECT DISTINCT b.doc_id AS new_doc_id, a.doc_id AS prior_doc_id "
    "FROM h2_banded b JOIN h1_banded a USING (band_key) "
    "ORDER BY new_doc_id, prior_doc_id"
)


register(
    "neardup_index_backfill",
    _neardup_index_backfill,
    _NEARDUP_BACKFILL_SQL,
    driver=False,
)


def _corpus_curate_stream_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming curation job (streaming/curate_job.StreamingCurator
    — the engine's flagship composition) driven over a deterministic
    two-batch backfill: even doc_ids arrive as batch 0, odd as batch 1,
    with the batch pipeline's quality thresholds. Batch 1 is then
    quality-filtered, exact-deduped in-batch AND against batch 0's
    accepted fingerprints, and near-dup-checked against the persistent
    band-key index of batch 0's accepted docs. The landed VersionedTable
    is the result — hashed end-to-end against a batch-SQL oracle that
    replays both micro-batches, so the cross-batch state machinery
    (accepted-fp anti-join, LSH index detect/register split, idempotent
    landing) has driver-tier hash evidence, not just pytest invariants.
    Decontamination is exercised by ``corpus_curate``; here the eval
    list is empty so the oracle stays two-batch-shaped."""
    from .queries_streaming import _run_tmp_root
    from .streaming.curate_job import StreamingCurator

    # load_parallel: the single-file scan otherwise feeds every
    # CPU-heavy batch stage (tokenize/shingle/MinHash x2 batches) as
    # ONE task; the repartitioned cache makes both batches distributed
    docs = tables.load_parallel(spark, "documents", sf_dir)
    cur = StreamingCurator(
        _run_tmp_root("netflow_curator_") + "/t",
        min_tokens=_CURATE_MIN_TOKENS,
        max_repetition=_CURATE_MAX_REP,
    )
    cur.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    cur.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    return (
        cur.curated.read(spark)
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    )


_CURATE_STREAM_SQL = (
    "WITH "
    f"toks AS (SELECT doc_id, lang, text, {_WORDS_SQL} AS w FROM documents), "
    "g AS (SELECT doc_id, list(concat_ws(' ', w[i], w[i+1], w[i+2])) AS grams "
    "      FROM toks, unnest(range(1, len(w) - 1)) t(i) GROUP BY doc_id), "
    "q AS (SELECT t.doc_id, t.lang, len(t.w) AS n_tokens, "
    "             md5(regexp_replace(lower(trim(t.text)), '\\s+', ' ', 'g')) AS fp "
    "      FROM toks t JOIN g USING (doc_id) "
    f"     WHERE len(t.w) >= {_CURATE_MIN_TOKENS} "
    f"       AND 1.0 - len(list_distinct(g.grams)) / len(g.grams) <= {_CURATE_MAX_REP}), "
    # batch 0: in-batch exact dedup only (index and accepted set empty)
    "acc0 AS (SELECT * FROM q WHERE doc_id % 2 = 0 "
    "         QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)), "
    # batch 1: in-batch exact dedup, then anti-join vs accepted fps
    "b1 AS (SELECT * FROM q WHERE doc_id % 2 = 1 "
    "       QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)), "
    "b1x AS (SELECT * FROM b1 WHERE fp NOT IN (SELECT fp FROM acc0)), "
    # near-dup: batch 1 survivors' band keys vs batch 0 accepted's
    + _half_banded_ctes("a0", "doc_id IN (SELECT doc_id FROM acc0)")
    + ", "
    + _half_banded_ctes("n1", "doc_id IN (SELECT doc_id FROM b1x)")
    + ", "
    "nd AS (SELECT DISTINCT n.doc_id FROM n1_banded n "
    "       JOIN a0_banded a USING (band_key)), "
    "acc1 AS (SELECT * FROM b1x WHERE doc_id NOT IN (SELECT doc_id FROM nd)) "
    "SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens "
    "FROM (SELECT doc_id, lang, n_tokens FROM acc0 "
    "      UNION ALL SELECT doc_id, lang, n_tokens FROM acc1) "
    "ORDER BY doc_id"
)


# Driver tier (round 6): the streaming curation stack previously had
# only pytest evidence; this backfill formulation gives the composed
# cross-batch machinery a CORRECTNESS hash row.
register(
    "corpus_curate_stream_backfill",
    _corpus_curate_stream_backfill,
    _CURATE_STREAM_SQL,
)


_PACK_CAP = 2048
_PACK_PARTS = 8


def _corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget bin packing (sequence packing for training
    efficiency): documents are laid out in a deterministic md5 order
    and assigned to fixed-capacity bins by their cumulative-token START
    offset — the batch-shardable approximation of greedy packing
    (a bin may overflow by its last doc's tail; none underflows except
    the final one).

    Scale pattern: a GLOBAL cumulative sum without the unpartitioned-
    window single-task trap — the classic two-phase prefix sum. Local
    cumsums per hash partition, then a P-row offset table (the only
    unpartitioned window, over exactly _PACK_PARTS rows regardless of
    data size) broadcast back. Exactly oracle-able: integer sums and
    an md5 order reproduced in DuckDB."""
    docs = tables.load(spark, "documents", sf_dir)
    t = docs.select(
        "doc_id",
        F.size(T.words(F.col("text"))).cast("long").alias("tok"),
        T.md5_hash32(F.col("doc_id").cast("string"), seed=7).alias("ord"),
    ).withColumn("p", F.col("ord") % _PACK_PARTS)
    w_local = (
        Window.partitionBy("p")
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = t.withColumn("cum", F.sum("tok").over(w_local))
    totals = t.groupBy("p").agg(F.sum("tok").alias("ptotal"))
    w_off = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "off", F.coalesce(F.sum("ptotal").over(w_off), F.lit(0))
    ).select("p", "off")
    packed = local.join(F.broadcast(offsets), "p").withColumn(
        "bin_id",
        F.floor((F.col("off") + F.col("cum") - F.col("tok")) / F.lit(float(_PACK_CAP))),
    )
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("bin_tokens"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("bin_id")
    )


_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, len({_WORDS_SQL}) AS tok,
         {T.md5_hash32_sql("CAST(doc_id AS VARCHAR)", 7)} AS ord
  FROM documents
),
tp AS (SELECT *, ord % {_PACK_PARTS} AS p FROM t),
l AS (
  SELECT *, SUM(tok) OVER (PARTITION BY p ORDER BY ord, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM tp
),
o AS (
  SELECT p, COALESCE(SUM(ptotal) OVER (ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM (SELECT p, SUM(tok) AS ptotal FROM tp GROUP BY p)
)
SELECT CAST(FLOOR((o.off + l.cum - l.tok) / {_PACK_CAP}.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS bin_tokens,
       MIN(doc_id) AS min_doc
FROM l JOIN o USING (p)
GROUP BY 1 ORDER BY bin_id
"""


register("corpus_pack_bins", _corpus_pack_bins, _PACK_SQL)  # promoted round 5


_CHUNK_TOKENS = 64
_CHUNK_OVERLAP = 16  # stride 48


def _text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking with overlap (the universal
    RAG / training-sequence chunker): 64-token windows, 16-token
    overlap, last window ragged. Pure higher-order functions — the
    chunk list materializes per row inside codegen, one narrow pass,
    explode only at the end. Chunk COUNT math is integer on both
    engines, so the mirror is exact."""
    docs = tables.load(spark, "documents", sf_dir).filter(F.col("doc_id") % 3 == 0)
    stride = _CHUNK_TOKENS - _CHUNK_OVERLAP
    w = docs.select("doc_id", T.words(F.col("text")).alias("w"))
    n = F.size("w")
    n_chunks = F.when(n <= _CHUNK_TOKENS, F.lit(1)).otherwise(
        F.floor((n - _CHUNK_TOKENS + stride - 1) / stride) + 1
    )
    chunked = w.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice(F.col("w"), (i * stride + 1).cast("int"), _CHUNK_TOKENS), " "
            ),
        ).alias("chunks"),
    )
    out = chunked.select(
        "doc_id", F.posexplode("chunks").alias("chunk_idx", "chunk_text")
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        F.md5("chunk_text").alias("chunk_md5"),
        F.size(F.split("chunk_text", " ")).cast("long").alias("chunk_tokens"),
    ).orderBy("doc_id", "chunk_idx")


_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id, {_WORDS_SQL} AS w FROM documents WHERE doc_id % 3 = 0
),
c AS (
  SELECT doc_id,
         list_transform(
           range(0, CASE WHEN len(w) <= {_CHUNK_TOKENS} THEN 1
                         ELSE (len(w) - {_CHUNK_TOKENS} + {_CHUNK_TOKENS - _CHUNK_OVERLAP} - 1)
                              // {_CHUNK_TOKENS - _CHUNK_OVERLAP} + 1 END),
           i -> array_to_string(w[i * {_CHUNK_TOKENS - _CHUNK_OVERLAP} + 1 :
                                  i * {_CHUNK_TOKENS - _CHUNK_OVERLAP} + {_CHUNK_TOKENS}], ' ')
         ) AS chunks
  FROM t
)
SELECT doc_id,
       i - 1 AS chunk_idx,
       md5(chunks[i]) AS chunk_md5,
       len(string_split(chunks[i], ' ')) AS chunk_tokens
FROM c, unnest(range(1, len(chunks) + 1)) u(i)
ORDER BY doc_id, chunk_idx
"""


register("text_chunk_documents", _text_chunk_documents, _CHUNK_SQL, driver=False)


# --- C4-style line-level global dedup (round 5) -----------------------------

_LINE_WORDS = 10  # the "line" unit: fixed non-overlapping 10-word segments
_LINE_MAX_OCCUR = 3  # C4 drops any line occurring >= 3 times corpus-wide


def _corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level global deduplication (Raffel et al. 2020
    drop any three-or-more-times-repeated line corpus-wide; the
    synthetic corpus is single-line, so the line unit is fixed
    non-overlapping 10-word segments — the pipeline shape is the real
    one): explode every doc into positioned segments, count each
    segment's occurrences across the WHOLE corpus, drop segments at
    the threshold, and reassemble each doc's survivors in original
    order. Returned per doc: surviving/dropped counts and the md5 of
    the reassembled text (compact driver-checkable proof of the exact
    reassembly, not just membership).

    Scale: ONE global hash aggregation on a fixed-width md5 segment
    fingerprint (never the raw segment text — same group-key discipline
    as exact dedup) + a fingerprint equi-join back, both AQE-skew
    splittable; reassembly is a per-doc hash aggregation. No window
    over more than one doc, no driver materialization."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    # Zero-word guard, mirroring the oracle's WHERE len(w) > 0: for an
    # empty/whitespace-only doc nseg=0 and sequence(0, -1) takes
    # Spark's descending default step — [0, -1], i.e. TWO phantom
    # empty segments the oracle never sees (which could also flip
    # other docs' segments past the drop threshold via md5('')
    # occurrence counts).
    wd = docs.select("doc_id", T.words(F.col("text")).alias("w")).filter(
        F.size("w") > 0
    )
    nseg = F.ceil(F.size("w") / _LINE_WORDS).cast("int")
    segs = (
        wd.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), nseg - 1),
                    lambda i: F.array_join(
                        F.slice(F.col("w"), i * _LINE_WORDS + 1, _LINE_WORDS), " "
                    ),
                )
            ).alias("pos", "seg"),
        )
        # fixed-width group key: 100 TB of distinct segments hash-agg
        # over 32 hex chars, not arbitrary-length text
        .withColumn("fp", F.md5("seg"))
    )
    counts = segs.groupBy("fp").agg(F.count("*").alias("n_occur"))
    kept = (
        segs.join(counts, "fp")
        .filter(F.col("n_occur") < _LINE_MAX_OCCUR)
    )
    # total_segments == nseg BY CONSTRUCTION (posexplode emits exactly
    # nseg rows per doc), so the per-doc total comes straight off the
    # pre-explode frame — the old third explode + groupBy(doc_id)
    # branch re-evaluated the segmentation and paid one more shuffle
    # for a count the driver-side arithmetic already knows (round 14,
    # guide §2.4 "don't compute things you throw away").
    totals = wd.select("doc_id", nseg.cast("long").alias("total_segments"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("kept_segments"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                        lambda x: x["seg"],
                    ),
                    " ",
                )
            ).alias("cleaned_md5"),
        )
        .join(totals, "doc_id")
        .select(
            "doc_id",
            "total_segments",
            "kept_segments",
            (F.col("total_segments") - F.col("kept_segments")).alias(
                "dropped_segments"
            ),
            "cleaned_md5",
        )
        .orderBy("doc_id")
    )


_LINE_DEDUP_SQL = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents WHERE len({_WORDS_SQL}) > 0),
seg AS (
  SELECT doc_id, i AS pos,
         array_to_string(w[i * {_LINE_WORDS} + 1 : i * {_LINE_WORDS} + {_LINE_WORDS}], ' ') AS seg
  FROM w, unnest(range(0, CAST(ceil(len(w) / {_LINE_WORDS}.0) AS BIGINT))) u(i)
),
cnt AS (SELECT md5(seg) AS fp, COUNT(*) AS n_occur FROM seg GROUP BY 1),
kept AS (
  SELECT doc_id, pos, seg FROM seg JOIN cnt ON md5(seg) = cnt.fp
  WHERE n_occur < {_LINE_MAX_OCCUR}
)
SELECT seg_totals.doc_id,
       CAST(seg_totals.total_segments AS BIGINT) AS total_segments,
       CAST(k.kept_segments AS BIGINT) AS kept_segments,
       CAST(seg_totals.total_segments - k.kept_segments AS BIGINT) AS dropped_segments,
       k.cleaned_md5
FROM (SELECT doc_id, COUNT(*) AS total_segments FROM seg GROUP BY doc_id) seg_totals
JOIN (SELECT doc_id, COUNT(*) AS kept_segments,
             md5(string_agg(seg, ' ' ORDER BY pos)) AS cleaned_md5
      FROM kept GROUP BY doc_id) k USING (doc_id)
ORDER BY doc_id
"""


# Promoted to the driver tier in round 6 (displacing the parity
# one-liner selects): line-level global dedup is a core C4-pipeline
# stage and deserves a CORRECTNESS row.
register("corpus_line_dedup", _corpus_line_dedup, _LINE_DEDUP_SQL)


# --- ExactSubstr-style duplicated-span removal (round 6) --------------------

_SUBSTR_L = 15  # the minimum duplicated span, in tokens (Lee et al. use 50 BPE)


def _corpus_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): any
    token span of >= _SUBSTR_L tokens that occurs more than once
    corpus-wide keeps its FIRST occurrence (min doc_id, then min
    position) and is cut out of every later one; each doc's surviving
    tokens are reassembled in order. Line dedup drops fixed segments
    at a count threshold; this removes arbitrary-alignment spans, the
    gap the suffix-array method closes in the paper.

    Suffix-array-free construction: every length-L sliding window is
    fingerprinted (md5, fixed width); a window-fingerprint shuffle
    ranks occurrences (first stays); each later occurrence marks its L
    token positions; uncovered tokens reassemble per doc. Overlapping
    duplicated windows union into maximal removed spans via the
    DISTINCT coverage set, so a duplicated run of length M >= L is
    removed in full, not window-by-window.

    Scale: per-doc work is one explode into n fixed-width fingerprints
    (the raw window text never leaves the projection); the global
    structure is ONE shuffle keyed on fingerprint (each partition = a
    handful of occurrences, AQE-skew splittable) plus equi-joins on
    (doc_id, pos); reassembly is a per-doc hash agg. No window spans
    more than one fingerprint group, nothing collects to the driver.
    Returned per doc: token totals, removed count, and the md5 of the
    reassembled text (exact proof of the reassembly)."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    wd = docs.select("doc_id", T.words(F.col("text")).alias("w")).filter(
        F.size("w") > 0
    )
    win = wd.filter(F.size("w") >= _SUBSTR_L).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - _SUBSTR_L),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("w"), i + 1, _SUBSTR_L), " ")
                ),
            )
        ).alias("pos", "fp"),
    )
    # "every non-first occurrence of a dup window" via min-struct agg +
    # equi-join, NOT row_number over Window.partitionBy("fp"): the two
    # are output-identical (rn > 1 <=> (doc_id, pos) != argmin), but a
    # WindowExec partition is unsplittable — one viral 15-token shingle
    # covering 20% of the corpus would sort 20% of all window rows in
    # ONE task. The min-struct aggregate partial-aggregates map-side
    # (the hot key collapses to one row per map task before the
    # shuffle), and the join back is AQE-skew-splittable. The n_occ > 1
    # filter keeps the build side to actually-duplicated fingerprints
    # (the long tail of unique windows never joins). Measured on the
    # planted-hot-key corpus (tools/scaling_probe.py --skew): see
    # BASELINE.md round-13/14 skew probes.
    #
    # Round 14 (VERDICT r13 ask #5): window occurrences PRE-AGGREGATED
    # per (doc_id, fp) into one persisted frame before anything joins.
    # Two measured wins from the 100x-skew stage decomposition:
    # (a) the small firsts frame broadcasts, so the probe side has no
    #     exchange to reuse and the md5 window explode — the plan's
    #     single most expensive stage (~8 s of the 28 s total at
    #     100x-skew, 19.7M windows) — was computed TWICE (firsts agg +
    #     join probe); wpos is computed once and persisted.
    # (b) a doc repeating a viral shingle contributes ONE row per
    #     (doc, fp) to the shuffle and the join instead of one per
    #     occurrence (3.6x compression on the planted corpus) — the
    #     map-side partial collect_list collapses it within the doc's
    #     own scan task, so the hot fingerprint's join fan-out shrinks
    #     by the per-doc duplication factor.
    wpos = tables.track_persist(
        win.groupBy("doc_id", "fp").agg(F.collect_list("pos").alias("poss"))
    )
    # first occurrence = lexicographic min over (doc_id, pos): the min
    # doc holding the fp, at ITS min position — identical to
    # min(struct(doc_id, pos)) over raw occurrence rows
    firsts = wpos.groupBy("fp").agg(
        F.min(F.struct("doc_id", F.array_min("poss").alias("pos"))).alias(
            "first_occ"
        ),
        F.sum(F.size("poss")).alias("n_occ"),
    )
    # cut positions per (doc, fp): every position, minus the global
    # first occurrence when this doc IS the first doc (positions are
    # unique within a (doc, fp) group, so array_remove drops exactly
    # one); docs whose only occurrence is the first contribute an
    # empty array, which the explode below drops naturally
    removers = wpos.join(firsts.filter(F.col("n_occ") > 1), "fp").select(
        "doc_id",
        F.when(
            F.col("doc_id") == F.col("first_occ.doc_id"),
            F.array_remove(F.col("poss"), F.col("first_occ.pos")),
        )
        .otherwise(F.col("poss"))
        .alias("cut"),
    )
    # per-doc covered-position ARRAY (collect_set dedups overlapping
    # windows), joined back once — reassembly is then a narrow
    # array_except projection per doc, with NO token-level explode,
    # anti-join, or regroup: the only row-multiplying stage in the
    # whole plan is the window fingerprint explode that the method
    # fundamentally needs. Positions per doc are bounded by doc
    # length, so the arrays are row-local and small.
    covered = (
        removers.select(
            "doc_id",
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("cut"),
                        lambda p: F.sequence(p, p + _SUBSTR_L - 1),
                    )
                )
            ).alias("cpos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("cpos").alias("cov"))
    )
    n = F.size("w")
    # array_except preserves the (ascending) order of the sequence, so
    # surviving tokens reassemble in original document order
    kept_pos = F.array_except(
        F.sequence(F.lit(0), n - 1),
        F.coalesce(F.col("cov"), F.array().cast("array<int>")),
    )
    kept = F.transform(kept_pos, lambda i: F.element_at(F.col("w"), i + 1))
    return (
        wd.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            F.size(kept).cast("long").alias("kept_tokens"),
            (n - F.size(kept)).cast("long").alias("removed_tokens"),
            # a fully-removed doc reassembles to the empty string
            F.md5(F.array_join(kept, " ")).alias("cleaned_md5"),
        )
        .orderBy("doc_id")
    )


_SUBSTR_DEDUP_SQL = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents WHERE len({_WORDS_SQL}) > 0),
win AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(w[i + 1 : i + {_SUBSTR_L}], ' ')) AS fp
  FROM w, unnest(range(0, len(w) - {_SUBSTR_L} + 1)) u(i)
  WHERE len(w) >= {_SUBSTR_L}
),
occ AS (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, pos) AS rn
  FROM win
),
cov AS (
  SELECT DISTINCT doc_id, pos + j AS pos
  FROM (SELECT doc_id, pos FROM occ WHERE rn > 1), unnest(range(0, {_SUBSTR_L})) t(j)
),
tok AS (SELECT doc_id, i AS pos, w[i + 1] AS tok
        FROM w, unnest(range(0, len(w))) u(i)),
kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t ANTI JOIN cov USING (doc_id, pos)),
reb AS (SELECT doc_id, COUNT(*) AS kept_tokens,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS cleaned_md5
        FROM kept GROUP BY doc_id)
SELECT w.doc_id,
       CAST(len(w.w) AS BIGINT) AS n_tokens,
       CAST(COALESCE(reb.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       CAST(len(w.w) - COALESCE(reb.kept_tokens, 0) AS BIGINT) AS removed_tokens,
       COALESCE(reb.cleaned_md5, md5('')) AS cleaned_md5
FROM w LEFT JOIN reb USING (doc_id)
ORDER BY doc_id
"""


# Driver tier (round 6, displacing scalar_array_functions): ExactSubstr
# span removal is the round's marquee dedup addition and carries an
# exact oracle — it earns the CORRECTNESS row.
register("corpus_substring_dedup", _corpus_substring_dedup, _SUBSTR_DEDUP_SQL)


# --- Gopher-rules composite quality filter (round 6) ------------------------

_GOPHER_MIN_WORDS = 30  # Rae et al. use 50; the synthetic docs are shorter
_GOPHER_MAX_WORDS = 100_000
_GOPHER_STOPWORDS = ["table", "query", "the", "scan", "row", "join", "filter", "hash"]


def _text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite document-quality rules (Rae et al. 2021,
    Appendix A1.1), per doc: word count in range, mean word length in
    [3, 10], symbol-word ratio <= 0.1, >= 80% of words contain an
    alphabetic character, and >= 2 distinct stopwords present
    (vocabulary-adapted markers — the corpus is synthetic). Returns
    each rule flag plus the conjunction, so downstream filters can
    report WHY a doc failed, the shape real curation dashboards need.

    Scale: one narrow per-row projection over the word array — every
    rule is a higher-order-function fold inside whole-stage codegen,
    no shuffle except the final presentation orderBy. Ratios are
    int/int divisions (bit-identical across engines), rounded to 4dp
    on both sides by corpus convention."""
    docs = tables.load(spark, "documents", sf_dir)
    w = docs.select("doc_id", T.words(F.col("text")).alias("w"))
    n = F.size("w")
    safe_n = F.greatest(n, F.lit(1))
    mean_len = (
        F.aggregate(
            F.transform(F.col("w"), lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        / safe_n
    )
    sym_ratio = F.size(F.filter(F.col("w"), lambda x: x.rlike("[^a-zA-Z0-9]"))) / safe_n
    alpha_ratio = F.size(F.filter(F.col("w"), lambda x: x.rlike("[a-zA-Z]"))) / safe_n
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.col("w")),
            F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS]),
        )
    )
    m = w.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(mean_len, 4).alias("mean_word_len"),
        (n >= _GOPHER_MIN_WORDS) & (n <= _GOPHER_MAX_WORDS),
        (mean_len >= 3.0) & (mean_len <= 10.0),
        sym_ratio <= 0.1,
        alpha_ratio >= 0.8,
        n_stop >= 2,
    ).toDF(
        "doc_id", "n_words", "mean_word_len",
        "pass_word_count", "pass_mean_len", "pass_symbol_ratio",
        "pass_alpha_ratio", "pass_stopwords",
    )
    return m.select(
        "*",
        (
            F.col("pass_word_count")
            & F.col("pass_mean_len")
            & F.col("pass_symbol_ratio")
            & F.col("pass_alpha_ratio")
            & F.col("pass_stopwords")
        ).alias("pass_all"),
    ).orderBy("doc_id")


_GOPHER_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS) + "]"

_GOPHER_SQL = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
m AS (
  SELECT doc_id, len(w) AS n,
         COALESCE(list_aggregate(list_transform(w, x -> CAST(len(x) AS BIGINT)), 'sum'), 0)
           * 1.0 / greatest(len(w), 1) AS mean_len,
         len(list_filter(w, x -> regexp_matches(x, '[^a-zA-Z0-9]')))
           * 1.0 / greatest(len(w), 1) AS sym_ratio,
         len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
           * 1.0 / greatest(len(w), 1) AS alpha_ratio,
         len(list_intersect(list_distinct(w), {_GOPHER_STOP_SQL})) AS n_stop
  FROM w
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_words,
       ROUND(mean_len, 4) AS mean_word_len,
       n >= {_GOPHER_MIN_WORDS} AND n <= {_GOPHER_MAX_WORDS} AS pass_word_count,
       mean_len >= 3.0 AND mean_len <= 10.0 AS pass_mean_len,
       sym_ratio <= 0.1 AS pass_symbol_ratio,
       alpha_ratio >= 0.8 AS pass_alpha_ratio,
       n_stop >= 2 AS pass_stopwords,
       (n >= {_GOPHER_MIN_WORDS} AND n <= {_GOPHER_MAX_WORDS})
         AND (mean_len >= 3.0 AND mean_len <= 10.0)
         AND sym_ratio <= 0.1 AND alpha_ratio >= 0.8
         AND n_stop >= 2 AS pass_all
FROM m
ORDER BY doc_id
"""


register("text_gopher_rules", _text_gopher_rules, _GOPHER_SQL, driver=False)


# --- Domain-mix rebalancing sampler (round 5) -------------------------------

_MIX_SEED = 77


def _corpus_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture rebalancing (the DoReMi/The-Pile
    knob: re-weight sources toward a target mixture before training):
    every language is downsampled toward the smallest language's count via
    a pure-integer hash threshold — keep doc iff
    ``md5_hash32(doc_id) * n_lang < min_count * 2^32`` — so the
    expected kept count per language is min_count, the decision is a
    pure function of (doc_id, corpus counts), and a retry, resize, or
    re-run keeps EXACTLY the same documents (orderBy(rand()) cannot).
    Integer comparison only: no float rate exists to diverge between
    engines. Returns per-source totals, kept counts, and an
    order-sensitive md5 of the kept doc_ids.

    Scale: per-source counts are a tiny-key hash agg (#sources rows);
    the min is a window over those #sources rows (never the fact
    table); the threshold join broadcasts that dim back; one final
    per-source agg. The fact table is scanned once and never
    re-shuffled except by the final tiny-key agg."""
    from pyspark.sql import Window

    docs = tables.load(spark, "documents", sf_dir).select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_source"))
    # min over the ~#sources-row dim — the only unpartitioned window,
    # bounded by source cardinality regardless of corpus size
    counts = counts.withColumn(
        "min_count", F.min("n_source").over(Window.orderBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    )
    keyed = docs.join(F.broadcast(counts), "lang").withColumn(
        "key", T.md5_hash32(F.col("doc_id").cast("string"), seed=_MIX_SEED)
    )
    kept = keyed.filter(
        F.col("key") * F.col("n_source") < F.col("min_count") * F.lit(2**32)
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.col("doc_id"))),
                        lambda d: d.cast("string"),
                    ),
                    ",",
                )
            ).alias("kept_md5"),
        )
        .join(F.broadcast(counts.select("lang", "n_source")), "lang")
        .select("lang", "n_source", "n_kept", "kept_md5")
        .orderBy("lang")
    )


_DOMAIN_MIX_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_source FROM documents GROUP BY lang
),
m AS (SELECT lang, n_source, (SELECT MIN(n_source) FROM counts) AS min_count FROM counts),
keyed AS (
  SELECT d.doc_id, d.lang, m.n_source, m.min_count,
         {T.md5_hash32_sql("CAST(doc_id AS VARCHAR)", _MIX_SEED)} AS key
  FROM documents d JOIN m USING (lang)
),
kept AS (
  SELECT * FROM keyed WHERE key * n_source < min_count * 4294967296
)
SELECT lang,
       CAST(MIN(n_source) AS BIGINT) AS n_source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS kept_md5
FROM kept GROUP BY lang ORDER BY lang
"""


# Promoted to the driver tier in round 6, same rationale.
register("corpus_domain_mix", _corpus_domain_mix, _DOMAIN_MIX_SQL)


# --- Training-data pipeline: leakage-safe splits, tokenizer prep, ---------
# --- LM scoring ------------------------------------------------------------


_SPLIT_SEED = 13
_SPLIT_BUCKETS = 10  # 8 train / 1 val / 1 test


def _corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the assignment unit is the
    near-dup CLUSTER, not the document, so near-duplicates can never
    straddle train and test (the classic eval-contamination bug that
    per-doc hashing splits cannot prevent). Composes the MinHash
    candidate pipeline + connected components, then hashes the
    cluster id into 10 deterministic buckets (8/1/1).

    Scale: component labels are tiny next to the corpus (clusters
    only); the label join is a broadcast-or-shuffle equi-join on
    doc_id and the split decision is a per-row hash — no window, no
    driver materialization beyond the components gate already audited
    in dedup_components."""
    from .operators import components as C
    from .queries_streaming import _bounded_state_partitions

    pairs = _dedup_minhash_candidates(spark, sf_dir)
    with _bounded_state_partitions(spark, 8):
        comp = C.connected_components(pairs)
        docs = tables.load(spark, "documents", sf_dir).select("doc_id")
        labeled = docs.join(
            comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
        ).withColumn(
            "group_id", F.coalesce(F.col("component"), F.col("doc_id")).cast("long")
        )
        bucket = (
            T.md5_hash32(F.col("group_id").cast("string"), seed=_SPLIT_SEED)
            % _SPLIT_BUCKETS
        )
        split = (
            F.when(bucket < 8, F.lit("train"))
            .when(bucket == 8, F.lit("val"))
            .otherwise(F.lit("test"))
        )
        return (
            labeled.select("doc_id", "group_id", split.alias("split"))
            .orderBy("doc_id")
        )


_SPLIT_SQL = (
    "WITH RECURSIVE "
    + _MINHASH_CAND_CTES
    + ", pairs AS ("
    + _MINHASH_CAND_SELECT
    + "), edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
    "  UNION SELECT doc_b, doc_a FROM pairs), "
    "walk(node, label) AS ("
    "  SELECT u, u FROM edges"
    "  UNION"
    "  SELECT e.u, w.label FROM walk w JOIN edges e ON e.v = w.node), "
    "comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node), "
    "g AS (SELECT d.doc_id,"
    "             CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS group_id"
    "      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id), "
    "b AS (SELECT doc_id, group_id, "
    + T.md5_hash32_sql("CAST(group_id AS VARCHAR)", _SPLIT_SEED)
    + f" % {_SPLIT_BUCKETS} AS bucket FROM g) "
    "SELECT doc_id, group_id, "
    "       CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'"
    "            ELSE 'test' END AS split "
    "FROM b ORDER BY doc_id"
)


register("corpus_split_leakage_safe", _corpus_split_leakage_safe, _SPLIT_SQL, driver=False)


_BPE_TOPK = 20


def _corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE iteration over the corpus: the top-20 adjacent
    character pairs by weighted frequency — the merge candidates a
    tokenizer trainer would fuse next. Uses BPE's classic optimization
    of counting over the distinct-WORD frequency table (vocab-sized,
    shrinks the explode by the corpus' word-repetition factor) rather
    than re-scanning every token occurrence.

    Scale: explode(words) -> hash-agg to the word-frequency table ->
    per-word adjacent-pair explode (bounded by word length) -> one
    global hash-agg on the pair key -> TakeOrderedAndProject for the
    top-k (never a global sort of all pairs). Integer-exact mirror."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    wf = (
        docs.select(F.explode(T.words(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_word"))
    )
    # length guard mirrors the oracle's empty range(1, len) for 1-char
    # words — without it sequence(1, 0) is Spark's descending [1, 0]
    pairs = wf.filter(F.length("word") >= 2).select(
        "n_word",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n_word").alias("merge_count"))
        .orderBy(F.col("merge_count").desc(), "pair")
        .limit(_BPE_TOPK)
    )


_BPE_SQL = f"""
WITH wf AS (
  SELECT w AS word, COUNT(*) AS n_word
  FROM (SELECT unnest({_WORDS_SQL}) AS w FROM documents)
  GROUP BY w
),
p AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, n_word
  FROM wf, unnest(range(1, length(word))) t(i)
  WHERE length(word) >= 2
)
SELECT pair, CAST(SUM(n_word) AS BIGINT) AS merge_count
FROM p GROUP BY pair
ORDER BY merge_count DESC, pair LIMIT {_BPE_TOPK}
"""


register("corpus_bpe_merges", _corpus_bpe_merges, _BPE_SQL, driver=False)


_BPE_TRAIN_STEPS = 8


def _bpe_exploded_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, word) — the ONE definition of the BPE entries'
    tokenization, shared by the trainer and the encoder so the trained
    and encoded vocabularies cannot drift."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    return docs.select(
        "doc_id", F.explode(T.words(F.col("text"))).alias("word")
    )


def _bpe_word_freqs(wd: DataFrame) -> DataFrame:
    return wd.groupBy("word").agg(F.count("*").alias("n_word"))


def _corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE BPE training (round 13, verdict-r12 ask #6):
    ``corpus_bpe_merges`` computes one merge iteration; a real
    tokenizer trainer runs hundreds. This entry runs
    ``_BPE_TRAIN_STEPS`` full rounds of functions/text.bpe_train —
    each round one adjacent-pair aggregation over the DISTINCT-WORD
    frequency table (vocab-sized, never corpus-sized), a 1-row argmax
    collect, and the winning merge applied to every word's symbol
    array with an executor-side HOF fold (greedy left-to-right
    non-overlapping, the textbook rule). Deterministic: ties break on
    (count desc, pair lexicographic). The merge table itself is the
    output — data-dependent argmax per round puts it beyond a single
    SQL statement, so correctness is pinned by an exact Python-BPE
    differential (tests/test_extensions.py::test_bpe_train_*),
    the same recount pattern the single-merge entry's oracle uses."""
    wf = _bpe_word_freqs(_bpe_exploded_words(spark, sf_dir))
    merges = T.bpe_train(wf, _BPE_TRAIN_STEPS)
    return spark.createDataFrame(
        merges,
        "step int, left string, right string, merged string, merge_count long",
    ).orderBy("step")


register("corpus_bpe_train", _corpus_bpe_train, None, driver=False)


_BPE_BATCHED_STEPS = 24
_BPE_BATCH = 8


def _corpus_bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED BPE training (round 14, VERDICT r13 ask #4): the
    sequential trainer above pays ~0.5 s of fixed per-round overhead
    (driver argmax + job scheduling) per merge — days at a real 32k
    vocabulary. This entry trains _BPE_BATCHED_STEPS merges in
    ~k/_BPE_BATCH rounds via functions/text.bpe_train_batched: per
    round one vocab-sized pair aggregation, a bounded top-(4*batch)
    collect, driver-side SYMBOL-DISJOINT admission, and ONE fold
    applying the whole batch (disjointness makes the one-pass apply
    exactly sequential-equivalent and leaves the other admitted pairs'
    counts untouched). Pinned by an exact Python differential of the
    same batched rule (tests/test_extensions.py::
    test_bpe_train_batched_differential_exact); k=64/k=256 wall-clock
    probe points in BASELINE.md show cost ~k/batch, sub-linear in k."""
    wf = _bpe_word_freqs(_bpe_exploded_words(spark, sf_dir))
    merges = T.bpe_train_batched(wf, _BPE_BATCHED_STEPS, batch=_BPE_BATCH)
    return spark.createDataFrame(
        merges,
        "step int, left string, right string, merged string, merge_count long",
    ).orderBy("step")


register(
    "corpus_bpe_train_batched", _corpus_bpe_train_batched, None, driver=False
)


def _corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale (round 13) — the other
    half of the tokenizer-prep story: train _BPE_TRAIN_STEPS merges
    (functions/text.bpe_train), apply the whole ranked merge list to
    the distinct-word table with chained executor-side folds
    (functions/text.bpe_encode_words — word-table-sized, the classic
    BPE optimization), then broadcast-join the per-word subtoken
    counts back to the exploded corpus and aggregate per document.
    Per doc: whitespace word count and the BPE token count under the
    trained tokenizer — the sequence-length accounting every
    pretraining data pipeline needs before packing. Data-dependent
    merges put the output beyond one SQL statement; correctness is
    pinned by the exact Python-BPE encode differential
    (tests/test_extensions.py::test_bpe_encode_differential_exact).

    Scale: train is k vocab-sized aggs (probed ~flat, BASELINE.md);
    encode is a narrow projection over the vocab; the join back is
    corpus x broadcast(vocab) — no extra shuffle beyond the per-doc
    hash agg."""
    # persist both reused frames: wd feeds the frequency table AND the
    # final join; wf feeds every training round AND the encode pass —
    # unpersisted, the tokenize+explode subtree re-executed per use
    wd = tables.track_persist(_bpe_exploded_words(spark, sf_dir))
    wf = tables.track_persist(_bpe_word_freqs(wd))
    merges = T.bpe_train(wf, _BPE_TRAIN_STEPS)
    encoded = T.bpe_encode_words(wf, merges).select("word", "n_subtokens")
    return (
        wd.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_subtokens").alias("n_bpe_tokens"),
        )
        .filter(F.col("doc_id") % 10 == 0)
        .orderBy("doc_id")
    )


register("corpus_bpe_encode", _corpus_bpe_encode, None, driver=False)


_NB_TEST_MOD = 5  # doc_id % 5 == 0 is the held-out fold


def _text_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and scored
    entirely as declarative aggregation — the fasttext-style quality /
    language filter of LLM-corpus pipelines, with no ML library and no
    Python in the hot path. Train fold: doc_id % 5 != 0; held-out
    fold: doc_id % 5 == 0. Add-one smoothing.

    Scale: "training" is one groupBy (lang, word) count — the model IS
    a DataFrame, vocab x classes rows, broadcastable when it fits and
    a plain shuffle equi-join when it doesn't (AQE decides). Scoring
    joins held-out doc words to the model on (class, word) and sums —
    no per-row Python, no window wider than one doc. Scores are
    rounded to 6 dp on BOTH engines before the argmax so a last-ulp
    double-summation difference cannot flip the predicted class."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    is_test = (F.col("doc_id") % _NB_TEST_MOD) == 0
    train = docs.filter(~is_test)
    tw = train.select("lang", F.explode(T.words(F.col("text"))).alias("word"))
    cls_word = tw.groupBy("lang", "word").agg(F.count("*").alias("c"))
    cls_tot = cls_word.groupBy("lang").agg(F.sum("c").alias("class_tokens"))
    vocab = tw.select("word").distinct().agg(F.count("*").alias("v_n"))
    priors = train.groupBy("lang").agg(F.count("*").alias("n_docs_cls"))
    ntr = train.agg(F.count("*").alias("n_train"))
    # per-class constants: one row per language, broadcast everywhere
    classes = (
        cls_tot.join(priors, "lang")
        .crossJoin(vocab)
        .crossJoin(ntr)
        .withColumnRenamed("lang", "cls")
    )
    dw = (
        docs.filter(is_test)
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(T.words(F.col("text"))).alias("word"),
        )
        .groupBy("doc_id", "true_lang", "word")
        .agg(F.count("*").alias("n_w"))
    )
    cand = dw.crossJoin(F.broadcast(classes))
    terms = cand.join(
        cls_word.withColumnRenamed("lang", "cls"), ["cls", "word"], "left"
    ).withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    ll = F.sum(
        F.col("n_w")
        * F.log((F.col("c") + F.lit(1.0)) / (F.col("class_tokens") + F.col("v_n")))
    )
    doc_cls = (
        terms.groupBy(
            "doc_id", "true_lang", "cls", "n_docs_cls", "n_train"
        )
        .agg(ll.alias("ll"))
        .withColumn(
            "score",
            F.round(
                F.log(F.col("n_docs_cls") / F.col("n_train")) + F.col("ll"), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cls")
    return (
        doc_cls.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "true_lang", F.col("cls").alias("pred_lang"), "score")
        .orderBy("doc_id")
    )


_NB_SQL = f"""
WITH tok AS (SELECT doc_id, lang, unnest({_WORDS_SQL}) AS word FROM documents),
train_tok AS (SELECT * FROM tok WHERE doc_id % {_NB_TEST_MOD} <> 0),
cls_word AS (SELECT lang, word, COUNT(*) AS c FROM train_tok GROUP BY lang, word),
cls_tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS class_tokens FROM cls_word GROUP BY lang),
vocab AS (SELECT COUNT(DISTINCT word) AS v_n FROM train_tok),
priors AS (SELECT lang, COUNT(*) AS n_docs_cls FROM documents
           WHERE doc_id % {_NB_TEST_MOD} <> 0 GROUP BY lang),
ntr AS (SELECT COUNT(*) AS n_train FROM documents WHERE doc_id % {_NB_TEST_MOD} <> 0),
dw AS (SELECT doc_id, lang AS true_lang, word, COUNT(*) AS n_w
       FROM tok WHERE doc_id % {_NB_TEST_MOD} = 0 GROUP BY doc_id, lang, word),
cand AS (SELECT dw.doc_id, dw.true_lang, dw.word, dw.n_w,
                ct.lang AS cls, ct.class_tokens, p.n_docs_cls, v.v_n, n.n_train
         FROM dw, cls_tot ct JOIN priors p ON p.lang = ct.lang, vocab v, ntr n),
terms AS (SELECT cand.*, COALESCE(cw.c, 0) AS c
          FROM cand LEFT JOIN cls_word cw
          ON cw.lang = cand.cls AND cw.word = cand.word),
doc_cls AS (
  SELECT doc_id, true_lang, cls,
         ROUND(ln(CAST(n_docs_cls AS DOUBLE) / CAST(n_train AS DOUBLE))
               + SUM(n_w * ln((CAST(c AS DOUBLE) + 1.0)
                              / (CAST(class_tokens AS DOUBLE) + CAST(v_n AS DOUBLE)))),
               6) AS score
  FROM terms GROUP BY doc_id, true_lang, cls, n_docs_cls, n_train
)
SELECT doc_id, true_lang, cls AS pred_lang, score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, cls) AS rn
  FROM doc_cls)
WHERE rn = 1 ORDER BY doc_id
"""


register("text_classifier_nb", _text_classifier_nb, _NB_SQL, driver=False)


def _text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal per document (bits/token) — the KenLM-
    style perplexity quality signal of CCNet-descended pipelines,
    reduced to its declarative core: the LM is the corpus' own
    unigram distribution, the score is cross-entropy against it.
    High bits/token = unusual vocabulary = candidate for down-weight.

    Scale: the LM "training" is one global word hash-agg; scoring is
    an equi-join of per-doc word counts to the unigram table (model
    broadcast when it fits, shuffle join when not) and one per-doc
    aggregation. The total-token scalar stays a 1-row frame
    (crossJoin-broadcast), never a driver scalar."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    tok = docs.select("doc_id", F.explode(T.words(F.col("text"))).alias("word"))
    uni = tok.groupBy("word").agg(F.count("*").alias("cw"))
    tot = uni.agg(F.sum("cw").alias("n_total"))
    dw = tok.groupBy("doc_id", "word").agg(F.count("*").alias("n_w"))
    j = dw.join(uni, "word").crossJoin(F.broadcast(tot))
    return (
        j.groupBy("doc_id")
        .agg(
            F.sum("n_w").alias("n_tokens"),
            F.sum(
                F.col("n_w") * F.log2(F.col("cw") / F.col("n_total"))
            ).alias("_nll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(-F.col("_nll") / F.col("n_tokens"), 6).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


_PPL_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents),
uni AS (SELECT word, COUNT(*) AS cw FROM tok GROUP BY word),
tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_total FROM uni),
dw AS (SELECT doc_id, word, COUNT(*) AS n_w FROM tok GROUP BY doc_id, word)
SELECT doc_id, CAST(SUM(n_w) AS BIGINT) AS n_tokens,
       ROUND(-SUM(n_w * log2(CAST(cw AS DOUBLE) / CAST(n_total AS DOUBLE)))
             / SUM(n_w), 6) AS bits_per_token
FROM dw JOIN uni USING (word), tot
GROUP BY doc_id ORDER BY doc_id
"""


register("text_perplexity_proxy", _text_perplexity_proxy, _PPL_SQL, driver=False)


_SEARCH_TERMS = ("spark", "stream")


def _text_search_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed conjunctive text search: term->doc posting lists
    (with term frequencies) are BUILT ONCE into a versioned table
    range-clustered on the term, then an AND query answers from two
    stats-PRUNED index reads joined on doc_id — the corpus itself is
    never rescanned at query time, and the pruning means only the
    index file groups covering the query terms are opened (the
    file-level analog of a B-tree descent).

    Scale: the index build is one explode + hash-agg (term, doc)
    pass; clustering gives each group a tight term range so a 2-term
    query opens ~2/8 of the index; query cost is posting-list-sized,
    independent of corpus text volume."""
    from .queries_streaming import _run_tmp_root
    from .storage.versioned import VersionedTable

    docs = tables.load_parallel(spark, "documents", sf_dir)
    postings = (
        docs.select("doc_id", F.explode(T.words(F.col("text"))).alias("word"))
        .groupBy("word", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    idx = VersionedTable(_run_tmp_root("netflow_searchidx_") + "/idx")
    idx.append_clustered(postings, "word", n_groups=8)
    t1, t2 = _SEARCH_TERMS
    p1 = idx.read(spark, prune=("word", t1, t1)).filter(F.col("word") == t1)
    p2 = idx.read(spark, prune=("word", t2, t2)).filter(F.col("word") == t2)
    return (
        p1.select("doc_id", F.col("tf").alias("tf1"))
        .join(p2.select("doc_id", F.col("tf").alias("tf2")), "doc_id")
        .select(
            "doc_id", (F.col("tf1") + F.col("tf2")).cast("long").alias("score")
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


_SEARCH_SQL = f"""
WITH postings AS (
  SELECT doc_id, w AS word, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents)
  GROUP BY doc_id, w
)
SELECT a.doc_id, CAST(a.tf + b.tf AS BIGINT) AS score
FROM postings a JOIN postings b USING (doc_id)
WHERE a.word = '{_SEARCH_TERMS[0]}' AND b.word = '{_SEARCH_TERMS[1]}'
ORDER BY score DESC, a.doc_id LIMIT 20
"""


register("text_search_inverted", _text_search_inverted, _SEARCH_SQL, driver=False)


_IMP_SEED = 29
_IMP_WMAX = 100  # token-count weight cap == the max keep rate denominator


def _corpus_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling with per-document weights: each doc is kept
    with probability weight/100 where weight = min(n_tokens, 100) —
    longer documents are proportionally likelier to survive (the
    quality-weighted subsampling step of mixture building). The keep
    decision is the INTEGER cross-multiplied hash threshold
    (key * W_MAX < w * 2^32): retry/resize-stable and exactly
    mirrorable, no float keep-rate to diverge — the same discipline
    as corpus_domain_mix, generalized from per-group rates to per-ROW
    weights.

    Scale: one narrow projection + filter, no shuffle at all until
    the caller aggregates; the sample is reproducible from doc_id
    alone (resampling after a retry or a repartition cannot change
    membership)."""
    docs = tables.load_parallel(spark, "documents", sf_dir)
    w = F.least(F.size(T.words(F.col("text"))), F.lit(_IMP_WMAX)).cast("long")
    key = T.md5_hash32(F.col("doc_id").cast("string"), seed=_IMP_SEED)
    return (
        docs.select("doc_id", "source", w.alias("weight"), key.alias("key"))
        .filter(F.col("key") * _IMP_WMAX < F.col("weight") * F.lit(2**32))
        .select("doc_id", "source", "weight")
        .orderBy("doc_id")
    )


_IMP_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(LEAST(len({_WORDS_SQL}), {_IMP_WMAX}) AS BIGINT) AS weight,
         {T.md5_hash32_sql("CAST(doc_id AS VARCHAR)", _IMP_SEED)} AS key
  FROM documents
)
SELECT doc_id, source, weight FROM t
WHERE key * {_IMP_WMAX} < weight * 4294967296
ORDER BY doc_id
"""


register("corpus_importance_sample", _corpus_importance_sample, _IMP_SQL, driver=False)


# Report this registrar's completion — covers users importing a
# registrar submodule directly, where queries.py's own registrar
# imports re-enter this module mid-body. registrar_done is defined
# ABOVE queries.py's registrar imports, so it exists whenever this
# tail executes; the LAST registrar to finish (in any import order)
# triggers the one STRICT driver-order validation in queries.py.
from . import queries as _queries_registry  # noqa: E402

_queries_registry.registrar_done("queries_extensions")
