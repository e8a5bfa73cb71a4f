"""Text-analysis expressions (SURVEY.md §2.9: LLM-pipeline operators).

All pure Catalyst expressions — tokenize/shingle/hash/score run inside
whole-stage codegen with zero Python crossings. Hashing is md5-based
specifically because md5 is bit-identical in DuckDB, making MinHash /
SimHash / fingerprints exactly oracle-checkable (a seeded murmur3
would be Spark-only).

Scale: every function here is a narrow per-row projection — no
shuffle; the expensive parts (explode + groupBy for signatures) are
in the query layer where the plan is visible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish token pattern: word pieces or single non-space punctuation.
TOKEN_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokenization (array<string>). Empty/whitespace-only
    text yields an EMPTY array — split alone returns [''] (one phantom
    token) in both Spark and DuckDB, so the filter exists on both
    sides of every oracle."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED word array.

    Pass a column reference, not words(text) inline: an inline split
    re-tokenizes the document for every element_at inside the lambda
    (measured ~4x slowdown on the shingle pipeline).
    """
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)])
    )
    # sequence(0, negative) would count DOWN; guard short docs explicitly.
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>, overlapping, in order).

    Convenience wrapper; hot paths should materialize words(text) into
    a column first and use shingles_from_words (see docstring there).
    """
    return shingles_from_words(words(text), n)


def md5_hash32(value: Column, seed: int | Column = 0) -> Column:
    """Deterministic 32-bit hash: first 8 hex chars of md5(seed:value).

    Mirrored in DuckDB as CAST('0x' || substr(md5(..),1,8) AS BIGINT);
    used by MinHash signatures and SimHash bits so oracles are exact.
    """
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    payload = F.concat(seed_col, F.lit(":"), value)
    return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")


def md5_hash32_sql(value_sql: str, seed: int) -> str:
    """The DuckDB-side mirror of md5_hash32 (oracle SQL fragment)."""
    return (
        f"CAST(('0x' || substr(md5(CONCAT('{seed}', ':', {value_sql})), 1, 8)) AS BIGINT)"
    )


_GOLDEN = 2654435769  # 2^32 / golden ratio


def affine_hash32(base: Column, i: int) -> Column:
    """i-th member of an affine universal-ish family over one 32-bit
    base hash: (base * (2i+1) + i*GOLDEN) mod 2^32.

    MinHash needs k independent-ish hashes per shingle; deriving them
    arithmetically from ONE md5 is ~k times cheaper than k md5 calls
    (measured 9.8s -> ~2s at sf0.1) and still mirrors exactly in SQL.
    """
    return (base * (2 * i + 1) + i * _GOLDEN) % F.lit(2**32)


def affine_hash32_sql(base_sql: str, i: int) -> str:
    """DuckDB mirror of affine_hash32."""
    return f"(({base_sql}) * {2 * i + 1} + {i * _GOLDEN}) % 4294967296"


def minhash_sig_aggs(shingle: Column, n: int) -> list[Column]:
    """The n MinHash signature aggregates over a shingle column:
    sig_i = MIN(affine_i(md5_hash32(shingle))). Shared by the query
    corpus and the recall tests so both use identical hashing."""
    base = md5_hash32(shingle, 0)
    return [F.min(affine_hash32(base, i)).alias(f"sig_{i}") for i in range(n)]


def minhash_sig_cols(hashed: Column, n: int) -> list[Column]:
    """Per-ROW MinHash signatures over an already-hashed shingle
    array (``transform(shingles, md5_hash32)``): sig_i =
    array_min(transform(hashed, affine_i)). Value-identical to
    ``minhash_sig_aggs`` over the exploded multiset — MIN over a
    doc's shingle rows IS the min over its shingle array — but needs
    NO explode and NO groupBy(doc_id) shuffle: the signature is a
    per-document quantity, so computing it as a row expression
    removes the widest shuffle of the dedup family (round 15, guide
    §2.4/§2.3 — the exchange carried one (doc_id, shingle-string)
    row per shingle). Callers must (a) filter out empty shingle
    arrays first (explode dropped those docs; array_min over [] is
    NULL and concat_ws would silently bucket the NULL sigs together)
    and (b) materialize ``hashed`` in its own projection so the n
    consumers share one md5 pass (CollapseProject declines to inline
    a non-cheap producer used n times)."""
    return [
        F.array_min(F.transform(hashed, lambda h: affine_hash32(h, i))).alias(
            f"sig_{i}"
        )
        for i in range(n)
    ]


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (lower, trim,
    collapsed whitespace). Identical duplicates collide, nothing else."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alnum, non-space characters."""
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(text), F.lit(1))


def stopword_hits(text: Column, stopwords: list[str]) -> Column:
    """Count of whole-word occurrences of any stopword."""
    pat = r"\b(" + "|".join(stopwords) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), 0))


def quality_score(text: Column, stopwords: list[str]) -> Column:
    """Heuristic quality score in [0,1]: rewards mid-length docs with
    a healthy stopword ratio and low punctuation noise — the standard
    pretraining-corpus filter shape (length/punct/stopword ratios).
    """
    n_tok = token_count_ws(text)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop_ratio = stopword_hits(text, stopwords) / F.greatest(n_tok, F.lit(1))
    stop_score = F.least(stop_ratio * 5, F.lit(1.0))
    noise = punct_ratio(text)
    return F.round(
        F.greatest(
            F.lit(0.0),
            len_score * 0.4 + stop_score * 0.4 + (1 - noise) * 0.2,
        ),
        4,
    )


# Marker vocabularies for the language-ID heuristic. The driver corpus
# is synthetic (uniform SQL-ish vocabulary), so these markers are drawn
# from that vocabulary to give the heuristic real signal; for natural
# text, swap in actual function-word lists per language.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["group", "sort", "merge"],
    "en": ["table", "query", "the"],
    "es": ["scan", "row", "data"],
    "fr": ["join", "filter", "line"],
    "zh": ["hash", "batch", "stream"],
}


def lang_guess(text: Column) -> Column:
    """n-gram/marker-word language ID: argmax of per-language marker
    hits, ties broken by language code order (deterministic)."""
    hits = {lang: stopword_hits(text, ws) for lang, ws in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            ge = (
                hits[lang] > hits[other]
                if other < lang  # earlier code wins ties -> need strict >
                else hits[lang] >= hits[other]
            )
            cond = ge if cond is None else (cond & ge)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(langs[0]))


# --- iterative BPE trainer (round 13) ---------------------------------------


def bpe_apply_merge(syms: Column, a: str, b: str) -> Column:
    """Apply ONE BPE merge (a, b) -> a+b to a symbol array, greedy
    left-to-right non-overlapping (the textbook rule: 'aaa' under
    (a, a) becomes ['aa', 'a']). Pure higher-order-function fold —
    executor-side, no Python in the loop: the aggregate state carries
    the emitted prefix plus one pending symbol; each input symbol
    either completes a merge with the carry, flushes the carry, or
    becomes the new carry."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(
                acc["carry"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("carry")),
            )
            .when(
                (acc["carry"] == a) & (s == b),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(a + b))).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(
            acc["carry"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["carry"]))),
    )


def bpe_train(wf, k: int) -> list[tuple[int, str, str, str, int]]:
    """Train ``k`` BPE merges over a word-frequency DataFrame
    (columns ``word``, ``n_word``) — the real tokenizer-prep loop,
    not one iteration. Returns [(step, left, right, merged, count)].

    Every iteration is ONE hash aggregation over the VOCABULARY-sized
    symbol table (never the corpus): adjacent-pair explode ->
    sum(n_word) -> a 1-row argmax collect (count desc, then pair
    lexicographic — deterministic), then the winning merge applied to
    every word's symbol array via the executor-side fold above. Each
    round persists its symbol table and unpersists the parent (the
    standard Spark iterative pattern, same as the pagerank entry), so
    lineage stays O(1) per round. 100 TB shape: the word table is
    orders of magnitude smaller than the corpus (the classic BPE
    optimization the single-merge entry already measures); k rounds
    cost k vocab-sized aggs + k narrow map stages.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # empty-word guard: sequence(1, 0) takes Spark's DESCENDING default
    # step, so '' would explode into two phantom empty symbols whose
    # ('', '') pair — lexicographically smallest — wins every count tie
    wf = wf.filter(F.length("word") > 0)
    cur = wf.select(
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("syms"),
        "n_word",
    ).persist()
    merges: list[tuple[int, str, str, str, int]] = []
    for step_i in range(k):
        pairs = cur.filter(F.size("syms") >= 2).select(
            "n_word",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n_word").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()  # bounded: exactly one argmax row per round
        )
        if not top:
            break  # vocabulary fully merged before k rounds
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((step_i, a, b, a + b, cnt))
        nxt = cur.withColumn("syms", bpe_apply_merge(F.col("syms"), a, b))
        nxt = nxt.persist()
        nxt.count()  # materialize before dropping the parent
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def bpe_encode_words(wf, merges: list[tuple[int, str, str, str, int]]):
    """Apply a trained merge list to the word-frequency table: chain
    the executor-side fold once per merge, IN TRAINING ORDER (BPE
    encoding applies merges by rank, and later merges can consume
    earlier merges' outputs — e.g. ('ab','c') only fires after
    ('a','b')). Returns (word, n_word, n_subtokens) — the per-word
    token count under the trained tokenizer, word-table-sized, ready
    to broadcast-join back to the corpus."""
    syms = F.expr(
        "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
    )
    for _, a, b, _, _ in merges:
        syms = bpe_apply_merge(syms, a, b)
    return wf.filter(F.length("word") > 0).select(
        "word", "n_word", F.size(syms).alias("n_subtokens")
    )


# --- batched BPE trainer (round 14) ------------------------------------------

_BPE_SEP = "\x00"  # never appears in corpus symbols (tokenized text)


def bpe_apply_merges(syms: Column, pairs: list[tuple[str, str]]) -> Column:
    """Apply a SYMBOL-DISJOINT set of BPE merges in ONE executor-side
    fold — the batched counterpart of bpe_apply_merge. Because the
    admitted pairs share no symbols (and no pair's merged output is
    another's constituent — bpe_train_batched's admission rule), a
    single greedy left-to-right pass is exactly equivalent to applying
    the merges sequentially in any order. The per-step dispatch is one
    O(1) map lookup on carry||SEP||next (a foldable map literal, not a
    chain of M nested aggregates — M-deep HOF nesting is where
    Catalyst's expression tree blows up)."""
    if not pairs:
        return syms
    lookup = F.map_from_arrays(
        F.array(*[F.lit(a + _BPE_SEP + b) for a, b in pairs]),
        F.array(*[F.lit(a + b) for a, b in pairs]),
    )
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc: Column, s: Column) -> Column:
        merged = F.element_at(
            lookup, F.concat(acc["carry"], F.lit(_BPE_SEP), s)
        )
        return (
            F.when(
                acc["carry"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("carry")),
            )
            .when(
                merged.isNotNull(),
                F.struct(
                    F.concat(acc["out"], F.array(merged)).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                    s.alias("carry"),
                )
            )
        )

    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(
            acc["carry"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["carry"]))),
    )


def bpe_admit_batch(
    ranked: list[tuple[str, str, int]], batch: int
) -> list[tuple[str, str, int]]:
    """Greedy admission of a symbol-disjoint merge batch from a ranked
    candidate list [(a, b, count)] (count desc, a, b asc): scan in
    rank order, admit a pair iff its symbol set {a, b, a+b} is
    disjoint from every previously admitted pair's, stop at ``batch``.
    Shared verbatim by the Spark trainer and the Python differential
    so the admission rule cannot drift between them."""
    admitted: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for a, b, cnt in ranked:
        trio = {a, b, a + b}
        if used & trio:
            continue
        admitted.append((a, b, cnt))
        used |= trio
        if len(admitted) >= batch:
            break
    return admitted


def bpe_train_batched(
    wf, k: int, batch: int = 16, cand_factor: int = 4
) -> list[tuple[int, str, str, str, int]]:
    """BATCHED BPE training (round 14, VERDICT r13 ask #4): admit up
    to ``batch`` SYMBOL-DISJOINT merges per Spark round instead of
    one, so a realistic merge count (32k vocab) costs ~k/batch rounds
    of fixed per-iteration overhead (driver argmax + job scheduling,
    ~0.5 s/round) instead of k — the standard batched-greedy variant
    every at-scale tokenizer trainer uses.

    Per round: ONE adjacent-pair aggregation over the vocabulary-sized
    symbol table, a bounded top-(cand_factor*batch) collect (count
    desc, then pair lexicographic — deterministic), driver-side
    disjoint admission (bpe_admit_batch), and ONE fold applying the
    whole admitted batch (bpe_apply_merges). Because admitted pairs
    are symbol-disjoint, their counts are mutually unaffected and the
    one-pass application equals sequential application; pairs SKIPPED
    for conflicts are re-ranked next round against post-merge counts.

    Semantics: batched-greedy BPE — identical to textbook sequential
    BPE (bpe_train) whenever the per-round top pairs don't interact
    (batch=1 reduces to it exactly); under interaction the admitted
    ranks can diverge from the sequential argmax, which is the
    documented trade every batched trainer makes. Correctness is
    pinned by an exact Python differential implementing the SAME rule
    (tests/test_extensions.py::test_bpe_train_batched_*)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    wf = wf.filter(F.length("word") > 0)
    cur = wf.select(
        F.expr(
            "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
        ).alias("syms"),
        "n_word",
    ).persist()
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < k:
        pairs = cur.filter(F.size("syms") >= 2).select(
            "n_word",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n_word").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(cand_factor * batch)
            .collect()  # bounded: at most cand_factor*batch rows
        )
        if not top:
            break  # vocabulary fully merged before k merges
        ranked = [(r["a"], r["b"], int(r["cnt"])) for r in top]
        admitted = bpe_admit_batch(ranked, min(batch, k - len(merges)))
        for a, b, cnt in admitted:
            merges.append((len(merges), a, b, a + b, cnt))
        nxt = cur.withColumn(
            "syms", bpe_apply_merges(F.col("syms"), [(a, b) for a, b, _ in admitted])
        ).persist()
        nxt.count()  # materialize before dropping the parent
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges
