"""Streaming near-duplicate detection against a persistent index.

The batch dedup family (queries_extensions) answers "which docs in
THIS corpus are near-dups of each other". Ingest pipelines need the
streaming question: "is this arriving document a near-dup of anything
seen BEFORE?" — without rescanning the corpus per batch. The classic
construction is a persistent LSH band-key index:

- each arriving batch computes MinHash signatures and band keys
  (identical hashing to the batch family — functions/text.py);
- candidate pairs = equi-join of the batch's band keys against the
  INDEX (everything previously registered), never against raw text;
- the batch's band keys are then appended to the index, idempotently
  (VersionedTable batch ids), so a replayed micro-batch neither
  re-registers nor dupes.

Scale: the index holds (doc_id, band_key) — a few rows per document,
joined on band_key; a hot key (boilerplate) is the standard AQE
skew-split case. The index table compacts like any VersionedTable.
Within-batch duplicates are the batch family's job; this operator's
contract is strictly cross-batch (docs vs the past), which keeps the
join one-sided and the index append-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..storage.versioned import VersionedTable


def band_keys(
    docs: DataFrame,
    n_minhash: int = 16,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, band_key) rows for each document — the same md5-derived
    MinHash banding the batch dedup family uses, so index hits agree
    with the batch detector exactly."""
    return band_keys_from_words(
        docs.select(id_col, T.words(F.col(text_col)).alias("w")),
        n_minhash,
        n_bands,
        id_col,
        "w",
    )


def band_keys_from_words(
    docs: DataFrame,
    n_minhash: int = 16,
    n_bands: int = 4,
    id_col: str = "doc_id",
    words_col: str = "w",
) -> DataFrame:
    """``band_keys`` over an ALREADY-TOKENIZED word-array column — the
    shared-tokenization path: a caller that has materialized
    ``words(text)`` anyway (e.g. the streaming curator's quality
    metrics cache) feeds the array straight in, so each document is
    regex-tokenized once per batch instead of once per consumer."""
    rows_per_band = n_minhash // n_bands
    # signatures per ROW (round 15, same rewrite as the batch family's
    # _minhash_sig_frame): array_min over the doc's hashed shingle
    # array — no explode, no distinct, no groupBy(id) shuffle. MIN
    # over the exploded (distinct or not) multiset equals array_min
    # over the array; the empty-array filter reproduces explode's
    # drop-empty-docs semantics. Each micro-batch's banding is now a
    # pure row pipeline, so its eager checkpoint is a single stage.
    sh = docs.select(
        id_col, T.shingles_from_words(F.col(words_col), 3).alias("_sh")
    ).filter(F.size("_sh") > 0)
    hashed = sh.select(
        id_col, F.transform("_sh", lambda s: T.md5_hash32(s)).alias("_h")
    )
    sig = hashed.select(id_col, *T.minhash_sig_cols(F.col("_h"), n_minhash))
    keys = F.array(
        *[
            F.concat_ws(
                "-",
                F.lit(str(b)),
                *[
                    F.col(f"sig_{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(id_col, F.explode(keys).alias("band_key"))


class NearDupIndex:
    """Persistent streaming near-dup index (use from foreachBatch)."""

    def __init__(
        self,
        root: str,
        n_minhash: int = 16,
        n_bands: int = 4,
        durable: bool = False,
    ) -> None:
        """``durable=True`` materializes each batch's detection via a
        reliable ``checkpoint()`` under ``root`` instead of the default
        executor-local ``localCheckpoint()`` — survives executor death
        mid-batch at the cost of one write to the index's store."""
        self.root = root
        self.table = VersionedTable(root)
        self.n_minhash = n_minhash
        self.n_bands = n_bands
        self.durable = durable

    def detect(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """(new_doc_id, prior_doc_id) candidate pairs of this batch
        against every document registered by an EARLIER batch. Index
        rows carry their registering batch id and the join filters to
        ``_src_batch < batch_id``, so a replayed batch id reproduces
        exactly its original pairs (the pre-batch index state). The
        result is eagerly materialized (reliable ``checkpoint()`` when
        ``durable``, else ``localCheckpoint``) so a later ``register``
        cannot change what this detection saw."""
        bands = band_keys(batch_df, self.n_minhash, self.n_bands)
        return self.detect_bands(bands, batch_df.sparkSession, batch_id)

    def detect_bands(
        self, bands: DataFrame, spark, batch_id: int
    ) -> DataFrame:
        """``detect`` over PRECOMPUTED (doc_id, band_key) rows — the
        shared-signature path: a caller that also registers a subset of
        the same batch (e.g. the streaming curator registering only
        ACCEPTED docs) computes MinHash once and feeds both sides,
        instead of hashing every document twice per micro-batch."""
        if self.table.versions():
            prior = (
                self.table.read(spark)
                .filter(F.col("_src_batch") < batch_id)
                .select(F.col("doc_id").alias("prior_doc_id"), "band_key")
            )
            pairs = (
                bands.join(prior, "band_key")
                .select(F.col("doc_id").alias("new_doc_id"), "prior_doc_id")
                .distinct()
            )
        else:
            # empty index (first batch): the empty local frame is
            # already stable — no register can change it — so skip the
            # checkpoint, which cost one Spark job per stream start
            # purely to materialize zero rows (round 15, job floor).
            # A durable index still claims the context checkpoint dir
            # HERE: first-durable-component-wins is this class's
            # documented contract, and callers (and the clobber test)
            # rely on batch 0 establishing it.
            if self.durable:
                sc = spark.sparkContext
                if sc.getCheckpointDir() is None:
                    sc.setCheckpointDir(self.root + "/_ckpt")
            return spark.createDataFrame([], "new_doc_id long, prior_doc_id long")
        if self.durable:
            # reliable checkpoint next to the index table: survives
            # executor death mid-batch (cluster deployments point root
            # at the reliable store, so this lands there too). The
            # checkpoint dir is a CONTEXT-LEVEL setting: set it only
            # when unset, so a dir configured by another component (or
            # a second durable index sharing this context) is never
            # clobbered — durable indexes in one SparkContext share
            # whichever checkpoint location was established first,
            # which is safe because checkpoint files are opaque
            # per-RDD subdirectories keyed by RDD id.
            sc = spark.sparkContext
            if sc.getCheckpointDir() is None:
                sc.setCheckpointDir(self.root + "/_ckpt")
            return pairs.checkpoint(eager=True)
        # executor-local: lost on executor death — acceptable because
        # foreachBatch retries re-run the whole batch and detection is
        # a pure function of pre-batch state
        return pairs.localCheckpoint(eager=True)

    def register(self, docs_df: DataFrame, batch_id: int) -> None:
        """Append ``docs_df``'s band keys under ``batch_id``,
        idempotently (a replayed batch id registers nothing twice).
        Callers choose WHAT the index mirrors: ``process_batch``
        registers everything it detected over; a curation job
        registers only the docs it ACCEPTED."""
        self.register_bands(
            band_keys(docs_df, self.n_minhash, self.n_bands), batch_id
        )

    def register_bands(self, bands: DataFrame, batch_id: int) -> None:
        """``register`` over precomputed (doc_id, band_key) rows (see
        ``detect_bands``)."""
        self.table.append(
            bands.withColumn("_src_batch", F.lit(batch_id)), batch_id=batch_id
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """Detect-then-register over the same document set (the plain
        index contract: every seen unique doc becomes part of the
        past)."""
        pairs = self.detect(batch_df, batch_id)
        self.register(batch_df, batch_id)
        return pairs
