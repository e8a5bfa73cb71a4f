"""Streaming corpus curation: the batch curation pipeline as a
continuously-ingesting job.

``queries_extensions._corpus_curate`` answers "curate THIS corpus";
an LLM-data ingest needs the streaming question: documents arrive in
micro-batches and each batch must be quality-filtered, deduplicated
against everything already ACCEPTED (exact and near-dup), optionally
decontaminated, and landed exactly-once — without rescanning the
accepted corpus per batch. Composition of the engine's own parts:

- quality gate: the same token-count + repetition-ratio predicate as
  the batch pipeline (narrow, codegen);
- exact dedup: within-batch keep-min-doc_id per md5 fingerprint, then
  a one-sided anti-join of the batch's fingerprints against the
  ACCEPTED table's fingerprint column (equi-join vs the past — never
  a corpus rescan);
- near-dup: ``NearDupIndex.process_batch`` (persistent LSH band-key
  index, detect-then-register, replay-safe) — any batch doc banding
  with a previously accepted doc is dropped;
- decontamination: optional broadcast anti-join against an eval-set
  shingle list;
- landing: ``VersionedTable.append(batch_id=...)`` — idempotent under
  foreachBatch replays, so the curated table is exactly-once.

Scale: every cross-corpus operation is an equi-join on a fixed-width
key (md5 fingerprint / band key) against an indexed table that grows
with ACCEPTED documents only; the arriving batch is the small side.
A replayed batch re-runs detection against pre-batch state (the index
filters ``_src_batch < batch_id``) and re-lands nothing.

Reference basis: the reference's pipeline is stateless per-record
(README.md:115-127); cross-batch state lives in Mongo. This is the
Spark-first equivalent with the state in versioned parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..storage.versioned import VersionedTable
from .neardup_index import NearDupIndex


class StreamingCurator:
    """foreachBatch target: curate arriving documents against all
    previously accepted ones and land survivors exactly-once.

    ``eval_shingles``: optional list of decontamination shingles (the
    eval set is tiny by construction — it is broadcast, never joined
    shuffle-side).
    """

    def __init__(
        self,
        root: str,
        min_tokens: int = 5,
        max_repetition: float = 0.5,
        eval_shingles: list[str] | None = None,
        durable_index: bool = False,
        audit_rejections: bool = False,
    ) -> None:
        self.curated = VersionedTable(root + "/curated")
        self.index = NearDupIndex(root + "/ndidx", durable=durable_index)
        self.min_tokens = min_tokens
        self.max_repetition = max_repetition
        self.eval_shingles = eval_shingles or []
        # opt-in provenance: every dropped doc lands in a side table
        # with its rejection reason — the audit trail takedown reviews
        # and filter-rate monitoring read. Costs one extra landing per
        # batch (reason frames are doc_id-sized, not text-sized).
        self.audit_rejections = audit_rejections
        self.rejected = (
            VersionedTable(root + "/rejected") if audit_rejections else None
        )

    def _quality(self, batch: DataFrame) -> DataFrame:
        """Returns (filtered_df, metrics_handle). The metrics
        projection is persist()ed and the filter applied ABOVE the
        cache — the same trick as the batch pipeline's round-5 fix:
        with the filter directly on the projection, PushDownPredicates
        substitutes the n_tokens/rep aliases into the predicate and
        re-evaluates the tokenize/shingle HOF chain several times per
        row (measured ~16s of a 17s batch at the 10x scale probe);
        against the cached columns it is two comparisons. The caller
        unpersists the handle once the batch pipeline has materialized
        (process_batch does, right after the stabilization
        checkpoint)."""
        sh3 = T.shingles_from_words(F.col("_w"), 3)
        rep = F.when(
            F.size(sh3) > 0,
            1.0 - F.size(F.array_distinct(sh3)) / F.size(sh3),
        ).otherwise(F.lit(0.0))
        # the word ARRAY rides in the cache too: banding re-shingles
        # from it downstream, so each document is regex-tokenized once
        # per batch total (the batch pipeline's `w`-column trick);
        # process_batch drops _w before anything lands
        metrics = (
            batch.withColumn("_w", T.words(F.col("text")))
            .withColumn("n_tokens", F.size("_w").cast("long"))
            .withColumn("rep", rep)
            .persist()
        )
        filtered = metrics.filter(
            (F.col("n_tokens") >= self.min_tokens)
            & (F.col("rep") <= self.max_repetition)
        ).drop("rep")
        return filtered, metrics

    def _decontaminate(self, batch: DataFrame) -> DataFrame:
        if not self.eval_shingles:
            return batch
        spark = batch.sparkSession
        ev = spark.createDataFrame(
            [(s,) for s in self.eval_shingles], "shingle string"
        )
        # reuse the checkpointed word array when the quality stage's _w
        # column is still in flight (tokenize-once discipline)
        w = F.col("_w") if "_w" in batch.columns else T.words(F.col("text"))
        hit = (
            batch.select(
                "doc_id",
                F.explode(T.shingles_from_words(w, 5)).alias("shingle"),
            )
            .join(F.broadcast(ev), "shingle")
            .select("doc_id")
            .distinct()
        )
        return batch.join(hit, "doc_id", "left_anti")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Quality -> exact dedup (in-batch + vs accepted) -> near-dup
        vs index -> decontaminate -> idempotent landing."""
        # skip only when EVERY landing of this batch committed — the
        # curated table, the index registration (concurrent with it
        # since round 15), and the audit table when enabled. A crash
        # that left any of them missing re-runs the batch; every
        # landing below is batch-id idempotent, so the re-run
        # double-commits nothing, and detection filters
        # `_src_batch < batch_id`, so a partially-registered index
        # replays to exactly the original pairs.
        done = (
            batch_id in self.curated.committed_batch_ids()
            and batch_id in self.index.table.committed_batch_ids()
        )
        if done and self.audit_rejections:
            done = batch_id in self.rejected.committed_batch_ids()
        if done:
            # replayed batch: the index's detect path is replay-safe on
            # its own; the landing would be a no-op too — skip the work
            return
        q, metrics = self._quality(batch_df)
        reasons: list[DataFrame] = []
        if self.audit_rejections:
            # materialize now: metrics unpersists below, and this
            # frame is doc_id-sized
            reasons.append(
                metrics.select("doc_id")
                .join(q.select("doc_id"), "doc_id", "left_anti")
                .withColumn("reason", F.lit("quality"))
                .localCheckpoint(eager=True)
            )
        fp = q.withColumn("fp", T.fingerprint(F.col("text")))
        # in-batch exact dedup: keep min doc_id per fingerprint
        keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        batch_unique = fp.join(keep, ["fp", "doc_id"], "left_semi")
        # cross-batch exact dedup: one-sided anti-join vs accepted fps
        # — against the PRE-batch snapshot. On a fresh batch that is
        # simply the latest version; on a replay (possible when the
        # curated landing committed but the audit landing did not) the
        # latest snapshot already CONTAINS this batch's accepted docs,
        # and diffing against it would misclassify them as exact dups.
        # Same replay discipline as the index's `_src_batch < batch_id`.
        prior_version = self.curated.latest_version()
        for m in self.curated._manifests():
            if m.get("batch_id") == batch_id:
                prior_version = m["version"] - 1
                break
        if prior_version is not None and prior_version >= 0:
            prior_fp = self.curated.read(
                batch_df.sparkSession, version=prior_version
            ).select("fp")
            batch_unique = batch_unique.join(prior_fp, "fp", "left_anti")
        # stabilize before the index mutates: detection must see the
        # pre-registration state and the landing must agree with what
        # was registered
        batch_unique = batch_unique.localCheckpoint(eager=True)
        if self.audit_rejections:
            reasons.append(
                q.select("doc_id")
                .join(batch_unique.select("doc_id"), "doc_id", "left_anti")
                .withColumn("reason", F.lit("exact_dup"))
                .localCheckpoint(eager=True)
            )
        # checkpoint materialized -> the metrics cache has served its
        # one consumer; release it so per-batch caches never accumulate
        # over a long-running stream
        metrics.unpersist()
        # MinHash the batch ONCE: detection consumes these band keys
        # and registration re-uses them (accepted docs are a doc_id
        # subset, so their band rows are a semi-join of the same
        # table) — without the shared handle every micro-batch paid
        # the tokenize+shingle+16-way-MinHash pipeline twice. Banding
        # shingles from the checkpointed _w array (tokenized once, in
        # the quality projection) rather than re-splitting text.
        from .neardup_index import band_keys_from_words

        bands = band_keys_from_words(
            batch_unique.select("doc_id", "_w"),
            self.index.n_minhash,
            self.index.n_bands,
            words_col="_w",
        ).localCheckpoint(eager=True)
        # near-dup vs previously ACCEPTED docs (the index mirrors the
        # curated corpus: detect over the batch, register survivors
        # only — a doc dropped here never shadows future arrivals)
        pairs = self.index.detect_bands(
            bands, batch_df.sparkSession, batch_id
        )
        neardup_ids = pairs.select(F.col("new_doc_id").alias("doc_id")).distinct()
        accepted = batch_unique.join(neardup_ids, "doc_id", "left_anti")
        pre_decon = accepted
        # decontaminate BEFORE dropping _w so its 5-gram shingles come
        # from the checkpointed array, not a re-tokenize of text
        accepted = self._decontaminate(accepted).drop("_w")
        accepted = accepted.localCheckpoint(eager=True)
        # the index registration and the curated landing are
        # independent (different tables, both inputs eagerly
        # checkpointed above) — overlap them so the second write job
        # back-fills the first's task tail instead of queuing behind
        # it (round 15, guide §2.6). Idempotence + the two-table done
        # check above make any crash/ordering interleaving safe.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_reg = pool.submit(
                self.index.register_bands,
                bands.join(accepted.select("doc_id"), "doc_id", "left_semi"),
                batch_id=batch_id,
            )
            f_land = pool.submit(
                self.curated.append, accepted, batch_id=batch_id
            )
            f_reg.result()
            f_land.result()
        if self.audit_rejections:
            reasons.append(
                neardup_ids.withColumn("reason", F.lit("near_dup"))
            )
            reasons.append(
                pre_decon.select("doc_id")
                .join(accepted.select("doc_id"), "doc_id", "left_anti")
                .withColumn("reason", F.lit("contaminated"))
            )
            rejected = reasons[0]
            for r in reasons[1:]:
                rejected = rejected.unionByName(r)
            # same idempotent landing as the curated table: a replayed
            # batch audits nothing twice
            self.rejected.append(rejected, batch_id=batch_id)
