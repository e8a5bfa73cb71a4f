"""Embedding-vector expressions: cosine math + deterministic LSH.

All built-in higher-order functions (zip_with / aggregate / transform)
— the dot product runs JVM-side per row, no Python boundary. The LSH
hyperplanes are generated from a Knuth-multiplicative integer formula
rather than rand(seed) so that (a) every executor derives bit-identical
planes with zero driver->executor data movement, and (b) tests and
oracles can reproduce them.

Scale (100 TB): brute-force top-k is O(Q x N) — fine for small Q on a
broadcast query set, the baseline. The LSH path buckets candidates so
each query probes ~N / 2^planes rows; buckets are the join key, so the
probe is a plain shuffled equi-join that AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_KNUTH = 2654435761  # golden-ratio multiplicative constant


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sum of elementwise products, left-to-right double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane(j: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane j as array<double> in
    [-1, 1): ((j*dim+k) * KNUTH mod 2^32) / 2^31 - 1."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(
        idx,
        lambda k: ((F.lit(j * dim) + k) * _KNUTH % F.lit(2**32)).cast("double")
        / F.lit(float(2**31))
        - 1.0,
    )


def ann_planes(n: int, target: int = 256, lo: int = 4, hi: int = 12) -> int:
    """Sign-LSH plane count for an n-vector corpus: enough hyperplanes
    that the EXPECTED bucket population (n / 2^planes) stays near
    ``target``, clamped to [lo, hi]. A FIXED plane count makes bucket
    populations — and therefore every per-query candidate set — grow
    linearly with the corpus (measured 25x at the 100x probe for the
    fixed-4 design this replaces); adapting keeps the equi-join's
    per-bucket work ~flat while hamming-1 multi-probe keeps recall —
    the same discipline as neardup_candidates_bucketed's log2(n/256)
    and _lsh_subsplit. Deterministic in n alone, so an oracle that
    knows n can mirror it: stays at the ``lo`` floor (4) up to
    n = target*(2^lo - 1) = 3840 vectors, which covers the sf0.01 and
    sf0.1 oracle corpora (500 / 2000) bit-identically."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(n / target + 1))))


def neardup_candidates(
    emb,
    k_per_row: int = 20,
    dim: int = 64,
    broadcast_row_limit: int = 200_000,
    pair_budget: int = 100_000_000,
):
    """Scale-gated near-dup candidate generation.

    Small corpus: the exact numpy blockwise kernel. Larger: the
    LSH-bucketed equi-join below — candidates come from a distributed
    self-join on bucket id and NOTHING is ever collected to the
    driver. The gate is one count() (cheap parquet metadata scan next
    to the work it guards) so callers can't accidentally drive the
    driver-collect kernel into a 100 TB corpus.

    TWO gate conditions, because feasibility and cost diverge: the row
    limit bounds the broadcast B side (~51 MB at 200k x 64 floats),
    but blockwise WORK is n^2 dots — the 10x scaling probe measured
    0.7s at 2k vectors vs 20s at 20k (quadratic, exactly as the
    arithmetic says) while the bucketed path stays near-linear. The
    pair budget (default 1e8 ~ 10k rows self-paired, a few seconds of
    BLAS on one box) flips to the approximate bucketed path while the
    exact kernel is still comfortably feasible — exact below it,
    ANN-with-documented-recall above, the standard trade."""
    n = emb.count()
    if n <= broadcast_row_limit and n * n <= pair_budget:
        return neardup_candidates_blockwise(emb, k_per_row=k_per_row)
    return neardup_candidates_bucketed(emb, k_per_row=k_per_row, dim=dim, n_rows=n)


def neardup_candidates_bucketed(
    emb,
    k_per_row: int = 20,
    dim: int = 64,
    planes: int | None = None,
    n_rows: int | None = None,
):
    """LSH-bucketed near-dup candidates — the 100 TB path: bucket each
    vector by hyperplane sign pattern (shuffled groupBy, AQE
    skew-splittable), then score each bucket with ONE BLAS matmul in
    an applyInPandas kernel — exact cosine within the bucket, top-k
    per row emitted directly. Single-probe: cross-bucket near-dups
    are missed with probability shrinking in similarity — the standard
    LSH recall trade documented in lsh_bucket.

    Two scaling lessons from the 10x probe are baked in:
    - ``planes`` defaults ADAPTIVELY to ~256-row buckets: with a fixed
      plane count the per-bucket population grows linearly with the
      corpus and in-bucket pair work is quadratic again (16 buckets at
      20k vectors = 1e7+ pair-cosines). log2(n/256) planes keeps it
      ~linear; each extra plane splits a true near-dup pair (angle
      theta ~ 0) with probability only theta/pi, so recall decays
      gently while cost halves.
    - the in-bucket scorer is a numpy kernel, NOT a self-join with a
      per-pair HOF dot: interpreted array lambdas cost ~5us/pair
      (measured — 4M pairs took 20s across 32 cores) while the same
      arithmetic is one m x m BLAS matmul per bucket. Same escape
      hatch as the blockwise kernel, applied per group; the shuffle
      moves only n rows, never pairs."""
    import math

    if planes is None:
        n = n_rows if n_rows is not None else emb.count()
        planes = max(4, min(12, math.ceil(math.log2(max(n, 1) / 256 + 1))))

    with_bucket = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket(F.col("embedding"), dim, planes).alias("bucket"),
    )

    def score_bucket(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos": "float64"}
            )
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        m = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = m @ m.T
        np.fill_diagonal(sims, -np.inf)
        sims[np.tril_indices_from(sims)] = -np.inf  # keep id_a < id_b
        k = min(k_per_row, sims.shape[1])
        ia, ib, cs = [], [], []
        # per-row top-k over the surviving upper triangle; stable
        # ordering (cos desc, id_b asc) matches the join+window form
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        for i in range(sims.shape[0]):
            cols = top[i][np.isfinite(sims[i, top[i]])]
            cols = cols[np.lexsort((ids[cols], -sims[i, cols]))]
            ia.extend([ids[i]] * len(cols))
            ib.extend(ids[cols].tolist())
            cs.extend(sims[i, cols].tolist())
        return pd.DataFrame({"id_a": ia, "id_b": ib, "cos": cs}).astype(
            {"id_a": "int64", "id_b": "int64", "cos": "float64"}
        )

    return with_bucket.groupBy("bucket").applyInPandas(
        score_bucket, schema="id_a long, id_b long, cos double"
    )


def neardup_candidates_blockwise(emb, k_per_row: int = 20):
    """All-pairs cosine with a numpy block kernel: each Arrow batch of
    rows (the A-block) is multiplied against the broadcast unit-norm
    B-matrix; only the upper triangle survives and each row keeps its
    local top-k — the global top-k is a subset, so the tiny candidate
    set (rows x k) can be re-ranked exactly downstream.

    This is the deliberate numpy escape hatch: 12M pair-dots through
    JVM higher-order lambdas measured ~40x slower than one BLAS matmul
    per batch. The B side is collected+broadcast like a broadcast-join
    build side (51 MB at 200k x 64 floats); beyond that, IVF/LSH
    bucketing or block-partitioning both sides replaces it — see
    lsh_bucket.

    Returns DataFrame(id_a, id_b, cos) of candidates.
    """
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    bc = emb.sparkSession.sparkContext.broadcast((ids, mat))

    def batches(it):
        import pandas as pd

        b_ids, b_mat = bc.value
        for pdf in it:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
            sims = a_mat @ b_mat.T
            # upper triangle only: candidate id_b must exceed id_a
            mask = b_ids[None, :] <= a_ids[:, None]
            sims[mask] = -np.inf
            k = min(k_per_row, sims.shape[1])
            top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            out_a, out_b, out_c = [], [], []
            for i in range(sims.shape[0]):
                for j in top[i]:
                    if np.isfinite(sims[i, j]):
                        out_a.append(a_ids[i])
                        out_b.append(b_ids[j])
                        out_c.append(float(sims[i, j]))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos": out_c})

    return emb.select("vec_id", "embedding").mapInPandas(
        batches, "id_a long, id_b long, cos double"
    )


def ivf_index(emb, n_centroids: int = 16, lloyd_iters: int = 3):
    """IVF (inverted-file) index trained with spherical k-means:
    deterministic seeded init (first n vectors by vec_id), then
    ``lloyd_iters`` assign+mean rounds; search probes only the closest
    centroid lists.

    Each Lloyd round is fully distributed: assignment is the numpy
    block kernel (one matmul per Arrow batch against the broadcast
    centroid matrix), the new means come from a posexplode +
    groupBy(cluster, pos) average — one shuffle of n_centroids x dim
    partial rows; only the (16 x 64) centroid matrix itself ever
    reaches the driver. Means are rounded to 1e-6 before re-normalizing
    so run-order float noise in the distributed average can't flip an
    assignment between runs (determinism the recall tests rely on).

    Returns (assigned DataFrame(vec_id, embedding, cluster),
    centroids ndarray).
    """
    import numpy as np
    from pyspark.sql import functions as F

    sc = emb.sparkSession.sparkContext
    # seed from the first n_centroids vectors IN vec_id ORDER — not
    # `vec_id < n_centroids`, which silently assumed ids are contiguous
    # from 0 and returned a degenerate (short or empty) seed matrix on
    # any filtered / resharded / id-shifted corpus. Same determinism
    # (smallest ids win), no contiguity assumption; TakeOrdered keeps
    # only k rows on the driver.
    cent_rows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(n_centroids)
        .collect()
    )
    cent = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)

    def make_assign(bc):
        def assign(it):
            c = bc.value
            for pdf in it:
                m = np.array(list(pdf["embedding"]), dtype=np.float64)
                m /= np.linalg.norm(m, axis=1, keepdims=True)
                pdf = pdf.copy()
                pdf["cluster"] = np.argmax(m @ c.T, axis=1).astype("int32")
                yield pdf

        return assign

    base = emb.select("vec_id", "embedding")
    for _ in range(lloyd_iters):
        bc = sc.broadcast(cent)
        assigned = base.mapInPandas(
            make_assign(bc), "vec_id long, embedding array<float>, cluster int"
        )
        mean_rows = (
            assigned.select(
                "cluster", F.posexplode(F.col("embedding")).alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_cent = cent.copy()  # empty clusters keep their old centroid
        for r in mean_rows:
            new_cent[r["cluster"], r["pos"]] = r["m"]
        new_cent = np.round(new_cent, 6)
        norms = np.linalg.norm(new_cent, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cent = new_cent / norms

    bc = sc.broadcast(cent)
    assigned = base.mapInPandas(
        make_assign(bc), "vec_id long, embedding array<float>, cluster int"
    )
    return assigned, cent


def _lsh_subsplit(assigned, dim: int, max_cluster_rows: int):
    """Bound cluster populations by construction: one k-row size agg,
    then deterministic LSH hyperplane-sign sub-buckets for the
    oversized clusters ONLY (``sub`` = 0 everywhere else, so the
    common path's grouping — and its results — are unchanged). Plane
    count targets half the bound for the worst cluster, capped at 10
    (1024-way split) — so the bound is EXPECTED-case: a cluster beyond
    ~1024x the bound, or one whose plane-sign distribution is skewed,
    can still produce an oversized sub-bucket. The prune kernel covers
    both residuals: near-identical blobs (every plane sign equal)
    collapse via the linear single-component fast path, and any other
    oversized group falls back to a block-wise edge scan whose peak
    memory is block*n instead of n*n — slow but bounded, never an
    executor OOM."""
    sizes = {
        r["cluster"]: r["n"]
        for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    oversized = {c: n for c, n in sizes.items() if n > max_cluster_rows}
    if not oversized:
        return assigned.withColumn("sub", F.lit(0))
    import math

    worst = max(oversized.values())
    planes = min(10, max(1, math.ceil(math.log2(worst / (max_cluster_rows / 2)))))
    return assigned.withColumn(
        "sub",
        F.when(
            F.col("cluster").isin(*[int(c) for c in oversized]),
            lsh_bucket(F.col("embedding"), dim, planes=planes),
        ).otherwise(F.lit(0)),
    )


def semantic_dedup(
    emb,
    n_centroids: int | None = None,
    threshold: float = 0.95,
    lloyd_iters: int = 3,
    max_cluster_rows: int = 2048,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then
    within each cluster drop all but one member of every group of
    semantically near-identical vectors (cosine >= threshold).

    Semantics, pinned deterministically:
    - duplicate groups are CONNECTED COMPONENTS of the within-cluster
      threshold graph (chains collapse to one survivor, matching the
      MinHash family's component semantics);
    - each group keeps the member LEAST similar to its cluster
      centroid (the paper's diversity-keeping rule: the most typical
      members are the most redundant), ties broken by min vec_id.

    Scale: clustering is the distributed IVF trainer (one broadcast
    matmul per Arrow batch per Lloyd round); pruning is ONE BLAS
    m x m matmul per cluster inside applyInPandas — the shuffle moves
    n rows partitioned by cluster, never pairs. ``n_centroids``
    defaults adaptively to ~256-row clusters (same lesson as the LSH
    bucketed path: a FIXED cluster count makes in-cluster pair work
    quadratic in corpus size).

    Adaptive k bounds the AVERAGE cluster, not the max — a skewed
    k-means cluster would re-introduce quadratic per-task work. So
    populations are bounded BY CONSTRUCTION: any cluster above
    ``max_cluster_rows`` is sub-split on deterministic LSH hyperplane
    signs (enough planes to target half the bound), the same
    discipline the bucketed near-dup path applies; pairs straddling
    sub-buckets of an oversized cluster are the same accepted LSH
    approximation. The one shape LSH cannot split — a blob of
    near-IDENTICAL vectors, which shares every plane sign — is exactly
    the shape the prune kernel's single-component fast path collapses
    in linear time (all members within threshold of the first ->
    provably one connected component, no pair matrix needed).

    Returns DataFrame(vec_id long, cluster int, keep boolean).
    """
    import numpy as np

    if n_centroids is None:
        # k ~ n/256 targets ~256-row clusters, CAPPED at 64 — and the
        # cap is measured, not guessed: raising it to 1024 (average
        # cluster back to 256 rows at 200k vectors, no sub-splitting)
        # was benchmarked at 100x corpus and came out 57% SLOWER
        # (29.6 s vs 18.9 s), because every Lloyd iteration's
        # assignment costs k*n*d flops — with k ~ n/256 that term is
        # quadratic in n and at k=1024 it already exceeds the
        # sub-split-capped in-cluster pair work it was meant to
        # avoid (<= max_cluster_rows*d flops/row). Small fixed k +
        # the LSH population cap is the asymptotically right split:
        # both terms linear in n, smaller constant.
        n = emb.count()
        n_centroids = int(max(16, min(64, n // 256)))
    assigned, cent = ivf_index(emb, n_centroids=n_centroids, lloyd_iters=lloyd_iters)
    bc = emb.sparkSession.sparkContext.broadcast(cent)

    # two consumers read the assignment — _lsh_subsplit's cluster-size
    # agg and the final grouped prune. Without the cache each re-runs
    # the full Arrow/numpy assignment pass over the corpus; the size
    # agg is the action that materializes it. The cache is released
    # BEFORE returning: the lazy prune plan instead reads an eager
    # localCheckpoint of the (cluster, sub) assignment, whose blocks
    # the ContextCleaner reclaims once the caller drops the result —
    # a bare persist here would pin one cached corpus per
    # semantic_dedup call for the session lifetime.
    assigned = assigned.persist()
    try:
        split = _lsh_subsplit(assigned, int(cent.shape[1]), max_cluster_rows)
        split = split.localCheckpoint(eager=True)
    finally:
        assigned.unpersist()
    assigned = split

    def prune(pdf):
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        cluster = int(pdf["cluster"].iloc[0])
        m = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        n_rows = len(ids)
        if n_rows == 1:
            return pd.DataFrame(
                {"vec_id": ids, "cluster": cluster, "keep": [True]}
            )
        cos_to_cent = m @ bc.value[cluster]
        # single-component fast path: if EVERY member is within
        # threshold of the first, the threshold graph is connected
        # through row 0 — one component, no m x m matrix. This is the
        # exact linear-time collapse for the near-identical blob that
        # LSH sub-splitting cannot break apart (all plane signs equal).
        if n_rows > 2 and bool(np.all(m @ m[0] >= threshold)):
            keep = np.zeros(n_rows, dtype=bool)
            keep[np.argmin(np.round(cos_to_cent, 9))] = True
            return pd.DataFrame(
                {"vec_id": ids, "cluster": cluster, "keep": keep}
            )
        # union-find over the threshold graph (strictly above-diagonal
        # edges). Cluster populations are ~bounded by the LSH sub-split,
        # but its 1024-bucket plane cap makes that an EXPECTED bound,
        # not a hard one — a pathological cluster (skewed plane signs,
        # not blob-collapsible) can still arrive oversized. The edge
        # scan therefore runs in ROW BLOCKS: peak memory is block*n
        # doubles instead of n*n, so an oversized group degrades to
        # slow-but-bounded instead of OOMing the executor.
        parent = np.arange(n_rows)

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        blk = n_rows if n_rows <= 4096 else 2048
        for s in range(0, n_rows, blk):
            sims_b = m[s : s + blk] @ m.T
            ai, bi = np.where(sims_b >= threshold)
            ai = ai + s
            above = bi > ai  # strictly above-diagonal, vectorized
            for a, b in zip(ai[above].tolist(), bi[above].tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(n_rows)])
        keep = np.zeros(n_rows, dtype=bool)
        for root in np.unique(roots):
            members = np.flatnonzero(roots == root)
            # least-typical member survives; ties -> min vec_id
            # (ids are sorted ascending, argmin takes the first)
            keep[members[np.argmin(np.round(cos_to_cent[members], 9))]] = True
        return pd.DataFrame({"vec_id": ids, "cluster": cluster, "keep": keep})

    return assigned.groupBy("cluster", "sub").applyInPandas(
        prune, schema="vec_id long, cluster int, keep boolean"
    )


def ivf_probe_clusters(query_vecs, cent, n_probe: int = 4):
    """For each query vector (numpy rows), the n_probe nearest
    centroid ids — the cluster lists to scan."""
    import numpy as np

    q = query_vecs / np.linalg.norm(query_vecs, axis=1, keepdims=True)
    sims = q @ cent.T
    return np.argsort(-sims, axis=1)[:, :n_probe]


def lsh_bucket(vec: Column, dim: int, planes: int = 6) -> Column:
    """Sign-pattern bucket id: bit j = (dot(vec, plane_j) >= 0).

    2^planes buckets; cosine-similar vectors land together with high
    probability (random-hyperplane LSH for angular distance).
    """
    bits = [
        F.when(dot(vec, hyperplane(j, dim)) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


# --- durable IVF index ---------------------------------------------------


def save_ivf_index(root: str, assigned, cent) -> None:
    """Persist a trained IVF index as a REAL on-disk inverted file:
    assignments land range-CLUSTERED on the cluster id in a versioned
    table (so each centroid's posting list occupies its own file
    group with tight manifest stats), centroids land as a tiny
    sibling table. Training is the expensive part of IVF — persisting
    lets every later session probe without retraining, and the
    clustered layout means a probe READS only its clusters' file
    groups (storage-level list pruning, not just a filter).
    """
    from ..storage.versioned import VersionedTable

    import os

    a = VersionedTable(root + "/assignments")
    # Posting-group count derived from DATA VOLUME (round 15,
    # guide §6 file sizing), not fixed at k: one group per centroid
    # wrote k near-empty files at small scale (32 write tasks + a
    # 32-directory footer walk for a few MB of assignments) and, at
    # 100 TB, would pile multi-GB posting lists into single files.
    # Catalyst's plan-size estimate is free (no job); the group count
    # targets NETFLOW_IVF_GROUP_BYTES per group (default 128 MB),
    # clamped to [min(k, 4), k] — the floor keeps the layout an
    # inverted FILE structure (range pruning stays demonstrably
    # selective), the cap keeps a group from spanning less than one
    # centroid's list. Any value is CORRECT (read_ivf_clusters prunes
    # by range and filters exactly); this only sizes files.
    k = int(cent.shape[0])
    est = int(
        assigned._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    target = int(os.environ.get("NETFLOW_IVF_GROUP_BYTES", str(128 << 20)))
    n_groups = max(min(k, 4), min(k, -(-est // target)))
    # OVERWRITE, not append: re-saving a retrained index must replace
    # the posting lists — an append would return the union of stale
    # and fresh assignments (duplicate vec_ids against the new
    # centroid matrix)
    a.overwrite_clustered(assigned, "cluster", n_groups=n_groups)
    c = VersionedTable(root + "/centroids")
    rows = [
        (int(i), [float(x) for x in cent[i]]) for i in range(cent.shape[0])
    ]
    # driver-local landing (round 15): the centroid matrix is k rows
    # the DRIVER already holds (cent is a numpy array), so shipping it
    # through createDataFrame + a one-task Spark write job (the round-14
    # parallelize(rows, 1) shape) paid a whole job for bytes that never
    # needed an executor. append_rows writes the parquet driver-side
    # and commits pure metadata; load_ivf_centroids stays a
    # single-file read.
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    c.append_rows(
        rows,
        StructType(
            [
                StructField("cluster", IntegerType()),
                StructField("centroid", ArrayType(DoubleType())),
            ]
        ),
        overwrite=True,
    )


def load_ivf_centroids(spark, root: str):
    """The (n_centroids x dim) matrix back from the centroid table —
    the only piece a query-router needs in memory."""
    import numpy as np

    from ..storage.versioned import VersionedTable

    rows = sorted(
        VersionedTable(root + "/centroids").read(spark).collect(),
        key=lambda r: r["cluster"],
    )
    return np.array([r["centroid"] for r in rows], dtype=np.float64)


def read_ivf_clusters(spark, root: str, clusters):
    """The probed posting lists, via manifest-stats file skipping:
    only file groups whose recorded cluster range overlaps a probed
    id are opened (the exact filter still applies on top — pruning is
    the superset contract). This is the IVF promise made physical:
    probe cost follows the probed lists, not the corpus."""
    import os

    from ..storage.versioned import VersionedTable

    t = VersionedTable(root + "/assignments")
    wanted = sorted({int(c) for c in clusters})
    # pin ONE snapshot for every probe: resolving latest_version per
    # cluster would mix two index generations if a re-save lands
    # mid-loop
    version = t.latest_version()
    files: list[str] = []
    for c in wanted:
        for f in t.snapshot_files(version, prune=("cluster", c, c)):
            if f not in files:
                files.append(f)
    from pyspark.sql import functions as F

    if not files:  # no probes, or every probe pruned to nothing
        return t.read(spark, version=version).limit(0)
    df = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(t.root, f) for f in files]
    )
    return df.filter(F.col("cluster").isin(wanted))
