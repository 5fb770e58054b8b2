"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup. Everything except candidate *verification* is a
single shuffle; nothing is quadratic in the corpus.

Reference analog: in-queue dup checks before writes (DbUpdateAddressOne
addMap containment) and the dedup write of graph nodes (SURVEY.md §2.1
S12/S13) — generalized here to content-level near-duplication.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from . import lsh


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session default parallelism when
    the input has fewer partitions.

    Python/Arrow stages (shingle UDF, GEMM mapInPandas) parallelize by
    input split, and a small single-file parquet table opens with only a
    couple of splits (``spark.sql.files.openCostInBytes`` pads small files
    to 4 MB, guide §6) — at sf1.0 the 5.7 MB documents table scanned as 2
    splits, so every downstream Arrow UDF ran on 2 of 32 cores. The
    repartition shuffles only the narrow projected columns; at cluster
    scale inputs span many files and this is a no-op."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


# -- exact -------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group byte-identical texts by md5; emit (content_md5, n_docs, keep_id)
    for groups with >1 member. keep_id = min id (deterministic winner)."""
    return (
        docs.select(F.col(id_col), TX.content_hash(F.col(text_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row (min id) per distinct text. row_number over the content
    hash — the standard pre-write compaction."""
    from pyspark.sql import Window as W

    w = W.partitionBy(TX.content_hash(F.col(text_col))).orderBy(F.col(id_col))
    return docs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


# -- n-gram Jaccard ----------------------------------------------------------


def shingle_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Standard (_id, _sh) shingle frame — the shared first stage of the
    Jaccard/MinHash family. Callers that run several dedup operators over
    the same corpus should build this ONCE, persist it, and pass it via
    the operators' ``sh=`` parameter (t06_dedup_recall does).

    The (id, text) projection is spread to full parallelism before the
    Arrow shingle UDF — see :func:`_spread` (r6: the sf1.0 corpus scanned
    as 2 splits and the UDF pass took 7.2 s on 2 cores vs ~1 s spread)."""
    return _spread(docs.select(
        F.col(id_col).alias("_id"), F.col(text_col)
    )).select(
        "_id", TX.word_shingles(F.col(text_col), n).alias("_sh")
    ).where(F.size("_sh") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
    sh: DataFrame | None = None,
    gemm_max_incidences: int = 32_000_000,
) -> DataFrame:
    """(id_a, id_b, jacc) for pairs with word-n-gram Jaccard >= threshold.

    Two physically different plans, one contract (parity pytest-pinned):

    * **Postings-GEMM path** (taken when the corpus fits
      ``gemm_max_incidences`` (doc, shingle) incidences): the shingle
      frame is collected ONCE, factorized to dense column codes on the
      driver (string-exact — no hashing, no collision modes), and the
      postings closure (~12 bytes/incidence + ~20/doc; ~400 MB per
      Python worker at the 32M default — size the budget to worker
      memory on smaller hosts) is broadcast; tasks then
      count their doc block's overlaps against the whole corpus with
      cache-resident numpy gathers — the §8-guide "decide with small
      rows" move, and the same size-guarded closure-broadcast pattern as
      the embedding exact path. ZERO shuffles, one pass over the corpus;
      the 10^8 co-incidence touches that previously went through a
      self-join + 120M-group hash aggregate (296 s at sf1.0) stay in
      numpy blocks (~4 s). Only pairs at or above the threshold leave
      Python.
    * **Shared-shingle join path** (fallback above the budget or for
      non-integral ids): explode → self-join on the shingle → arithmetic
      pair count, never a full cross join — unbounded-scale, one shuffle
      per stage.

    Shingles shared by more than ``max_shingle_freq`` docs ("hub"
    shingles — boilerplate) are EXCLUDED from candidate generation on both
    paths, because a shingle in d docs emits d(d-1)/2 candidate rows —
    quadratic blowup on adversarial/boilerplate corpora. The reported
    Jaccard stays EXACT: each doc's (tiny) hub-shingle subset is
    intersected back per candidate pair, so ``c = c_nonhub +
    |hub_A ∩ hub_B|``. The only semantic difference vs the uncapped
    operator is that a pair whose shared shingles are ALL hubs (both docs
    >= threshold-fraction pure boilerplate) is not emitted — the standard
    CCNet/Gopher-style dedup convention, identical on both paths.

    ``max_shingle_freq=None`` disables the cap (pure arithmetic path).
    """
    id_type = (
        sh.schema["_id"] if sh is not None else docs.schema[id_col]
    ).dataType.simpleString()
    if sh is None:
        # cheap no-UDF eligibility proxy: token count <= chars/5, and a
        # shingle never outnumbers tokens — an over-estimate only ever
        # sends an eligible corpus to the (correct, slower) join path
        pre = docs.agg(F.sum(F.length(text_col)).alias("chars")).collect()[0]
        if (pre["chars"] or 0) // 5 <= 2 * gemm_max_incidences:
            post = _try_text_postings(docs, id_col, text_col, n, gemm_max_incidences)
            if post is not None:
                return _jaccard_pairs_gemm(
                    docs.sparkSession, id_type, post, threshold, max_shingle_freq
                )
        # join path consumes the shingle frame several times — persist it
        return _jaccard_pairs_join(
            shingle_docs(docs, id_col, text_col, n).persist(), threshold, max_shingle_freq
        )
    st = sh.agg(F.sum(F.size("_sh")).alias("inc")).collect()[0]
    if st["inc"] is not None and st["inc"] <= gemm_max_incidences:
        post = _try_shingle_postings(sh, gemm_max_incidences)
        if post is not None:
            return _jaccard_pairs_gemm(
                sh.sparkSession, id_type, post, threshold, max_shingle_freq
            )
    return _jaccard_pairs_join(sh, threshold, max_shingle_freq)


def _jaccard_pairs_join(
    sh: DataFrame, threshold: float, max_shingle_freq: int | None
) -> DataFrame:
    """The distributed shared-shingle join plan (see
    :func:`ngram_jaccard_pairs`); unbounded scale, no driver state."""
    docs = sh  # only the sparkSession is needed from here on
    # _sh is a DISTINCT shingle array, so (id, shingle) rows are unique and
    # the shared-shingle count c per pair equals |A ∩ B| exactly — Jaccard
    # falls out arithmetically: j = c / (|A| + |B| - c). No second pass
    # over the arrays, no verify join; one shuffle for the pair groupBy.
    exploded = sh.select("_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_g"))

    n_hubs = 0
    if max_shingle_freq is not None:
        # Hub shingles number <= total_incidences / cap by construction —
        # collected once (the reference's hot-address-cache move) and
        # re-entered as a small broadcast DATAFRAME. Not a persist (it
        # would leak into the caller's long-lived session — t06's
        # unpersist sweep can't reach it) and not a literal
        # F.array(*[F.lit(g) ...]) (Catalyst analysis degrades at a few
        # thousand literal expressions, far below any useful cap).
        hub_rows = (
            exploded.groupBy("_g")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") > max_shingle_freq)
            .select("_g")
            .limit(100_001)
            .collect()
        )
        n_hubs = len(hub_rows)
        if n_hubs > 100_000:
            raise ValueError(
                "ngram_jaccard_pairs: >100k hub shingles above "
                f"max_shingle_freq={max_shingle_freq}; raise the cap or use "
                "minhash_lsh_pairs for this corpus"
            )
        exploded_all = exploded
        if n_hubs:
            hubs = docs.sparkSession.createDataFrame(hub_rows, "_g string")
            exploded = exploded.join(F.broadcast(hubs), "_g", "left_anti")

    cand = (
        exploded.alias("a")
        .join(exploded.alias("b"), (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
        )
        .agg(F.count("*").alias("_c"))
    )
    if n_hubs:
        # Add back the hub-shingle overlap so jacc is exact: each doc's hub
        # subset comes from a semi join against the hub dim (never a giant
        # literal array), re-packed per doc — bounded by n_hubs per row.
        hsub = (
            exploded_all.join(F.broadcast(hubs), "_g", "left_semi")
            .groupBy("_id")
            .agg(F.collect_list("_g").alias("_hub"))
        )
        empty = F.array().cast("array<string>")
        # plain equi-joins: cand is post-threshold-small, hsub is one tiny
        # array per doc; AQE picks broadcast for whichever side is small.
        # LEFT joins: docs with no hub shingles are absent from hsub.
        cand = (
            cand.join(hsub.withColumnRenamed("_id", "id_a").withColumnRenamed("_hub", "_ha"), "id_a", "left")
            .join(hsub.withColumnRenamed("_id", "id_b").withColumnRenamed("_hub", "_hb"), "id_b", "left")
            .withColumn(
                "_c",
                F.col("_c")
                + F.size(F.array_intersect(F.coalesce("_ha", empty), F.coalesce("_hb", empty))),
            )
        )
    jacc = F.col("_c").cast("double") / (F.col("_na") + F.col("_nb") - F.col("_c")).cast("double")
    return cand.select("id_a", "id_b", jacc.alias("jacc")).where(F.col("jacc") >= threshold)


def _try_text_postings(
    docs: DataFrame, id_col: str, text_col: str, n: int, max_incidences: int
):
    """Collect the BOUNDED corpus as raw (id, text) — ~8x fewer bytes than
    the shingle arrays — and shingle on the driver with the shared
    pure-Python tokenizer (functions.text.shingle_list: identical
    semantics to the Arrow UDF by construction). Cuts the distributed
    shingle-UDF pass out of the GEMM path entirely: the corpus must be
    collected anyway, and 50k docs shingle in ~2 s flat on the driver vs
    a 3-5 s Python-worker stage. Returns the postings dict or None."""
    import numpy as np

    try:
        tbl = docs.select(
            F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
        ).toArrow()
        ids = np.asarray(tbl.column("_id"), dtype=np.int64)
    except (ValueError, TypeError, OverflowError):
        return None  # non-integral ids — join path handles them
    texts = tbl.column("_t").to_pylist()
    flat: list[str] = []
    sizes = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        shl = TX.shingle_list(t, n)
        sizes[i] = len(shl)
        flat.extend(shl)
    keep = sizes > 0  # mirror shingle_docs' size(_sh) > 0 filter
    if not keep.all():
        ids, sizes = ids[keep], sizes[keep]
    return _assemble_postings(ids, sizes, flat, max_incidences)


def _try_shingle_postings(sh: DataFrame, max_incidences: int):
    """Collect an existing (_id, _sh) shingle frame (persisted by the
    caller — the t06 stage-sharing shape) and build the postings closure.
    Returns None when the corpus exceeds the incidence budget or ids are
    not integral (then the caller must use the distributed string join)."""
    import numpy as np

    try:
        tbl = sh.select("_id", "_sh").toArrow()
        ids = np.asarray(tbl.column("_id"), dtype=np.int64)
    except (ValueError, TypeError, OverflowError):
        return None  # non-integral ids — join path handles them
    import pyarrow.compute as pc

    scol = tbl.column("_sh").combine_chunks()
    sizes = np.asarray(pc.list_value_length(scol), dtype=np.int64)
    return _assemble_postings(ids, sizes, scol.flatten(), max_incidences)


def _assemble_postings(ids, sizes, flat, max_incidences: int):
    """Common tail of the postings builders: dictionary-encode the flat
    shingle stream (string-exact dense column codes, Arrow C++), reorder
    rows into id order if needed, and build the postings arrays described
    in :func:`ngram_jaccard_pairs`. ``flat`` is a pyarrow string Array or
    a Python list of strings in row-major order."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    tot = int(sizes.sum())
    if tot == 0 or tot > max_incidences:
        return None
    if not isinstance(flat, (pa.Array, pa.ChunkedArray)):
        flat = pa.array(flat, type=pa.string())
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes_raw = np.asarray(enc.indices, dtype=np.int32)
    vocab = enc.dictionary.to_numpy(zero_copy_only=False)
    if len(ids) > 1 and not bool(np.all(ids[:-1] < ids[1:])):
        # regather rows in id order so doc position order == id order
        # (skipped on the common already-sorted layout)
        order = np.argsort(ids, kind="stable")
        offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
        np.cumsum(sizes, out=offsets[1:])
        lens = sizes[order]
        starts = offsets[:-1][order]
        csum = np.cumsum(lens)
        idx = np.repeat(starts, lens) + (
            np.arange(tot, dtype=np.int64) - np.repeat(csum - lens, lens)
        )
        codes_raw = codes_raw[idx]
        ids, sizes = ids[order], lens
    inc_codes = codes_raw.astype(np.int32, copy=False)
    sizes = sizes.astype(np.int32)
    n_docs = len(ids)
    row_ptr = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(sizes, out=row_ptr[1:])
    doc_of_inc = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)
    porder = np.argsort(inc_codes, kind="stable")
    post_docs = doc_of_inc[porder].astype(np.int32)
    inc_pos = np.empty(tot, dtype=np.int32)
    inc_pos[porder] = np.arange(tot, dtype=np.int32)
    col_df = np.bincount(inc_codes, minlength=len(vocab))
    post_ptr = np.zeros(len(vocab) + 1, dtype=np.int64)
    np.cumsum(col_df, out=post_ptr[1:])
    return {
        "ids": ids,
        "sizes": sizes,
        "row_ptr": row_ptr,
        "inc_codes": inc_codes,
        "inc_pos": inc_pos,
        "post_docs": post_docs,
        "post_ptr": post_ptr,
        "col_df": col_df.astype(np.int32),
        "vocab": np.asarray(vocab, dtype=object),
        "n_docs": n_docs,
    }


def _count_sorted(keys):
    """(unique_keys, counts) via in-place sort + run-length — sequential
    memory access; np.bincount over the full keyspace thrashed ~100 MB of
    random writes per block under 32-way task contention."""
    import numpy as np

    keys.sort()
    change = np.empty(len(keys), dtype=bool)
    change[0] = True
    np.not_equal(keys[1:], keys[:-1], out=change[1:])
    idx = np.flatnonzero(change)
    counts = np.diff(np.append(idx, len(keys)))
    return keys[idx], counts


def _jaccard_pairs_gemm(
    spark, id_type: str, post: dict, threshold: float, max_shingle_freq: int | None
) -> DataFrame:
    """Postings-GEMM pair counting (see :func:`ngram_jaccard_pairs`).

    The whole corpus lives in the broadcast closure, so the "stream" side
    is just ``spark.range(n_blocks)``: each task slices its doc block's
    row-major incidences out of the broadcast, gathers postings of
    partners with a LARGER doc position (upper triangle — every unordered
    pair counted exactly once, and position order is id order so
    ``id_a < id_b`` holds by construction), and sort-counts
    (block_row, partner) co-incidences per ~256-row sub-block (cache
    resident). Hub columns (df > cap) are excluded from the gather —
    candidacy needs one shared NON-hub shingle, matching the join path —
    and their exact per-pair overlap is added back from per-doc hub sets
    before the threshold test.
    """
    import numpy as np

    sc = spark.sparkContext
    n_docs = post["n_docs"]

    hubbed = max_shingle_freq is not None and bool(
        (post["col_df"] > max_shingle_freq).any()
    )
    payload = {
        k: post[k]
        for k in ("ids", "sizes", "row_ptr", "inc_codes", "inc_pos",
                  "post_docs", "post_ptr", "n_docs")
    }
    if hubbed:
        cap = int(max_shingle_freq)
        hub_col = post["col_df"] > cap
        nonhub_inc = ~hub_col[post["inc_codes"]]
        # postings restricted to non-hub columns, plus re-derived own-
        # position indices (hub incidences get -1 → zero-length slices)
        porder = np.argsort(post["inc_codes"][nonhub_inc], kind="stable")
        doc_of_inc = np.repeat(
            np.arange(n_docs, dtype=np.int64), post["sizes"].astype(np.int64)
        )
        nh_docs = doc_of_inc[nonhub_inc][porder].astype(np.int32)
        nh_pos = np.full(len(post["inc_codes"]), -1, dtype=np.int32)
        nh_pos[np.flatnonzero(nonhub_inc)[porder]] = np.arange(
            len(nh_docs), dtype=np.int32
        )
        nh_df = np.where(hub_col, 0, post["col_df"]).astype(np.int64)
        nh_ptr = np.zeros(len(post["col_df"]) + 1, dtype=np.int64)
        np.cumsum(nh_df, out=nh_ptr[1:])
        # per-doc hub column sets (sorted codes) for the exact add-back
        h_docs = doc_of_inc[~nonhub_inc]
        h_cols = post["inc_codes"][~nonhub_inc]
        horder = np.argsort(h_docs, kind="stable")
        hub_vals = h_cols[horder]
        hub_cnt = np.bincount(h_docs, minlength=n_docs)
        hub_ptr = np.zeros(n_docs + 1, dtype=np.int64)
        np.cumsum(hub_cnt, out=hub_ptr[1:])
        for d in np.flatnonzero(np.diff(hub_ptr) > 1):
            hub_vals[hub_ptr[d] : hub_ptr[d + 1]].sort()
        payload.update(post_docs=nh_docs, post_ptr=nh_ptr, inc_pos=nh_pos,
                       hub_ptr=hub_ptr, hub_vals=hub_vals)
    else:
        payload.update(hub_ptr=None, hub_vals=None)

    bc = sc.broadcast(payload)
    thr = float(threshold)
    SUB = 256
    n_blocks = min(max(sc.defaultParallelism * 4, 1), max(n_docs // 16, 1))
    bounds = np.linspace(0, n_docs, n_blocks + 1).astype(np.int64)

    def mapper(batches):
        v = bc.value
        row_ptr, inc_codes, inc_pos = v["row_ptr"], v["inc_codes"], v["inc_pos"]
        pptr, pdocs = v["post_ptr"], v["post_docs"]
        ids_s, sizes_s, nd = v["ids"], v["sizes"], v["n_docs"]
        hub_ptr, hub_vals = v["hub_ptr"], v["hub_vals"]
        key32 = SUB * nd < 2**31 - 1
        for pdf in batches:
            outs = []
            for blk in pdf["id"].to_numpy():
                lo, hi = int(bounds[blk]), int(bounds[blk + 1])
                for s0 in range(lo, hi, SUB):
                    s1 = min(s0 + SUB, hi)
                    a, b = row_ptr[s0], row_ptr[s1]
                    k = inc_codes[a:b].astype(np.int64)
                    own = inc_pos[a:b].astype(np.int64)
                    brow = np.repeat(
                        np.arange(s1 - s0, dtype=np.int64),
                        sizes_s[s0:s1].astype(np.int64),
                    )
                    start = own + 1
                    lens = np.where(own >= 0, pptr[k + 1] - start, 0)
                    tot = int(lens.sum())
                    if tot == 0:
                        continue
                    out_rows = np.repeat(brow, lens)
                    csum = np.cumsum(lens)
                    within = np.arange(tot, dtype=np.int64) - np.repeat(
                        csum - lens, lens
                    )
                    flat = np.repeat(start, lens) + within
                    out_docs = pdocs[flat].astype(np.int64)
                    pk = out_rows * nd + out_docs
                    uk, c = _count_sorted(pk.astype(np.int32) if key32 else pk)
                    r = (uk // nd).astype(np.int64) + s0
                    d = (uk % nd).astype(np.int64)
                    na = sizes_s[r].astype(np.int64)
                    nb = sizes_s[d].astype(np.int64)
                    c = c.astype(np.int64)
                    if hub_ptr is not None:
                        ha = hub_ptr[r + 1] - hub_ptr[r]
                        hb = hub_ptr[d + 1] - hub_ptr[d]
                        m = np.minimum(ha, hb)
                        jmax = (c + m).astype(np.float64) / (
                            na + nb - c - m
                        ).astype(np.float64)
                        for i in np.flatnonzero((jmax >= thr) & (m > 0)):
                            pa, pb = r[i], d[i]
                            c[i] += np.intersect1d(
                                hub_vals[hub_ptr[pa] : hub_ptr[pa + 1]],
                                hub_vals[hub_ptr[pb] : hub_ptr[pb + 1]],
                                assume_unique=True,
                            ).size
                    j = c.astype(np.float64) / (na + nb - c).astype(np.float64)
                    keep = j >= thr
                    outs.append(
                        pd.DataFrame(
                            {
                                "id_a": ids_s[r[keep]],
                                "id_b": ids_s[d[keep]],
                                "_c": c[keep],
                                "_na": na[keep].astype(np.int32),
                                "_nb": nb[keep].astype(np.int32),
                            }
                        )
                    )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame(
                    {"id_a": pd.Series(dtype="int64"),
                     "id_b": pd.Series(dtype="int64"),
                     "_c": pd.Series(dtype="int64"),
                     "_na": pd.Series(dtype="int32"),
                     "_nb": pd.Series(dtype="int32")}
                )
            )

    blocks = spark.range(0, n_blocks, 1, numPartitions=n_blocks)
    out = blocks.mapInPandas(mapper, "id_a long, id_b long, _c long, _na int, _nb int")
    jacc = F.col("_c").cast("double") / (
        F.col("_na") + F.col("_nb") - F.col("_c")
    ).cast("double")
    return out.select(
        F.col("id_a").cast(id_type).alias("id_a"),
        F.col("id_b").cast(id_type).alias("id_b"),
        jacc.alias("jacc"),
    ).where(F.col("jacc") >= threshold)



def cross_contamination(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 8,
    broadcast_max_shingles: int | None = 5_000_000,
) -> DataFrame:
    """Benchmark-decontamination pass: flag training docs sharing at least
    ``min_shared`` distinct word-n-gram shingles with ANY eval doc.

    The standard pre-training hygiene step (the cross-table twin of
    :func:`ngram_jaccard_pairs`): both sides shingle once, candidates come
    from an equi-join on the shingle — at production scale the eval side
    is tiny relative to the corpus, so its exploded shingle set broadcasts
    and the train side streams through map-side, no shuffle of the corpus.
    Output: (train_id, eval_id, shared_shingles) per contaminated pair,
    one row per (train, eval) hit — callers `.select("train_id").distinct()`
    for the drop list.

    The "eval side is tiny" assumption is CHECKED, not assumed (ADVICE
    r4): the eval side's postings are built only under
    ``broadcast_max_shingles`` exploded rows (~12 bytes each); above it —
    a huge eval suite or very long eval docs — the plan falls back to a
    shuffle join and lets AQE pick the strategy instead of blowing the
    driver heap on a forced broadcast.
    ``broadcast_max_shingles=None`` skips the count and never broadcasts.

    r6 plan change: the eligible path is now the postings-GEMM twin of
    :func:`ngram_jaccard_pairs` — eval postings broadcast, train side
    streamed through a numpy gather-count ``mapInPandas`` that matches
    shingle STRINGS against the eval vocabulary (string-exact, no
    hashing); NOTHING is shuffled (the previous plan shuffled the
    ~|train shingles ∩ eval vocabulary| join product into a pair groupBy:
    12.8M rows / 22.4 s at sf1.0 → ~5 s).
    """
    if broadcast_max_shingles is not None:
        post = _try_text_postings(
            evalset, id_col, text_col, n, broadcast_max_shingles
        )
        if post is not None:
            return _cross_overlap_gemm(
                train, id_col, text_col, n, post, min_shared
            )
    tsh = shingle_docs(train, id_col, text_col, n)
    esh = shingle_docs(evalset, id_col, text_col, n)
    ts = tsh.select(F.col("_id").alias("train_id"), F.explode("_sh").alias("_g"))
    es = esh.select(F.col("_id").alias("eval_id"), F.explode("_sh").alias("_g"))
    if broadcast_max_shingles is not None and es.count() <= broadcast_max_shingles:
        es = F.broadcast(es)
    # _sh is distinct per doc, so the join-count equals |shingles(train) ∩
    # shingles(eval)| exactly — same arithmetic-overlap trick as Jaccard
    return (
        ts.join(es, "_g")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("shared_shingles"))
        .where(F.col("shared_shingles") >= min_shared)
    )


def _cross_overlap_gemm(
    train: DataFrame, id_col: str, text_col: str, n: int, post: dict, min_shared: int
) -> DataFrame:
    """Stream the train side's RAW TEXT against the broadcast EVAL
    postings (see :func:`cross_contamination`): each batch shingles its
    texts in-process (functions.text.shingle_list — identical semantics
    to the Arrow UDF), resolves each shingle STRING to an eval column
    code (``pd.Index.get_indexer``; absent → -1, dropped), gathers the
    column's posting list, sort-counts (train_row, eval_doc)
    co-incidences, and emits pairs with >= ``min_shared`` overlaps. One
    Python stage over the corpus, nothing shuffled; string matching is
    exact by construction. No triangle slice (the sides are distinct) and
    no hub handling (contamination counts every shared shingle,
    boilerplate included — same as the join plan)."""
    import numpy as np

    sc = train.sparkSession.sparkContext
    train_id_type = train.schema[id_col].dataType.simpleString()
    bc = sc.broadcast(
        {k: post[k] for k in ("ids", "vocab", "post_ptr", "post_docs", "n_docs")}
    )
    min_c = int(min_shared)
    ngram = int(n)
    SUB = 256

    def mapper(batches):
        v = bc.value
        vocab_index = pd.Index(v["vocab"])
        pptr, pdocs = v["post_ptr"], v["post_docs"]
        eids, n_docs = v["ids"], v["n_docs"]
        key32 = SUB * n_docs < 2**31 - 1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            bids_all = pdf["_id"].to_numpy()
            outs = []
            for s0 in range(0, len(pdf), SUB):
                texts = pdf["_t"].iloc[s0 : s0 + SUB]
                bl = [TX.shingle_list(t, ngram) for t in texts]
                bn = np.array([len(x) for x in bl], dtype=np.int64)
                flat: list[str] = []
                for x in bl:
                    flat.extend(x)
                brow = np.repeat(np.arange(len(bl), dtype=np.int64), bn)
                k = vocab_index.get_indexer(np.asarray(flat, dtype=object))
                ok = k >= 0  # train shingles absent from eval drop here
                brow, k = brow[ok], k[ok]
                start = pptr[k]
                lens = pptr[k + 1] - start
                tot = int(lens.sum())
                if tot == 0:
                    continue
                out_rows = np.repeat(brow, lens)
                csum = np.cumsum(lens)
                within = np.arange(tot, dtype=np.int64) - np.repeat(csum - lens, lens)
                flat_idx = np.repeat(start, lens) + within
                out_docs = pdocs[flat_idx].astype(np.int64)
                pk = out_rows * n_docs + out_docs
                uk, c = _count_sorted(pk.astype(np.int32) if key32 else pk)
                keep = c >= min_c
                uk, c = uk[keep].astype(np.int64), c[keep]
                outs.append(
                    pd.DataFrame(
                        {
                            "train_id": bids_all[s0 : s0 + SUB][uk // n_docs],
                            "eval_id": eids[uk % n_docs],
                            "shared_shingles": c.astype(np.int64),
                        }
                    )
                )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame(
                    {"train_id": pd.Series(dtype="int64"),
                     "eval_id": pd.Series(dtype="int64"),
                     "shared_shingles": pd.Series(dtype="int64")}
                )
            )

    stream = _spread(
        train.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    )
    out = stream.mapInPandas(mapper, "train_id long, eval_id long, shared_shingles long")
    return out.select(
        F.col("train_id").cast(train_id_type).alias("train_id"),
        F.col("eval_id").cast(train_id_type).alias("eval_id"),
        F.col("shared_shingles"),
    )


# -- embedding-cosine near-dup -------------------------------------------------


def embedding_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_tables: int = 8,
    planes_per_table: int = 6,
    dim: int = 64,
    exact: bool = False,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, cos_sim) pairs with cosine >= threshold.

    Scale path (default): multi-table hyperplane-LSH candidates → exact
    cosine verify — at threshold 0.9 (angle <= 26°) a 6-plane table
    collides with p ~ (1-26/180)^6 ≈ 0.38, OR-amplified over 8 tables to
    ~0.98 recall. ``exact=True`` switches to the O(n²) broadcast cross
    join (used by the sf0.01 oracle gate where n=500).

    ``buckets``: optional pre-computed (persisted) ``_multi_table_buckets``
    frame over the same corpus/params — shares the signature GEMM across
    operators AND across this function's own self-join sides (an
    unpersisted frame would re-run the GEMM once per side).
    """
    from . import similarity

    e = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if exact:
        # calibration baseline: the corpus is bounded by contract, so it is
        # collected once and closure-broadcast into a numpy-GEMM
        # mapInPandas — each Arrow batch computes its block row of the
        # similarity matrix (BLAS) and emits only pairs above threshold.
        # Measured ~15x over the HOF-fold cross join at 2000x64.
        import numpy as np

        rows = e.collect()
        ids = np.array([r["_id"] for r in rows], dtype=np.int64)
        M = np.array([list(r["_v"]) for r in rows], dtype=np.float64)
        mn = np.linalg.norm(M, axis=1)
        thr = float(threshold)

        MT = np.ascontiguousarray(M.T)
        mn_safe = np.where(mn == 0, np.inf, mn)

        def mapper(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                C = np.array(list(pdf["_v"]), dtype=np.float64)
                cids = pdf["_id"].to_numpy()
                cn = np.linalg.norm(C, axis=1)
                cn_safe = np.where(cn == 0, np.inf, cn)
                # corpus-axis chunking: a full C @ M.T block was ~100 MB of
                # float64 per task (x32 concurrent tasks = GBs of transient
                # allocations — measured as in-bench drag); 2048-column
                # chunks stay cache-resident (r6). zero-norm guard: inf
                # divisor → cos 0, which cleanly fails the threshold
                # instead of producing NaN (NaN >= t is False in numpy but
                # poisons any later ordering).
                CHUNK = 2048
                outs = []
                for c0 in range(0, MT.shape[1], CHUNK):
                    S = (C @ MT[:, c0 : c0 + CHUNK]) / np.outer(
                        cn_safe, mn_safe[c0 : c0 + CHUNK]
                    )
                    mask = (S >= thr) & (cids[:, None] < ids[None, c0 : c0 + CHUNK])
                    ai, bj = np.nonzero(mask)
                    outs.append(
                        pd.DataFrame(
                            {
                                "id_a": cids[ai],
                                "id_b": ids[c0 + bj],
                                "cos_sim": S[ai, bj],
                            }
                        )
                    )
                yield (
                    pd.concat(outs)
                    if outs
                    else pd.DataFrame(
                        {"id_a": pd.Series(dtype="int64"),
                         "id_b": pd.Series(dtype="int64"),
                         "cos_sim": pd.Series(dtype="float64")}
                    )
                )

        # _spread: the sf1.0 embeddings table scans as 2 splits — without
        # it the block-GEMM runs on 2 of 32 cores (t10: 31.9 s → 3.4 s)
        return _spread(e).mapInPandas(mapper, "id_a long, id_b long, cos_sim double")
    # candidate generation carries ONLY ids through the bucket join and
    # the dedup shuffle (the vectors would multiply shuffle bytes by
    # ~50x); vectors re-attach at the verify stage.
    if buckets is None:
        buckets = similarity._multi_table_buckets(e, "_id", "_v", num_tables, planes_per_table, dim)
    ids = buckets.select("_id", "_tbl", "_bucket")
    pairs = (
        ids.join(
            ids.select(F.col("_id").alias("id_b"), "_tbl", "_bucket"), ["_tbl", "_bucket"]
        )
        .where(F.col("_id") < F.col("id_b"))
        .select(F.col("_id").alias("id_a"), "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Verify strategy is size-aware. When the vector table is bounded
    # (fits a closure broadcast, same contract as the exact path), the
    # candidates are scored by a gathered row-wise einsum — no vector
    # shuffle, no per-pair JVM fold (the fold was ~80% of emb_lsh's wall
    # at weak thresholds where candidates are dense: 16.4 s → 3.9 s at
    # 2000×64/0.35). Past the bound, vectors + staged norms re-attach via
    # two narrow equi-joins and the JVM fold scores each pair — the
    # unbounded-scale path (an attached-pairs pandas verify was tried and
    # is 2-6x SLOWER there; see cosine()'s measured note). The bound check
    # is one take() that doubles as the closure collect.
    closure = similarity._try_vec_closure(e, "_id", "_v", 20_000_000 // max(dim, 1))
    if closure is not None:
        scored = similarity._gather_score(pairs, closure, closure, "id_a", "id_b")
    else:
        from .similarity import dot, norm

        vecs = e.select("_id", F.col("_v").alias("_vec"), norm(F.col("_v")).alias("_nrm"))
        cand = pairs.join(
            vecs.select(
                F.col("_id").alias("id_a"), F.col("_vec").alias("va"), F.col("_nrm").alias("na")
            ),
            "id_a",
        ).join(
            vecs.select(
                F.col("_id").alias("id_b"), F.col("_vec").alias("vb"), F.col("_nrm").alias("nb")
            ),
            "id_b",
        )
        # norms staged per vector, not recomputed per candidate pair;
        # nullif → zero-norm cosine is NULL and fails the threshold filter
        scored = cand.select(
            "id_a",
            "id_b",
            (
                dot(F.col("va"), F.col("vb"))
                / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0))
            ).alias("cos_sim"),
        )
    return scored.where(F.col("cos_sim") >= threshold)


# -- winnowing fingerprints ---------------------------------------------------


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken):
    hash all k-gram shingles, keep the minimum hash of every sliding window
    of `window` consecutive shingles, emit the distinct selected hashes.

    Guarantee: any shared substring of >= k+window-1 words produces at
    least one shared fingerprint — the standard plagiarism/near-dup sketch.
    Output: (id, fingerprint long) exploded rows, ready for a groupBy join.
    Pure higher-order functions; hashes staged behind an exchange.

    Windows slide over the POSITIONAL k-gram stream (repeats kept) — a
    distinct-ified shingle array would change window composition for texts
    with recurring k-grams and void the guarantee; only the final selected
    fingerprints are deduped.
    """
    sh = docs.select(
        F.col(id_col).alias("_id"),
        TX.word_shingles_positional(F.col(text_col), k).alias("_sh"),
    ).where(F.size("_sh") >= 1)
    hashed = sh.select(
        "_id", F.transform("_sh", lambda s: F.xxhash64(s)).alias("_h")
    ).repartition(F.col("_id"))
    n = F.size("_h")
    starts = F.when(n >= window, F.sequence(F.lit(1), n - window + 1)).otherwise(
        F.sequence(F.lit(1), F.lit(1))
    )
    mins = F.transform(
        starts, lambda i: F.array_min(F.slice(F.col("_h"), i, window))
    )
    return (
        hashed.select("_id", F.explode(F.array_distinct(mins)).alias("fingerprint"))
        .withColumnRenamed("_id", id_col)
    )


def winnow_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 3,
) -> DataFrame:
    """Near-dup pairs sharing >= min_shared winnowing fingerprints —
    one explode + one shuffle groupBy, no quadratic pass."""
    fp = winnow_fingerprints(docs, id_col, text_col, k, window)
    pairs = (
        fp.alias("a")
        .join(
            fp.alias("b"),
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("shared_fingerprints"))
        .where(F.col("shared_fingerprints") >= min_shared)
    )
    return pairs


# -- MinHash + LSH -----------------------------------------------------------


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
    sh: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    Same output contract as :func:`ngram_jaccard_pairs` but candidate
    generation is O(docs x bands) — the 100 TB path. With 32 perms / 8
    bands (r=4), P(candidate) = 1-(1-j^4)^8: ~0.97 at j=0.7, ~0.22 at
    j=0.3 — recall at the threshold comes from the verify step pruning
    false positives, not from banding alone.
    """
    if sh is None:
        # feeds signature generation + both verify joins
        sh = shingle_docs(docs, id_col, text_col, n).persist()
    cand = lsh.lsh_candidate_pairs(sh, "_id", "_sh", num_perm, num_bands)
    verified = (
        cand.join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        .select("id_a", "id_b", lsh.jaccard(F.col("sh_a"), F.col("sh_b")).alias("jacc"))
        .where(F.col("jacc") >= threshold)
    )
    return verified


# -- SimHash -----------------------------------------------------------------


def simhash(text_col: Column, bits: int = 64) -> Column:
    """64-bit SimHash over word tokens: bit k of the signature is the sign
    of sum over tokens of (+1/-1 by bit k of xxhash64(token)).

    Pure higher-order-function implementation (no UDF). NOTE: composing
    this inline duplicates the tokenization into all 64 bit-votes — the
    hot path (:func:`simhash_dup_pairs`) stages token hashes behind an
    exchange and calls :func:`simhash_from_hashes`.
    """
    toks = TX.tokens(text_col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return simhash_from_hashes(hashes, bits)


def simhash_from_hashes(hashes: Column, bits: int = 64) -> Column:
    """SimHash from a pre-computed array<long> of token hashes."""
    # Per bit k (python-level loop — shift amounts must be literals): the
    # vote is (#tokens with bit set) - (#tokens with bit clear).
    # bit-test via mask (shift functions reject lambda variables); a closure
    # factory keeps the lambda binary — PySpark derives HOF arity from the
    # Python signature, so a `m=mask` default would break it.
    def vote_fn(m: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(m).cast("long")) != 0, 1
        ).otherwise(-1)

    sig = F.lit(0).cast("long")
    for k in range(bits):
        # bit 63 is the sign bit of a signed long → two's-complement literal
        mask = -(1 << 63) if k == 63 else (1 << k)
        vote = F.aggregate(hashes, F.lit(0).cast("long"), vote_fn(mask))
        sig = sig + F.when(vote > 0, F.lit(mask).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(_id, _sig) SimHash-64 signatures.

    Token hashes stay JVM-side (xxhash64 — the hash family is part of the
    signature spec); the 64 bit-votes run as an Arrow-batched numpy UDF:
    the Column form is 64 interpreted F.aggregate folds over the token
    array (the same interpreted-fold cost family as the shingle/banding
    fixes), while the numpy bit-matrix computes identical signatures in
    one vectorized pass — parity asserted in tests/test_text_ops.py.
    """
    hashed = _spread(docs.select(F.col(id_col).alias("_id"), F.col(text_col))).select(
        "_id",
        F.transform(TX.tokens(F.col(text_col)), lambda t: F.xxhash64(t)).alias("_h"),
    )
    return hashed.select("_id", _simhash_arrow_udf()(F.col("_h")).alias("_sig"))


@lru_cache(maxsize=1)
def _simhash_arrow_udf():
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(64, dtype=np.uint64)
    weights = np.uint64(1) << shifts

    @pandas_udf("long")
    def udf(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.uint64)
        for i, arr in enumerate(hashes):
            if arr is None or len(arr) == 0:
                continue
            H = np.asarray(arr, dtype=np.int64).view(np.uint64)
            ones = ((H[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
            # vote_k = (+1 per set bit, -1 per clear bit) = 2*ones - n;
            # signature bit k set iff vote > 0 — identical to the Column
            # spec in simhash_from_hashes
            out[i] = weights[(2 * ones) > len(H)].sum()
        return pd.Series(out.view(np.int64))

    return udf


def simhash_pairs_exact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Brute-force SimHash pairs (O(n²) popcount cross join) — the
    calibration baseline the banded path is measured against. The banding
    is pigeonhole-EXACT, so recall vs this baseline must be 1.0."""
    if sigs is None:
        sigs = simhash_signatures(docs, id_col, text_col)
    a = sigs.select(F.col("_id").alias("id_a"), F.col("_sig").alias("sig_a"))
    b = sigs.select(F.col("_id").alias("id_b"), F.col("_sig").alias("sig_b"))
    pairs = F.broadcast(a).crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def simhash_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Scale path: 4-block banding (Charikar/Manku) — split the 64-bit
    signature into max_hamming+1 16-bit blocks; any pair within distance
    max_hamming agrees exactly on >=1 block (pigeonhole), so candidates
    come from a groupBy on (block_idx, block_value), then popcount
    verifies. No quadratic pass.
    """
    n_blocks = max_hamming + 1
    width = 64 // n_blocks
    if sigs is None:
        sigs = simhash_signatures(docs, id_col, text_col)
    blocks = sigs.select(
        "_id",
        "_sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_sig"), i * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("_blk_idx", "_blk"),
    )
    blocks = blocks.persist()  # self-joined below; avoid recomputing signatures
    cand = (
        blocks.alias("a")
        .join(
            blocks.alias("b"),
            (F.col("a._blk_idx") == F.col("b._blk_idx"))
            & (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sig").alias("sig_a"),
            F.col("b._sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
