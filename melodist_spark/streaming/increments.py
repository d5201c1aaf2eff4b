"""Replay-safe ``foreachBatch`` sinks for the incremental dedup
indexes (round 13, VERDICT r12 item 5).

The batch increments (:func:`pipeline.dedup.remove_repeated_spans_against`,
:func:`pipeline.dedup.neardup_against`,
:func:`pipeline.similarity.embedding_neardup_against`) consume durable
parquet state; a streaming loop advancing that state needs more than
the ops themselves, because Structured Streaming re-runs a failed
micro-batch WITH ITS ORIGINAL BATCH ID and a naive read-modify-append
corrupts under that replay:

- **summed gram counts** double-count the replayed delta, push totals
  past ``min_occurrences`` and excise text that was never duplicated;
- **set-valued indexes** (MinHash signatures, embedding buckets) that
  already absorbed the crashed attempt's delta make the replayed batch
  match ITSELF in the index — every survivor reads as a duplicate and
  is silently dropped.

The sinks here make replay a no-op by construction, with three rules:

1. **Snapshot reads by batch id**: state is read as of
   ``delta_batch < bid`` — a batch never sees its own (possibly
   partially committed) delta, so the read-modify-write is
   deterministic under re-execution.
2. **Batch-id-keyed OVERWRITE writes**: every write lands under
   ``.../delta_batch={bid}``; a replay rewrites the same rows instead
   of appending a second copy.
3. **Output BEFORE state**: a crash between the two writes leaves the
   output durable and the state lagging — the safe direction. A
   restart replays the batch and overwrites both with identical
   bytes; until then the state merely under-claims (future batches
   would at worst re-admit a duplicate, which the next pass removes).
   The opposite order leaves state claiming survivors whose output
   never landed anywhere — if the job is abandoned rather than
   restarted, later batches excise text against phantom history:
   permanent data loss, not a transient.

``test_streaming_span_increment_foreach_batch`` pins the raw
discipline inline; ``test_*_increment_sink_crash_between_writes`` pin
these sinks' crash-window convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "EmbeddingIncrementSink",
    "MinhashIncrementSink",
    "ProfileIncrementSink",
    "SpanIncrementSink",
]


# -- filesystem primitives for the compaction lifecycle ----------------
#
# Compaction needs delete + rename on the state log, which DataFrame
# writes alone cannot express. The Hadoop FileSystem API (reached
# through the JVM gateway) works on whatever filesystem backs the
# path — HDFS/S3 on a real cluster, local disk in tests. On Spark
# Connect there is no JVM gateway; fall back to os/shutil for local
# paths and refuse remote schemes loudly rather than pretend.


def _hadoop_fs(spark, path: str):
    """(fs, jvm Path class) for ``path``, or ``None`` when no JVM
    gateway is reachable (Spark Connect)."""
    try:
        jvm = spark._jvm
        jsc = spark._jsc
        if jvm is None or jsc is None:
            return None
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(jsc.hadoopConfiguration())
        return fs, jvm.org.apache.hadoop.fs.Path
    except Exception:
        return None


def _local_path(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    if "://" in path:
        raise NotImplementedError(
            f"no JVM gateway and {path!r} is not a local path — "
            "compaction needs filesystem delete/rename; run it from a "
            "classic (non-Connect) session or on a local state log"
        )
    return path


def _fs_exists(spark, path: str) -> bool:
    h = _hadoop_fs(spark, path)
    if h is not None:
        fs, jpath = h
        return bool(fs.exists(jpath(path)))
    import os

    return os.path.exists(_local_path(path))


def _fs_delete(spark, path: str) -> None:
    h = _hadoop_fs(spark, path)
    if h is not None:
        fs, jpath = h
        fs.delete(jpath(path), True)
        return
    import shutil

    shutil.rmtree(_local_path(path), ignore_errors=True)


def _fs_rename(spark, src: str, dst: str) -> None:
    h = _hadoop_fs(spark, src)
    if h is not None:
        fs, jpath = h
        if not fs.rename(jpath(src), jpath(dst)):
            raise IOError(f"rename {src!r} -> {dst!r} failed")
        return
    import os

    os.rename(_local_path(src), _local_path(dst))


def _fs_list_slots(spark, state_path: str) -> list[int]:
    """The ``delta_batch`` ids present in the log, from a directory
    listing (no data read)."""
    h = _hadoop_fs(spark, state_path)
    names: list[str] = []
    if h is not None:
        fs, jpath = h
        p = jpath(state_path)
        if not fs.exists(p):
            return []
        for st in fs.listStatus(p):
            names.append(st.getPath().getName())
    else:
        import os

        lp = _local_path(state_path)
        if not os.path.isdir(lp):
            return []
        names = list(os.listdir(lp))
    out = []
    for n in names:
        if n.startswith("delta_batch="):
            out.append(int(n.split("=", 1)[1]))
    return sorted(out)


class _BatchIncrementSink:
    """Shared mechanics: the delta-log layout, snapshot reads, and the
    output-then-state write order. Subclasses define the survivor
    computation (``_survivors``), the state delta (``_delta``) and the
    merge-on-read (``_merge``)."""

    def __init__(self, state_path: str, out_path: str):
        self.state_path = state_path.rstrip("/")
        self.out_path = out_path.rstrip("/")
        self._scratch: list[DataFrame] = []

    def _keep(self, df: DataFrame) -> DataFrame:
        """Persist an intermediate that more than one downstream job
        will traverse (the intra-batch CC pass runs eagerly inside
        ``_survivors``, then the output and state writes traverse the
        survivor plan again) and register it for release after the
        batch's writes land — without this the signature/against-pass
        subtrees recompute 2-3x per micro-batch."""
        df.persist()
        self._scratch.append(df)
        return df

    # -- layout ---------------------------------------------------------
    def _state_slot(self, bid: int) -> str:
        return f"{self.state_path}/delta_batch={bid}"

    def _out_slot(self, bid: int) -> str:
        return f"{self.out_path}/delta_batch={bid}"

    # -- public surface ---------------------------------------------------
    def init(self, df: DataFrame) -> None:
        """Bootstrap the state log at ``delta_batch=-1`` from ``df`` —
        pass ``corpus`` to seed with pre-stream history, or
        ``corpus.limit(0)`` for an empty bootstrap (the slot must
        exist so the first batch's parent-directory read discovers one
        consistent partitioned layout)."""
        self._delta(df).write.mode("overwrite").parquet(self._state_slot(-1))

    def state_as_of(self, spark, bid: int | None = None) -> DataFrame:
        """Merge-on-read of the delta log; ``bid`` excludes that batch
        id and everything after it (the snapshot a replayed batch must
        compute against). ``None`` reads the full state."""
        df = spark.read.parquet(self.state_path)
        if bid is not None:
            df = df.filter(F.col("delta_batch") < bid)
        return self._merge(df.drop("delta_batch"))

    def output(self, spark) -> DataFrame:
        """All emitted survivors (carries ``delta_batch`` provenance)."""
        return spark.read.parquet(self.out_path)

    # -- state-log compaction ---------------------------------------------
    #
    # The log grows one parquet slot per micro-batch forever; at 100k
    # batches the merge-on-read in rule 1 lists and reads 100k
    # directories per batch. ``compact`` folds every slot up to a
    # horizon into the base slot (``delta_batch=-1``) through
    # ``_merge`` — so summed gram counts are genuinely re-aggregated
    # (with their ``least(…, max_count)`` saturation, which composes:
    # ``least(least(a,M)+b, M) == least(a+b, M)`` for non-negative
    # deltas) and set-valued indexes are unioned into one slot.

    def _staging(self) -> str:
        # leading dot: invisible to Spark's data-file discovery, so a
        # half-written staging dir can never leak into a state read
        return f"{self.state_path}/.compact_staging"

    def _compact_manifest(self) -> str:
        return f"{self.state_path}/.compact_manifest"

    def compact(self, spark, up_to: int | None = None) -> None:
        """Fold state slots ``delta_batch <= up_to`` into the base
        slot. Call ONLY while the stream is stopped (between
        ``availableNow`` runs) — a concurrently running batch would
        read an under-claiming snapshot mid-swap.

        ``up_to=None`` (default) compacts everything except the
        newest slot: Structured Streaming replays at most the last
        batch after a crash, and that batch's own delta must stay in
        a separate slot so the rule-1 snapshot (``delta_batch < bid``)
        can still exclude it on replay. Pass an explicit ``up_to``
        only for a batch id known committed in the stream checkpoint.

        Crash-safe in the module's rule-3 direction: the merged rows
        land complete in a hidden staging dir and a manifest records
        the horizon BEFORE any slot is deleted; a crash mid-swap
        leaves the log under-claiming (duplicates at worst re-admitted
        until recovery), never double-counting, and the next
        ``compact`` call (any horizon) completes the pending swap
        first. The OUTPUT log is append-only provenance read once
        downstream, not per-batch state — it is deliberately not
        compacted (folding slots would erase the ``delta_batch``
        provenance column).
        """
        import json as _json

        self._compact_recover(spark)
        bids = _fs_list_slots(spark, self.state_path)
        if up_to is None:
            up_to = (max(bids) - 1) if bids else -1
        merge = [b for b in bids if b <= up_to]
        if len(merge) <= 1:
            return
        merged = self._merge(
            spark.read.parquet(self.state_path)
            .filter(F.col("delta_batch") <= up_to)
            .drop("delta_batch")
        )
        staging = self._staging()
        merged.write.mode("overwrite").parquet(staging)
        line = _json.dumps({"up_to": up_to, "slots": merge})
        spark.range(1).select(F.lit(line).alias("value")).coalesce(
            1
        ).write.mode("overwrite").text(self._compact_manifest())
        self._compact_finish(spark, merge)

    def _compact_recover(self, spark) -> None:
        """Complete a compaction that crashed mid-swap: the manifest
        only exists once staging is fully written, so recovery is
        'finish the deletes, land the rename'."""
        import json as _json

        mpath = self._compact_manifest()
        if not _fs_exists(spark, mpath):
            return
        try:
            m = _json.loads(spark.read.text(mpath).collect()[0]["value"])
        except Exception:
            # torn manifest write: staging (if any) was never armed —
            # discard both, the slots are untouched
            _fs_delete(spark, mpath)
            _fs_delete(spark, self._staging())
            return
        if _fs_exists(spark, self._staging()):
            self._compact_finish(spark, m["slots"])
        else:
            # rename already landed; only the manifest cleanup remains
            _fs_delete(spark, mpath)

    def _compact_finish(self, spark, slots: list[int]) -> None:
        for b in slots:
            _fs_delete(spark, self._state_slot(b))
        _fs_rename(spark, self._staging(), self._state_slot(-1))
        _fs_delete(spark, self._compact_manifest())

    def __call__(self, batch_df: DataFrame, bid) -> None:
        """The ``foreachBatch`` body: snapshot-read, compute survivors
        once (persisted — both writes consume them), write output then
        state, both keyed by the batch id."""
        bid = int(bid)
        state = self.state_as_of(batch_df.sparkSession, bid)
        surv = self._survivors(batch_df, state).persist()
        try:
            self._write_output(surv, bid)
            self._write_state(surv, bid)
        finally:
            surv.unpersist()
            for df in self._scratch:
                df.unpersist()
            self._scratch = []

    # -- write order: output first, then state (rule 3 above) -----------
    def _write_output(self, surv: DataFrame, bid: int) -> None:
        surv.write.mode("overwrite").parquet(self._out_slot(bid))

    def _write_state(self, surv: DataFrame, bid: int) -> None:
        self._delta(surv).write.mode("overwrite").parquet(
            self._state_slot(bid)
        )

    # -- subclass hooks ---------------------------------------------------
    def _survivors(self, batch: DataFrame, state: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _delta(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _merge(self, df: DataFrame) -> DataFrame:
        # set-valued indexes need no re-aggregation; summed counts do
        return df


class SpanIncrementSink(_BatchIncrementSink):
    """Incremental cross-document span removal over a document stream:
    each micro-batch is excised against the durable gram-count state
    (:func:`pipeline.dedup.remove_repeated_spans_against`) and the
    SURVIVORS' :func:`pipeline.dedup.gram_index` becomes the batch's
    state delta. Counts are SUMMED on read, which is exactly the index
    replay corrupts — rules 1–3 in the module docstring are load-
    bearing here, not hygiene. ``max_count`` saturates both the deltas
    and the merge at the decision threshold (bounded durable state
    under adversarial re-quoting, the :func:`gram_index` discipline)."""

    def __init__(
        self,
        state_path: str,
        out_path: str,
        span_tokens: int = 50,
        text_col: str = "text",
        id_col: str = "doc_id",
        min_occurrences: int = 2,
        until_clean: bool = True,
        max_rounds: int = 20,
        portable: bool = False,
        max_count: int | None = None,
    ):
        super().__init__(state_path, out_path)
        self.span_tokens = span_tokens
        self.text_col = text_col
        self.id_col = id_col
        self.min_occurrences = min_occurrences
        self.until_clean = until_clean
        self.max_rounds = max_rounds
        self.portable = portable
        self.max_count = max_count

    def _merge(self, df: DataFrame) -> DataFrame:
        c = F.sum("c")
        if self.max_count is not None:
            c = F.least(c, F.lit(self.max_count).cast("long"))
        return df.groupBy("gh").agg(c.alias("c"))

    def _delta(self, df: DataFrame) -> DataFrame:
        from melodist_spark.pipeline.dedup import gram_index

        return gram_index(
            df.select(self.id_col, self.text_col),
            span_tokens=self.span_tokens,
            text_col=self.text_col,
            id_col=self.id_col,
            portable=self.portable,
            max_count=self.max_count,
        )

    def _survivors(self, batch: DataFrame, state: DataFrame) -> DataFrame:
        from melodist_spark.pipeline.dedup import (
            remove_repeated_spans_against,
        )

        return remove_repeated_spans_against(
            batch,
            state,
            span_tokens=self.span_tokens,
            text_col=self.text_col,
            id_col=self.id_col,
            min_occurrences=self.min_occurrences,
            until_clean=self.until_clean,
            max_rounds=self.max_rounds,
            portable=self.portable,
        )


class MinhashIncrementSink(_BatchIncrementSink):
    """Incremental MinHash near-dup over a document stream: each
    micro-batch drops documents whose estimated Jaccard against the
    stored signature index reaches ``threshold``
    (:func:`pipeline.dedup.neardup_against`); the survivors'
    :func:`pipeline.dedup.minhash_index` is the state delta
    (~128 B/doc at the defaults). Run exact dedup
    (:func:`streaming.dedup.streaming_dedup_exact` or
    :func:`pipeline.dedup.dedup_against`) in front — near-dup no
    longer sees signature-less empty docs.

    INTRA-BATCH near-dups (round-13 review finding): the ``against``
    op compares batch-vs-index only, so two near-copies arriving in
    the SAME micro-batch would both survive and both enter the
    durable index forever — a permanent leak the batch pipeline's
    self-join near-dup would have caught. With ``intra_batch=True``
    (default) the survivors also run the standard self-join pass —
    banded LSH candidates, signature-agreement verify at the same
    ``threshold``, connected components, keep the min-id
    representative per cluster — on the batch-sized survivor set
    (the signatures are shared with the against-pass, so the
    expensive shingle→minhash projection still runs once)."""

    def __init__(
        self,
        state_path: str,
        out_path: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        num_hashes: int = 16,
        band_size: int = 4,
        shingle: int | None = None,
        threshold: float = 0.8,
        intra_batch: bool = True,
    ):
        super().__init__(state_path, out_path)
        self.text_col = text_col
        self.id_col = id_col
        self.num_hashes = num_hashes
        self.band_size = band_size
        self.shingle = shingle
        self.threshold = threshold
        self.intra_batch = intra_batch

    def _delta(self, df: DataFrame) -> DataFrame:
        from melodist_spark.pipeline.dedup import minhash_index

        return minhash_index(
            df,
            text_col=self.text_col,
            id_col=self.id_col,
            num_hashes=self.num_hashes,
            shingle=self.shingle,
        )

    def _survivors(self, batch: DataFrame, state: DataFrame) -> DataFrame:
        from melodist_spark.pipeline.dedup import (
            duplicate_clusters,
            lsh_bands,
            lsh_candidate_pairs,
            minhash_signature,
            neardup_against,
        )

        sig = self._keep(
            minhash_signature(
                batch, self.text_col, self.num_hashes, self.shingle
            )
        )
        surv = neardup_against(
            batch,
            state,
            text_col=self.text_col,
            id_col=self.id_col,
            num_hashes=self.num_hashes,
            band_size=self.band_size,
            shingle=self.shingle,
            threshold=self.threshold,
            batch_sig=sig,
        )
        if not self.intra_batch:
            return surv
        surv = self._keep(surv)
        names = [f"sig_{i}" for i in range(self.num_hashes)]
        ssig = sig.select(self.id_col, *names).join(
            surv.select(self.id_col), self.id_col, "left_semi"
        )
        cand = lsh_candidate_pairs(
            lsh_bands(ssig, self.id_col, self.num_hashes, self.band_size),
            self.id_col,
        )
        a = ssig.select(
            F.col(self.id_col).alias("id_a"),
            *[F.col(n).alias(f"__a{i}") for i, n in enumerate(names)],
        )
        b = ssig.select(
            F.col(self.id_col).alias("id_b"),
            *[F.col(n).alias(f"__b{i}") for i, n in enumerate(names)],
        )
        est = sum(
            F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0)
            for i in range(self.num_hashes)
        ) / F.lit(float(self.num_hashes))
        pairs = (
            cand.join(a, "id_a")
            .join(b, "id_b")
            .filter(est >= float(self.threshold))
            .select("id_a", "id_b")
        )
        labels = duplicate_clusters(pairs)
        drop = labels.filter(F.col("cluster_id") != F.col("id")).select(
            F.col("id").alias(self.id_col)
        )
        return surv.join(drop, self.id_col, "left_anti")


class EmbeddingIncrementSink(_BatchIncrementSink):
    """Incremental embedding near-dup over a vector stream: each
    micro-batch drops vectors whose cosine against the stored index
    reaches ``threshold``
    (:func:`pipeline.similarity.embedding_neardup_against`); the
    survivors' :func:`pipeline.similarity.embedding_index` is the
    state delta. The snapshot read (rule 1) is what keeps a replayed
    batch from matching ITSELF in the index and silently dropping
    every survivor.

    INTRA-BATCH near-dups (round-13 review finding): the ``against``
    op compares batch-vs-index only; with ``intra_batch=True``
    (default) the survivors also self-join on their own
    :func:`embedding_index` buckets (each table unioned — the same
    OR-amplified candidate set the against-pass uses), re-check exact
    cosine at ``threshold``, and keep the min-id representative per
    connected component — so two near-copies arriving in one
    micro-batch no longer both enter the durable index forever."""

    def __init__(
        self,
        state_path: str,
        out_path: str,
        dim: int,
        threshold: float = 0.9,
        num_planes: int = 8,
        num_tables: int = 1,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        arrow: bool = False,
        intra_batch: bool = True,
    ):
        super().__init__(state_path, out_path)
        self.dim = dim
        self.threshold = threshold
        self.num_planes = num_planes
        self.num_tables = num_tables
        self.id_col = id_col
        self.vec_col = vec_col
        self.arrow = arrow
        self.intra_batch = intra_batch

    def _delta(self, df: DataFrame) -> DataFrame:
        from melodist_spark.pipeline.similarity import embedding_index

        return embedding_index(
            df,
            self.dim,
            num_planes=self.num_planes,
            num_tables=self.num_tables,
            id_col=self.id_col,
            vec_col=self.vec_col,
        )

    def _survivors(self, batch: DataFrame, state: DataFrame) -> DataFrame:
        from melodist_spark.pipeline.dedup import duplicate_clusters
        from melodist_spark.pipeline.similarity import (
            _bucketed_cosine_pairs,
            embedding_neardup_against,
        )

        surv = embedding_neardup_against(
            batch,
            state,
            self.dim,
            threshold=self.threshold,
            num_planes=self.num_planes,
            num_tables=self.num_tables,
            id_col=self.id_col,
            vec_col=self.vec_col,
            arrow=self.arrow,
        )
        if not self.intra_batch:
            return surv
        surv = self._keep(surv)
        idx = self._keep(self._delta(surv))
        pairs = None
        for t in range(self.num_tables):
            b = idx.select(
                F.col(self.id_col).alias("__id"),
                F.col(self.vec_col).alias("__v"),
                F.col(f"bucket_{t}").alias("__bucket"),
            )
            p = _bucketed_cosine_pairs(
                b, self.threshold, 4096, arrow=self.arrow
            ).select("id_a", "id_b")
            pairs = p if pairs is None else pairs.unionByName(p)
        labels = duplicate_clusters(pairs.distinct())
        drop = labels.filter(F.col("cluster_id") != F.col("id")).select(
            F.col("id").alias(self.id_col)
        )
        return surv.join(drop, self.id_col, "left_anti")


class ProfileIncrementSink(_BatchIncrementSink):
    """Streaming corpus profile over a document stream: each
    micro-batch lands its per-group mergeable sketch state
    (:func:`pipeline.profile.corpus_profile_state` — exact counters +
    HLL/theta/KLL) as BOTH the output slot and the state delta.

    The output log is therefore a per-batch profile TIME SERIES —
    composition drift (a language mix shifting, document lengths
    collapsing, duplication spiking) is visible by estimating each
    ``delta_batch`` slot without touching any document again — while
    ``state_as_of``/``compact`` fold the slots through
    :func:`pipeline.profile.merge_profile_states` into the cumulative
    corpus profile (HLL/theta unions are exact under the fold, so the
    compacted state equals a from-scratch profile of everything
    ingested).

    The replay rules hold degenerately: profiling makes no
    against-state decision, so ``__call__`` skips the rule-1 snapshot
    read entirely (nothing to read), and the batch-id-keyed overwrite
    (rule 2) makes a replayed batch rewrite identical sketch bytes —
    HLL registers and theta hash sets are deterministic functions of
    the batch's content hashes. State is bytes per (group × batch)
    before compaction, bytes per group after.
    """

    def __init__(
        self,
        state_path: str,
        out_path: str,
        group_by: tuple[str, ...] | list[str] = (),
        text_col: str = "text",
        lg_k: int = 12,
        kll_k: int = 200,
    ):
        super().__init__(state_path, out_path)
        self.group_by = list(group_by)
        self.text_col = text_col
        self.lg_k = lg_k
        self.kll_k = kll_k

    def _profile(self, docs: DataFrame) -> DataFrame:
        from melodist_spark.pipeline.profile import corpus_profile_state

        return corpus_profile_state(
            docs,
            group_by=self.group_by,
            text_col=self.text_col,
            lg_k=self.lg_k,
            kll_k=self.kll_k,
        )

    def init(self, df: DataFrame) -> None:
        """Bootstrap from pre-stream history (``docs`` rows, not
        profile rows — the sink profiles them) or ``docs.limit(0)``
        for an empty base slot."""
        self._profile(df).write.mode("overwrite").parquet(
            self._state_slot(-1)
        )

    def _survivors(self, batch: DataFrame, state) -> DataFrame:
        return self._profile(batch)

    def _delta(self, surv: DataFrame) -> DataFrame:
        return surv

    def _merge(self, df: DataFrame) -> DataFrame:
        from melodist_spark.pipeline.profile import merge_profile_states

        return merge_profile_states(
            df, group_by=self.group_by, lg_k=self.lg_k, kll_k=self.kll_k
        )

    def __call__(self, batch_df: DataFrame, bid) -> None:
        # no against-state decision → skip the rule-1 snapshot read;
        # rules 2 and 3 (batch-id-keyed overwrites, output-then-state)
        # unchanged from the base
        bid = int(bid)
        surv = self._survivors(batch_df, None).persist()
        try:
            self._write_output(surv, bid)
            self._write_state(surv, bid)
        finally:
            surv.unpersist()
