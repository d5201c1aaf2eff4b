"""Distributed Bloom-filter membership, entirely in JVM-side
DataFrame ops — the approximate-membership primitive a 100 TB
curation pipeline needs wherever the reference set outgrows an exact
broadcast (billion-URL blocklists, seen-before registries,
cross-corpus leakage checks).

Design (no Python in any hot path, no driver-side bitmap):

- **Build**: each element hashes to ``k`` bit positions
  (``xxhash64(value, seed_i) mod m``); positions map to (word_idx,
  bit-mask) pairs and a single map-side-combinable
  ``groupBy(word_idx).agg(bit_or(mask))`` produces the filter as a
  DataFrame of NON-ZERO 64-bit words — the bitmap's sparse
  representation. One shuffle over at most ``m/64`` uniformly-hashed
  keys; the filter itself never touches the driver and can be
  persisted as parquet like any other table (an incremental-state
  twin of ``dedup.minhash_index``).
- **Probe**: ``k`` *broadcast* left joins of the word table against
  the probe column's k word indices — every join is narrow, Catalyst
  reuses ONE BroadcastExchange for all k probes (plan-asserted in
  tests), and the verdict is a pure-codegen AND of bit tests. No
  explode, no per-row aggregation, no shuffle of the probed side.

Sizing: the classic formulas (m = -n ln p / (ln 2)^2, k = m/n ln 2).
At p = 1 %, ~9.6 bits/element: a 10^9-element blocklist costs a
~1.2 GB word table (vs 8+ GB for its exact 8-byte-hash set), and a
10^6-gram eval suite ~1.2 MB. The word table broadcast carries 16
bytes per non-zero word; above a few GB pass ``broadcast_filter=
False`` to fall back to k shuffle joins (or shard the filter).

False-positive rate is the standard (1 - e^{-kn/m})^k; false
negatives are impossible, which is what makes the two-phase
``decontaminate_bloom`` (bloom prefilter -> exact verify on the
surviving grams) EXACTLY equal to the exact join path — same rows,
same numbers, same oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_parameters",
    "bloom_build",
    "bloom_probe",
    "bloom_probe_packed",
    "bloom_words_local",
    "decontaminate_bloom",
    "stamp_bloom_filter",
    "PACKED_FILTER_MAX_BITS",
]


def _bloom_meta(m_bits: int, k: int) -> dict:
    """Schema metadata stamped on a filter's ``word_idx`` column: the
    bit-table size, salt count, and hash family the words were built
    with. A stored filter probed with a different ``m_bits``/``k``
    computes different bit positions, and since absent words read as
    zeros the verdict degrades to FALSE NEGATIVES — for a
    decontamination or blocklist gate that is silently admitted
    contamination, the same failure class the MinHash/gram/embedding
    index guards close. Survives parquet (Spark keeps field metadata
    in the footer schema)."""
    return {"family": "xxhash64_salted_v1", "m_bits": m_bits, "k": k}


def stamp_bloom_filter(df: "DataFrame", m_bits: int, k: int) -> "DataFrame":
    """Attach filter metadata to an externally materialized word
    table (e.g. re-created from collected rows). The caller asserts
    the parameters — word values cannot be distinguished."""
    return df.select(
        F.col("word_idx").alias(
            "word_idx", metadata=_bloom_meta(m_bits, k)
        ),
        "word",
    )


def _check_bloom_meta(df: "DataFrame", m_bits: int, k: int) -> None:
    for col in ("word_idx", "word"):
        if col not in df.columns:
            raise ValueError(
                f"bloom filter frame is missing column '{col}' "
                f"(columns: {df.columns})"
            )
    want = _bloom_meta(m_bits, k)
    meta = dict(df.schema["word_idx"].metadata or {})
    got = {key: meta.get(key) for key in want}
    if got["family"] is None:
        raise ValueError(
            "bloom filter frame carries no metadata on word_idx — it "
            "was built outside bloom_build() (or its schema was "
            "rebuilt). Rebuild it, or assert its provenance with "
            "stamp_bloom_filter(df, m_bits, k); probing with "
            "mismatched parameters reads as false negatives "
            "(silently admitted members)."
        )
    if got != want:
        raise ValueError(
            f"bloom filter was built with {got} but this probe asks "
            f"for {want} — mismatched positions read as false "
            "negatives. Pass the values the filter was built with."
        )


def bloom_parameters(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for a target false-positive rate; m is rounded up
    to a multiple of 64 and k clamped to [1, 16]."""
    if n_items < 1:
        raise ValueError(f"n_items must be >= 1, got {n_items}")
    if not (0.0 < fpr < 1.0):
        raise ValueError(f"fpr must be in (0, 1), got {fpr}")
    m = max(64, -n_items * math.log(fpr) / (math.log(2) ** 2))
    m_bits = int(-(-m // 64)) * 64
    k = max(1, min(16, round(m_bits / n_items * math.log(2))))
    return m_bits, int(k)


def _positions(col, m_bits: int, k: int):
    """The k bit positions of a value: xxhash64 with k distinct salt
    columns, pmod'd into the table. xxhash64 is JVM-side and
    engine-stable across Spark versions."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Build the filter over ``df[col]`` (any orderable type; hashed
    by value). Returns the sparse word table ``(word_idx: long,
    word: long)`` holding only non-zero words."""
    if m_bits % 64 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not (1 <= k <= 64):
        raise ValueError(f"k must be in [1, 64], got {k}")
    pos = F.explode(F.array(*_positions(F.col(col), m_bits, k))).alias("__pos")
    return (
        df.select(pos)
        .select(
            F.shiftright(F.col("__pos"), 6).alias(
                "word_idx", metadata=_bloom_meta(m_bits, k)
            ),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos, 64) AS INT))"
            ).alias("__m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int,
    out_col: str = "bloom_maybe",
    broadcast_filter: bool = True,
) -> DataFrame:
    """Add ``out_col`` (boolean): false ⇒ definitely NOT in the built
    set; true ⇒ maybe (verify exactly if the use needs certainty).

    k narrow broadcast joins against ONE shared broadcast of the word
    table (Catalyst's ReuseExchange collapses the k copies); a word
    index absent from the sparse table is an all-zero word, handled
    by the coalesce. The probed side never shuffles and never
    explodes — row count is preserved, so this composes with
    streaming sources too.

    The word table must carry the metadata :func:`bloom_build` stamps
    (parquet round-trips it) and it must match this probe's
    ``m_bits``/``k`` — a mismatch reads as false negatives, the worst
    failure a membership gate has; externally materialized frames go
    through :func:`stamp_bloom_filter` first.
    """
    if m_bits % 64 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    _check_bloom_meta(bloom, m_bits, k)
    out = df
    verdict = F.lit(True)
    for i, pos in enumerate(_positions(F.col(col), m_bits, k)):
        w = f"__bf_w{i}"
        b = f"__bf_b{i}"
        side = bloom.select(
            F.col("word_idx").alias(w), F.col("word").alias(f"__bf_word{i}")
        )
        if broadcast_filter:
            side = F.broadcast(side)
        out = (
            out.withColumn(w, F.shiftright(pos, 6))
            .withColumn(b, F.pmod(pos, 64).cast("int"))
            .join(side, w, "left")
        )
        verdict = verdict & (
            F.expr(
                f"(shiftright(coalesce(__bf_word{i}, CAST(0 AS BIGINT)),"
                f" CAST({b} AS INT)) & 1) = 1"
            )
        )
    out = out.withColumn(out_col, verdict)
    drop = [c for i in range(k) for c in (f"__bf_w{i}", f"__bf_b{i}", f"__bf_word{i}")]
    return out.drop(*drop)


#: Largest filter (in bits) the packed-literal probe will inline into
#: the plan: m_bits/64 longs ride the query plan as ONE array
#: constant, shipped to each executor with the stage broadcast.
#: 2^22 bits = 64 Ki longs = 512 KB — past that the word-table
#: broadcast join amortizes better than re-shipping a large plan
#: constant, and the k-join probe is the right shape anyway.
PACKED_FILTER_MAX_BITS = 1 << 22


def bloom_words_local(bloom: DataFrame, m_bits: int, k: int) -> list[int]:
    """Collect a (parameter-sized) word table to a dense driver-side
    list of ``m_bits/64`` longs — the model-object boundary for
    :func:`bloom_probe_packed`. Validates the frame's provenance
    metadata exactly like :func:`bloom_probe`. The caller asserts the
    filter is parameter-sized (use :data:`PACKED_FILTER_MAX_BITS` as
    the sanity bound); corpus-sized filters stay DataFrames and go
    through the join probe."""
    if m_bits % 64 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if m_bits > PACKED_FILTER_MAX_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds PACKED_FILTER_MAX_BITS="
            f"{PACKED_FILTER_MAX_BITS} — a filter this large should "
            "stay distributed (bloom_probe join path), not ride the "
            "plan as a constant"
        )
    _check_bloom_meta(bloom, m_bits, k)
    words = [0] * (m_bits // 64)
    for r in bloom.collect():
        words[r["word_idx"]] = r["word"]
    return words


def bloom_probe_packed(
    df: DataFrame,
    col: str,
    words: list[int],
    m_bits: int,
    k: int,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Join-free twin of :func:`bloom_probe` for parameter-sized
    filters: the dense word array (from :func:`bloom_words_local`)
    becomes one array literal and the whole verdict is a pure-codegen
    expression — k xxhash64 probes, k element_at word reads, k bit
    tests, ANDed. Bit positions are the identical ``_positions``
    family, so verdicts match the join probe exactly (pytest-pinned).

    Where the join probe pays k broadcast hash lookups plus k join
    projections per probed row, this pays k array indexings — the
    right trade whenever the filter fits comfortably in the plan
    (eval-suite decontamination gates, config blocklists). At
    blocklist scale (GBs of words) use :func:`bloom_probe`."""
    if m_bits % 64 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not (1 <= k <= 64):
        raise ValueError(f"k must be in [1, 64], got {k}")
    if len(words) != m_bits // 64:
        raise ValueError(
            f"dense word table must hold m_bits/64={m_bits // 64} words, "
            f"got {len(words)} — build it with bloom_words_local()"
        )
    # The dense array rides a ONE-ROW broadcast frame (the
    # dangling-mass crossJoin pattern), NOT a literal: an inline
    # array(...) tree of m/64 literal nodes gets embedded once per
    # probe and the analyzer/optimizer then walk k copies of it —
    # measured ~7 s of pure driver time per query at 19k words —
    # while a column reference is one node. At runtime every row sees
    # the same broadcast ArrayData, so each probe is still an O(1)
    # indexed read.
    spark = df.sparkSession
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    # collision-free temp name: a probed frame already carrying a
    # '__bf_words' column would make the crossJoin ambiguous and the
    # final drop would remove both (the embedding_index pattern)
    tmp = "__bf_words"
    while tmp in df.columns:
        tmp += "_"
    wdf = spark.createDataFrame(
        [([int(w) for w in words],)],
        StructType([StructField(tmp, ArrayType(LongType()), False)]),
    )
    out = df.crossJoin(F.broadcast(wdf))
    arr = F.col(tmp)
    verdict = F.lit(True)
    for pos in _positions(F.col(col), m_bits, k):
        # F.shiftright only takes a literal shift; the SQL function
        # accepts a column — call it through the function registry
        word = F.element_at(arr, (F.call_function("shiftright", pos, F.lit(6)) + 1).cast("int"))
        bit = F.pmod(pos, 64).cast("int")
        verdict = verdict & (
            F.call_function("shiftright", word, bit).bitwiseAND(F.lit(1)) == 1
        )
    return out.withColumn(out_col, verdict).drop(tmp)


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
    threshold: int = 1,
    fpr: float = 0.01,
    n_bench_grams: int | None = None,
    broadcast_filter: bool = True,
    text_is_extracted: bool = False,
    filter_mode: str = "auto",
) -> DataFrame:
    """Two-phase decontamination: Bloom prefilter on the corpus gram
    stream, exact verification join on the survivors only.

    Bit-for-bit the same contract and output as
    :func:`decontamination.decontaminate` (Bloom filters have no
    false negatives, and every false positive is struck by the exact
    join) — but at scale it is the better plan twice over: the
    benchmark set crosses the wire as a ~9.6-bits-per-gram word table
    instead of 64, and the per-document count aggregation sees only
    the matching grams (a ~0.1 % trickle for a clean corpus) instead
    of every gram of every document.

    ``n_bench_grams`` sizes the filter without an extra counting job
    (pass the known benchmark gram count); by default one count()
    action sizes it exactly.

    Plan shape (round 10 — the broadcastable case was restructured
    after the paired bench priced its old two-sided form at 2.3x the
    exact path): with ``broadcast_filter=True`` the whole audit is
    ONE pass over the gram stream — shingle tree evaluated once,
    bloom probe + exact verify both ride the stream as broadcast
    joins, and n_ngrams/n_hits come out of a single map-side-
    combinable aggregation (count(*) + conditional sum), exactly the
    exact path's proven shuffle shape. Measured at sf0.1: 5.25 s →
    2.21 s, bit-identical rows. The old form computed the
    CodegenFallback shingle tree TWICE (the gram stream and the
    n_ngrams side of a final doc-list join) — two corpus scans plus
    an extra shuffle join, strictly worse at every scale.
    ``broadcast_filter=False`` (benchmark too big for one broadcast)
    keeps the candidate-trickle form: only bloom survivors (~fpr of
    a clean corpus) enter the exact-verify SHUFFLE join, which is the
    point of the prefilter when the reference set cannot broadcast —
    a single-pass conditional left join there would drag every gram
    of every document through the verify shuffle.
    """
    from .decontamination import _check_ordering_contract, ngram_hashes

    _check_ordering_contract(ngram, text_is_extracted)
    bench = (
        ngram_hashes(benchmark, text_col, id_col, ngram)
        .select(F.col("__g").alias("__bg"))
        .distinct()
    )
    n = n_bench_grams if n_bench_grams is not None else max(bench.count(), 1)
    m_bits, k = bloom_parameters(n, fpr)
    bloom = bloom_build(bench, "__bg", m_bits, k)

    if filter_mode not in ("auto", "join", "packed"):
        raise ValueError(
            f"filter_mode must be 'auto', 'join' or 'packed', got "
            f"{filter_mode!r}"
        )
    # 'packed' inlines the word table into the plan as one array
    # constant and probes with pure codegen (k array reads) instead of
    # k broadcast hash joins of the gram stream — the right shape for
    # eval-suite-sized filters at any corpus scale, where the probe
    # joins' per-gram hash-relation lookups dominate the filter's own
    # size. 'auto' takes it whenever the filter is plan-sized
    # (PACKED_FILTER_MAX_BITS); corpus-sized filters keep the join
    # probe. Verdicts are pin-tested identical.
    if filter_mode == "packed" and not broadcast_filter:
        # the packed probe requires the word table collected to the
        # driver (a broadcast-class filter); silently falling back to
        # the trickle join would ignore the caller's explicit ask
        raise ValueError(
            "filter_mode='packed' requires broadcast_filter=True — the "
            "packed probe inlines the driver-collected word table into "
            "the plan; with broadcast_filter=False use filter_mode="
            "'join' (or 'auto')"
        )
    packed = filter_mode == "packed" or (
        filter_mode == "auto"
        and broadcast_filter
        and m_bits <= PACKED_FILTER_MAX_BITS
    )

    if broadcast_filter:
        grams = ngram_hashes(docs, text_col, id_col, ngram)
        if packed:
            probed = bloom_probe_packed(
                grams, "__g", bloom_words_local(bloom, m_bits, k),
                m_bits, k,
            )
        else:
            probed = bloom_probe(grams, "__g", bloom, m_bits, k)
        exact = F.broadcast(bench)
        joined = probed.join(
            exact,
            F.col("bloom_maybe") & (probed["__g"] == exact["__bg"]),
            "left",
        )
        per_doc = joined.groupBy(id_col).agg(
            F.count("*").alias("n_ngrams"),
            F.sum(
                F.when(F.col("__bg").isNotNull(), 1).otherwise(0)
            ).alias("n_hits"),
        )
        return per_doc.select(
            id_col,
            "n_ngrams",
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits") / F.col("n_ngrams")).alias("overlap"),
            (F.col("n_hits") >= F.lit(threshold)).alias("contaminated"),
        )

    from .dedup import _shingles
    from .decontamination import _gram_hash

    staged = docs.select(
        F.col(id_col),
        F.transform(_shingles(F.col(text_col), ngram), _gram_hash).alias("__grams"),
    ).select(
        id_col,
        F.coalesce(F.size("__grams"), F.lit(0)).cast("long").alias("n_ngrams"),
        F.col("__grams"),
    ).filter(F.col("n_ngrams") > 0)

    grams = staged.select(id_col, F.explode("__grams").alias("__g"))
    candidates = bloom_probe(
        grams, "__g", bloom, m_bits, k, broadcast_filter=False
    ).filter(F.col("bloom_maybe"))

    hits = (
        candidates.join(bench, candidates["__g"] == bench["__bg"], "inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )

    return (
        staged.select(id_col, "n_ngrams")
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)) / F.col("n_ngrams")
            ).alias("overlap"),
            (
                F.coalesce("n_hits", F.lit(0)) >= F.lit(threshold)
            ).alias("contaminated"),
        )
    )
