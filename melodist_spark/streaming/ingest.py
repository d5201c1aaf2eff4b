"""Composed streaming ingest curation: the batch curation operators
wired into one continuously-running intake pipeline.

A crawl lands as a stream; by the time documents reach storage they
should already be encoding-repaired, cleaned, quality-gated,
decontaminated and first-occurrence deduplicated — running curation
at ingest avoids a second full pass over the corpus later. Every
stage here is the SAME operator the batch pipeline uses, which is the
point: the stateless stages (fix_text repair, cleaning, quality
rules, Arrow-kernel decontamination) are
narrow projections that are streaming-safe by construction, and the
one stateful stage (exact dedup) keys on the same md5 digest as the
batch `exact_duplicates`, so a streaming-then-batch pipeline agrees
with a pure-batch run on document identity.

Scale shape: the only state is the dedup digest store (bounded by the
watermark horizon when ``ts_col`` is given); everything else is
per-batch narrow compute that scales with executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_curate(
    stream: DataFrame,
    bench_grams=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    min_tokens: int = 20,
    max_tokens: int = 1000,
    ngram: int = 5,
    repetition_thresholds: dict[str, float] | None = None,
    text_is_extracted: bool = False,
    extract_html: bool = False,
    surgical: bool = False,
    surgery_pad: int = 0,
) -> DataFrame:
    """[Extract →] clean → quality-gate → [repetition-gate] →
    decontaminate → dedup, on a stream.

    ``extract_html=True`` declares the input column is raw crawl HTML
    and prepends boilerplate-aware main-content extraction
    (:func:`~melodist_spark.pipeline.text.extract_main_content_dom`,
    a stateless Arrow kernel — streaming-safe — with the documented
    ``html_to_text`` fallback for pages where no block qualifies).
    This is the composed-API form of the ordering contract the crawl
    composition smoke proved (SCALE.md round 8): short-gram
    decontamination over chrome-bearing text flags everything, so
    with the extractor in place the stream satisfies
    ``text_is_extracted`` BY CONSTRUCTION and no
    :class:`~melodist_spark.pipeline.decontamination.BoilerplateOrderingWarning`
    fires.

    ``bench_grams`` is the sorted benchmark gram-hash array from
    :func:`melodist_spark.pipeline.decontamination.benchmark_gram_array`
    (None skips the decontamination stage). ``repetition_thresholds``
    enables the Gopher table-A1 repetition gate on the cleaned text —
    the Arrow kernel is a stateless scalar op, so it is
    streaming-safe and sits between the cheap codegen quality gate
    and the decontamination stage. It follows the SAME semantics as
    ``repetition_flags(thresholds=...)`` via the shared
    :func:`~melodist_spark.pipeline.text.resolve_repetition_thresholds`:
    the dict is overrides applied on top of the full published table
    (``{}`` gates at the published defaults; a subset dict overrides
    just those cutoffs while the other rules still apply); ``None``
    disables the gate.

    ``surgical=True`` (round 10, needs ``bench_grams``) completes the
    flag→surgery story for ingest: instead of DROPPING contaminated
    documents, the flagged slice goes through
    :func:`~melodist_spark.pipeline.decontamination.remove_contaminated_spans`
    (stateless Arrow kernel, streaming-safe by construction) —
    benchmark-overlapping spans are excised (± ``surgery_pad``
    tokens) and the document survives with the zero-residual
    guarantee; clean documents pass through untouched. Both slices
    carry ``n_tokens_removed`` / ``n_tokens_kept`` audit columns with
    identical semantics (non-empty kept tokens), and a repaired
    document must still clear ``min_tokens`` on what SURVIVED — a
    page that was mostly benchmark text is dropped even though its
    spans were excised. The cost shape is the intended one: the
    per-token-md5 kernel runs on the contaminated slice only
    (typically <0.1% of a clean corpus); the clean slice pays one
    codegen token count.

    Returns the curated stream: original columns plus ``text_clean``
    and the quality columns (plus the surgery audit columns when
    ``surgical=True``), with dropped documents filtered out.
    """
    from ..pipeline.decontamination import decontaminate_stateless
    from ..pipeline.text import clean_text, quality_flags
    from .dedup import streaming_dedup_exact

    # every gate operates on the REPAIRED, cleaned text: a mojibake'd
    # re-crawl must hash to the same dedup digest as its clean twin
    # (fix_text runs first — it is stateless codegen, so it is
    # streaming-safe like the rest), two re-crawls that differ only
    # in boilerplate (tracking URL, tag churn) must collide too,
    # markup tokens must not pad a document past the quality gate,
    # and benchmark text wrapped in tags must not evade the n-gram
    # match
    from ..pipeline.text import fix_text

    base = F.col(text_col)
    if extract_html:
        from ..pipeline.text import extract_main_content_dom, html_to_text

        base = F.coalesce(
            F.nullif(extract_main_content_dom(base), F.lit("")),
            html_to_text(base),
        )
        text_is_extracted = True
    staged = stream.withColumn("text_clean", clean_text(fix_text(base)))
    gated = quality_flags(
        staged,
        text_col="text_clean",
        min_tokens=min_tokens,
        max_tokens=max_tokens,
    ).filter(F.col("keep"))
    if repetition_thresholds is not None:
        from ..pipeline.text import (
            gopher_repetition_col,
            resolve_repetition_thresholds,
        )

        # SAME resolution rule as batch repetition_flags: the dict is
        # overrides on top of the full table-A1 set, never a
        # restriction to the listed signals ({} = published defaults)
        th = resolve_repetition_thresholds(repetition_thresholds)
        # collision-safe staging column — the contract returns the
        # caller's original columns untouched
        tmp = "_rep_gate"
        while tmp in gated.columns:
            tmp += "_"
        gated = gated.withColumn(
            tmp, gopher_repetition_col(F.col("text_clean"))
        )
        pred = None
        for sig, cut in th.items():
            ok = F.col(tmp)[sig] <= F.lit(cut)
            pred = ok if pred is None else pred & ok
        gated = gated.filter(pred).drop(tmp)
    if surgical and bench_grams is None:
        raise ValueError("surgical=True requires bench_grams")
    if bench_grams is not None:
        flagged = decontaminate_stateless(
            gated,
            bench_grams,
            text_col="text_clean",
            id_col=id_col,
            ngram=ngram,
            keep_payload=True,
            # clean_text strips markup but NOT chrome text — callers
            # feeding raw-crawl streams with short grams get the
            # ordering warning unless they extracted upstream
            text_is_extracted=text_is_extracted,
        )
        if surgical:
            from ..pipeline.decontamination import (
                remove_contaminated_spans,
            )

            audit_cols = ["n_ngrams", "n_hits", "overlap", "contaminated"]
            # clean slice: untouched text, audit columns with the SAME
            # semantics the kernel reports (non-empty kept tokens over
            # the kernel's space-trim + ASCII-\s+ tokenization — trim
            # strips spaces only and Java \s is ASCII, matching
            # _ascii_ws_split exactly)
            clean = flagged.filter(~F.col("contaminated")).select(
                *[c for c in flagged.columns if c not in audit_cols],
                F.lit(0).cast("long").alias("n_tokens_removed"),
                F.size(
                    F.filter(
                        F.split(F.trim(F.col("text_clean")), r"\s+"),
                        lambda w: w != F.lit(""),
                    )
                ).cast("long").alias("n_tokens_kept"),
            )
            # contaminated slice: excise the overlapping spans (the
            # expensive per-token kernel runs ONLY here); what
            # survives must still clear the token floor
            repaired = remove_contaminated_spans(
                flagged.filter(F.col("contaminated")).drop(*audit_cols),
                bench_grams,
                text_col="text_clean",
                ngram=ngram,
                pad=surgery_pad,
                text_is_extracted=True,
            ).filter(F.col("n_tokens_kept") >= F.lit(min_tokens))
            gated = clean.unionByName(repaired)
        else:
            gated = flagged.filter(~F.col("contaminated"))
    return streaming_dedup_exact(
        gated, text_col="text_clean", ts_col=ts_col, watermark=watermark
    )
