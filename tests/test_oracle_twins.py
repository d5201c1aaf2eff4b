"""Spark-vs-DuckDB oracle twins on ENGINEERED corpora: the driver's
correctness gate runs both sides at sf0.01, but some divergences only
fire on shapes that corpus happens not to contain (empty documents,
template junctions). These tests re-run the registry query AND its
oracle_sql() on purpose-built parquet so those latent mismatches are
pinned here instead of surfacing as a future rows_match failure."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e

    return e


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """The checker's compare discipline: sorted columns, stringified
    objects, order-insensitive rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _twin(entry, spark, name: str, sf_dir: str) -> None:
    spark_pdf = entry.queries()[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    duck_pdf = con.execute(entry.oracle_sql()[name]).fetchdf()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    assert len(spark_pdf) == len(duck_pdf)
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]):
            assert np.allclose(
                av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True
            ), c
        else:
            assert (
                (av == bv) | (pd.isna(av) & pd.isna(bv))
            ).all(), (c, av[av != bv][:3], bv[av != bv][:3])


def test_tokenize_apply_twin_handles_empty_documents(
    entry, spark, tmp_path
):
    """ADVICE r11: an empty or whitespace-only document produces no
    `words` row in the DuckDB twin, while the Spark encoders emit an
    n_pieces=0 / md5('') row per doc — the twin must anchor its
    aggregate back onto `documents` or the row counts diverge on any
    corpus containing empty texts (the SF corpora happen to have
    none, so only this engineered corpus exercises it)."""
    rows = [
        (0, ""),
        (1, "   \t  "),
        (2, "the quick brown fox"),
        (3, "hello hello world"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    _twin(entry, spark, "tokenize_apply", str(tmp_path))


def test_span_removal_twin_handles_edge_documents(entry, spark, tmp_path):
    """The span_removal replay on shapes the SF corpora lack: empty
    and whitespace-only documents (no grams, untouched, kept=0),
    mixed ASCII whitespace (tabs / runs of spaces — both engines
    split on \\s+ after trim), short docs below the gram width, a
    duplicated passage that actually excises, and non-ASCII text
    (md5 over UTF-8 bytes on both sides)."""
    passage = " ".join(f"dup{i}" for i in range(8))
    rows = [
        (0, ""),
        (1, " \t  "),
        (2, "short doc"),                         # < span_tokens tokens
        (3, f"left side {passage} right side"),
        (4, f"other intro {passage} tail words"),
        (5, "tabs\tbetween\ttokens  and   runs of spaces"),
        (6, "наивный текст with ümläuts φ"),
        (7, f"{passage}"),                        # passage IS the doc
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    _twin(entry, spark, "span_removal", str(tmp_path))


@pytest.mark.parametrize(
    "name",
    [
        "line_dedup",
        "text_features",
        "text_curation",
        "repetition_stats",
        "vocab_topk",
        "pmi_collocations",
        "doc_perplexity",
        "quality_classifier",
        "pack_sequences",
        "dup_clusters",
        "minhash_pairs",
        "jaccard_pairs",
        "doc_sample",
        "weighted_mixture",
        "decontaminate",
        "benchmark_leakage",
    ],
)
def test_document_query_twins_on_edge_corpus(entry, spark, tmp_path, name):
    """Broad latent-divergence net: every document-consuming oracle
    row re-run against a corpus of the shapes the SF data lacks —
    empty text, whitespace-only, single-token, duplicated and
    near-duplicated pairs, odd whitespace, non-ASCII — Spark vs
    DuckDB. This is how the tokenize_apply empty-doc divergence
    (ADVICE r11) would have been caught before the driver corpus
    ever contained an empty document."""
    passage = " ".join(f"dup{i}" for i in range(8))
    texts = [
        "",
        " \t ",
        "one",
        f"left side {passage} right side",
        f"other intro {passage} tail words",
        f"{passage}",
        "tabs\tbetween\ttokens  and   runs of spaces",
        "наивный текст with ümläuts φ",
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",   # exact dup
        "the quick brown fox jumps over a lazy dog",     # near dup
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    ]
    rows = [
        (i, t, ["en", "de"][i % 2], ["web", "books", "code"][i % 3], len(t))
        for i, t in enumerate(texts * 4)  # 48 docs: enough for samplers
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    _twin(entry, spark, name, str(tmp_path))
