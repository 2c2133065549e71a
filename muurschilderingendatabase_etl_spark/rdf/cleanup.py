"""Export-side data-quality filters (SURVEY.md O3-O5).

The reference removes garbage triples in a mutate-while-iterating pass
(export_from_omeka_s.py:53-71). Here each rule is a declarative filter —
Catalyst fuses them into one scan, and every predicate is a built-in
expression (no Python UDF; SURVEY §4.3.5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from muurschilderingendatabase_etl_spark.rdf.schema import (
    IRI,
    RDF_TYPE,
    VALID_URI_REGEX,
)


def drop_context_garbage(triples: DataFrame) -> DataFrame:
    """O3 (export:53-59): drop triples whose subject or object contains
    the literal text ``@context``, or whose subject is not a valid URI.

    Blank-node subjects are kept: like the reference, the URI test only
    guards against junk strings landing in the subject position.
    """
    return triples.where(
        ~F.col("s").contains("@context")
        & ~F.col("o").contains("@context")
        & ((F.col("s_kind") != IRI) | F.col("s").rlike(VALID_URI_REGEX))
    )


def drop_customvocab_refs(triples: DataFrame) -> DataFrame:
    """O4 (export:60-65) — *intended* semantics of the reference's dead
    code: drop triples whose object node is rdf:typed to a customvocab
    class.

    The reference's branch never fires (``"customvocab" in
    str(<generator>)`` is always False — SURVEY §2.1 O4); we implement
    the intent and document the divergence. The bad-object set is tiny
    (vocabulary terms), so it broadcasts: anti-join without shuffling
    the fact side.
    """
    bad_objects = (
        triples.where(
            (F.col("p") == RDF_TYPE) & F.col("o").contains("customvocab")
        )
        .select(F.col("s").alias("bad_o"))
        .distinct()
    )
    return triples.join(
        F.broadcast(bad_objects), triples.o == bad_objects.bad_o, "left_anti"
    )


def drop_invalid_uri_objects(triples: DataFrame) -> DataFrame:
    """O5 (export:66-71): drop triples whose object claims to be an IRI
    but is not a valid URI."""
    return triples.where(
        (F.col("o_kind") != IRI) | F.col("o").rlike(VALID_URI_REGEX)
    )


def clean(triples: DataFrame) -> DataFrame:
    """The full export cleanup pass, fused into one plan."""
    return drop_invalid_uri_objects(
        drop_customvocab_refs(drop_context_garbage(triples))
    )
