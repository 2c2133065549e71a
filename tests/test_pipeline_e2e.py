"""End-to-end pipeline golden test (SURVEY §3.1 + §3.2 + §5.2 item 2):
paginated REST scan (stub fetcher) → cleanup → enrichment/sameAs →
rename → filter → deterministic Turtle serialization, byte-compared
against a checked-in golden string and asserted idempotent."""

from __future__ import annotations

from muurschilderingendatabase_etl_spark.rdf import pipeline
from muurschilderingendatabase_etl_spark.rdf.schema import (
    CEO_RIJKSMONUMENT,
    CEO_RIJKSMONUMENTNUMMER,
    RDF_TYPE,
    WELL_KNOWN_NAMESPACES,
)
from muurschilderingendatabase_etl_spark.rdf.turtle import (
    parse_turtle_text,
    serialize_turtle,
)

DCTERMS = "http://purl.org/dc/terms/"
SDO = WELL_KNOWN_NAMESPACES["SDO"]
OMEKA = "http://omeka.org/s/vocabs/o#"
ITEM = "https://muurschilderingendatabase.nl/item/"


def _page_fetcher(page: int) -> str:
    if page > 1:
        return ""
    return f"""
    @prefix dcterms: <{DCTERMS}> .
    @prefix ceo: <https://linkeddata.cultureelerfgoed.nl/def/ceo#> .
    @prefix o: <{OMEKA}> .
    <{ITEM}1> dcterms:title "Sint Joris" ;
        a ceo:Rijksmonument ;
        ceo:rijksmonumentnummer "RM12345" ;
        o:is_public true .
    <{ITEM}2> dcterms:title "Zonder type" .
    <notascheme> dcterms:title "garbage subject" .
    """


def _enrich_fetcher(key: str) -> str:
    return f'<https://monuments.example/{key}> <{DCTERMS}identifier> "{key}" .'


def test_full_pipeline_golden(spark):
    cleaned = pipeline.run_export(spark, _page_fetcher)
    result = pipeline.run_transform(
        cleaned,
        mapping={DCTERMS + "title": SDO + "name"},
        filterlist=[OMEKA + "is_public"],
        fetcher=_enrich_fetcher,
    )
    text = serialize_turtle(result, {"sdo": SDO, "dcterms": DCTERMS})

    rows = {(r["s"], r["p"], r["o"]) for r in parse_turtle_text(text)}
    # cleanup dropped the invalid-URI subject
    assert not any(s == "notascheme" for s, _, _ in rows)
    # rename applied (dcterms:title -> sdo:name), original gone
    assert (ITEM + "1", SDO + "name", "Sint Joris") in rows
    assert not any(p == DCTERMS + "title" for _, p, _ in rows)
    # filter dropped the housekeeping predicate
    assert not any(p == OMEKA + "is_public" for _, p, _ in rows)
    # enrichment union + type-gated sameAs
    assert ("https://monuments.example/12345", DCTERMS + "identifier", "12345") in rows
    assert (ITEM + "1", SDO + "sameAs", "RM12345") in rows
    # type row survived
    assert (ITEM + "1", RDF_TYPE, CEO_RIJKSMONUMENT) in rows

    # determinism: serializing the same result twice is byte-identical
    assert text == serialize_turtle(result, {"sdo": SDO, "dcterms": DCTERMS})


def test_file_pipeline_matches_run_transform(spark, tmp_path):
    src = tmp_path / "in.ttl"
    src.write_text(_page_fetcher(1), encoding="utf-8")
    text = pipeline.run_file_pipeline(
        spark,
        str(src),
        mapping={DCTERMS + "title": SDO + "name"},
        filterlist=[OMEKA + "is_public"],
    )
    rows = {(r["s"], r["p"], r["o"]) for r in parse_turtle_text(text)}
    assert (ITEM + "1", SDO + "name", "Sint Joris") in rows
    # no fetcher -> sameAs still derived for typed monuments (add_same_as)
    assert (ITEM + "1", SDO + "sameAs", "RM12345") in rows
