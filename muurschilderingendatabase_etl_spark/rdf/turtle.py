"""Turtle parser and deterministic writer (SURVEY.md O2, O7/O17, O21).

The reference round-trips between Turtle text and an rdflib Graph
(graph.parse — export_from_omeka_s.py:50, transform_datamodel.py:84,102;
graph.serialize — export:84, transform:131-137). Here:

- **parse**: ``spark.read.text(paths, wholetext=True)`` (one file per
  row) → ``mapPartitions`` running a small Turtle tokenizer → triples
  rows. Prefix directives are file-scoped, so parsing whole files per
  task is the correct unit of parallelism (SURVEY §7 watch-list); many
  files parallelize across tasks. Malformed statements go to a
  ``_corrupt`` column instead of failing the job (O20 —
  ``badRecordsPath`` analogue of the reference's BadSyntax handling,
  transform:162-163).
- **write**: global ``orderBy(s, p, o)`` → single-partition formatter
  with prefix compaction (auto_compact analogue, transform:135). The
  deterministic sort is what makes golden-file testing possible; the
  single-file output matches the reference's artifact handoff (workflow
  33-39). Scale ceiling: the writer is for RDF artifacts (≤ GBs); the
  triples DataFrame itself scales via parquet.

Supported Turtle subset: @prefix/PREFIX directives, IRIs, prefixed
names, ``a`` keyword, blank-node labels, string literals (single/triple
quoted) with @lang / ^^datatype, numeric and boolean literal shorthand,
``;`` and ``,`` lists. Not supported (absent from the reference's data):
collections ``( … )``, anonymous ``[ … ]`` property lists.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row, SparkSession

from muurschilderingendatabase_etl_spark.rdf.schema import (
    BNODE,
    IRI,
    LITERAL,
    TRIPLE_COLS,
    WELL_KNOWN_NAMESPACES,
)

PARSED_SCHEMA = (
    "s string, s_kind string, p string, o string, o_kind string,"
    " o_lang string, o_datatype string, _corrupt string"
)

_XSD = WELL_KNOWN_NAMESPACES["XSD"]

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<triple_quote>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<quote>"(?:[^"\\\n]|\\.)*")
  | (?P<keyword>@prefix(?=\s)|@base(?=\s)|PREFIX\b|BASE\b|true\b|false\b|[Aa](?![\w:-]))
  | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<dtype_marker>\^\^)
  | (?P<punct>[;,.])
  | (?P<bnode>_:[A-Za-z0-9_-]+)
  | (?P<pname>[A-Za-z0-9_-]*:[A-Za-z0-9_.%-]*)
  | (?P<number>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(text: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == "\\" and i + 1 < len(text):
            nxt = text[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u" and i + 6 <= len(text):
                out.append(chr(int(text[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(text):
                out.append(chr(int(text[i + 2 : i + 10], 16)))
                i += 10
                continue
        out.append(ch)
        i += 1
    return "".join(out)


def _tokenize(text: str) -> Iterator[tuple[str, str]]:
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"unexpected character at offset {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield kind, m.group()


class _Parser:
    """Statement-at-a-time Turtle parser over a token stream."""

    def __init__(self) -> None:
        self.prefixes: dict[str, str] = {}
        self.base = ""

    def parse(self, text: str) -> Iterator[dict]:
        tokens = list(_tokenize(text))
        i = 0
        n = len(tokens)
        while i < n:
            kind, val = tokens[i]
            if kind == "keyword" and val in ("@prefix", "PREFIX"):
                # @prefix ex: <http://…> .
                pname = tokens[i + 1][1]
                iri = tokens[i + 2][1][1:-1]
                self.prefixes[pname[:-1]] = iri
                i += 3
                if i < n and tokens[i] == ("punct", "."):
                    i += 1
                continue
            if kind == "keyword" and val in ("@base", "BASE"):
                self.base = tokens[i + 1][1][1:-1]
                i += 2
                if i < n and tokens[i] == ("punct", "."):
                    i += 1
                continue
            i = yield from self._statement(tokens, i)

    def _statement(self, tokens: list, i: int) -> Iterator[dict]:
        subj, s_kind = self._term(tokens[i], subject=True)
        i += 1
        while True:
            pred = self._predicate(tokens[i])
            i += 1
            while True:
                i, obj = self._object(tokens, i)
                yield {"s": subj, "s_kind": s_kind, "p": pred, **obj}
                if i < len(tokens) and tokens[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < len(tokens) and tokens[i] == ("punct", ";"):
                i += 1
                # trailing ';' before '.'
                if i < len(tokens) and tokens[i] == ("punct", "."):
                    i += 1
                    return i
                continue
            if i < len(tokens) and tokens[i] == ("punct", "."):
                i += 1
                return i
            raise ValueError(f"expected ';' ',' or '.' near token {i}: {tokens[i:i+3]}")

    def _expand_pname(self, pname: str) -> str:
        prefix, _, local = pname.partition(":")
        if prefix not in self.prefixes:
            raise ValueError(f"undefined prefix {prefix!r} in {pname!r}")
        return self.prefixes[prefix] + local

    def _term(self, token: tuple[str, str], subject: bool = False) -> tuple[str, str]:
        kind, val = token
        if kind == "iri":
            iri = val[1:-1]
            if self.base and "://" not in iri and not re.match(r"^[A-Za-z][\w+.-]*:", iri):
                iri = self.base + iri
            return iri, IRI
        if kind == "pname":
            return self._expand_pname(val), IRI
        if kind == "bnode":
            return val, BNODE
        raise ValueError(f"invalid {'subject' if subject else 'term'}: {token}")

    def _predicate(self, token: tuple[str, str]) -> str:
        kind, val = token
        if kind == "keyword" and val.lower().lstrip("@") == "a":
            return WELL_KNOWN_NAMESPACES["RDF"] + "type"
        term, t_kind = self._term(token)
        if t_kind != IRI:
            raise ValueError(f"predicate must be an IRI: {token}")
        return term

    def _object(self, tokens: list, i: int) -> tuple[int, dict]:
        kind, val = tokens[i]
        if kind in ("iri", "pname", "bnode"):
            term, t_kind = self._term(tokens[i])
            return i + 1, {"o": term, "o_kind": t_kind, "o_lang": None, "o_datatype": None}
        if kind in ("quote", "triple_quote"):
            raw = val[3:-3] if kind == "triple_quote" else val[1:-1]
            text = _unescape(raw)
            lang = dtype = None
            i += 1
            if i < len(tokens) and tokens[i][0] == "langtag":
                lang = tokens[i][1][1:]
                i += 1
            elif i < len(tokens) and tokens[i][0] == "dtype_marker":
                dtype, _ = self._term(tokens[i + 1])
                i += 2
            return i, {"o": text, "o_kind": LITERAL, "o_lang": lang, "o_datatype": dtype}
        if kind == "number":
            dtype = _XSD + (
                "integer" if re.fullmatch(r"[+-]?\d+", val)
                else "double" if "e" in val.lower()
                else "decimal"
            )
            return i + 1, {"o": val, "o_kind": LITERAL, "o_lang": None, "o_datatype": dtype}
        if kind == "keyword" and val in ("true", "false"):
            return i + 1, {"o": val, "o_kind": LITERAL, "o_lang": None,
                           "o_datatype": _XSD + "boolean"}
        raise ValueError(f"invalid object token: {tokens[i]}")


def parse_turtle_text(text: str) -> list[dict]:
    """Parse one Turtle document (driver-side helper, also the executor
    kernel). Raises ValueError on malformed input."""
    return list(_Parser().parse(text))


def parse_bodies(bodies: DataFrame, column: str = "value") -> DataFrame:
    """Executor-side Turtle parse: one document body per row (in
    ``column``) → triples DataFrame (+ ``_corrupt`` quarantine column —
    PERMISSIVE mode, SURVEY O20). The shared kernel for file input
    (``read_turtle``) and the paginated REST source (``rdf/source.py``).
    """

    def parse_partition(rows: Iterable[Row]) -> Iterator[tuple]:
        for row in rows:
            body = row[column]
            try:
                for tr in parse_turtle_text(body):
                    yield (
                        tr["s"], tr["s_kind"], tr["p"],
                        tr["o"], tr["o_kind"], tr["o_lang"], tr["o_datatype"],
                        None,
                    )
            except ValueError as exc:
                # quarantine the document, don't fail the job
                yield (None, None, None, None, None, None, None,
                       f"{exc}: {body[:200]}")

    return bodies.rdd.mapPartitions(parse_partition).toDF(PARSED_SCHEMA)


def read_turtle(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Turtle files → triples DataFrame (+ ``_corrupt`` column).

    One file per row via wholetext (prefix directives are file-scoped);
    files parallelize across tasks.
    """
    return parse_bodies(spark.read.text(paths, wholetext=True))


def triples_only(parsed: DataFrame) -> DataFrame:
    """Drop the quarantine column and corrupt rows."""
    return parsed.where(F.col("_corrupt").isNull()).select(*TRIPLE_COLS)


def corrupt_records(parsed: DataFrame) -> DataFrame:
    return parsed.where(F.col("_corrupt").isNotNull()).select("_corrupt")


# ---------------------------------------------------------------------------
# Writer


def _format_term(value: str, kind: str, lang: str | None, dtype: str | None,
                 prefixes: list[tuple[str, str]]) -> str:
    if kind == IRI:
        for pfx, ns in prefixes:
            if value.startswith(ns) and re.fullmatch(r"[A-Za-z0-9_.-]*", value[len(ns):]):
                return f"{pfx}:{value[len(ns):]}"
        return f"<{value}>"
    if kind == BNODE:
        return value
    escaped = (
        value.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )
    out = f'"{escaped}"'
    if lang:
        out += f"@{lang}"
    elif dtype:
        dt = _format_term(dtype, IRI, None, None, prefixes)
        out += f"^^{dt}"
    return out


def write_turtle(
    triples: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
) -> None:
    """Deterministic Turtle sink: global orderBy(s,p,o) → one text file.

    Prefix compaction mirrors rdflib's auto_compact
    (transform_datamodel.py:135); the stable sort is the determinism
    contract that golden-file tests rely on (SURVEY O21). coalesce(1)
    matches the reference's single-artifact handoff — documented scale
    ceiling, use parquet for the at-scale representation.
    """
    prefix_items = sorted((prefixes or {}).items())
    # longest namespace first so the most specific prefix wins
    prefix_order = sorted(prefix_items, key=lambda kv: -len(kv[1]))

    header = "".join(f"@prefix {p}: <{ns}> .\n" for p, ns in prefix_items)

    ordered = triples.select(*TRIPLE_COLS).orderBy("s", "p", "o").coalesce(1)

    def format_partition(rows: Iterable[Row]) -> Iterator[str]:
        first = True
        for r in rows:
            if first and header:
                yield header.rstrip("\n")
                first = False
            subj = _format_term(r.s, r.s_kind, None, None, prefix_order)
            pred = _format_term(r.p, IRI, None, None, prefix_order)
            obj = _format_term(r.o, r.o_kind, r.o_lang, r.o_datatype, prefix_order)
            yield f"{subj} {pred} {obj} ."

    lines = ordered.rdd.mapPartitions(format_partition)
    lines.saveAsTextFile(path)


_SERIALIZE_MAX_TRIPLES = 1_000_000  # ~100 MB of driver strings; override per call


def serialize_turtle(
    triples: DataFrame,
    prefixes: dict[str, str] | None = None,
    max_triples: int = _SERIALIZE_MAX_TRIPLES,
) -> str:
    """Driver-side serialization to a single string (golden tests /
    small artifacts — the reference's graph.serialize analogue,
    workflows:33-39 single-file handoff).

    Guarded: this path collects to the driver, so a graph above
    `max_triples` raises instead of silently OOM-ing the driver at 100x
    scale — callers with big graphs belong on the distributed
    `write_turtle` sink. The limit check is a cheap pushdown-friendly
    `limit(n+1).count()`, not a full count of the graph."""
    n = triples.limit(max_triples + 1).count()
    if n > max_triples:
        raise ValueError(
            f"serialize_turtle collects to the driver and the graph exceeds "
            f"max_triples={max_triples}; use write_turtle(df, path) for the "
            f"distributed single-artifact sink instead"
        )
    prefix_items = sorted((prefixes or {}).items())
    prefix_order = sorted(prefix_items, key=lambda kv: -len(kv[1]))
    rows = triples.select(*TRIPLE_COLS).orderBy("s", "p", "o").collect()
    out = [f"@prefix {p}: <{ns}> ." for p, ns in prefix_items]
    for r in rows:
        subj = _format_term(r.s, r.s_kind, None, None, prefix_order)
        pred = _format_term(r.p, IRI, None, None, prefix_order)
        obj = _format_term(r.o, r.o_kind, r.o_lang, r.o_datatype, prefix_order)
        out.append(f"{subj} {pred} {obj} .")
    return "\n".join(out) + "\n"
