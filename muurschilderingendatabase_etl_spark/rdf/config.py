"""Env-driven configuration loaders (SURVEY.md O9, O11).

The reference configures its predicate filter and rename mapping from
environment variables (transform_datamodel.py:28-39, 51-79). Same
contract here, feeding the declarative transforms in ``transform.py``.
"""

from __future__ import annotations

import logging
import os
import re

from muurschilderingendatabase_etl_spark.rdf.schema import (
    VALID_URI_REGEX,
    import_namespace_by_name,
)

log = logging.getLogger(__name__)

_URI_RE = re.compile(VALID_URI_REGEX)


def get_filter_from_env(environ: dict[str, str] | None = None) -> list[str]:
    """O9 (transform:28-39): every env var ``FILTER*`` whose value is a
    valid URI becomes a predicate to drop; invalid values are logged and
    skipped."""
    environ = dict(os.environ if environ is None else environ)
    filters: list[str] = []
    for key, value in sorted(environ.items()):
        if not key.startswith("FILTER"):
            continue
        if _URI_RE.fullmatch(value):
            filters.append(value)
        else:
            log.warning("skipping invalid filter URI %s=%r", key, value)
    return filters


def get_mapping_from_env(environ: dict[str, str] | None = None) -> dict[str, str]:
    """O11 (transform:51-79): env ``MAP_<SRCNS>_<PRED>=<TGTNS>.<pred>``
    → {source predicate IRI: target predicate IRI}.

    Behavior notes vs the reference:
    - the source predicate local-name is lowercased, as the reference
      does (transform:61) — preserved as documented behavior;
    - the reference splits the key on every ``_`` and keeps only parts
      [0] and [1], silently truncating local-names containing ``_``
      (SURVEY O11 quirk). We split once, so ``MAP_DCTERMS_date_created``
      maps ``date_created`` — the *intended* semantics; divergence
      covered by tests.
    """
    environ = dict(os.environ if environ is None else environ)
    mapping: dict[str, str] = {}
    for key, value in sorted(environ.items()):
        if not key.startswith("MAP_"):
            continue
        try:
            src_ns_name, src_pred = key[4:].split("_", 1)
            tgt_ns_name, tgt_pred = value.split(".", 1)
            src_ns = import_namespace_by_name(src_ns_name)
            tgt_ns = import_namespace_by_name(tgt_ns_name)
        except ValueError as exc:
            log.warning("skipping invalid mapping %s=%r: %s", key, value, exc)
            continue
        mapping[src_ns + src_pred.lower()] = tgt_ns + tgt_pred
    return mapping
