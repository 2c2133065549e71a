"""RDF layer: the reference's own operator surface (SURVEY.md §2.1),
re-expressed on a triples DataFrame instead of an in-memory rdflib Graph.
"""
