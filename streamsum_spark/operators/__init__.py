"""Operator library: the reference pipeline surface (extract / transform /
caches), the read-side count-cache query API, and the relational + LLM-data
extension operators."""
