"""PySpark-native type-filtered entity-resolution engine.

A brand-new DataFrame/Arrow implementation of the semantics of
samprintz/type-filtered-entity-linker (see SURVEY.md): blocking by
normalized surface form, ontology-type-filter candidate pruning
(broadcast semi-join), vectorized pairwise scoring (embedding cosine +
Jaro-Winkler + Levenshtein in pandas UDFs), deterministic top-K /
argmax, and transitive clustering via an iterative connected-components
DataFrame loop — designed for 10^12-document scale (salted blocking
keys, AQE, per-stage checkpoints with lineage + metrics).
"""

__version__ = "0.1.0"
