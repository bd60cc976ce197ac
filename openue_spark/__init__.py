"""openue_spark — a from-scratch PySpark-native knowledge-graph-construction
engine with the capabilities of zjunlp/OpenUE (reference at /root/reference,
read-only).

The reference is an eager PyTorch-Lightning pipeline; this package re-expresses
its dataflow semantics (two-stage interaction scheme: multi-label relation
classification -> relation-conditioned BIO span labeling -> triple assembly)
as declarative PySpark DataFrame plans with vectorized Arrow/pandas UDFs for
the model forwards, plus the post-extraction stages the north rule requires
(entity linking, canonicalization, graph materialization) and large-scale
training-data ops (dedup, similarity search, text analysis).

Nothing here is a port: see SURVEY.md for the reference->Spark mapping.
"""

__version__ = "0.1.0"
