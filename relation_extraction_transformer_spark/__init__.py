"""relation_extraction_transformer_spark — a PySpark-native knowledge-graph
construction engine.

A from-scratch re-expression of the capabilities of
``ivan-bilan/Relation-Extraction-Transformer`` (reference at /root/reference,
cited throughout as ``ref:<file>:<lines>``) as an idiomatic Spark pipeline:

    pages (url, warc_ts, html, text, lang)
      -> extract_text          (byte-identical per url)
      -> sentences / tokens    (deterministic splitting)
      -> mention detection     (gazetteer NER, vectorized pandas UDF)
      -> candidate pairs       (subject x object explode)
      -> preprocessing         (entity masking, id mapping, position
                                vectors, log2 binning — pure Spark SQL exprs)
      -> relation inference    (position-aware self-attention transformer,
                                NumPy inside mapInPandas — no per-row Python)
      -> triples (subj, pred, obj, prob)
      -> entity linking + minhash/connected-components canonicalization
      -> nodes / edges tables

Everything is DataFrame-first: Catalyst handles pushdown/pruning/broadcasts;
the only Python on the hot path is Arrow-batched NumPy.

The training loop is covered too: ``kernel_grad`` (gradient-checked
analytic backward), ``optim`` (torch-semantics optimizer zoo), and
``operators.train`` (synchronous data-parallel ``train_step`` / ``fit``
with checkpoints and resume).
"""

__version__ = "0.1.0"
