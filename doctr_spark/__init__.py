"""doctr_spark — a from-scratch, PySpark-native document-text-extraction engine.

Re-expresses the capabilities of docTR (reference: /root/reference, lkosh/doctr)
as an idiomatic Spark pipeline over tables of multi-turn transcripts:

- ``sources``   : payload codecs, deterministic synthetic corpus, raster font
- ``operators`` : detection / recognition / builder / dedup / similarity kernels
- ``functions`` : column-level helpers (render joins, html strip, text stats, metrics)
- ``plans``     : the fused extraction pipeline, salting, checkpoint/lineage
- ``streaming`` : structured-streaming variant of the extractor

All heavy work runs inside Arrow-batched ``mapInPandas`` stages (no per-row
Python); everything relational stays in DataFrame/SQL ops so Catalyst can
prune/push down/replan.
"""

__version__ = "0.1.0"
