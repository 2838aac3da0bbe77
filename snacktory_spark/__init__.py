"""snacktory_spark — a from-scratch PySpark-native reimplementation of the
snacktory main-content extractor (reference: /root/reference, Java), applied
to multi-turn conversation/agent transcript tables at scale.

Layers:
- pure-python extraction core: dom, shelper, dates, constants, domains,
  weights, formatter, metadata, author, extractor
- Spark layer: schema, udf, pipeline.extract_job (Arrow-vectorized UDFs,
  salted repartitioning, per-partition manifest + idempotent resume)
- deterministic synthetic data: data.synth
"""

from .extractor import extract  # noqa: F401

__version__ = "0.1.0"
