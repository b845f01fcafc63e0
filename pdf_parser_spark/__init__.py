"""pdf_parser_spark — PySpark-native rebuild of acstumler/pdf_parser's
extraction core as a batch pipeline over Common-Crawl-style web-page tables.

Layers (see SURVEY.md §7):
- extraction_core / html_extract / pdf_layout: pure-Python, Spark-free
  byte-identity engines (imported by pandas UDFs and by pytest both).
- fixtures: deterministic synthetic pages corpus (FIXTURES.md F1/F2).
- operators/: DataFrame stages (extract, normalize, classify, pairing,
  journal, dedupe, similarity, textstats, multimodal).
- plans/: end-to-end pipeline assembly + lineage/resume.
- sources/, streaming/: table readers and incremental checkpointed batch.
"""

__version__ = "0.1.0"
