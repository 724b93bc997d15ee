"""loganalyzer_spark — a PySpark-native log/telemetry analytics engine.

A from-scratch rebuild of the *capabilities* of hayhan/loganalyzer
(reference at /root/reference, cited by file:line throughout) as an
idiomatic Spark DataFrame DAG:

    parse (grok/regex + vectorized masking)
      -> template match (broadcast candidate join + vectorized similarity)
      -> enrich (broadcast dimension joins: template lib, knowledge base,
                 vocab, lang)
      -> route (fan-out to per-class sinks)
      -> aggregate (event-count matrices over time windows, tf-idf,
                    sequence slicing)
      -> score (vectorized numeric kernel over Arrow batches)

Design rules (see SURVEY.md §4/§7):
  * DataFrame/SQL first; Catalyst fuses the narrow wash ops that the
    reference hand-fused into one scan (preprocess_base.py:217-407).
  * Custom Python only as vectorized pandas/Arrow UDFs — never per-row.
  * All joins against dimensions are broadcast hash joins.
  * Skewed event_id aggregation uses two-level salted aggregation.
  * Order-sensitive ops pin explicit (url/doc, line_no) sort keys.
"""

__version__ = "0.1.0"
