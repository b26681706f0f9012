"""mpnsm_spark — a PySpark-native time-series rollup / downsample / retention engine.

A from-scratch Spark-first re-expression of the capabilities of the reference
``ProjetaAi/mpnsm`` time-series module (multi-series-per-key processing,
frequency tiers, gap-fill, per-series parallel kernels, incremental cache /
resume, versioned lineage — see SURVEY.md for the full operator inventory and
``/root/reference`` citations).

Design scale: 10^12 turns over a partitioned (Iceberg-style) table of
conversation/agent transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.
Everything relational stays in Spark SQL (Catalyst pruning/pushdown/codegen);
Python appears only inside Arrow-vectorized pandas UDFs (Gorilla codec).
"""

__version__ = "0.1.0"

TIERS = ("1m", "1h", "1d")

# Tier → Spark date_trunc unit and seconds-per-bucket.
TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}
# Cascade order: each tier is re-aggregated from the previous (cheaper and
# exactly consistent — continuous-aggregate semantics, SURVEY.md §2.4 A9).
TIER_PARENT = {"1h": "1m", "1d": "1h"}
