"""PySpark-native analytics engine with the capabilities of the reference
``ohlc-spark-streaming`` app (OHLC candle streaming over trade events),
rebuilt Spark-first and extended with a relational query surface and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns). See /root/repo/SURVEY.md for the blueprint.
"""

from .session import apply_engine_confs, build_session

__all__ = ["apply_engine_confs", "build_session"]
