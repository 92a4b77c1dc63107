"""scache_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capabilities of the reference shuffle
manager (frankfzw/SCache) as a declarative DataFrame/SQL engine, and
adds the LLM-data-pipeline operator surface (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB scale.

The reference (/root/reference) is a distributed shuffle-block cache:
its data plane is partition-by-key redistribution, block caching with
memory/disk tiers, per-reducer size statistics, and pre-scheduled
placement.  All of that is built into Spark; this package therefore
concentrates on the *operator surface* (SURVEY.md §2 Part B) expressed
Spark-first so Catalyst/Tungsten/AQE do the physical planning.
"""

from scache_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
