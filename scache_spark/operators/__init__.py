"""Operator modules.  Importing a module registers its queries into
``scache_spark.registry.REGISTRY`` (see ``registry._ensure_loaded``)."""
