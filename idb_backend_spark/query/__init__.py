from idb_backend_spark.query.shim import compile_shim, shim_to_sql

__all__ = ["compile_shim", "shim_to_sql"]
