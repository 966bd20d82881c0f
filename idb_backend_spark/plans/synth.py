"""Shared synthetic-input SQL builders (identical literal arithmetic on
the Spark and DuckDB sides; the TPC-H-ish tables carry no coordinates)."""

GEO_LAT = "CAST((c_custkey * 7) % 160 - 80 AS DOUBLE) + 0.5"
GEO_LON = "CAST((c_custkey * 13) % 360 - 180 AS DOUBLE) + 0.5"
