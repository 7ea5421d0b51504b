from utility_service_areas_spark.sources.tables import load_table, load_tables

__all__ = ["load_table", "load_tables"]
