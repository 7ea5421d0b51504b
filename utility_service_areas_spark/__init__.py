"""PySpark-native analytics engine with the query and data-processing
capabilities of acep-uaf/utility-service-areas (see SURVEY.md), built
Spark-first for 100 TB scale: declarative DataFrame plans, broadcast
joins for dims, Arrow-batched UDFs only where built-ins can't express
the semantics.
"""

__version__ = "0.1.0"
