"""Column-level functions (all JVM-side pyspark.sql.functions compositions)."""
