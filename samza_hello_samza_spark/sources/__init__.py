"""Sources & sinks: the reference's connector surface, Spark-first."""
