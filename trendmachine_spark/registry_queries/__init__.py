"""Position-contiguous registry chunks. IMPORT ORDER IS THE
DRIVER-CONTRACT REGISTRATION ORDER — trendmachine_spark.registry
imports these modules in sequence; never import a chunk directly
(you would get a partially populated QUERIES).
"""
