"""garamond_jl_spark — PySpark-native full-text engine (Garamond.jl capabilities)."""
