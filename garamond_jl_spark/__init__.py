"""garamond_jl_spark — PySpark-native full-text engine (Garamond.jl capabilities)."""

# version string (utils/version.jl analog; rounds track the build)
__version__ = "0.4.0"
