"""Pure-Python protobuf runtime SHIM — only the surface generated *_pb2
modules and Spark's transformWithState client use. Provided by
preprocessor_spark.protoshim; not a general protobuf implementation."""
__version__ = "0.0.0-shim"
