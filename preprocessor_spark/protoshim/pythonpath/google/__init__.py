"""Namespace shell for the protobuf shim (see preprocessor_spark.protoshim).
A real google namespace package on the path takes precedence because the
shim directory is only appended when `import google.protobuf` fails."""
