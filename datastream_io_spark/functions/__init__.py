from datastream_io_spark.functions.tokenize import (  # noqa: F401
    tokenize_simple,
    tokenize_code,
    tokenize_simple_col,
    tokenize_simple_udf,
    tokenize_code_udf,
    tokenizer_for,
)
from datastream_io_spark.functions.bm25 import idf_col, tf_norm_col, idf_py, tf_norm_py  # noqa: F401
