from pasar_spark.streaming.stream import StreamingIngest  # noqa: F401
