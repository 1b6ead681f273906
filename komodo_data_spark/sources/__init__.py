from komodo_data_spark.sources.tables import load_all, load_events, load_table  # noqa: F401
