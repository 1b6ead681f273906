from komodo_data_spark.operators.analytics import (  # noqa: F401
    aggregate_interaction_type,
    aggregate_user,
    drawing_pattern,
    user_energy,
    user_proximity,
)
