from komodo_data_spark.functions.json_compat import (  # noqa: F401
    decode_entity,
    jget,
    jget_num,
    req_param,
)
