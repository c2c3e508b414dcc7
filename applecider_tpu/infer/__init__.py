from applecider_tpu.infer.stream import AlertStreamPipeline  # noqa: F401
