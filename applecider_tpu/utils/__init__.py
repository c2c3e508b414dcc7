from applecider_tpu.utils.rng import seed_everything, key_iter  # noqa: F401
