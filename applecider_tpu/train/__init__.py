from applecider_tpu.train.trainer import Trainer  # noqa: F401
from applecider_tpu.train.runtime import AppleCiderRuntime  # noqa: F401
