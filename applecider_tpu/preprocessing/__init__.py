"""Host-plane preprocessing: raw ZTF object directories -> fixed-schema npz.

Public surface mirrors the reference
(``preprocess_multimodal.py:969-975`` ``__all__`` + the splitter):
``PreprocessConfig``, ``build_all_preprocessed``,
``build_multimodal_for_object``, ``make_splits_from_manifest``,
``compute_feature_stats``, ``find_available_ids``.
"""

from applecider_tpu.preprocessing.config import PreprocessConfig  # noqa: F401
from applecider_tpu.preprocessing.builder import (  # noqa: F401
    build_all_preprocessed,
    build_multimodal_for_object,
)
from applecider_tpu.preprocessing.manifest import (  # noqa: F401
    compute_feature_stats,
    find_available_ids,
    make_splits_from_manifest,
    write_manifest_csv,
)

# compatibility aliases with the reference naming
Config = PreprocessConfig
compute_feature_stats_safe = compute_feature_stats
