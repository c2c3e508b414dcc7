"""AppleCider-TPU: a TPU-native multimodal transient-classification framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``skyportal/applecider`` (arXiv:2507.16088): four-modality preprocessing
(photometry, cutout images, alert metadata, spectra), dataset abstractions
with class-imbalance oversampling, four model families plus a late-fusion
classifier and self-supervised pretraining, and a config-driven
``prepare``/``train``/``infer``/``export`` runtime.

Design stance (vs the PyTorch reference):

* Host plane: raw-file ingest, alert matching, manifests/splits — pure
  NumPy/pandas, inherently ragged and I/O bound.
* Device plane: everything from "fixed-shape batch" onward — featurization
  math, models, losses, metrics — jit-compiled, bf16 fast path with an f32
  parity mode, sharded over a ``jax.sharding.Mesh`` for multi-chip.
"""

__version__ = "0.1.0"

from applecider_tpu.config import Config, load_config  # noqa: F401
from applecider_tpu.registry import (  # noqa: F401
    get_dataset_class,
    get_model,
    register_dataset,
    register_model,
)
